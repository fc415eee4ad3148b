"""Pytest twin of tools/degenerate_sweep.py (fixture recipe + runner in
wikidata2pg_spark/degenerate_audit.py): every registered key must
survive — on BOTH engines — an all-constant minimal fixture where every
variance is zero, every determinant singular, every rank tied, the
co-purchase graph regular, the EVT block count one, and the embeddings
identical. The r7 grep-driven audit found 14 degenerate-division keys;
this sweep's first run found FIVE more crashes the grep missed
(pq_adc's KC-stride overrun, pca power/project's zero-norm
renormalization, degree_powerlaw's empty tail, strength's constant
series) plus two oracle-boundary divergences (stream frontier with an
empty side, hill_tail's fabricated row below k+1 documents) — all fixed
and held at zero by this gate.

Runtime note: one spark+duck run per key over tiny tables per variant
(~3-4 min each) — the same order as the liveness and plan sweeps.
Engine errors FAIL; value mismatches also fail here (the steady state
is exact parity on every variant — weaker than the driver gate, but
drift-free). Seven variants: all-constant, zero-row (row-fabrication
class), NULL-injected measures (NULL-ordering class), extreme
magnitude (int64-square overflow class, r9), negated measures
(sign-assumption class, r10), unicode text (case-mapping/BLOB-cast
class, r10), duplicate mass + hot-key skew (tie-ordering /
merge-path class, r10).
"""

from __future__ import annotations

import pytest

from wikidata2pg_spark.degenerate_audit import (
    EXPECTED_EMPTY_MISMATCH,
    EXPECTED_RAISE_EMPTY,
    build_degenerate_dir,
    build_empty_dir,
    build_nulls_dir,
    run_sweep,
)


def _tools_module(name: str):
    """Import a sweep-builder module from tools/ (shared by the three
    promoted sweep gates — the CLI files double as fixture builders)."""
    import importlib
    import os
    import sys

    from tests.conftest import REPO_ROOT

    tools = os.path.join(REPO_ROOT, "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    return importlib.import_module(name)


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    return build_degenerate_dir(str(tmp_path_factory.mktemp("degen")))


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    return build_empty_dir(str(tmp_path_factory.mktemp("degen_empty")))


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    return build_nulls_dir(str(tmp_path_factory.mktemp("degen_nulls")))


def test_degenerate_input_sweep(spark, degenerate_dir):
    spark_errors, duck_errors, mismatches = run_sweep(spark, degenerate_dir)
    assert not spark_errors, (
        "key RAISES on degenerate input (ANSI divide-by-zero / index "
        "overrun class) — guard with try_divide / greatest-clamp / "
        f"try_element_at on BOTH sides: {spark_errors}"
    )
    assert not duck_errors, (
        "oracle RAISES on degenerate input (DuckDB sqrt-of-negative "
        f"class) — greatest-clamp the sqrt argument on BOTH sides: {duck_errors}"
    )
    assert not mismatches, (
        "engines degrade DIFFERENTLY on degenerate input — align the "
        f"NULL/zero conventions on both sides: {mismatches}"
    )


def test_empty_input_sweep(spark, empty_dir):
    """Zero-row variant: the ungrouped-aggregate row-fabrication class
    (one side groups, the other aggregates bare — the q_text_hill_tail
    bug shape) plus empty-partition robustness. Deliberate, loudly
    raised preconditions and documented engine-semantics divergences
    (SQL's grand-total row over empty ROLLUP/CUBE input) are
    allowlisted with reasons in degenerate_audit.py."""
    spark_errors, duck_errors, mismatches = run_sweep(
        spark, empty_dir,
        expected_raise=EXPECTED_RAISE_EMPTY,
        expected_mismatch=EXPECTED_EMPTY_MISMATCH,
    )
    assert not spark_errors, spark_errors
    assert not duck_errors, duck_errors
    assert not mismatches, mismatches


def test_null_measure_sweep(spark, nulls_dir):
    """NULL-injected measure variant (every 3rd measure value NULL):
    probes NULL propagation through arithmetic, folds, and — the class
    its first run surfaced — rankings over nullable measures, where
    Spark's ASC default is NULLS FIRST and DuckDB's NULLS LAST. Closed
    in r7 by the repo NULL-ordering convention: every ranking over a
    nullable measure spells NULLS LAST on BOTH sides (asc_nulls_last /
    explicit SQL; ordered_bucket routes NULLs to the last bucket), and
    every order statistic (gini, KS, quantile bands, winsorized mean,
    LTTB downsample, skyline) excludes NULL measures on BOTH sides."""
    spark_errors, duck_errors, mismatches = run_sweep(spark, nulls_dir)
    assert not spark_errors, spark_errors
    assert not duck_errors, duck_errors
    assert not mismatches, mismatches


def test_extreme_magnitude_sweep(spark, tmp_path_factory):
    """Fourth variant, PROMOTED from exploratory to standing gate in r9
    once its catalog emptied (tools/extreme_sweep.py documents the
    history): every measure scaled by 9e11 so the derived cents reach
    ~9e15 — still under 2^53 (double-exact, engine-identical) but far
    past the int64 square boundary. Holds the wide-multiply discipline
    (decimal(38,0) Spark-side / one HUGEINT operand oracle-side; never
    try_multiply) at zero crashes. The ONE allowed mismatch is
    q_ab_delta_method's documented display-level clamp: its 6dp
    floor(x*1e6+0.5) saturates Spark's LONG floor at |x| >= ~9.2e12
    while DuckDB's floor stays DOUBLE — aggregation is hardened, only
    the displayed rounding clamps, ~6 orders above real ratio ranges."""
    build_extreme_dir = _tools_module("extreme_sweep").build_extreme_dir

    xdir = build_extreme_dir(str(tmp_path_factory.mktemp("extreme")))
    spark_errors, duck_errors, mismatches = run_sweep(spark, xdir)
    assert not spark_errors, (
        "key OVERFLOWS at extreme magnitudes (per-row squared-cents "
        f"class) — widen the multiply on BOTH sides: {spark_errors}"
    )
    assert not duck_errors, duck_errors
    assert [k for k, _ in mismatches] == ["q_ab_delta_method"], (
        f"unexpected extreme-magnitude divergence: {mismatches}"
    )


def test_negative_measure_sweep(spark, tmp_path_factory):
    """Fifth variant, PROMOTED from exploratory to standing gate in r10
    once its catalog emptied (tools/negative_sweep.py documents the
    history): every money/value measure of the real sf0.001 fixture
    NEGATED — refund-shaped rows a 100 TB corpus will contain. Its
    first run found three sign-assumption crashes (q_dq_benford's
    leading-digit substr hitting '-', q_agg_log_histogram's
    two's-complement bin() vs DuckDB's signed '%b' shift crash,
    q_fn_math's ln/log10 of a negative where DuckDB throws and ANSI
    Spark NULLs) — all fixed with magnitude/positive-domain guards on
    BOTH sides, held at zero here."""
    build_negated_dir = _tools_module("negative_sweep").build_negated_dir

    ndir = build_negated_dir(str(tmp_path_factory.mktemp("negated")))
    spark_errors, duck_errors, mismatches = run_sweep(spark, ndir)
    assert not spark_errors, (
        "key RAISES on negative measures (sign-assumption class) — "
        f"guard the domain on BOTH sides, never abs(): {spark_errors}"
    )
    assert not duck_errors, (
        "oracle RAISES on negative measures (DuckDB ln/sqrt-of-negative "
        f"class) — positive-domain CASE on BOTH sides: {duck_errors}"
    )
    assert not mismatches, mismatches


def test_unicode_text_sweep(spark, tmp_path_factory):
    """Sixth variant, PROMOTED from exploratory to standing gate in r10
    once its catalog emptied (tools/unicode_sweep.py documents the
    history): multilingual tokens (NFC + genuinely-NFD accents, CJK,
    astral emoji, Turkish U+0130, full-width forms, sharp s, Greek,
    RTL Hebrew) injected into documents.text — the driver fixture is
    100% ASCII, so this is the only coverage the text/dedup families
    get on real multilingual bytes. Its first run found the repo's one
    wrong-answer class (q_dedup_exact's lower() canonical key diverging
    on U+0130 between Java FULL and utf8proc SIMPLE case mappings —
    fixed by the engine-portable ASCII-only fold, README §canonical)
    plus two oracle text::BLOB casts that reject non-ASCII (now
    encode()). Held at zero here."""
    build_unicode_dir = _tools_module("unicode_sweep").build_unicode_dir

    udir = build_unicode_dir(str(tmp_path_factory.mktemp("unicode")))
    spark_errors, duck_errors, mismatches = run_sweep(spark, udir)
    assert not spark_errors, spark_errors
    assert not duck_errors, (
        "oracle RAISES on non-ASCII text (DuckDB STRING->BLOB cast "
        f"class) — use encode() in the oracle: {duck_errors}"
    )
    assert not mismatches, (
        "engines diverge on multilingual bytes (full-vs-simple case "
        "mapping class) — canonicalize with the engine-portable "
        f"ASCII-only fold on BOTH sides: {mismatches}"
    )


def test_duplicate_mass_sweep(spark, tmp_path_factory):
    """Seventh variant (r10, clean on first run — promoted with an
    empty catalog): real DUPLICATE MASS and hot-key skew injected into
    the fixture (tools/duplicate_sweep.py — 3 exact copies + a
    trim-mergeable + a fold-mergeable + a near-dup variant per sampled
    document; one user's events amplified 20x at fresh event_ids). The
    driver fixture has zero exact-duplicate texts and no hot keys, so
    without this variant the dedup family's merge paths (keeper
    selection, n_copies > 1, bucket sharing, corpus-vs-batch hits) and
    tie-heavy ranking paths go unexercised by every other check. Holds
    the unique-id-tiebreaker and canonicalization conventions at exact
    cross-engine parity."""
    build_duplicate_dir = _tools_module("duplicate_sweep").build_duplicate_dir

    ddir = build_duplicate_dir(str(tmp_path_factory.mktemp("dupmass")))
    spark_errors, duck_errors, mismatches = run_sweep(spark, ddir)
    assert not spark_errors, (
        "key RAISES under duplicate mass / hot-key skew: "
        f"{spark_errors}"
    )
    assert not duck_errors, duck_errors
    assert not mismatches, (
        "engines diverge under duplicate mass (tie-ordering or "
        f"canonicalization drift): {mismatches}"
    )
