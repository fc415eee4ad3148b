"""Local mirror of the driver's t2 gate: every declared query vs its DuckDB
oracle at sf0.01 (row count + column names + order-insensitive exact values).
Queries without an oracle get a rows-run check (driver records rows-only).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_T2
from wikidata2pg_spark.oracle import compare
from wikidata2pg_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()

# r11 fast tier (VERDICT r10 task 1): the full 365-key mirror is the
# single biggest block of the suite; the default run keeps a
# DETERMINISTIC ~1/7 sample (every 7th key of the sorted registry —
# stable across runs, spans every operator family alphabetically), and
# the rest carry the 'full' marker (run by --full / the round-close
# gate). Sampling is selection-only: every key's test still exists.
FAST_MIRROR_SAMPLE = frozenset(sorted(QUERIES)[::7])


@pytest.mark.parametrize(
    "key",
    [
        pytest.param(
            k, marks=() if k in FAST_MIRROR_SAMPLE else (pytest.mark.full,)
        )
        for k in sorted(QUERIES)
    ],
)
def test_query_matches_oracle(key, spark, duck):
    df = QUERIES[key](spark, SF_T2)
    if key in ORACLES:
        errors = compare(key, df, duck, ORACLES[key])
        assert not errors, "\n".join(e[:500] for e in errors)
    else:
        # oracle-less (rows-only) key: execute end-to-end and pin at least
        # the schema — count() can't be negative, so asserting on it would
        # verify nothing
        df.count()
        assert len(df.columns) > 0


def test_every_oracle_key_is_declared():
    assert set(ORACLES) <= set(QUERIES)


def test_mirror_distinguishes_signed_zero(spark, duck):
    """r5 regression pin: the driver's value hash distinguishes -0.0 from
    +0.0, and the mirror's old _canon normalized them equal — so the mirror
    stayed green while the driver failed q_agg_stats. A deliberately
    injected -0.0-vs-+0.0 disagreement must now go red locally too."""
    df = spark.createDataFrame([(-0.0,)], "v double")
    errors = compare("negzero_probe", df, duck, "SELECT CAST(0.0 AS DOUBLE) AS v")
    assert any("values differ" in e for e in errors), errors


def test_mirror_flags_agreed_signed_zero(spark, duck):
    """Even when BOTH engines emit -0.0 (driver hash would pass today), the
    hazard sweep must flag it: which zero a tiny-negative rounds to is
    engine/summation-order dependent, so agreement is luck, not safety."""
    df = spark.createDataFrame([(-0.0,)], "v double")
    errors = compare("negzero_agree_probe", df, duck, "SELECT -1e-300 * 1e-300 AS v")
    assert any("HAZARD signed zero" in e for e in errors), errors


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
