"""Branch-liveness audit: flag registered keys whose categorical output
columns (string/boolean) show a single state at the driver's
correctness scale — the class the r7 audit surfaced, where a CASE/WHEN
branch, a join side, or an entire result set is DEAD on fixture data
and a green hash row attests nothing about it (q_except hash-matched on
ZERO rows; the decontamination/repetition/quality gates never flagged a
document; q_dedup_incremental only ever said 'new').

Rule: for every string/bool output column, states = countDistinct +
(1 if any NULL); for every NUMERIC column, flagged when ALL-NULL, when
ALL-NaN (nan != nan would otherwise slip the min==max test — r7 review
catch), or when min == max with no NULLs (numeric 0/1 columns are
booleans in disguise — the stale/top1_match catches lived there,
invisible to the categorical rule; a NULL *among* real values stays a
second state, the outer-join shape). A column with one state over a
multi-row result is flagged, as is an empty result. Every steady-state flag must be
allowlisted here WITH the evidence that covers the dead branch — a
crafted-fixture probe running the REGISTERED key on data that lights
it (tests/test_boundary_probes*.py), or a constant-by-construction
argument. A NEW flag means a new key shipped with an unattested branch:
write the probe, then allowlist.

Shared by tools/branch_audit.py and the pytest twin
(tests/test_branch_audit.py) so the two cannot drift.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, NumericType, StringType

# (key, column) -> reason. "probe:" entries name the crafted-fixture
# test that exercises the dead branch; "construction:" entries are
# constant for structural reasons no probe can change.
EXPECTED_CONSTANT: dict[tuple[str, str], str] = {
    # wikidata micro-fixture: one entity carries qualifiers, one carries
    # aliases, references are all snaktype=value — the json-walk pins
    # (tests/test_wikidata_pins*.py) recompute these from the dump lines,
    # and the fixture is pinned by FIXTURES.md (changing DUMP_LINES
    # changes every wikidata oracle hash — not during a freeze)
    ("q_wd_qualifiers", "subject"): "construction: single qualifier-bearing entity; json-walk pinned",
    ("q_wd_qualifiers", "property"): "construction: single qualifier-bearing statement; json-walk pinned",
    ("q_wd_qualifiers", "qual_snaktype"): "construction: fixture qualifiers all snaktype=value; json-walk pinned",
    ("q_wd_two_hop", "src"): "construction: one entity has 2-hop paths on the micro-fixture; json-walk pinned",
    ("q_wd_aliases", "id"): "construction: single alias-bearing entity; json-walk pinned",
    ("q_wd_aliases", "lang"): "construction: single alias language; json-walk pinned",
    ("q_wd_references", "ref_snaktype"): "construction: fixture reference snaks all value; json-walk pinned",
    # samplers / gates whose flagging branch is dead on clean fixture data
    ("q_dedup_incremental", "status"): "probe: test_boundary_probes4 lights new/dup_batch/dup_corpus",
    ("q_text_quality", "passes_quality"): "probe: test_boundary_probes5 lights both verdicts + exact thresholds",
    ("q_text_decontaminate", "is_contaminated"): "probe: test_boundary_probes4 lights the 8-gram hit",
    ("q_text_repetition", "passes_repetition"): "probe: test_boundary_probes4 lights the fail branch + exact 0.2",
    ("q_agg_bool", "all_qty_pos"): "probe: test_boundary_probes5 lights both truth values",
    ("q_agg_bool", "any_deep_disc"): "probe: test_boundary_probes5 lights both truth values",
    ("q_time_control_chart", "side"): "probe: xmr worked example pins above AND below spikes",
    # constant by construction — the column states an invariant or a
    # single-valued projection
    ("q_fn_url", "host"): "construction: one host built from a literal; parse roundtrip is the test",
    ("q_fn_try_safe", "oob_elem"): "construction: index 5 of a 2-element split is ALWAYS null (pinned in test_fn_pins)",
    ("q_fn_map", "keys_sorted"): "construction: same literal map keys per row",
    ("q_agg_hll_mergeable", "est_within_5pct"): "construction: accuracy invariant, true everywhere by contract",
    ("q_agg_listagg", "statuses"): "construction: every priority sees all 3 statuses at sf>=0.01; pinned vs Python",
}

# keys allowed to return ZERO rows at the audit scale
EXPECTED_EMPTY: dict[str, str] = {
    "q_except": "probe: test_boundary_probes4 pins non-empty EXCEPT semantics on crafted parts",
}

# Numeric columns stuck at min == max over a multi-row result. Numeric
# 0/1 columns are booleans in disguise (the r7 audit's stale/top1_match
# catches lived here, invisible to the string/bool rule), so the gate
# covers numerics too — at the price of a larger by-construction list.
EXPECTED_CONSTANT_NUM: dict[tuple[str, str], str] = {
    # dead branches now lit by crafted probes
    ("q_fn_try_safe", "bad_cast"): "probe: test_boundary_probes8 lights the cast-SUCCEEDS branch ('42')",
    ("q_pivot", "status_p"): "probe: test_boundary_probes8 fills the 'P' pivot bucket",
    ("q_dq_freshness", "stale"): "probe: test_boundary_probes6 lights stale=1 and the lag==7 boundary",
    ("q_dedup_semantic_cluster", "cluster_id"): "probe: test_boundary_probes6 pins multi-component + chain",
    ("q_vec_truncation_fidelity", "top1_match"): "probe: test_boundary_probes7 pins both top-1 outcomes",
    ("q_dedup_exact", "n_copies"): "probe: test_boundary_probes2 pins a 3-way normalization fold",
    ("q_text_decontaminate", "n_shared_grams"): "probe: test_boundary_probes4 lights the 8-gram hit",
    ("q_agg_iqr_outliers", "n_outliers"): "probe: closed-form pin plants an outlier (test_stats_extra)",
    ("q_dq_referential", "n_orphans"): "probe: injected-orphan test (test_analytics)",
    ("q_wd_dump_diff", "labels_removed"): "probe: dump_diff deletion test (test_wikidata)",
    ("q_fn_struct", "lt_flag"): "construction: {a,b} < {a,b+1} is true by definition (struct-compare demo)",
    # equal-group / global-constant / micro-fixture shapes
    ("q_ab_delta_method", "n"): "construction: md5-hash arms split 150 users evenly",
    ("q_agg_churn", "active_users"): "construction: all 150 users active every week on this fixture",
    ("q_agg_gains_table", "n_cust"): "construction: deciles of 150 customers are equal-sized",
    ("q_agg_bitmap_distinct", "distinct_users"): "construction: every group sees all 150 users",
    ("q_agg_hll_mergeable", "exact_users"): "construction: every group sees all 150 users",
    ("q_agg_count_distinct", "n_parts"): "construction: every returnflag sees all 2000 parts",
    ("q_agg_count_distinct", "n_supps"): "construction: every returnflag sees all 100 suppliers",
    ("q_agg_approx_cd", "approx_parts"): "construction: same distinct set per group -> same sketch estimate",
    ("q_agg_sum_distinct", "sum_dq"): "construction: every flag sees quantities 1..50 -> 1275",
    ("q_agg_entropy", "entropy"): "construction: uniform event-type mix per group; closed-form pinned",
    ("q_dq_kl_drift", "n_docs"): "construction: 25 docs per source by fixture design",
    ("q_profile_table", "n_rows"): "construction: per-column census of ONE table",
    ("q_profile_table", "n_nonnull"): "construction: fixture columns carry no nulls",
    ("q_sql_recursive_cte", "root"): "construction: every heap walk ends at 1 (closed-form pinned)",
    ("q_graph_link_predict", "common_neighbors"): "construction: k-NN graph degree; closed-form pinned",
    ("q_time_seasonal_naive", "n_days"): "construction: fixed 23-day evaluation window",
    ("q_time_control_chart", "center"): "construction: global XmR constants repeated per violation row",
    ("q_time_control_chart", "ucl"): "construction: global XmR constants repeated per violation row",
    ("q_time_control_chart", "lcl"): "construction: global XmR constants repeated per violation row",
    ("q_time_ljung_box", "df"): "construction: fixed lag count",
    ("q_time_ljung_box", "chi2_crit_05"): "construction: fixed critical value for df=3",
    ("q_vec_normalize", "norm"): "construction: fixture embeddings are generated ~unit-norm (see docstring)",
    ("q_vec_normalize", "unit_len"): "construction: the invariant column — 1.0 IS the assertion",
    ("q_multimodal_framesample", "frame_bytes"): "construction: floor-division framing yields full frames only",
    ("q_fn_map", "n_entries"): "construction: same literal map per row",
    ("q_wd_qualifiers", "stmt_idx"): "construction: micro-fixture single qualifier statement",
    ("q_wd_qualifiers", "qual_idx"): "construction: micro-fixture single-snak qualifier lists",
    ("q_wd_references", "stmt_idx"): "construction: micro-fixture reference placement",
    ("q_wd_references", "snak_idx"): "construction: micro-fixture single-snak reference lists",
}


def audit_key(spark, fn, sf_dir: str):
    """Return a list of flags for one key: '__EMPTY__', a categorical
    column name, or 'num:<column>' for a numeric stuck at min == max.
    Raises whatever the key itself raises."""
    df = fn(spark, sf_dir)
    cat = [f.name for f in df.schema.fields if isinstance(f.dataType, (StringType, BooleanType))]
    num = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    aggs = [F.countDistinct(c).alias(f"d_{c}") for c in cat]
    aggs += [F.max(F.col(c).isNull().cast("int")).alias(f"n_{c}") for c in cat + num]
    aggs += [F.min(c).alias(f"mn_{c}") for c in num]
    aggs += [F.max(c).alias(f"mx_{c}") for c in num]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    r = df.agg(*aggs).collect()[0]
    if r["__n"] == 0:
        return ["__EMPTY__"]
    if r["__n"] == 1:
        return []  # a single-row result cannot show two states
    flags = [c for c in cat if (r[f"d_{c}"] + (r[f"n_{c}"] or 0)) <= 1]
    flags += [
        f"num:{c}"
        for c in num
        # one-state numerics (r7 review catches): ALL-NULL (min is None —
        # the NULL-only column the try_divide guards could silently
        # produce), ALL-NaN (min == max fails because nan != nan), or a
        # constant with no NULLs. A NULL *among* real values stays a
        # second state (outer-join shape), so constant-with-nulls passes.
        if r[f"mn_{c}"] is None
        or (_num_same(r[f"mn_{c}"], r[f"mx_{c}"]) and not r[f"n_{c}"])
    ]
    return flags


def _num_same(a, b) -> bool:
    """min == max with NaN treated as equal to itself (nan != nan would
    let an all-NaN column — a single-state dead branch — slip the gate)."""
    if a is None or b is None:
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return a == b


def run_audit(spark, sf_dir: str, keys=None):
    """Audit every registered key; return (violations, allowlisted,
    errors) where violations are NON-allowlisted flags."""
    from wikidata2pg_spark.registry import all_queries

    qs = all_queries()
    violations, allowlisted, errors = [], [], []
    if keys:
        unknown = [k for k in keys if k not in qs]
        errors.extend((k, "unknown key") for k in unknown)
        qs = {k: qs[k] for k in keys if k in qs}
    for k, fn in qs.items():
        try:
            for flag in audit_key(spark, fn, sf_dir):
                if flag == "__EMPTY__":
                    ok = k in EXPECTED_EMPTY
                elif flag.startswith("num:"):
                    ok = (k, flag[4:]) in EXPECTED_CONSTANT_NUM
                else:
                    ok = (k, flag) in EXPECTED_CONSTANT
                (allowlisted if ok else violations).append((k, flag))
        except Exception as e:  # noqa: BLE001 - surfaced to the caller per key
            errors.append((k, str(e).splitlines()[0][:120]))
    return violations, allowlisted, errors
