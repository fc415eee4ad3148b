"""Query registry — the single source of truth wired into __spark_entry__.py.

Each operator from SURVEY.md §2 registers itself with::

    @query("q_agg_basic", oracle="SELECT ... FROM lineitem ...")
    def q_agg_basic(spark, sf_dir): ...

``oracle=None`` means the driver records a rows-only check (approx ops,
streaming semantics, JDBC sinks — per __spark_entry__.py contract).

Oracle-stability rules (FIXTURES.md) apply to every pair:
  * every floating aggregate rounded to 2 decimals on BOTH sides;
  * every ORDER BY feeding row_number/LIMIT ends with a unique tiebreaker;
  * UTC session timezone; events ts normalized to µs;
  * approx_* declared without oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return deco


# The driver's correctness pass walks `queries()` in dict order and checks
# EXACTLY the first 50 keys per round (r1-r5 each recorded 50). The window
# rotates per round: _ROUND5_PRIORITY (see git history, commit 252e008)
# packed all 41 then-never-tested keys; its 50 slots all recorded in
# CORRECTNESS_r05.json.

# Round-6 window (VERDICT r5 tasks 1-2 + ADVICE r5 low finding). Three
# tiers, exactly 50 keys:
#   A (8)  — the keys with NO driver row after r1-r5 (deferred past r5's
#            freeze; 196/196 cumulative coverage lands when these record).
#   B (8)  — keys whose CODE or ORACLE changed after their latest driver
#            row, so that row attests pre-change behavior: q_agg_stats
#            (r5 hash-FAIL, rewritten on exact integer moments this round)
#            plus the r5-edit set ADVICE flagged (q_agg_basic/having/
#            conditional/percentile_exact floor-rounding, q_join_asof +
#            q_stream_session oracle edits, q_win_moving_rows ORDER BY
#            extension). The r3/r5 history shows mirror-green != driver-
#            green, so every modified hash key must re-prove.
#   C (34) — the stalest r1-proven keys (rows now 5 rounds old), ordered
#            rounding-sensitive aggs -> windows -> ordered output -> set
#            ops -> joins -> scalar fns.
# Deliberately deferred to r7 (r1 rows, but pure-codegen filters/limits
# with no rounding/ordering sensitivity — lowest re-prove value):
# q_project_alias_expr, q_filter_compound, q_filter_in_between_like,
# q_null_semantics, q_case_when, q_distinct, q_limit, q_union_all,
# q_join_cross; then the r3-proven wikidata/llm families. Registered
# AFTER the r6 freeze (post-window; pinned on the deferral list in
# test_driver_window_ordering_is_pinned, must lead r7): q_text_bm25,
# q_sample_token_budget, q_cluster_kmeans, q_pipeline_neardup,
# q_vec_pq_adc, q_stream_stream_left, q_agg_grouping_id,
# q_agg_regression, q_retrieval_hybrid_rrf, q_agg_skewkurt,
# q_funnel_conversion, q_cohort_retention, q_join_bloom_prefilter,
# q_agg_mad, q_wd_dump_diff, q_agg_gini, q_time_ewma, q_text_dupspans,
# q_agg_entropy, q_time_mom_growth, q_agg_weighted_median,
# q_funnel_time_to_convert, q_stream_full_outer, q_except_all,
# q_intersect_all, q_fn_date2, q_agg_bitmap_distinct, q_time_ohlc,
# q_sample_balanced, q_win_ratio_to_report, q_agg_iqr_outliers,
# q_time_streaks, q_agg_churn, q_subquery_exists_flag, q_text_lm_score,
# q_join_asof_tolerance.
_ROUND6_PRIORITY = (
    # --- tier A: never driver-tested (8) ---
    "q_dedup_incremental", "q_stream_jdbc_upsert", "q_scan_schema_evolution",
    "q_sink_zorder", "q_scan_corrupt_tolerant", "q_sink_compact",
    "q_custom_stream_source", "q_agg_hll_mergeable",
    # --- tier B: modified after latest driver row (8) ---
    "q_agg_stats", "q_agg_basic", "q_agg_having", "q_agg_conditional",
    "q_agg_percentile_exact", "q_join_asof", "q_win_moving_rows",
    "q_stream_session",
    # --- tier C: stalest r1-proven (32) + the two r6 signed-zero-guard
    # edits (q_vec_centroid caught LIVE by the sf0.1 hazard sweep,
    # q_vec_normalize guarded for the same class) which displace the two
    # rows-only approx keys (q_agg_approx_cd, q_agg_percentile_approx —
    # a rows-only re-prove is the weakest possible evidence, a modified
    # hash key the strongest; the approx pair rotates into r7) ---
    "q_vec_centroid", "q_vec_normalize",
    "q_agg_count_distinct", "q_agg_sum_distinct", "q_agg_rollup",
    "q_agg_cube", "q_agg_grouping_sets",
    "q_win_row_number", "q_win_rank_dense", "q_win_ntile", "q_win_lag_lead",
    "q_win_range_frame", "q_win_cumsum", "q_win_first_last",
    "q_sort_multikey", "q_topk_global", "q_topk_per_group",
    "q_union_distinct", "q_intersect", "q_except",
    "q_join_inner_shuffle", "q_join_broadcast", "q_join_left_outer",
    "q_join_right_outer", "q_join_full_outer", "q_join_semi", "q_join_anti",
    "q_join_theta_band", "q_join_interval_overlap", "q_join_multikey_self",
    "q_fn_string", "q_fn_regexp", "q_fn_date", "q_fn_math",
)


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND6_PRIORITY if k in d}
    head.update((k, v) for k, v in d.items() if k not in head)
    return head


def _load_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import wikidata2pg_spark.wikidata.queries  # noqa: F401
    import wikidata2pg_spark.llm.dedup  # noqa: F401
    import wikidata2pg_spark.llm.similarity  # noqa: F401
    import wikidata2pg_spark.llm.text  # noqa: F401
    import wikidata2pg_spark.llm.multimodal  # noqa: F401
    import wikidata2pg_spark.llm.sampling  # noqa: F401
    import wikidata2pg_spark.llm.clustering  # noqa: F401
    import wikidata2pg_spark.llm.retrieval  # noqa: F401
    import wikidata2pg_spark.streaming.queries  # noqa: F401
    import wikidata2pg_spark.udf.queries  # noqa: F401
    import wikidata2pg_spark.sources.scans  # noqa: F401
    import wikidata2pg_spark.functions.scalar  # noqa: F401
    import wikidata2pg_spark.functions.semi_structured  # noqa: F401
    import wikidata2pg_spark.operators.relational  # noqa: F401
    import wikidata2pg_spark.operators.joins  # noqa: F401
    import wikidata2pg_spark.operators.windows  # noqa: F401
    import wikidata2pg_spark.operators.graph  # noqa: F401
    import wikidata2pg_spark.operators.behavioral  # noqa: F401
    import wikidata2pg_spark.operators.analytics  # noqa: F401
    import wikidata2pg_spark.operators.subqueries  # noqa: F401
    import wikidata2pg_spark.operators.tpch  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return _prioritize(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return _prioritize(_ORACLES)
