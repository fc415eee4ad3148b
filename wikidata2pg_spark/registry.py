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
# EXACTLY the first 50 keys per round (r1-r6 each recorded 50). The window
# rotates per round: _ROUND5_PRIORITY (git history, commit 252e008) packed
# all 41 then-never-tested keys; _ROUND6_PRIORITY (git history, commit
# 2bf4fde is the last HEAD carrying it) re-proved the 8 r5 deferrals, the
# 8 post-r5-edit keys, and 34 stale r1 rows — all 50 hash-green in
# CORRECTNESS_r06.json, bringing the cumulative driver ledger to 196/359.

# Round-7 window (VERDICT r6 tasks 1/6 + ADVICE r6). After r6, 163
# registered keys had NO driver row (the post_freeze_deferred list in
# tests/test_robustness.py); the r7-r9 rotation drains that backlog at 50
# keys/round with key additions FROZEN (VERDICT r6 task 2). Five tiers,
# exactly 50 keys, all never-driver-tested:
#   A (4)  — keys MODIFIED this round, so driver evidence lands on the
#            new code (mirror-green != driver-green, r3/r5 lesson):
#            q_win_skyline (distributed two-pass rewrite),
#            q_time_extreme_value (sample-sd fit, ADVICE r6), and the
#            two further full-table global windows the new blanket
#            SinglePartition sweep caught and global_cumsum rewrote —
#            q_win_concurrency, q_text_vocab_growth (review catch:
#            the tier-A principle applies to them identically).
#   B (16) — the full TPC-H suite (operators/tpch.py): headline parity
#            claims resting entirely on the local mirror until now.
#   C (13) — subtle-determinism machinery, where a driver row is worth
#            the most: the ordered float folds (mutual_info, kl_drift,
#            peak_hours, anova_eta, psi, jsd_sources), the fixed-point
#            iterative family (cluster_kmeans, vec_pq_adc,
#            vec_pca_power/project, vec_drift), and the
#            watermark-frontier stream-stream outer joins.
#   D (2)  — the composed pipelines (q_pipeline_neardup,
#            q_pipeline_multimodal): each certifies a whole family
#            end-to-end (VERDICT r6 task 6).
#   E (15) — the OLDEST post-freeze additions (r6 mid-round batch, in
#            registration order; the last two rotate to r8 to make room
#            for tier A's review-catch additions).
# The remaining 113 never-tested keys stay on post_freeze_deferred
# (tests/test_robustness.py) and fill r8 (50) + r9 (50) + r10 (13).
_ROUND7_PRIORITY = (
    # --- tier A: modified this round (4) ---
    "q_win_skyline", "q_time_extreme_value",
    "q_win_concurrency", "q_text_vocab_growth",
    # --- tier B: TPC-H suite (16) ---
    "q_sql_tpch_q1", "q_sql_tpch_q3", "q_sql_tpch_q4", "q_sql_tpch_q5",
    "q_sql_tpch_q6", "q_sql_tpch_q7", "q_sql_tpch_q8", "q_sql_tpch_q10",
    "q_sql_tpch_q13", "q_sql_tpch_q14", "q_sql_tpch_q15", "q_sql_tpch_q16",
    "q_sql_tpch_q17", "q_sql_tpch_q18", "q_sql_tpch_q19", "q_sql_tpch_q22",
    # --- tier C: ordered folds, fixed-point, watermark-frontier (13) ---
    "q_agg_mutual_info", "q_dq_kl_drift", "q_time_peak_hours",
    "q_agg_anova_eta", "q_dq_psi", "q_text_jsd_sources",
    "q_cluster_kmeans", "q_vec_pq_adc", "q_vec_pca_power",
    "q_vec_pca_project", "q_vec_drift",
    "q_stream_stream_left", "q_stream_full_outer",
    # --- tier D: composed pipelines (2) ---
    "q_pipeline_neardup", "q_pipeline_multimodal",
    # --- tier E: oldest post-freeze additions (15) ---
    "q_text_bm25", "q_sample_token_budget", "q_agg_grouping_id",
    "q_agg_regression", "q_retrieval_hybrid_rrf", "q_agg_skewkurt",
    "q_funnel_conversion", "q_cohort_retention", "q_join_bloom_prefilter",
    "q_agg_mad", "q_wd_dump_diff", "q_agg_gini", "q_time_ewma",
    "q_text_dupspans", "q_agg_entropy",
)


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND7_PRIORITY if k in d}
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
