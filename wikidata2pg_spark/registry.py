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

# Round-9 window (VERDICT r8 tasks 1/2/3/7). After r8's 50/50-hash
# window the cumulative ledger stands at 281/359 attested; r8's frozen
# registry grows to 365 THIS round only for the six staged TPC-H
# completion keys (task 3 lifts the freeze for exactly those). Five
# tiers, exactly 50 keys:
#   A (3)  — RE-PROVES: attested keys widened by the r9
#            extreme-magnitude fix (tools/extreme_sweep.py catalog):
#            q_agg_argminmax + q_agg_anova_eta (wide composite/square,
#            recipe unchanged), q_agg_skewkurt (anchored-deviation
#            restructure — moments about the per-group min).
#   B (6)  — the newly REGISTERED TPC-H completion keys
#            (operators/tpch_ext.py — registration is a change, so
#            their first driver rows land this round).
#   C (3)  — never-tested keys widened by the same r9 fix, slotted so
#            their FIRST driver row lands on widened code: q_time_twa,
#            q_time_anomaly, q_agg_hhi.
#   D (29) — the rest of operators/analytics.py's never-tested block
#            (the largest uncertified module, VERDICT task 1), oldest
#            first in deferral-list order.
#   E (9)  — the ANN/dedup metrology keys that certify the rows-only
#            family's accuracy claims (task 7: minhash_fidelity,
#            binary_hamming, recall_eval, ndcg, truncation_fidelity)
#            plus the graph/behavioral deferral heads (kcore, bfs,
#            streaks, churn).
# The remaining 37 never-tested keys stay on post_freeze_deferred
# (tests/test_robustness.py) and fill r10 (37 + re-prove slots).
_ROUND9_PRIORITY = (
    # --- tier A: re-proves on r9-widened attested keys (3) ---
    "q_agg_argminmax", "q_agg_skewkurt", "q_agg_anova_eta",
    # --- tier B: newly registered TPC-H completion (6) ---
    "q_sql_tpch_q2", "q_sql_tpch_q9", "q_sql_tpch_q11",
    "q_sql_tpch_q12", "q_sql_tpch_q20", "q_sql_tpch_q21",
    # --- tier C: never-tested, widened this round (3) ---
    "q_time_twa", "q_time_anomaly", "q_agg_hhi",
    # --- tier D: analytics.py never-tested backlog (29) ---
    "q_time_interval_union", "q_seq_transitions", "q_dq_benford",
    "q_dq_referential", "q_agg_log_histogram", "q_attribution_last_touch",
    "q_time_cusum", "q_dq_chi2", "q_time_acf", "q_agg_theilsen",
    "q_orders_reorder_interval", "q_time_seasonal_naive",
    "q_dq_duplicate_keys", "q_join_fanout_audit", "q_orders_abc_migration",
    "q_orders_fulfillment_latency", "q_agg_smoothed_rate", "q_win_rbo",
    "q_time_decompose", "q_agg_bootstrap_ci", "q_dq_srm",
    "q_time_changepoint", "q_time_hampel", "q_agg_trimmed_mean",
    "q_time_forecast_accuracy", "q_time_mann_kendall",
    "q_agg_hodges_lehmann", "q_dq_freshness", "q_time_ljung_box",
    # --- tier E: ANN metrology + graph/behavioral heads (9) ---
    "q_dedup_minhash_fidelity", "q_vec_binary_hamming",
    "q_retrieval_recall_eval", "q_retrieval_ndcg",
    "q_vec_truncation_fidelity",
    "q_graph_kcore", "q_graph_bfs", "q_time_streaks", "q_agg_churn",
)

# _ROUND8_PRIORITY (git history, commit 5574f6a is the last HEAD
# carrying it): 14 tier-A re-proves (the 3 r7 HUGEINT hash-fails, the 9
# r7-close-modified attested keys, skyline + moving_median) + 28
# modified never-tested + 8 oldest backlog — all 50 hash-green in
# CORRECTNESS_r08.json (the first 0-red round), ledger 281/359.


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND9_PRIORITY if k in d}
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
    import wikidata2pg_spark.operators.tpch_ext  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return _prioritize(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return _prioritize(_ORACLES)
