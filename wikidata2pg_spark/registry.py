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

# Round-10 window (VERDICT r9 tasks 1/2/6): the LAST never-tested keys.
# After r9's 50/50-hash window the ledger stands at 328/365 attested,
# 37 never-tested — this window drains them completely, so the driver
# ledger can read 365/365 for the first time. Three tiers, exactly 50:
#   A (9)  — RE-PROVES on attested keys whose code/oracle changed this
#            round (task 2 + ADVICE r9 + the r10 /code-review catch):
#            q_fn_math (positive-domain CASE guard on sqrt/ln/log10,
#            negative-sweep catalog), q_dedup_exact (engine-portable
#            ASCII-only case fold, unicode-sweep catalog),
#            q_multimodal_binary + q_multimodal_decode (oracle encode()
#            instead of ::BLOB, unicode-sweep catalog),
#            q_agg_log_histogram (NULL measures keep a NULL bucket —
#            ADVICE r9), and the four other digest-keyed dedup-family
#            keys the review found still on lower(trim()):
#            q_dedup_incremental, q_corpus_clean,
#            q_pipeline_pretraining, q_stream_corpus_clean — all five
#            text-canonicalization sites now share canon_text/canon_sql
#            (llm/dedup.py).
#   B (37) — the ENTIRE post-freeze never-tested backlog (task 1), in
#            deferral-list order (module-grouped): 1 dedup, 6 text,
#            1 multimodal, 4 sampling, 1 retrieval, 1 streaming,
#            1 fn_struct, 2 agg, 5 joins, 4 windows/time, rest
#            analytics/graph/behavioral/subqueries.
#   C (4)  — staleness re-proves: the oldest surviving hash rows are
#            r1-era (9 keys); re-prove the 4 that fit (the other 5 stay
#            r1 rows — the driver's per-round window is exactly 50, and
#            tier-A re-proves on changed keys outrank staleness).
# After this window the deferral list (tests/test_robustness.py) is
# EMPTY — nothing registered is un-attested.
_ROUND10_PRIORITY = (
    # --- tier A: re-proves on keys fixed this round (9) ---
    "q_fn_math", "q_dedup_exact", "q_multimodal_binary",
    "q_multimodal_decode", "q_agg_log_histogram",
    "q_dedup_incremental", "q_corpus_clean", "q_pipeline_pretraining",
    "q_stream_corpus_clean",
    # --- tier B: the final 37 never-tested keys (all of them) ---
    "q_dedup_cdc_chunks",
    "q_text_lm_score", "q_text_lexical_diversity", "q_text_collocations",
    "q_text_ngram_novelty", "q_text_vocab_richness",
    "q_text_bigram_entropy",
    "q_multimodal_image_tiles",
    "q_sample_balanced", "q_mix_temperature", "q_sample_time_split",
    "q_sample_negatives",
    "q_retrieval_mmr",
    "q_stream_windowed_topk",
    "q_fn_struct",
    "q_agg_iqr_outliers", "q_agg_bool",
    "q_join_asof_tolerance", "q_join_asof_forward", "q_join_dpp",
    "q_join_asof_nearest", "q_join_null_safe",
    "q_time_ohlc", "q_win_ratio_to_report", "q_time_holt",
    "q_win_rolling_corr",
    "q_orders_basket_rules",
    "q_graph_link_predict", "q_graph_random_walk", "q_graph_modularity",
    "q_graph_clustering_coeff",
    "q_cohort_ltv", "q_survival_km", "q_seq_topk_paths",
    "q_cohort_stickiness", "q_feature_point_in_time",
    "q_subquery_exists_flag",
    # --- tier C: oldest (r1) attested rows, staleness re-proves (4) ---
    "q_project_alias_expr", "q_filter_compound",
    "q_filter_in_between_like", "q_null_semantics",
)

# _ROUND9_PRIORITY (git history, commit 47c79f7 is the last HEAD
# carrying it): 3 tier-A extreme-magnitude re-proves + 6 newly
# registered TPC-H completion keys + 3 widened never-tested + 29
# analytics backlog + 9 ANN-metrology/graph/behavioral heads — all 50
# hash-green in CORRECTNESS_r09.json (second 0-red round), ledger
# 328/365. _ROUND8_PRIORITY: commit 5574f6a, 50/50, ledger 281/359.


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND10_PRIORITY if k in d}
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
