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

# Round-8 window (VERDICT r7 tasks 1/4 + the r7 close's re-prove
# addendum in .claude/skills/verify/SKILL.md). After r7's 50/50-rows
# window the cumulative ledger stands at 246/359 attested; the r8-r10
# rotation keeps draining the never-tested backlog at 50 keys/round with
# key additions still FROZEN (VERDICT r7 task 5). Three tiers, exactly
# 50 keys:
#   A (14) — RE-PROVES: attested keys whose code or oracle changed after
#            their latest driver row (mirror-green != driver-green,
#            r3/r5 lesson). The three r7 hash-FAILs with the HUGEINT
#            oracle casts fixed this round (q_win_concurrency,
#            q_text_vocab_growth, q_sample_token_budget); the nine keys
#            the r7 close modified after their rows landed (q_agg_stats
#            division guards, q_udf_python oracle NULL edit, the seven
#            NULL-ordering-close window/pack keys); q_win_skyline
#            (asc_nulls_last contract fix this round, ADVICE r7) and
#            q_win_moving_median (r5 row, NULLS-sweep guard in late r7).
#   B (28) — never-tested keys whose code/oracle was MODIFIED since the
#            backlog pre-proof, so driver evidence lands on current
#            code: the 12 degenerate-division-audit keys, the 4
#            degenerate-sweep crash fixes (degree_powerlaw, strength,
#            hill_tail, mrr), the 9 NULL-ordering-close deferred keys
#            (cume_dist_nth, orders_rfm, gains_table, ks_test,
#            quantile_bands, winsorized_mean, downsample, zipf,
#            pareto_abc — the last also re-modified this round per
#            ADVICE r7), and the 3 further uncast-HUGEINT oracles this
#            round's type sweep caught (growth_curve, control_chart,
#            drawdown).
#   C (7+1) — the OLDEST never-tested backlog (the two that rotated out
#            of r7 tier E plus the head of the deferral list), and one
#            late tier-A-style re-prove: q_agg_regression, whose moment
#            block the r8 extreme-magnitude widening also touched.
# The remaining 78 never-tested keys stay on post_freeze_deferred
# (tests/test_robustness.py) and fill r9 (50) + r10 (28).
_ROUND8_PRIORITY = (
    # --- tier A: re-proves on changed code/oracles (14) ---
    "q_win_concurrency", "q_text_vocab_growth", "q_sample_token_budget",
    "q_agg_stats", "q_udf_python", "q_win_ntile", "q_win_ntile_distributed",
    "q_win_percent_rank", "q_win_percent_rank_distributed",
    "q_win_range_frame", "q_pack_sequences", "q_pipeline_pretraining",
    "q_win_skyline", "q_win_moving_median",
    # --- tier B: never-tested, modified since pre-proof (28) ---
    "q_agg_corr_matrix", "q_graph_assortativity", "q_ab_delta_method",
    "q_agg_spearman", "q_agg_mannwhitney", "q_agg_runs_test", "q_agg_ols2",
    "q_time_volatility", "q_time_lag_corr", "q_agg_welch_ttest",
    "q_dq_cramers_v", "q_text_burstiness",
    "q_graph_degree_powerlaw", "q_time_strength", "q_text_hill_tail",
    "q_retrieval_mrr",
    "q_win_cume_dist_nth", "q_orders_rfm", "q_agg_gains_table",
    "q_agg_ks_test", "q_agg_quantile_bands", "q_agg_winsorized_mean",
    "q_time_downsample", "q_text_zipf", "q_pareto_abc",
    "q_agg_growth_curve", "q_time_control_chart", "q_time_drawdown",
    # --- tier C: oldest never-tested backlog (7) + one late re-prove ---
    "q_time_mom_growth", "q_agg_weighted_median", "q_funnel_time_to_convert",
    "q_except_all", "q_intersect_all", "q_fn_date2", "q_agg_bitmap_distinct",
    # q_agg_regression (r7-attested) re-proves here: the r8 extreme-sweep
    # widening patched its moment block (shared shape with q_agg_stats),
    # so its driver row must land on the new code; q_time_ohlc rotated
    # back to the deferral head to make room.
    "q_agg_regression",
)


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND8_PRIORITY if k in d}
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
