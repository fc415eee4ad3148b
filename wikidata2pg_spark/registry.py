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


# The driver's correctness pass walks `queries()` in dict order and checks a
# ~50-key budget per round. Keys with NO driver row in CORRECTNESS_r01–r03
# (computed from those files) go first, followed by the keys whose latest
# driver row failed/errored (streaming family — broken by the r3 fixture
# dtype change, fixed in tables.py — plus q_agg_collect_sorted), so round 4
# proves the unproven before re-proving the already-green 83.
_ROUND4_PRIORITY = (
    # never driver-tested (33)
    "q_scan_parquet", "q_scan_jsonl", "q_scan_csv", "q_scan_orc",
    "q_sink_parquet_partitioned", "q_sink_jdbc_pg", "q_source_jdbc",
    "q_stream_file_source", "q_sink_console_memory", "q_custom_datasource",
    "q_custom_datasink", "q_sink_sorted_layout",
    "q_fn_conditional", "q_fn_string2", "q_fn_bitwise", "q_fn_array",
    "q_fn_explode", "q_fn_map", "q_fn_json", "q_fn_hash",
    "q_fn_hash_spark_native", "q_fn_array_setops",
    "q_udf_arrow_python", "q_udf_pandas_scalar", "q_udaf_pandas_agg",
    "q_udtf_python",
    "q_pivot", "q_unpivot", "q_na_handling",
    "q_join_fuzzy_levenshtein", "q_join_salted_skew", "q_join_bucketed",
    "q_win_percent_rank",
    # q_agg_collect_sorted: FAILed r1 on array canonicalization, since
    # reworked to emit a string — needs its first green row
    "q_agg_collect_sorted",
    # errored in r3 from the fixture dtype change (fixed in tables.py);
    # the VERDICT's done-criterion is all 11 green in CORRECTNESS_r04, and
    # the driver checks EXACTLY 50 keys/round (r1-r3 each recorded 50), so
    # these must sit inside the first 50 (11)
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_foreach_batch", "q_stream_watermark_late", "q_stream_dedup",
    "q_stream_stateful_count", "q_stream_stream_join", "q_stream_static_join",
    "q_time_multirollup", "q_time_gapfill",
    # new in r4, mirror-proven — the 5 remaining budget slots go to the
    # flagship extras; the remaining 21 (everything after q_text_chunk,
    # including the late-r4 additions) sit OUTSIDE the 50-key driver
    # window this round and rotate into the r5 window
    "q_dedup_semantic_cluster", "q_text_pii_scrub", "q_vec_quantize",
    "q_scd2_intervals", "q_text_chunk",
    "q_text_decontaminate", "q_text_repetition", "q_sample_stratified",
    "q_sql_entry", "q_merge_upsert", "q_dedup_jaccard_prefix",
    "q_agg_histogram", "q_agg_stats", "q_profile_table", "q_text_search",
    "q_scan_xml", "q_wd_aliases", "q_wd_label_coverage", "q_pack_sequences",
    "q_wd_references", "q_multimodal_audio_energy",
)


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND4_PRIORITY if k in d}
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
    import wikidata2pg_spark.streaming.queries  # noqa: F401
    import wikidata2pg_spark.udf.queries  # noqa: F401
    import wikidata2pg_spark.sources.scans  # noqa: F401
    import wikidata2pg_spark.functions.scalar  # noqa: F401
    import wikidata2pg_spark.functions.semi_structured  # noqa: F401
    import wikidata2pg_spark.operators.relational  # noqa: F401
    import wikidata2pg_spark.operators.joins  # noqa: F401
    import wikidata2pg_spark.operators.windows  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return _prioritize(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return _prioritize(_ORACLES)
