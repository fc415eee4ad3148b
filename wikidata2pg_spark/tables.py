"""Table loaders for the driver-generated parquet fixtures (FIXTURES.md).

Every query callable receives ``(spark, sf_dir)``; this module is the single
place that maps table name → DataFrame, so normalization rules live in
exactly one spot:

  * ``events.ts`` normalization branches on the dtype Spark actually read:
    older driver fixtures were parquet TIMESTAMP(NANOS) (arriving as bigint
    nanos under ``spark.sql.legacy.parquet.nanosAsLong=true``, converted to a
    µs timestamp here); current fixtures are TIMESTAMP(MICROS) (arriving as
    timestamp_ntz, cast to timestamp — identity under the UTC session TZ).
    The DuckDB oracle casts ``ts::TIMESTAMP`` — both paths verified identical.

At 100 TB these would be catalog tables with partition columns; the loader
keeps a plain ``spark.read.parquet`` so predicate pushdown / column pruning
reach the scan untouched (audited in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from wikidata2pg_spark.session import configure_session

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str, fresh: bool = False) -> DataFrame:
    """Load one fixture table, applying per-table normalization.

    ``fresh=True`` bypasses the plan cache and builds a new scan: self-join /
    self-cogroup call sites need two DISTINCT plan subtrees for unambiguous
    attribute lineage — handing both sides the same cached object is exactly
    the ambiguity the cache must not introduce.

    The analyzed plan is cached on the session (prepared-statement style):
    repeated invocations of the same query (bench reps, t2 re-runs) skip
    the parquet footer read, re-analysis, and the runtime-conf RPCs —
    measured ~0.2-0.4 s per flagship build at sf0.1. The cache key folds in
    the source's (mtime, size) so a regenerated fixture invalidates rather
    than serving a stale plan (the r3 dtype incident class). DataFrames are
    immutable logical plans, so sharing the object is safe; no data is
    pinned in memory.
    """
    if not getattr(spark, "_w2pg_configured", False):
        configure_session(spark)
        spark._w2pg_configured = True
    path = f"{sf_dir}/{name}.parquet"
    cache = getattr(spark, "_w2pg_plan_cache", None)
    if cache is None:
        cache = spark._w2pg_plan_cache = {}
    # Key on EVERY physical file's (mtime_ns, size), not the top path's
    # stat: for directory-style tables, rewriting part files in place does
    # not bump the directory's own mtime/size, which would serve a stale
    # cached plan (stale file listing / dtype branch) — the same staleness
    # class source_stamp exists to prevent for derived artifacts.
    try:
        from wikidata2pg_spark.util import fixture_files

        stats = tuple(
            (f, os.stat(f).st_mtime_ns, os.stat(f).st_size)
            for f in fixture_files(sf_dir, name)
        )
        key = None if (fresh or not stats) else (path, stats)
    except OSError:
        key = None
    if key is not None and key in cache:
        return cache[key]
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos bigint -> µs timestamp (matches DuckDB's ts::TIMESTAMP).
            # Integer `div`, NOT `/1000` — double division rounds …969829ns
            # up to …970µs while DuckDB truncates (observed on this data).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS) fixture: identity wall-clock cast under the
            # UTC session TZ; keeps withWatermark/window semantics unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        # already `timestamp`: leave untouched
    if key is not None:
        cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}


def spread_if_few_splits(df, sf_dir: str, table: str, min_files: int = 4, target: int = 16):
    """Spread a CPU-heavy projection across a round-robin exchange when its
    source table has fewer physical files than ``min_files`` — a
    single-row-group fixture funnels expensive per-row work (JSON parse,
    tokenize+explode) into one scan task. The probe is a file listing
    (no Spark job, no plan build — the same no-JVM probe style as
    similarity's parquet-footer row counts), so the guard is deterministic
    across executor configs and free per invocation. Multi-split inputs —
    any real corpus — take the no-op path: their scan already parallelizes
    the work (plan-asserted in tests/test_plans.py). Shared by
    flagship.json_extract_agg and llm.text.q_text_tfidf so the
    threshold/target can only move together."""
    from wikidata2pg_spark.util import fixture_files

    try:
        n_files = len(fixture_files(sf_dir, table))
    except OSError:
        n_files = min_files  # unknown layout: don't add an exchange
    return df.repartition(target) if n_files < min_files else df
