"""Table loaders for the driver-generated parquet fixtures (FIXTURES.md).

Every query callable receives ``(spark, sf_dir)``; this module is the single
place that maps table name → DataFrame, so normalization rules live in
exactly one spot:

  * ``events.ts`` is parquet TIMESTAMP(NANOS) which Spark 4.1.2 cannot read
    natively; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives
    as bigint nanos and we convert to a µs timestamp. The DuckDB oracle casts
    ``ts::TIMESTAMP`` — both sides verified identical (FIXTURES.md ⚠).

At 100 TB these would be catalog tables with partition columns; the loader
keeps a plain ``spark.read.parquet`` so predicate pushdown / column pruning
reach the scan untouched (audited in tests/test_plans.py).
"""

from __future__ import annotations

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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, applying per-table normalization."""
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # nanos bigint -> µs timestamp (identical to DuckDB's ts::TIMESTAMP).
        # Integer `div`, NOT `/1000` — double division rounds …969829ns up to
        # …970µs while DuckDB truncates (observed on this data).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLE_NAMES}
