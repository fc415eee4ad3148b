"""Structured Streaming test harness: run a bounded stream to completion
and return its result as a static DataFrame.

``availableNow`` processes everything currently available in micro-batches
then stops — the canonical way to exercise streaming semantics (state,
watermarks, dedup) on fixed fixtures. Results land in a uniquely-named
memory sink; callers get ``spark.table(name)``.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

EVENTS_STREAM_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def events_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the normalized events table (µs timestamps) as a parquet
    *directory* usable by the file stream source (which rejects bare files).
    Idempotent per sf_dir."""
    import hashlib
    import tempfile

    from wikidata2pg_spark.tables import load

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "wikidata2pg_spark", h, "events_stream")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
    return path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = events_stream_dir(spark, sf_dir)
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout_s: int = 120,
) -> DataFrame:
    name = "mem_" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)
