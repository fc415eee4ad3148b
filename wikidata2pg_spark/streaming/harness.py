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
    Idempotent per (sf_dir, events content) — keyed on the fixture's stamp
    so a driver regeneration invalidates instead of feeding every streaming
    query stale events."""
    from wikidata2pg_spark.tables import load
    from wikidata2pg_spark.util import tmpdir_for

    path = tmpdir_for(sf_dir, "events_stream", "events")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
    return path


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = events_stream_dir(spark, sf_dir)
    return spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(path)


def late_arrival_dir(spark: SparkSession, sf_dir: str) -> str:
    """Three-file arrival sequence for the watermark test (T4).

    Spark's late filter uses the START-of-batch watermark (it lags eviction
    by one batch — verified empirically: a late row merging into still-held
    state is NOT dropped; numRowsDroppedByWatermark fires only once the
    prior batch advanced the filter watermark). So the sequence is:
      01 base       — everything except a mid-timeline slice + the tail
      02 advancer   — the global-max rows: their batch ends with the filter
                      watermark at max-10min for the NEXT batch
      03 late       — the mid-timeline slice, now far below the watermark,
                      dropped (windows were already emitted+evicted)
    File mtimes force processing order (the file source orders by mtime)."""
    import time as _time

    import pyarrow.parquet as pq

    from wikidata2pg_spark.tables import load
    from wikidata2pg_spark.util import tmpdir_for

    path = tmpdir_for(sf_dir, "late_seq", "events")
    done = os.path.join(path, ".done")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    ev = load(spark, sf_dir, "events")
    import pyarrow as pa

    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    # pandas defaults to ns precision; the stream schema declares µs TIMESTAMP
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    # "late" slice: 50 rows from the middle of the timeline;
    # "advancer": the 5 newest rows (kept out of base so their batch is the
    # one that pushes the filter watermark forward for the late batch)
    mid = len(pdf) // 2
    # Precondition, stated loudly: the late slice and the advancer must be
    # DISJOINT. On a tiny regenerated fixture an overlap would duplicate
    # rows across 02_advance/03_late AND put global-max timestamps into
    # the "late" file (which the watermark then keeps), silently breaking
    # q_stream_watermark_late's semantics and its test arithmetic.
    assert mid + 50 <= len(pdf) - 5, (
        f"events fixture too small for the late-arrival harness: {len(pdf)} rows"
    )
    late = pdf.iloc[mid : mid + 50]
    adv = pdf.iloc[len(pdf) - 5 :]
    base = pdf.drop(late.index.union(adv.index))
    f1 = os.path.join(path, "01_base.parquet")
    f2 = os.path.join(path, "02_advance.parquet")
    f3 = os.path.join(path, "03_late.parquet")
    pq.write_table(pa.Table.from_pandas(base, preserve_index=False), f1)
    pq.write_table(pa.Table.from_pandas(adv, preserve_index=False), f2)
    pq.write_table(pa.Table.from_pandas(late, preserve_index=False), f3)
    now = _time.time()
    os.utime(f1, (now - 120, now - 120))
    os.utime(f2, (now - 60, now - 60))
    os.utime(f3, (now, now))
    with open(done, "w") as fh:
        fh.write("ok")
    return path


def await_available_now(q, timeout_s: int, what: str) -> None:
    """THE timeout contract for every availableNow run in the package:
    await up to ``timeout_s``; on timeout STOP the query and raise — a
    hung/slow stream must surface as an error, never as a silently-partial
    sink. One definition; run_available_now, run_foreach_batch_available_now
    and the custom-stream drain loop (sources/scans.py) all go through it."""
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"{what}: availableNow stream did not terminate in "
                f"{timeout_s}s (checkpointed runs resume on retry)"
            )
    finally:
        if q.isActive:
            q.stop()


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    output_mode: str = "append",
    timeout_s: int = 120,
) -> DataFrame:
    # r10 (guide §2.1/§5): a stateful micro-batch pays one state-store
    # open+commit per partition per batch — for a stream-stream join that
    # is 4 stores x partitions x batches of pure overhead, dominating the
    # tiny-state fixtures here (measured 16 -> 8 parts: 4.2 -> 3.1 s on
    # q_stream_stream_join, identical rows). State partitions are fixed
    # at stream START and sized to expected STATE volume, not input size,
    # so they are a deliberate, env-parameterized choice; this call
    # always starts from a fresh temp checkpoint, so the override can
    # never conflict with a resumed query's recorded partitioning (the
    # foreachBatch path keeps persistent checkpoints and is NOT touched).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    parts = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS")
    if parts is None:
        parts = str(min(int(prev), 8))
    name = "mem_" + uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q, timeout_s, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


DOCS_STREAM_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def documents_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """documents twin of :func:`events_stream_dir` — the corpus as a file
    stream source (keyed on the fixture stamp, regenerated on change)."""
    from wikidata2pg_spark.tables import load
    from wikidata2pg_spark.util import tmpdir_for

    path = tmpdir_for(sf_dir, "documents_stream", "documents")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load(spark, sf_dir, "documents").write.mode("overwrite").parquet(path)
    return path


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = documents_stream_dir(spark, sf_dir)
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(path)


def run_foreach_batch_available_now(
    spark, stream_df, batch_fn, ckpt_dir: str, marker_path: str, timeout_s: int = 120, what: str = "stream"
) -> None:
    """availableNow ``foreachBatch`` under the package's loud-failure +
    completion-marker contract, in ONE place (q_stream_foreach_batch and
    q_stream_jdbc_upsert previously carried drifting copies): start the
    stream with the given checkpoint, await up to ``timeout_s``; on clean
    termination touch ``marker_path`` (callers gate on it to skip reruns),
    on timeout STOP and raise — a partial batch set must surface as an
    error, never as a silently-partial readback. The checkpoint makes the
    next invocation resume exactly where this one stopped."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    await_available_now(q, timeout_s, what)
    # reached only on clean termination (await_available_now raised otherwise)
    with open(marker_path, "w") as fh:
        fh.write("ok")
