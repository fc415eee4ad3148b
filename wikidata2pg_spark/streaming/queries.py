"""Streaming operators (§2.9 T1-T7) over the events table.

T1 and T7 run as REAL Structured Streaming queries (readStream →
availableNow → memory sink, complete mode) whose terminal results are
deterministic, so they are hash-checked against the DuckDB oracle like any
batch query. T2/T3/T5 are declared in their batch window form (same
operator, same semantics — `window`/`session_window` work on static frames)
with stream==batch equivalence asserted in tests/test_streaming.py.
T4 (watermark late-drop) and T6 (arbitrary stateful) depend on arrival
order / state machinery with no SQL twin → rows-only.

Scale posture: windowed aggs shuffle on (window, key) — at 100 TB the state
store (RocksDB) holds only open windows; watermarks bound state growth;
session windows merge within the key partition.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from wikidata2pg_spark.llm.dedup import canon_sql, canon_text
from wikidata2pg_spark.registry import query
from wikidata2pg_spark.streaming.harness import read_events_stream, run_available_now
from wikidata2pg_spark.tables import load


@query(
    "q_stream_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS window_start,
       time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q_stream_tumbling(spark, sf_dir):
    """T1: tumbling 1h window agg as a REAL stream (availableNow → memory,
    complete mode) — result at termination equals the batch computation, so
    it hash-checks."""
    s = read_events_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    out = agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
    )
    return run_available_now(spark, out, output_mode="complete")


@query(
    "q_stream_sliding",
    oracle="""
SELECT time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP) - k.i * INTERVAL 30 MINUTE AS window_start,
       time_bucket(INTERVAL 30 MINUTE, ts::TIMESTAMP) - k.i * INTERVAL 30 MINUTE + INTERVAL 1 HOUR AS window_end,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events, range(2) k(i)
GROUP BY 1, 2
""",
)
def q_stream_sliding(spark, sf_dir):
    """T2: sliding window (1h size, 30m slide) — every event lands in exactly
    two windows; oracle replicates via a 2-way bucket-offset cross join."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy(F.window("ts", "1 hour", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
        "sum_value",
    )


@query(
    "q_stream_session",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts::TIMESTAMP AS t, event_id, value,
         CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
), sessions AS (
  SELECT user_id, t, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gaps
)
SELECT user_id,
       min(t) AS session_start,
       max(t) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM sessions
GROUP BY user_id, sess_id
""",
)
def q_stream_session(spark, sf_dir):
    """T3: session windows (30m inactivity gap) per user. Oracle is the
    classic gaps-and-islands rewrite; Spark's session_window end = last
    event + gap."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n",
        "sum_value",
    )


@query(
    "q_stream_foreach_batch",
    oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY event_type
""",
)
def q_stream_foreach_batch(spark, sf_dir):
    """Sink-surface extra (r2): ``foreachBatch`` — the production sink
    pattern (arbitrary batch writer per micro-batch, keyed by batchId for
    exactly-once upsert). Each micro-batch lands as a parquet subdir; the
    union of batches is the full input replayed once, so the read-back
    aggregate hash-checks against the batch aggregate. Write-once per
    (sf_dir, events content); the skip marker is a RUN-completion file
    touched only when availableNow terminated on its own — any single
    batch's _SUCCESS is not proof the stream drained (a timed-out prior
    run leaves a partial batch set), and a partial run re-enters here and
    RESUMES from the checkpoint, which is the exactly-once story this
    operator demonstrates."""
    import os as _os

    from wikidata2pg_spark.util import tmpdir_for

    out_dir = tmpdir_for(sf_dir, "foreach_batch", "events")
    done = _os.path.join(out_dir, "_STREAM_COMPLETE")

    def write_batch(batch_df, batch_id: int):
        # idempotence shape: one dir per batchId, overwrite on retry
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    if not _os.path.exists(done):
        from wikidata2pg_spark.streaming.harness import run_foreach_batch_available_now

        s = read_events_stream(spark, sf_dir).select("event_id", "event_type", "value")
        run_foreach_batch_available_now(
            spark, s, write_batch, f"{out_dir}/_ckpt", done,
            what="q_stream_foreach_batch",
        )
    back = spark.read.option("basePath", out_dir).parquet(f"{out_dir}/batch=*")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query("q_stream_watermark_late", oracle=None)  # arrival-order semantics → rows-only
def q_stream_watermark_late(spark, sf_dir):
    """T4: watermark + append-mode late-data drop. Two files arrive as
    separate micro-batches (maxFilesPerTrigger=1); batch 1 advances the
    watermark past the crafted late rows in batch 2, which are dropped.
    Deterministic semantics asserted in tests/test_streaming.py."""
    from wikidata2pg_spark.streaming.harness import EVENTS_STREAM_SCHEMA, late_arrival_dir

    path = late_arrival_dir(spark, sf_dir)
    s = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
    return run_available_now(spark, agg, output_mode="append")


@query(
    "q_stream_dedup",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def q_stream_dedup(spark, sf_dir):
    """T5 (batch form): dropDuplicates on the dedup key — projected to the
    key columns so the result is deterministic regardless of which row each
    engine keeps. Streaming dropDuplicatesWithinWatermark runs in tests."""
    e = load(spark, sf_dir, "events")
    return e.dropDuplicates(["user_id", "event_type"]).select("user_id", "event_type")


def _stateful_count_trail(spark, sf_dir):
    """The T6 stream: running per-user (count, sum) via
    applyInPandasWithState; state persists across micro-batches, each batch
    emits the updated totals, the memory sink keeps the full trail.

    Memoized per (session, events content stamp): q_stream_stateful_count
    and q_stream_stateful_final both consume this trail, and without the
    cache a correctness round holding both keys would execute the most
    expensive streaming operator in the package twice. The memory-sink
    table is a materialized batch DataFrame, so sharing it is safe; the
    stamp key makes a fixture regeneration re-run the stream."""
    from wikidata2pg_spark.util import source_stamp

    cache = getattr(spark, "_w2pg_trail_cache", None)
    if cache is None:
        cache = spark._w2pg_trail_cache = {}
    key = (sf_dir, source_stamp(sf_dir, "events"))
    if key in cache:
        return cache[key]
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    s = read_events_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        # emit the RAW total: Python round() is half-to-EVEN while the
        # oracle (DuckDB round) and every sibling query (F.round) are
        # half-away-from-zero — rounding happens once, below, in F.round
        yield pd.DataFrame({"user_id": [key[0]], "n": [cnt], "sum_value": [total]})

    out = s.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n BIGINT, sum_value DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sunk = run_available_now(spark, out, output_mode="update")
    trail = sunk.withColumn("sum_value", F.round("sum_value", 2))
    cache[key] = trail
    return trail


@query("q_stream_stateful_count", oracle=None)  # custom state machine → rows-only
def q_stream_stateful_count(spark, sf_dir):
    """T6: the full update-mode emission trail — genuinely unhashable (one
    row per (user, micro-batch) touched, so the row set depends on batch
    boundaries). The deterministic sub-projection is the next key."""
    return _stateful_count_trail(spark, sf_dir)


@query(
    "q_stream_stateful_final",
    oracle="""
SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY user_id
""",
)
def q_stream_stateful_final(spark, sf_dir):
    """T6's hashable half (VERDICT r4 task 8): each user's FINAL state from
    the same applyInPandasWithState trail. The trail's row count depends on
    micro-batch boundaries, but the last emission per user is the converged
    (count, sum) — batch-equal to a plain GROUP BY, so it hash-checks.
    Selected with a per-user max-n window (n strictly increases per
    emission; no arrival-order dependence)."""
    from pyspark.sql import Window

    trail = _stateful_count_trail(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        trail.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@query(
    "q_stream_stream_join",
    oracle="""
SELECT e.event_id AS err_id, p.event_id AS purchase_id, e.user_id,
       e.ts::TIMESTAMP AS err_ts, p.ts::TIMESTAMP AS purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id
 AND p.ts::TIMESTAMP >= e.ts::TIMESTAMP - INTERVAL 1 HOUR
 AND p.ts::TIMESTAMP <= e.ts::TIMESTAMP
""",
)
def q_stream_stream_join(spark, sf_dir):
    """T-family extra (r2): stream-stream inner join with watermarks and a
    time-range condition — each error event joined to same-user purchases
    in the preceding hour. Both sides are watermarked so the state store
    only holds the range window (the condition bounds state eviction at
    scale); the terminal availableNow inner-join result equals the batch
    time-range join, so it hash-checks."""
    err = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "2 hours")
    )
    pur = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = err.join(
        pur,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("err_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("purchase_ts") <= F.col("err_ts")),
        "inner",
    ).select("err_id", "purchase_id", "user_id", "err_ts", "purchase_ts")
    return run_available_now(spark, joined, output_mode="append")


@query(
    "q_stream_static_join",
    oracle="""
SELECT c.c_mktsegment, count(*) AS n, round(sum(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_stream_static_join(spark, sf_dir):
    """T7: stream-static dimension join as a REAL stream — the static side
    is broadcast into every micro-batch; complete-mode result equals the
    batch join, so it hash-checks."""
    s = read_events_stream(spark, sf_dir)
    c = load(spark, sf_dir, "customer")
    joined = s.join(F.broadcast(c), s.user_id == c.c_custkey)
    agg = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return run_available_now(spark, agg, output_mode="complete")


@query(
    "q_time_multirollup",
    oracle="""
SELECT 'hour' AS granularity,
       time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS bucket,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', time_bucket(INTERVAL 1 DAY, ts::TIMESTAMP), event_type,
       count(*), round(sum(value), 2)
FROM events GROUP BY 2, 3
""",
)
def q_time_multirollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup (r2 extra): the same
    events aggregated at EVERY granularity (hour + day) in one pass — each
    row is exploded to its (granularity, bucket) memberships, then a single
    hash-agg groups all levels together (one shuffle for all granularities,
    map-side combined; the timescale continuous-aggregate shape). At scale
    the coarse levels are near-free: they ride the same shuffle."""
    e = load(spark, sf_dir, "events")
    levels = F.array(
        F.struct(F.lit("hour").alias("granularity"), F.date_trunc("hour", "ts").alias("bucket")),
        F.struct(F.lit("day").alias("granularity"), F.date_trunc("day", "ts").alias("bucket")),
    )
    return (
        e.select("event_type", "value", F.explode(levels).alias("g"))
        .groupBy(
            F.col("g.granularity").alias("granularity"),
            F.col("g.bucket").alias("bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "q_time_gapfill",
    oracle="""
WITH spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                TIMESTAMP '2024-01-06 23:00:00',
                                INTERVAL 1 HOUR)) AS h
),
types AS (SELECT DISTINCT event_type FROM events),
hourly AS (
  SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS h,
         round(sum(value), 2) AS v
  FROM events
  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-05'
    AND ts::TIMESTAMP < TIMESTAMP '2024-01-07'
  GROUP BY 1, 2
)
SELECT t.event_type, s.h AS bucket,
       (hv.v IS NULL) AS was_gap,
       last_value(hv.v IGNORE NULLS) OVER (
           PARTITION BY t.event_type ORDER BY s.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM spine s
CROSS JOIN types t
LEFT JOIN hourly hv ON hv.event_type = t.event_type AND hv.h = s.h
""",
)
def q_time_gapfill(spark, sf_dir):
    """Time-series gap-fill (r2 extra): generate a dense hourly spine ×
    keys, left-join the sparse aggregates, forward-fill with
    last-non-null over an ordered window — the hypertable
    ``time_bucket_gapfill + locf`` semantics. The spine is generated
    (``sequence``+``explode``, no driver loop) and the fill is one keyed
    window — both scale-free shapes."""
    e = load(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-05 00:00:00").cast("timestamp"),
                F.lit("2024-01-06 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket")
    )
    types = e.select("event_type").distinct()
    hourly = (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-07").cast("timestamp"))
        )
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    grid = spine.crossJoin(types)
    j = grid.join(hourly, ["event_type", "bucket"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "event_type",
        "bucket",
        F.col("v").isNull().alias("was_gap"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


@query(
    "q_time_sessionize_batch",
    oracle="""
WITH g AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, value,
         CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, session_idx
""",
)
def q_time_sessionize_batch(spark, sf_dir):
    """Batch sessionization: per-user sessions from a
    30-minute inactivity gap — lag to flag the break, running sum of the
    flags for the session index, then a per-session rollup. The batch twin
    of T3's session_window (same gap semantics over history instead of a
    stream), and the canonical clickstream prep step. One user-keyed
    shuffle; both windows and the final agg share the (user_id) hash
    partitioning, so Catalyst plans a single Exchange."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap: cast('long') truncates to whole seconds while
    # the oracle compares the exact interval, so a gap in [1800, 1801) s
    # would break a session in DuckDB but not here — unix_micros keeps the
    # two sides comparing the identical quantity.
    brk = (
        F.unix_micros(F.col("ts"))
        - F.lag(F.unix_micros(F.col("ts"))).over(w)
        > 30 * 60 * 1_000_000
    ).cast("int")
    g = e.withColumn("brk", F.coalesce(brk, F.lit(0)))
    s = g.withColumn(
        "session_idx",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "q_stream_corpus_clean",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {canon_sql('text')} AS norm,
         string_split({canon_sql('text')}, ' ') AS toks FROM documents
), q AS (
  SELECT norm, len(toks) AS n_toks
  FROM t
  WHERE len(toks) BETWEEN 10 AND 1000
    AND len(list_distinct(toks)) * 1.0 / len(toks) > 0.2
), d AS (
  SELECT DISTINCT sha256(norm) AS digest, n_toks FROM q
)
SELECT n_toks // 100 AS len_bucket,
       count(*)::BIGINT AS n_docs,
       sum(n_toks)::BIGINT AS total_tokens
FROM d GROUP BY 1
""",
)
def q_stream_corpus_clean(spark, sf_dir):
    """Streaming capstone: the corpus-clean gate (quality filter + digest
    dedup) running as a REAL Structured Streaming query over a streamed
    documents source — quality predicate inside the stream scan, then
    streaming ``dropDuplicates`` on the normalized digest (append mode,
    availableNow). The sink is projected to digest-determined columns
    (digest, n_toks) so the result set is identical whichever duplicate
    arrives first — which is what makes a streaming dedup hash-checkable
    at all. The final length-bucket histogram is a batch aggregate over
    the sunk rows. In production the dedup state is bounded with
    dropDuplicatesWithinWatermark; availableNow replay here holds state
    for the run only."""
    from wikidata2pg_spark.streaming.harness import read_documents_stream

    s = read_documents_stream(spark, sf_dir)
    # Tokenize the NORMALIZED text (the same string the digest hashes):
    # n_toks must be digest-determined, or two same-digest variants
    # (case/whitespace) would carry different n_toks and the surviving
    # row would depend on arrival order — unhashable.
    norm = canon_text(F.col("text"))
    toks = F.split(norm, " ")
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) * 1.0 / n
    cleaned = (
        s.filter(n.between(10, 1000) & (ttr > 0.2))
        .select(
            F.sha2(norm, 256).alias("digest"),
            n.cast("long").alias("n_toks"),
        )
        .dropDuplicates(["digest"])
    )
    sunk = run_available_now(spark, cleaned, output_mode="append")
    return sunk.groupBy(F.floor(F.col("n_toks") / 100).alias("len_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
    )


@query(
    "q_stream_jdbc_upsert",
    oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY event_type
""",
)
def q_stream_jdbc_upsert(spark, sf_dir):
    """Streaming → database with EXACTLY-ONCE upsert: foreachBatch
    aggregates each micro-batch, stages it via JDBC, and applies it with a
    transactional MERGE guarded by an applied-batch ledger — the
    production pattern for keeping a serving table in sync with a stream.
    Retried batches hit the ledger and are skipped, so counts never
    double-apply (count/sum are additive, so per-batch partials merge to
    the exact batch answer). Runs against the Spark-bundled Derby (which
    has MERGE since 10.11); on Postgres only URL/driver change — or
    INSERT .. ON CONFLICT replaces the MERGE (README Derby caveat).
    StringType must be pinned to VARCHAR via createTableColumnTypes:
    Derby's default CLOB mapping cannot be compared in a MERGE ON
    clause. The final serving table hash-checks against the batch
    aggregate of the full input."""
    import os as _os

    from wikidata2pg_spark.util import tmpdir_for

    # Content-stamped like the checkpoint dir below: a driver fixture
    # regeneration must land a FRESH Derby database, or the old
    # applied_batches ledger would mark the new run's batch ids (fresh
    # checkpoint → ids restart at 0) as already applied and the key would
    # serve the stale serving table against the new oracle. The completion
    # marker lives IN the db dir so marker and database can only
    # invalidate together.
    db_dir = tmpdir_for(sf_dir, "derbydb_upsert", "events")
    url = f"jdbc:derby:{db_dir}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    done = _os.path.join(db_dir, "_STREAM_COMPLETE")

    def _connect():
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return jvm.java.sql.DriverManager.getConnection(url)

    def _exec_ignore(con, sql, ignore_states=("X0Y32",)):
        st = con.createStatement()
        try:
            st.execute(sql)
        except Exception as e:  # table exists et al.
            if not any(s in str(e) for s in ignore_states):
                raise
        finally:
            st.close()

    def apply_batch(batch_df, batch_id: int):
        # UPPERCASE aliases: Spark's JDBC writer quotes column names, so
        # lowercase aliases create case-sensitive columns that unquoted
        # Derby SQL (which upper-cases identifiers) cannot reference
        agg = batch_df.groupBy(F.col("event_type").alias("EVENT_TYPE")).agg(
            F.count(F.lit(1)).alias("N"), F.sum("value").alias("SUM_VALUE")
        )
        (
            agg.write.mode("overwrite")
            .option("createTableColumnTypes", "EVENT_TYPE VARCHAR(64), N BIGINT, SUM_VALUE DOUBLE")
            .jdbc(url, "upsert_stage", properties=props)
        )
        con = _connect()
        try:
            con.setAutoCommit(False)
            st = con.createStatement()
            try:
                # ledger probe: a batch already applied (crash after commit,
                # retry before checkpoint advance) must be a no-op
                rs = st.executeQuery(
                    f"SELECT count(*) FROM applied_batches WHERE bid = {int(batch_id)}"
                )
                rs.next()
                if rs.getLong(1) == 0:
                    st.executeUpdate(
                        "MERGE INTO event_serving t USING upsert_stage s "
                        "ON t.event_type = s.event_type "
                        "WHEN MATCHED THEN UPDATE SET n = t.n + s.n, "
                        "sum_value = t.sum_value + s.sum_value "
                        "WHEN NOT MATCHED THEN INSERT (event_type, n, sum_value) "
                        "VALUES (s.event_type, s.n, s.sum_value)"
                    )
                    st.executeUpdate(
                        f"INSERT INTO applied_batches VALUES ({int(batch_id)})"
                    )
                con.commit()
            finally:
                st.close()
        finally:
            con.close()

    if not _os.path.exists(done):
        con = _connect()
        try:
            _exec_ignore(
                con,
                "CREATE TABLE event_serving "
                "(event_type VARCHAR(64) PRIMARY KEY, n BIGINT, sum_value DOUBLE)",
            )
            _exec_ignore(con, "CREATE TABLE applied_batches (bid BIGINT PRIMARY KEY)")
            # a partial prior run is resumed from the checkpoint (ledger
            # makes re-delivered batches no-ops); a COMPLETED prior run
            # without marker (marker write crashed) would re-apply nothing
            # either — every batch is in the ledger.
        finally:
            con.close()
        from wikidata2pg_spark.streaming.harness import run_foreach_batch_available_now

        s = read_events_stream(spark, sf_dir).select("event_type", "value")
        run_foreach_batch_available_now(
            spark, s, apply_batch, f"{db_dir}/_ckpt", done,
            what="q_stream_jdbc_upsert (ledgered)",
        )
    back = spark.read.jdbc(url, "event_serving", properties=props)
    return back.select(
        F.col("EVENT_TYPE").alias("event_type"),
        F.col("N").alias("n"),
        F.round("SUM_VALUE", 2).alias("sum_value"),
    )


@query(
    "q_stream_stream_left",
    oracle="""
WITH e AS (
  SELECT event_id AS err_id, user_id, ts::TIMESTAMP AS err_ts
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT event_id AS purchase_id, user_id, ts::TIMESTAMP AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), wm AS (
  -- Spark truncates each input's max event time to MILLISECONDS before
  -- subtracting the delay (EventTimeWatermarkExec divides us by 1000),
  -- and left-state eviction is STRICT (err_ts < watermark) — an
  -- unmatched error exactly at the frontier stays withheld. Mirror both,
  -- or a fixture landing an error in the sub-ms sliver at the frontier
  -- flips the hash (review repro, r6). The CASE mirrors the EMPTY-side
  -- convention (r7 degenerate-input sweep): a stream with no rows never
  -- advances its watermark, so Spark's min-policy global watermark stays
  -- at the epoch and EVERYTHING is withheld — least() alone would
  -- silently ignore the NULL max (Postgres convention) and anchor the
  -- frontier to the populated side.
  SELECT CASE WHEN (SELECT max(err_ts) FROM e) IS NULL
              OR (SELECT max(purchase_ts) FROM p) IS NULL THEN NULL
         ELSE least(date_trunc('milliseconds', (SELECT max(err_ts) FROM e)),
                    date_trunc('milliseconds', (SELECT max(purchase_ts) FROM p)))
              - INTERVAL 2 HOUR END AS w
), matched AS (
  SELECT e.err_id, p.purchase_id, e.user_id, e.err_ts, p.purchase_ts
  FROM e JOIN p ON e.user_id = p.user_id
   AND p.purchase_ts >= e.err_ts - INTERVAL 1 HOUR
   AND p.purchase_ts <= e.err_ts
)
SELECT err_id, purchase_id, user_id, err_ts, purchase_ts FROM matched
UNION ALL
SELECT e.err_id, NULL, e.user_id, e.err_ts, CAST(NULL AS TIMESTAMP)
FROM e, wm
WHERE e.err_id NOT IN (SELECT err_id FROM matched) AND e.err_ts < wm.w
""",
)
def q_stream_stream_left(spark, sf_dir):
    """Stream-stream LEFT OUTER join — the capability the inner form
    (q_stream_stream_join) cannot express: errors with NO same-user
    purchase in the preceding hour still emit, with NULL purchase
    columns, once the watermark proves no match can arrive. The outer
    side is the interesting state machine: an unmatched error is held in
    the join state until the GLOBAL watermark (min over both inputs of
    max-event-time minus the 2h delay) passes its err_ts — only then is
    "no match" final.

    Hash-certified WITH the frontier rule stated honestly in the oracle:
    after an availableNow drain the unmatched errors whose err_ts is not
    STRICTLY below the final watermark remain in state (measured:
    exactly the max-err_ts row at sf0.001 — its "no purchase yet"
    verdict is genuinely not final), so the oracle is the batch left
    join MINUS null-matched rows at or above
    `least(ms_floor(max_err), ms_floor(max_purchase)) - 2h` — the
    ms-floor and the strict bound mirror Spark's watermark arithmetic
    exactly (review repro: an error in the sub-ms frontier sliver). That
    set is a pure function of the DATA (final watermark does not depend
    on micro-batch boundaries), which is what makes this key hashable
    while the update-mode emission trail (T6) is not. At 100 TB the same
    watermark bounds the state store: matched pairs evict as the range
    window passes, unmatched lefts evict exactly when they emit."""
    err = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "2 hours")
    )
    pur = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = err.join(
        pur,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("err_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("purchase_ts") <= F.col("err_ts")),
        "left_outer",
    ).select("err_id", "purchase_id", "user_id", "err_ts", "purchase_ts")
    return run_available_now(spark, joined, output_mode="append")


@query(
    "q_stream_full_outer",
    oracle="""
WITH e AS (
  SELECT event_id AS err_id, user_id, ts::TIMESTAMP AS err_ts
  FROM events WHERE event_type = 'error'
), p AS (
  SELECT event_id AS purchase_id, user_id, ts::TIMESTAMP AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), wm AS (
  -- identical watermark arithmetic to q_stream_stream_left (ms-floor,
  -- strict eviction, NULL frontier when EITHER side is empty — the
  -- min-policy watermark never advances off the epoch then, r7
  -- degenerate-input sweep); the RIGHT side's finality bound is shifted
  -- by the range width: a purchase at time t can match errors up to
  -- t + 1h, so "no error matched" is final only when t + 1h < W, i.e.
  -- t < W - 1h (strict — pinned by the crafted frontier fixture in
  -- tests/test_streaming.py: a probe exactly at W-1h stays withheld,
  -- one 1 ms below emits).
  SELECT CASE WHEN (SELECT max(err_ts) FROM e) IS NULL
              OR (SELECT max(purchase_ts) FROM p) IS NULL THEN NULL
         ELSE least(date_trunc('milliseconds', (SELECT max(err_ts) FROM e)),
                    date_trunc('milliseconds', (SELECT max(purchase_ts) FROM p)))
              - INTERVAL 2 HOUR END AS w
), matched AS (
  SELECT e.err_id, p.purchase_id, e.user_id, e.err_ts, p.purchase_ts
  FROM e JOIN p ON e.user_id = p.user_id
   AND p.purchase_ts >= e.err_ts - INTERVAL 1 HOUR
   AND p.purchase_ts <= e.err_ts
)
SELECT err_id, purchase_id, user_id, err_ts, purchase_ts FROM matched
UNION ALL
SELECT e.err_id, NULL, e.user_id, e.err_ts, CAST(NULL AS TIMESTAMP)
FROM e, wm
WHERE e.err_id NOT IN (SELECT err_id FROM matched) AND e.err_ts < wm.w
UNION ALL
SELECT NULL, p.purchase_id, p.user_id, CAST(NULL AS TIMESTAMP), p.purchase_ts
FROM p, wm
WHERE p.purchase_id NOT IN (SELECT purchase_id FROM matched)
  AND p.purchase_ts < wm.w - INTERVAL 1 HOUR
""",
)
def q_stream_full_outer(spark, sf_dir):
    """Stream-stream FULL OUTER join — both sides' unmatched rows emit
    with NULL partners once the global watermark proves no match can
    arrive. Extends q_stream_stream_left's frontier rule to the right
    side, whose finality bound is SHIFTED BY THE RANGE WIDTH: an
    unmatched error is final when err_ts < W, but an unmatched purchase
    at t can still match errors arriving up to t + 1h, so it emits only
    when t < W - 1h. Both bounds are STRICT and W ms-floors each input's
    max event time before subtracting the 2 h delay — all three facts
    pinned empirically with a crafted frontier fixture (probes 1 ms
    either side of, exactly at, and in the sub-ms sliver above each
    bound). As with the left key, the final watermark is a pure function
    of the data, which is what makes the availableNow drain hashable.
    At 100 TB the two bounds are exactly the state-store eviction
    frontiers — state is bounded by delay + range width."""
    err = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "2 hours")
    )
    pur = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = err.join(
        pur,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("err_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("purchase_ts") <= F.col("err_ts")),
        "full_outer",
    ).select(
        "err_id",
        "purchase_id",
        F.coalesce(F.col("user_id"), F.col("p_user_id")).alias("user_id"),
        "err_ts",
        "purchase_ts",
    )
    return run_available_now(spark, joined, output_mode="append")


@query(
    "q_stream_windowed_topk",
    oracle="""
WITH agg AS (
  SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS window_start,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n, rk FROM (
  SELECT window_start, event_type, n,
         CAST(row_number() OVER (PARTITION BY window_start
                                 ORDER BY n DESC, event_type) AS BIGINT)
           AS rk
  FROM agg
) z WHERE rk <= 3
""",
)
def q_stream_windowed_topk(spark, sf_dir):
    """Streaming top-k composition: the STREAM maintains the per-window
    per-type counts (tumbling 1h, availableNow -> memory, complete
    mode — the only stream-legal part, since rank functions cannot run
    inside an unbounded aggregation), and the top-3-per-window RANK
    runs at serve time over the sink — the standard production split
    (aggregate in the stream, rank at query time). Counts are exact
    integers; the rank breaks count ties by event_type, so the final
    relation is a pure function of the data and hash-checks against
    the batch oracle. At scale the serve-side rank is the cheap part
    (windows x types rows); the stream side shuffles once per trigger
    on the window/type key with partial aggregation upstream."""
    s = read_events_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = agg.select(
        F.col("window.start").alias("window_start"), "event_type", "n"
    )
    final = run_available_now(spark, out, output_mode="complete")
    w = W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    return (
        final.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("window_start", "event_type", F.col("n").cast("long"), "rk")
    )
