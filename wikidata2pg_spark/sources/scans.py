"""Scans / sources / sinks (§2.1 S1-S10).

Roundtrip queries (CSV/ORC/partitioned-parquet) write under a per-SF temp
dir then read back — the *read* path with explicit schemas is what's under
test; at 100 TB these writers become the bronze→silver materialization and
the readers the silver scans (partition pruning audited in tests).

JDBC (S6/S7) runs against the Spark-bundled Derby engine (file-based DB) —
same DataFrame API surface as the reference's Postgres load
(``df.write.jdbc`` / ``spark.read.jdbc``), no external server needed.
S10 is a from-scratch Python DataSource emitting Wikidata-style entity
lines — the shape of a dump-chunk source.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


from wikidata2pg_spark.util import (
    tmpdir as _tmpdir,
    tmpdir_for as _tmpdir_for,
    written as _written,
)


@query(
    "q_scan_parquet",
    oracle="""
SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_quantity >= 25
GROUP BY l_returnflag
""",
)
def q_scan_parquet(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


_JSONL_LINES = [
    '{"id": "Q1", "type": "item", "n": 1}',
    '{"id": "Q2", "type": "item", "n": 2}',
    '{"id": "P10", "type": "property", "n": 3}',
    "{this is not json",
    '{"id": "Q4", "type": "item", "n": 4}',
]


@query(
    "q_scan_jsonl",
    oracle="""
SELECT * FROM (VALUES
  ('Q1', 'item', CAST(1 AS BIGINT), false),
  ('Q2', 'item', CAST(2 AS BIGINT), false),
  ('P10', 'property', CAST(3 AS BIGINT), false),
  (NULL, NULL, NULL, true),
  ('Q4', 'item', CAST(4 AS BIGINT), false)
) t(id, type, n, bad)
""",
)
def q_scan_jsonl(spark, sf_dir):
    """JSON-lines scan with explicit schema + PERMISSIVE corrupt-record —
    exactly the dump-parsing posture of §1.2 (one malformed line must not
    flip a column type or kill the job)."""
    lines = spark.createDataFrame([(l,) for l in _JSONL_LINES], "line string")
    parsed = F.from_json(
        F.col("line"),
        "id STRING, type STRING, n BIGINT",
        {"mode": "PERMISSIVE"},
    )
    # PERMISSIVE mode yields an all-null struct (not a NULL struct) for a
    # corrupt line; "bad" = the required id field failed to parse.
    return lines.select(
        parsed.getField("id").alias("id"),
        parsed.getField("type").alias("type"),
        parsed.getField("n").alias("n"),
        parsed.getField("id").isNull().alias("bad"),
    )


@query(
    "q_scan_csv",
    oracle="""
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_orderstatus
""",
)
def q_scan_csv(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = _tmpdir_for(sf_dir, "csv_orders", "orders")
    if not _written(path):
        o.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE").option(
        "header", True
    ).csv(path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "q_scan_orc",
    oracle="""
SELECT c_mktsegment, count(*) AS n,
       floor(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) * 1e0
             / count(*) + 0.5) / 100 AS avg_bal
FROM customer
GROUP BY c_mktsegment
""",
)
def q_scan_orc(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    path = _tmpdir_for(sf_dir, "orc_customer", "customer")
    if not _written(path):
        c.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    # Exact-cents average: avg(2-decimal doubles) differs across engines by
    # summation-order ulp AND can land on a half-cent — sum of integer
    # cents / count is the identical double on both sides, so the floor
    # rounding is deterministic (verify-skill int-ratio rule).
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        (F.floor(F.sum(cents) * 1.0 / F.count(F.lit(1)) + F.lit(0.5)) / 100).alias(
            "avg_bal"
        ),
    )


@query(
    "q_sink_parquet_partitioned",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
GROUP BY l_returnflag, l_linestatus
""",
)
def q_sink_parquet_partitioned(spark, sf_dir):
    """partitionBy write + partition-pruned readback: the filter on the
    partition column prunes directories, not rows (verified in plan tests)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_linestatus")
    path = _tmpdir_for(sf_dir, "parquet_part", "lineitem")
    if not _written(path):
        li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    # explicit schema on readback (r7 empty-input sweep): a partitionBy
    # write of an EMPTY frame produces no part files, and schema
    # inference then fails — the writer's schema is the contract either
    # way, and passing it is also one footer read cheaper at scale
    back = spark.read.schema(li.schema).parquet(path).filter(
        F.col("l_returnflag").isin("A", "R")
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


def _derby_url(sf_dir: str) -> str:
    return f"jdbc:derby:{_tmpdir(sf_dir, 'derbydb')}/db;create=true"


@query(
    "q_sink_jdbc_pg",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def q_sink_jdbc_pg(spark, sf_dir):
    """The reference's sink shape [R]: batched JDBC bulk load
    (``df.write.jdbc`` with batchsize, mode=overwrite for idempotence).
    Runs against Spark's bundled Derby; against Postgres only the URL/driver
    change. NOT exercised by Derby (README "Postgres-vs-Derby caveat"):
    reWriteBatchedInserts, COPY loading, ON CONFLICT — the env-gated
    test_cli_import_real_postgres covers them where a server exists.
    Returns the written rows read back — a full write→read JDBC
    roundtrip is value-preserving, so it hash-checks against the source
    table (upgraded from rows-only in r2)."""
    n = load(spark, sf_dir, "nation")
    url = _derby_url(sf_dir)
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver", "batchsize": "1000"}
    n.write.jdbc(url, "nation_sink", mode="overwrite", properties=props)
    return spark.read.jdbc(url, "nation_sink", properties=props).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "q_source_jdbc",
    oracle="""
SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
FROM customer
GROUP BY c_nationkey
""",
)
def q_source_jdbc(spark, sf_dir):
    """Parallel JDBC read: partitionColumn/lowerBound/upperBound/numPartitions
    → 4 concurrent connections each reading a key range. The roundtripped
    aggregate is value-identical to aggregating the source directly, so it
    hash-checks (upgraded from rows-only in r2)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    url = _derby_url(sf_dir)
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    c.write.jdbc(url, "customer_src", mode="overwrite", properties=props)
    # Bounds derived from the data (one tiny agg job), not hardcoded:
    # static 0/10000 put EVERY sf0.01 row in partition 0 and skewed sf0.1
    # into the last stripe — the "4 concurrent connections each reading a
    # key range" this key exists to exercise only happens with real bounds.
    lo, hi = c.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    # empty-table default (r7 empty-input sweep): min/max are NULL when
    # the source has no rows — any [0, 1) stripe reads back the same
    # zero rows, instead of int(None) crashing the bounds arithmetic
    lo = 0 if lo is None else int(lo)
    hi = lo if hi is None else int(hi)
    back = spark.read.jdbc(
        url,
        "customer_src",
        column="c_custkey",
        lowerBound=lo,
        upperBound=hi + 1,
        numPartitions=4,
        properties=props,
    )
    return back.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal")
    )


@query(
    "q_stream_file_source",
    oracle="""
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY event_type
""",
)
def q_stream_file_source(spark, sf_dir):
    """File stream source + availableNow trigger + memory sink: the batch
    parquet is replayed as a bounded stream and aggregated per event_type.
    Complete-mode terminal state equals the batch aggregate regardless of
    micro-batch boundaries → hash-checkable (upgraded in r2, same argument
    as T1)."""
    from wikidata2pg_spark.streaming.harness import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return run_available_now(spark, agg, output_mode="complete")


@query(
    "q_sink_console_memory",
    oracle="""
SELECT event_id, user_id, event_type FROM events
""",
)
def q_sink_console_memory(spark, sf_dir):
    """Memory-sink surface: an append-mode stateless projection replays
    every input row exactly once by termination, so the sink contents
    hash-check against the batch projection (upgraded in r2)."""
    from wikidata2pg_spark.streaming.harness import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    return run_available_now(spark, stream.select("event_id", "user_id", "event_type"), output_mode="append")


# ---------------------------------------------------------------------------
# S10: custom Python DataSource — a Wikidata dump-chunk source.
# ---------------------------------------------------------------------------

_DUMP_ENTITIES = [
    '{"id":"Q42","type":"item","labels":{"en":{"language":"en","value":"Douglas Adams"}}}',
    '{"id":"Q64","type":"item","labels":{"en":{"language":"en","value":"Berlin"}}}',
    '{"id":"P31","type":"property","labels":{"en":{"language":"en","value":"instance of"}}}',
    '{"id":"Q5","type":"item","labels":{"en":{"language":"en","value":"human"}}}',
]


class _DumpChunkPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _DumpChunkReader(DataSourceReader):
    def partitions(self):
        # two chunks, like two byte-ranges of latest-all.json
        mid = len(_DUMP_ENTITIES) // 2
        return [_DumpChunkPartition(0, mid), _DumpChunkPartition(mid, len(_DUMP_ENTITIES))]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, _DUMP_ENTITIES[i])


class WikidataDumpChunkSource(DataSource):
    """Python DataSource emitting (line_no, entity_json) pairs — the shape a
    real dump-chunk source would have (byte-range partitions over a
    decompressed JSON-lines dump)."""

    @classmethod
    def name(cls):
        return "wikidata_dump_chunks"

    def schema(self):
        return "line_no BIGINT, entity_json STRING"

    def reader(self, schema):
        return _DumpChunkReader()


@query(
    "q_custom_datasource",
    oracle="""
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), 'Q42', 'item', 'Douglas Adams'),
  (CAST(1 AS BIGINT), 'Q64', 'item', 'Berlin'),
  (CAST(2 AS BIGINT), 'P31', 'property', 'instance of'),
  (CAST(3 AS BIGINT), 'Q5', 'item', 'human')
) t(line_no, id, type, label_en)
""",
)
def q_custom_datasource(spark, sf_dir):
    try:
        spark.dataSource.register(WikidataDumpChunkSource)
    except Exception:
        pass  # already registered in this session
    df = spark.read.format("wikidata_dump_chunks").load()
    return df.select(
        "line_no",
        F.get_json_object("entity_json", "$.id").alias("id"),
        F.get_json_object("entity_json", "$.type").alias("type"),
        F.get_json_object("entity_json", "$.labels.en.value").alias("label_en"),
    )


# ---------------------------------------------------------------------------
# S10b (r2): custom Python DataSource WRITER — the sink half of the
# connector surface, with the real two-phase commit protocol: executors
# write part files under temporary names, the driver's commit() atomically
# renames them (abort() discards) — exactly the task-commit shape a
# production object-store sink uses for exactly-once output.
# ---------------------------------------------------------------------------


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, rows: int):
        self.tmp_path = tmp_path
        self.rows = rows


class _JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")

    def write(self, iterator):
        import json
        import uuid

        tmp = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.tmp")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _JsonlCommit(tmp, n)

    def commit(self, messages):
        for m in messages:
            if m is not None:
                os.rename(m.tmp_path, m.tmp_path[: -len(".tmp")])

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class JsonlCommitSink(DataSource):
    """Python DataSource with a writer: JSON-lines sink with tmp-file +
    driver-side atomic-rename commit."""

    @classmethod
    def name(cls):
        return "jsonl_commit_sink"

    def writer(self, schema, overwrite: bool):
        return _JsonlSinkWriter(self.options)


@query(
    "q_custom_datasink",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def q_custom_datasink(spark, sf_dir):
    """Write nation through the custom commit-protocol sink, read the
    committed JSON-lines back — the roundtrip is value-preserving, so it
    hash-checks against the source table. Write-once per (sf_dir, source
    content): the reuse marker is a JOB-level completion file touched only
    after save() returns — per-file .jsonl presence is NOT enough, because
    the sink's commit() renames task files one by one and a mid-commit
    crash would leave a partial-but-nonempty set; the dir is keyed on the
    nation fixture's content stamp so a regenerated fixture re-writes."""
    # register() silently overwrites on re-registration, so no guard: a
    # blanket try/except here would only hide REAL registration failures
    # until they resurface as DATA_SOURCE_NOT_FOUND at save() time.
    spark.dataSource.register(JsonlCommitSink)
    out = _tmpdir_for(sf_dir, "jsonl_sink", "nation")
    done = os.path.join(out, "_SINK_COMPLETE")
    if not os.path.exists(done):
        # No completion marker => any *.jsonl/*.tmp present are leftovers of
        # a run that crashed mid-commit (commit() renames task files one by
        # one). The writer appends uuid-named files, so re-running on top of
        # them would ACCUMULATE a second full file set — clear first so the
        # rerun publishes exactly one committed set.
        import glob as _glob

        for stale in _glob.glob(os.path.join(out, "*.jsonl")) + _glob.glob(
            os.path.join(out, "*.tmp")
        ):
            os.remove(stale)
        n = load(spark, sf_dir, "nation")
        n.write.format("jsonl_commit_sink").mode("append").option("path", out).save()
        with open(done, "w") as fh:
            fh.write("ok")
    return spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT").json(
        f"{out}/*.jsonl"
    )


@query(
    "q_sink_sorted_layout",
    oracle="""
SELECT count(*) AS n, round(sum(value), 2) AS sum_value,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events
WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-10' AND ts::TIMESTAMP < TIMESTAMP '2024-01-12'
""",
)
def q_sink_sorted_layout(spark, sf_dir):
    """Write-layout extra (r2): ``repartitionByRange(ts).sortWithinPartitions
    (ts)`` before the parquet write — each output file covers a disjoint ts
    range and its row groups carry tight min/max stats, so a time-range scan
    prunes whole files/row-groups instead of reading everything (the sorted
    silver-layout story; at 100 TB this is the difference between scanning a
    day and scanning a year). The readback aggregate hash-checks against the
    unsorted source."""
    e = load(spark, sf_dir, "events")
    path = _tmpdir_for(sf_dir, "events_sorted", "events")
    if not _written(path):
        (
            e.repartitionByRange(8, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(path)
        )
    back = spark.read.parquet(path).filter(
        (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12").cast("timestamp"))
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@query(
    "q_scan_xml",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS acctbal
FROM supplier
""",
)
def q_scan_xml(spark, sf_dir):
    """XML roundtrip via Spark 4's BUILT-IN xml source (the spark-xml
    package merged into core): write supplier as <row> elements, read back
    with an explicit schema. Completes the format family (parquet / jsonl /
    csv / orc / xml / jdbc / custom python source); value-preserving, so it
    hash-checks against the source table."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.round("s_acctbal", 2).alias("acctbal")
    )
    path = _tmpdir_for(sf_dir, "xml_supplier", "supplier")
    if not _written(path):
        s.write.mode("overwrite").format("xml").option("rootTag", "suppliers").option(
            "rowTag", "row"
        ).save(path)
    return (
        spark.read.format("xml")
        .schema("s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT, acctbal DOUBLE")
        .option("rowTag", "row")
        .load(path)
    )


@query(
    "q_scan_binaryfile",
    oracle="""
SELECT 'blob-' || (n_nationkey % 4) || '.bin' AS file_name,
       count(*)::BIGINT AS n_rows_in_file,
       sum(length(n_name))::BIGINT AS payload_chars
FROM nation
GROUP BY n_nationkey % 4
""",
)
def q_scan_binaryfile(spark, sf_dir):
    """Whole-file binary ingestion via the built-in ``binaryFile`` source —
    the front door for multimodal corpora (images/audio/video land as one
    row per file with path, length, and the raw bytes). Four files are
    derived deterministically from the nation table (newline-joined names
    per n_nationkey%4 group, UTF-8); the read-back decodes the bytes and
    re-derives per-file row counts and payload sizes, which the oracle
    states directly from the source table — a write/read/decode roundtrip.
    At scale binaryFile parallelizes per file (maxPartitionBytes splits do
    not apply to whole-file rows), so file-granularity IS the unit of
    parallelism — exactly how image/audio shards are consumed."""
    import os as _os

    n = load(spark, sf_dir, "nation")
    path = _tmpdir_for(sf_dir, "binaryfile_nation", "nation")
    if not _written(path):
        rows = (
            n.select((F.col("n_nationkey") % 4).alias("g"), "n_name", "n_nationkey")
            .sort("n_nationkey")
            .collect()
        )  # 25 rows: fixture-size driver assembly for the derived artifact only
        _os.makedirs(path, exist_ok=True)
        # marker absent -> a prior run may have crashed mid-write: clear
        # leftovers so the published set is exactly one write (r4 lesson)
        for leftover in _os.listdir(path):
            if leftover.endswith(".bin"):
                _os.unlink(_os.path.join(path, leftover))
        groups: dict[int, list[str]] = {}
        for r in rows:
            groups.setdefault(int(r["g"]), []).append(r["n_name"])
        for g, names in groups.items():
            with open(_os.path.join(path, f"blob-{g}.bin"), "wb") as fh:
                fh.write("\n".join(names).encode("utf-8"))
        with open(_os.path.join(path, "_SUCCESS"), "w") as fh:
            fh.write("ok")
    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(path)
    decoded = files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.split(F.decode(F.col("content"), "UTF-8"), "\n").alias("names"),
    )
    return decoded.select(
        "file_name",
        F.size("names").cast("long").alias("n_rows_in_file"),
        F.aggregate(
            F.transform(F.col("names"), lambda s: F.length(s).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("payload_chars"),
    )


@query(
    "q_scan_schema_evolution",
    oracle="""
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
       CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status
FROM orders
""",
)
def q_scan_schema_evolution(spark, sf_dir):
    """Schema evolution across files of one dataset: older files carry 3
    columns, newer ones add ``status`` — the unavoidable lakehouse reality
    once a 100 TB dataset is appended to for months. ``mergeSchema=true``
    unions the footers into one evolved schema and back-fills NULL for
    columns a file predates; the per-row result (evolved rows carry their
    status, legacy rows NULL) hash-checks against deriving the same split
    from the source table.

    Scale note: mergeSchema reads every file FOOTER at planning time — at
    real scale you pin the merged schema in a catalog instead and pass it
    explicitly; per-file back-fill behavior is identical either way, which
    is what this verifies."""
    o = load(spark, sf_dir, "orders")
    path = _tmpdir_for(sf_dir, "orders_evolved", "orders")
    v1_dir, v2_dir = f"{path}/v=1", f"{path}/v=2"
    if not (_written(v1_dir) and _written(v2_dir)):
        legacy = o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        evolved = o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_custkey", "o_totalprice", F.col("o_orderstatus").alias("status")
        )
        legacy.write.mode("overwrite").parquet(v1_dir)
        evolved.write.mode("overwrite").parquet(v2_dir)
    back = spark.read.option("mergeSchema", "true").parquet(v1_dir, v2_dir)
    return back.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        "status",
    )


def _morton16(a, b):
    """Interleave the low 16 bits of two long columns (a gets the odd bit
    positions) — pure JVM bitwise expressions, no UDF."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(16):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i))
    return z


@query(
    "q_sink_zorder",
    oracle="""
SELECT count(*) AS n, round(sum(value), 2) AS sum_value,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events
WHERE user_id BETWEEN 40 AND 80
  AND ts::TIMESTAMP >= TIMESTAMP '2024-01-10' AND ts::TIMESTAMP < TIMESTAMP '2024-01-14'
""",
)
def q_sink_zorder(spark, sf_dir):
    """Z-order (Morton-interleaved) write layout: quantize the two query
    dimensions (user_id, ts) to 16-bit ranks, interleave the bits into one
    sort key, and range-partition + sort the write on it — every output
    file then covers a small RECTANGLE in (user_id, ts) space, so a
    two-dimensional predicate prunes files/row-groups via min/max stats on
    BOTH columns. A linear sort clusters only its leading column; at
    100 TB Z-order is the difference between a 2-D slice reading a few
    files and reading the whole partition range (the Delta/Iceberg OPTIMIZE
    ZORDER story, built here from shiftleft/& codegen expressions — no
    UDF, one range shuffle). Dimension min/max come from a broadcast 1-row
    aggregate, not driver-side constants, so the same plan survives any
    data range. The pruning effect itself is asserted in
    tests/test_plans.py (files hit by the rectangle < total files); here
    the read-back rectangle aggregate hash-checks against the unsorted
    source."""
    e = load(spark, sf_dir, "events")
    rng = e.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min(F.unix_timestamp("ts")).alias("t_lo"),
        F.max(F.unix_timestamp("ts")).alias("t_hi"),
    )
    path = _tmpdir_for(sf_dir, "events_zorder", "events")
    if not _written(path):
        scale = lambda c, lo, hi: (  # noqa: E731
            (c - F.col(lo)) * F.lit(65535) / F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        ).cast("long")
        keyed = e.crossJoin(F.broadcast(rng)).withColumn(
            "z",
            _morton16(
                scale(F.col("user_id"), "u_lo", "u_hi"),
                scale(F.unix_timestamp("ts"), "t_lo", "t_hi"),
            ),
        )
        (
            keyed.drop("u_lo", "u_hi", "t_lo", "t_hi")
            .repartitionByRange(16, "z")
            .sortWithinPartitions("z")
            .write.mode("overwrite")
            .parquet(path)
        )
    back = spark.read.parquet(path).filter(
        F.col("user_id").between(40, 80)
        & (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-14").cast("timestamp"))
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


@query(
    "q_scan_corrupt_tolerant",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
)
def q_scan_corrupt_tolerant(spark, sf_dir):
    """Corrupt-file-tolerant scan: a directory holding the real data plus
    one truncated/garbage ``.parquet`` member — at 100 TB some files WILL
    be bad (partial uploads, bitrot), and one of them must not kill a
    million-task job. ``ignoreCorruptFiles=true`` (per-read option, not a
    session-wide conf — only this scan opts in) drops unreadable files and
    footer-validates the rest; the result is exactly the healthy files'
    rows, which hash-checks against the source table. The write is split
    in two so tolerance is provably per-file, not all-or-nothing."""
    n = load(spark, sf_dir, "nation")
    path = _tmpdir_for(sf_dir, "nation_with_corrupt", "nation")
    marker = os.path.join(path, "_LAYOUT_DONE")
    if not os.path.exists(marker):
        n.filter(F.col("n_nationkey") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/good1")
        n.filter(F.col("n_nationkey") % 2 == 1).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/good2")
        with open(os.path.join(path, "good1", "part-corrupt.parquet"), "wb") as fh:
            fh.write(b"PAR1 this is not a real parquet footer")
        with open(marker, "w") as fh:
            fh.write("ok")
    back = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(f"{path}/good1", f"{path}/good2")
    )
    return back.select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_sink_compact",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty,
       round(l_extendedprice, 2) AS price
FROM lineitem
""",
)
def q_sink_compact(spark, sf_dir):
    """Small-file compaction — the lakehouse maintenance job every
    streaming/append pipeline needs: a table fragmented into many tiny
    files (here a derived 32-way split of lineitem) is rewritten into
    size-targeted files. The output file count is derived from the INPUT
    FOOTERS (sum of file bytes / target), not hardcoded, and the rewrite
    uses ``coalesce`` — a narrow dependency that merges splits inside the
    scan stage with NO shuffle, which is the correct compaction plan at
    any scale (repartition would shuffle the whole table to fix a layout
    problem). Read-back rows hash-check against the source; the file-count
    reduction is asserted in tests."""
    import glob as _glob

    import pyarrow.parquet as _pq

    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    li = load(spark, sf_dir, "lineitem").select(*cols)
    frag = _tmpdir_for(sf_dir, "lineitem_fragmented", "lineitem")
    if not _written(frag):
        li.repartition(32).write.mode("overwrite").parquet(frag)
    compacted = _tmpdir_for(sf_dir, "lineitem_compacted", "lineitem")
    # Gate reuse on an EXPLICIT post-validation marker, not Spark's
    # _SUCCESS: save() publishes _SUCCESS before the asserts below run, so
    # a failed assert would raise exactly once and every later invocation
    # would silently serve the data the assert rejected (the sticky-wrong
    # class this file's loud-failure contract forbids).
    compact_ok = os.path.join(compacted, "_COMPACT_VALIDATED")
    if not os.path.exists(compact_ok):
        in_files = _glob.glob(f"{frag}/*.parquet")
        total = sum(os.path.getsize(f) for f in in_files)
        target = 4 << 20  # 4 MiB files at fixture scale; TUNE at real scale
        n_out = max(1, -(-total // target))
        spark.read.parquet(frag).coalesce(n_out).write.mode("overwrite").parquet(compacted)
        n_in, n_out_actual = len(in_files), len(_glob.glob(f"{compacted}/*.parquet"))
        # strict reduction only when there is fragmentation to fix: an
        # EMPTY/1-file input (r7 empty-input sweep) compacts to itself
        assert n_out_actual < n_in or n_in <= 1, (n_out_actual, n_in)
        # row-group sanity: compaction must not have re-sorted or dropped
        assert sum(
            _pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(f"{compacted}/*.parquet")
        ) == sum(_pq.ParquetFile(f).metadata.num_rows for f in in_files)
        with open(compact_ok, "w") as fh:
            fh.write("ok")
    back = spark.read.parquet(compacted)
    return back.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
        F.round("l_extendedprice", 2).alias("price"),
    )


class _DumpStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the fixed entity list: offsets are
    line indices, each micro-batch advances by at most two lines — a finite,
    deterministic stand-in for a dump-tail/changes-feed source. NOTE: the
    simple-reader API has no latestOffset(); the engine derives the latest
    offset from read()'s returned end (verified in pyspark 4.1.2's
    _SimpleStreamReaderWrapper), which is why availableNow drains one
    batch per run and the query loops runs over one checkpoint."""

    BATCH = 2

    def initialOffset(self):
        return {"idx": 0}

    def read(self, start):
        # each planned micro-batch advances at most BATCH lines, so the
        # 4-entity fixture takes >=2 batches — offset persistence and the
        # batch loop are genuinely exercised, not one big gulp
        end = {"idx": min(start["idx"] + self.BATCH, len(_DUMP_ENTITIES))}
        rows = [
            (i, _DUMP_ENTITIES[i]) for i in range(start["idx"], end["idx"])
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        return iter(
            (i, _DUMP_ENTITIES[i]) for i in range(start["idx"], end["idx"])
        )

    def commit(self, end):
        pass  # nothing external to clean up for an in-memory source


class WikidataDumpStreamSource(DataSource):
    """Streaming half of the from-scratch connector surface (S10's
    readStream twin): a Python DataSource with a simpleStreamReader whose
    JSON offsets Spark persists in the checkpoint log — restart-safe
    resume comes from the engine, the source only maps offset ranges to
    rows (the changes-feed/dump-tail shape)."""

    @classmethod
    def name(cls):
        return "wikidata_dump_stream"

    def schema(self):
        return "line_no BIGINT, entity_json STRING"

    def simpleStreamReader(self, schema):
        return _DumpStreamReader()


@query(
    "q_custom_stream_source",
    oracle="""
SELECT type, count(*) AS n FROM (VALUES
  ('item'), ('item'), ('property'), ('item')
) t(type)
GROUP BY type
""",
)
def q_custom_stream_source(spark, sf_dir):
    """Custom Python STREAMING source end-to-end, with RESTART-RESUME
    proven: each availableNow run drains one 2-line micro-batch (observed:
    the engine adopts read()'s returned end as caught-up for a simple
    reader), so the 4 fixture entities need MULTIPLE runs over the SAME
    checkpoint — run N+1 resumes from the offset run N committed, which is
    exactly the engine-persisted-offset contract a changes-feed source
    relies on. Parsed rows land in an append parquet sink; the final batch
    aggregate over all runs hash-checks against the static truth."""
    spark.dataSource.register(WikidataDumpStreamSource)  # re-register = overwrite
    # Keyed on the ACTUAL source — the in-code _DUMP_ENTITIES list — not a
    # fixture table: editing the entity list (with its oracle) must
    # invalidate the drained parquet + checkpoint, and regenerating an
    # unrelated fixture must NOT force a pointless re-drain.
    import hashlib as _hashlib

    src_stamp = _hashlib.md5("\n".join(_DUMP_ENTITIES).encode()).hexdigest()[:10]
    out = _tmpdir(sf_dir, f"custom_stream-{src_stamp}")
    done = os.path.join(out, "_STREAM_COMPLETE")
    if not os.path.exists(done):
        total = len(_DUMP_ENTITIES)
        for _ in range(total + 2):  # bound: one run per batch + slack
            s = spark.readStream.format("wikidata_dump_stream").load()
            parsed = s.select(
                "line_no",
                F.get_json_object("entity_json", "$.type").alias("type"),
            )
            q = (
                parsed.writeStream.format("parquet")
                .option("path", f"{out}/data")
                .option("checkpointLocation", f"{out}/_ckpt")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            from wikidata2pg_spark.streaming.harness import await_available_now

            await_available_now(q, 120, "q_custom_stream_source")
            got = spark.read.parquet(f"{out}/data").count()
            if got >= total:
                break
        # Publish the marker ONLY on the exact expected row count: a drain
        # loop that exhausted short (count < total) or double-applied a
        # batch (count > total) must raise NOW, not cache a wrong result
        # that every later invocation would silently serve (loud-failure
        # contract, same as the availableNow-timeout raise above).
        if got != total:
            raise RuntimeError(
                f"q_custom_stream_source drained {got} rows, expected {total}; "
                "not publishing completion marker"
            )
        with open(done, "w") as fh:
            fh.write("ok")
    back = spark.read.parquet(f"{out}/data")
    return back.groupBy("type").agg(F.count(F.lit(1)).alias("n"))
