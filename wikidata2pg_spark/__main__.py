"""The reference's UX [R]: a command-line dump→database import tool.

``python -m wikidata2pg_spark --dump latest-all.json.gz --jdbc-url <url>``
runs the full pipeline: clean dump lines → PERMISSIVE parse → keep latest
revision per id → flatten to normalized tables → batched JDBC bulk load,
then prints per-table row counts. This is the front door a user of the
reference ETL would reach for; every stage is the same code path the
K1–K12 contract keys exercise (wikidata/flatten.py).

Dump formats: plain ``.json``, ``.json.gz``, ``.json.bz2`` — Spark's text
reader picks the codec from the extension, and all three are splittable
or stream-decoded the same way the published dumps are consumed.

Database: any JDBC URL (driver class inferred for Postgres and Derby
URLs; override with --driver), and/or ``--pg-dsn`` for real PostgreSQL
over COPY — the bulk path that needs no JDBC driver jar at all
(sources/pg_copy.py; this sandbox has a PostgreSQL 15 server but no
PostgreSQL JDBC jar, so the JDBC tests run against embedded Derby while
test_pg_real.py drives the COPY path against real Postgres). Against
Postgres over JDBC the recommended extras are ``--jdbc-option
reWriteBatchedInserts=true`` (turns executeBatch into multi-row INSERTs
server-side).

Scale posture: the parse is one pass over the text scan (no shuffle until
latest_revisions' per-id window); each table write repartitions to
--load-partitions so the database sees that many concurrent batched
connections — the knob that matters on a real cluster import.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from wikidata2pg_spark.wikidata import flatten

# name -> flattener over the parsed-latest frame
TABLE_BUILDERS = {
    "wd_labels": flatten.labels_table,
    "wd_descriptions": flatten.descriptions_table,
    "wd_aliases": flatten.aliases_table,
    "wd_claims": flatten.claims_triples,
    "wd_truthy": lambda p: flatten.triples_from_statements(
        flatten.truthy_statements(p)
    ),
    "wd_qualifiers": flatten.qualifiers_table,
    "wd_references": flatten.references_table,
    "wd_sitelinks": flatten.sitelinks_table,
    "wd_edges": flatten.item_edges,
}
DEFAULT_TABLES = "wd_labels,wd_claims,wd_qualifiers,wd_sitelinks,wd_edges"


def _infer_driver(url: str | None) -> str | None:
    if url is None:
        return None
    if url.startswith("jdbc:postgresql:"):
        return "org.postgresql.Driver"
    if url.startswith("jdbc:derby:"):
        return "org.apache.derby.jdbc.EmbeddedDriver"
    return None


def run_import(
    spark: SparkSession,
    dump_path: str,
    jdbc_url: str | None,
    *,
    tables: list[str] | None = None,
    driver: str | None = None,
    batchsize: int = 5000,
    load_partitions: int = 8,
    truthy_only: bool = False,
    jdbc_options: dict[str, str] | None = None,
    parquet_dir: str | None = None,
    pg_dsn: str | None = None,
) -> dict[str, int]:
    """Import a dump file into the database and/or a parquet directory;
    returns {table: rows_loaded}.

    ``jdbc_url`` loads the normalized tables over JDBC (the reference's
    sink); ``parquet_dir`` writes each table as parquet under
    ``<dir>/<table>/`` instead — the lakehouse export path, where the
    same normalized tables become inputs for every other operator in
    this engine (and for any parquet consumer); ``pg_dsn`` bulk-loads
    each table into real PostgreSQL over COPY (sources/pg_copy.py) — the
    path to use when no PostgreSQL JDBC driver jar is on the classpath,
    and the faster path even when one is. Sinks compose; at least one is
    required.

    Idempotent: mode=overwrite per table, and latest_revisions collapses
    duplicate entity lines (re-running on an extended dump converges to
    the newest revision of each id — the reference's re-import story)."""
    if jdbc_url is None and parquet_dir is None and pg_dsn is None:
        raise ValueError("run_import needs jdbc_url, parquet_dir and/or pg_dsn")
    raw = spark.read.text(dump_path).withColumnRenamed("value", "line")
    parsed = flatten.latest_revisions(
        flatten.parse_entities(flatten.clean_dump_lines(raw))
    )
    props = {"batchsize": str(batchsize)}
    drv = driver or _infer_driver(jdbc_url)
    if drv:
        props["driver"] = drv
    props.update(jdbc_options or {})

    chosen = tables if tables is not None else DEFAULT_TABLES.split(",")
    counts: dict[str, int] = {}
    # Every table builder re-reads `parsed` — persist the parse ONCE so N
    # tables don't mean N full text-read→clean→parse executions of a
    # multi-GB dump (MEMORY_AND_DISK default: spills, never recomputes).
    # Validate ALL table names BEFORE the first overwrite: failing on the
    # 3rd name after dropping/rewriting the first two would leave the
    # target database partially re-imported.
    unknown = [n for n in chosen if n not in TABLE_BUILDERS]
    if unknown:
        raise SystemExit(
            f"unknown table(s) {unknown!r}; choose from {sorted(TABLE_BUILDERS)}"
        )
    parsed.persist()
    try:
        for name in chosen:
            if truthy_only and name == "wd_claims":
                df = TABLE_BUILDERS["wd_truthy"](parsed)
            else:
                df = TABLE_BUILDERS[name](parsed)
            out = df.repartition(load_partitions)
            # Dual-sink order: parquet FIRST, then feed the JDBC load from
            # the parquet read-back — one execution of the table plan total,
            # and the two sinks are row-identical by construction (vs. two
            # independent executions of an uncached plan).
            if parquet_dir is not None:
                out.write.mode("overwrite").parquet(f"{parquet_dir}/{name}")
                # Re-assert the requested JDBC concurrency: the read-back's
                # partitioning follows file-split packing, not
                # load_partitions (the knob that bounds concurrent DB
                # connections).
                out = spark.read.parquet(f"{parquet_dir}/{name}").repartition(
                    load_partitions
                )
            if jdbc_url is not None:
                out.write.jdbc(jdbc_url, name, mode="overwrite", properties=props)
            pg_count = None
            if pg_dsn is not None:
                import tempfile

                from wikidata2pg_spark.sources.pg_copy import (
                    ddl_for,
                    load_postgres_copy,
                )

                with tempfile.TemporaryDirectory(
                    prefix=f"w2pg_copy_{name}_"
                ) as wd:
                    pg_count = load_postgres_copy(
                        out, pg_dsn, name, ddl_for(out), wd
                    )
            # count from the sink actually written (read-back, not the plan)
            if jdbc_url is not None:
                counts[name] = spark.read.jdbc(
                    jdbc_url, name, properties=props
                ).count()
            elif pg_count is not None:
                counts[name] = pg_count
            else:
                counts[name] = spark.read.parquet(f"{parquet_dir}/{name}").count()
    finally:
        parsed.unpersist()
    return counts


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m wikidata2pg_spark",
        description="Import a Wikidata JSON dump into a database over JDBC.",
    )
    ap.add_argument("--dump", required=True, help="dump file (.json/.json.gz/.json.bz2)")
    ap.add_argument("--jdbc-url", default=None, help="JDBC URL, e.g. jdbc:postgresql://host/db?user=u&password=p")
    ap.add_argument("--parquet-dir", default=None, help="write normalized tables as parquet under this directory instead of (or besides) JDBC")
    ap.add_argument("--pg-dsn", default=None, help="bulk-load into real PostgreSQL via COPY (libpq DSN/URI, e.g. postgresql://user@/db?host=/run/pg&port=5432) — no JDBC driver jar needed")
    ap.add_argument("--driver", default=None, help="JDBC driver class (inferred for postgresql/derby URLs)")
    ap.add_argument("--tables", default=DEFAULT_TABLES, help=f"comma list from {sorted(TABLE_BUILDERS)}")
    ap.add_argument("--batchsize", type=int, default=5000, help="JDBC batch size per executor connection")
    ap.add_argument("--load-partitions", type=int, default=8, help="concurrent JDBC connections per table write")
    ap.add_argument("--truthy-only", action="store_true", help="load truthy-filtered claims into wd_claims")
    ap.add_argument("--jdbc-option", action="append", default=[], metavar="K=V", help="extra JDBC option (repeatable), e.g. reWriteBatchedInserts=true")
    args = ap.parse_args(argv)
    if args.jdbc_url is None and args.parquet_dir is None and args.pg_dsn is None:
        raise SystemExit("one of --jdbc-url, --parquet-dir or --pg-dsn is required")

    extra = {}
    for kv in args.jdbc_option:
        k, _, v = kv.partition("=")
        if not _:
            raise SystemExit(f"--jdbc-option must be K=V, got {kv!r}")
        extra[k] = v

    from wikidata2pg_spark.session import get_session

    spark = get_session("wikidata2pg-import")
    counts = run_import(
        spark,
        args.dump,
        args.jdbc_url,
        tables=args.tables.split(","),
        driver=args.driver,
        batchsize=args.batchsize,
        load_partitions=args.load_partitions,
        truthy_only=args.truthy_only,
        jdbc_options=extra,
        parquet_dir=args.parquet_dir,
        pg_dsn=args.pg_dsn,
    )
    for name in counts:
        print(f"{name}\t{counts[name]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
