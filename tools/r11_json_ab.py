"""r11 json_events_agg A/B at 10x (VERDICT r10 task 4): one more honest
attempt at beating get_json_object for the single-path "JSON extract +
agg" row, measured where the parse constant dominates (the bench scaled
posture: AQE on, 32 shuffle partitions, 2 MB splits). Candidates must be
real JSON parsers (the regexp row is a decomposition control only, per
the r9 honesty rule) and must produce IDENTICAL agg rows.

Variants:
  current      get_json_object($.k) + try_cast  (committed, r9-measured)
  from_json_pr from_json(props, 'k BIGINT') pruned schema,
               spark.sql.json.enablePartialResults left at default
  from_json_np same, enablePartialResults=false
  variant_get  parse_json + try_variant_get (Spark 4 variant type)
  ctl_regexp   regexp_extract (control: not a JSON parser)
  ctl_noparse  length(props) (control: pipeline shape without the parse)

Usage: python tools/r11_json_ab.py [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def agg_over(narrow, kcol):
    return (
        narrow.select("event_type", kcol.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    import bench
    from wikidata2pg_spark.session import get_session
    from wikidata2pg_spark.tables import load, spread_if_few_splits

    sdir, srows = bench.scaled_dir()
    print(f"scaled dir {sdir} events_rows={srows.get('events')}", flush=True)
    spark = get_session("r11-json-ab")
    # bench scaled posture
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    spark.conf.set("spark.sql.files.openCostInBytes", "256k")

    e = load(spark, sdir, "events")
    narrow = spread_if_few_splits(e.select("event_type", "props"), sdir, "events")

    variants = {
        "current": (
            agg_over(narrow, F.get_json_object(F.col("props"), "$.k").try_cast("long")),
            None,
        ),
        "from_json_pr": (
            agg_over(narrow, F.from_json(F.col("props"), "k BIGINT")["k"]),
            None,
        ),
        "from_json_np": (
            agg_over(narrow, F.from_json(F.col("props"), "k BIGINT")["k"]),
            ("spark.sql.json.enablePartialResults", "false"),
        ),
        "variant_get": (
            agg_over(narrow, F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")),
            None,
        ),
        "ctl_regexp": (
            agg_over(narrow, F.regexp_extract(F.col("props"), r'"k"\s*:\s*(-?\d+)', 1).try_cast("long")),
            None,
        ),
        "ctl_noparse": (
            agg_over(narrow, F.length(F.col("props")).cast("long")),
            None,
        ),
    }

    base_rows = sorted(map(tuple, variants["current"][0].collect()))
    for name in ("from_json_pr", "from_json_np", "variant_get", "ctl_regexp"):
        df, conf = variants[name]
        if conf:
            spark.conf.set(*conf)
        ok = sorted(map(tuple, df.collect())) == base_rows
        if conf:
            spark.conf.unset(conf[0])
        print(f"{name}\trows_equal={ok}", flush=True)

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for rep in range(a.reps + 1):
        for name, (df, conf) in variants.items():
            if conf:
                spark.conf.set(*conf)
            spark.sparkContext.setJobDescription(f"json-ab {name} rep{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if conf:
                spark.conf.unset(conf[0])
            if rep > 0:
                samples[name].append(dt)
    for name, xs in samples.items():
        print(f"{name}\tmedian={statistics.median(xs):.4f}s\tall={[round(x,4) for x in xs]}", flush=True)

    # co-measured DuckDB twin on the same scaled data (ratio target <6 raw)
    duck = bench._duck_times(sdir, {"json": bench._FLAGSHIP_TWIN_SQL["json_events_agg"]})
    print(f"duckdb_4t_ms={duck['json']}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
