"""r11 tumbling_1h residual A/B at 10x/30x (VERDICT r10 task 5): the
row's raw ratio vs the DuckDB twin (~7) is attributed to the per-row
hash-agg constant (PLANS.md r7 decomposition). Re-test the two §5/§2
levers VERDICT named — shuffle right-sizing (partitions / AQE advisory
size) — plus a two-level pre-aggregation variant, under the bench scaled
posture, and record the decomposition controls so the residual
attribution is measured, not assumed.

Variants (identical result rows, proven before timing):
  current      committed epoch-truncation groupBy (32 shuffle parts, AQE)
  parts8 / parts64    shuffle.partitions right-sizing
  advisory1m   AQE advisoryPartitionSizeInBytes=1m (default 64m)
  twolevel     explicit two-level agg: partial by (hour, event_type,
               pmod(xxhash64(ts), 64)) then final — tests whether a
               salted pre-agg beats the single hash-agg's partial pass
Controls (decomposition, not candidates):
  ctl_scan     scan + project ts,event_type,value only (no agg)
  ctl_5group   groupBy(event_type) only (5 groups, same input)

Usage: python tools/r11_tumbling_ab.py [--reps 5] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--factor", type=int, default=10)
    a = ap.parse_args()

    os.environ["SPARK_GRAFT_SCALE_FACTOR"] = str(a.factor)
    import bench
    from wikidata2pg_spark.flagship import batch_tumbling
    from wikidata2pg_spark.session import get_session
    from wikidata2pg_spark.tables import load

    sdir, srows = bench.scaled_dir()
    print(f"scaled dir {sdir} events_rows={srows.get('events')}", flush=True)
    spark = get_session("r11-tumbling-ab")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    spark.conf.set("spark.sql.files.openCostInBytes", "256k")

    cur = batch_tumbling(spark, sdir)

    e = load(spark, sdir, "events")
    hour_us = F.lit(3_600_000_000)
    ws = F.timestamp_micros(
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("ts")) % hour_us
    )
    partial = (
        e.filter(F.col("ts").isNotNull())
        .groupBy(
            ws.alias("window_start"),
            "event_type",
            F.pmod(F.xxhash64("ts"), F.lit(64)).alias("_salt"),
        )
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv"))
    )
    twolevel = (
        partial.groupBy("window_start", "event_type")
        .agg(F.sum("pn").alias("n"), F.round(F.sum("pv"), 2).alias("sum_value"))
        .select(
            "window_start",
            (F.col("window_start") + F.expr("INTERVAL 1 HOUR")).alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )

    ctl_scan = e.select("ts", "event_type", "value")
    ctl_5group = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
    )

    variants = {
        "current": (cur, {}),
        "parts8": (cur, {"spark.sql.shuffle.partitions": "8"}),
        "parts64": (cur, {"spark.sql.shuffle.partitions": "64"}),
        "advisory1m": (cur, {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m"}),
        "twolevel": (twolevel, {}),
        "ctl_scan": (ctl_scan, {}),
        "ctl_5group": (ctl_5group, {}),
    }

    base_rows = sorted(map(tuple, cur.collect()))
    ok = sorted(map(tuple, twolevel.collect())) == base_rows
    print(f"twolevel\trows_equal={ok}", flush=True)

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for rep in range(a.reps + 1):
        for name, (df, confs) in variants.items():
            saved = {k: spark.conf.get(k) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
            spark.sparkContext.setJobDescription(f"tumbling-ab {name} rep{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            for k, v in saved.items():
                spark.conf.set(k, v)
            if rep > 0:
                samples[name].append(dt)
    for name, xs in samples.items():
        print(f"{name}\tmedian={statistics.median(xs):.4f}s\tall={[round(x,4) for x in xs]}", flush=True)

    duck = bench._duck_times(sdir, {"tumbling": bench._FLAGSHIP_TWIN_SQL["tumbling_1h"]})
    print(f"duckdb_4t_ms={duck['tumbling']}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
