"""One-shot equivalence proof for the three r10 flagship rewrites.

Compares the rewritten pricing_summary / join3_top10 (ordered rows,
order-sensitive) and batch_tumbling (row-set) against their pre-rewrite
forms, built inline from the same tables, at sf0.001 and sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikidata2pg_spark.flagship import batch_tumbling, join3_top10, pricing_summary
from wikidata2pg_spark.session import get_session
from wikidata2pg_spark.tables import load


def old_q1(spark, sf):
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def old_join3(spark, sf):
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("orev")
    )
    return (
        per_order.join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("orev").alias("rev"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", F.round("rev", 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


def old_tumbling(spark, sf):
    e = load(spark, sf, "events")
    agg = e.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
        "sum_value",
    )


def main() -> int:
    spark = get_session("r10-equiv")
    rc = 0
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        new_rows = pricing_summary(spark, sf).collect()
        old_rows = old_q1(spark, sf).collect()
        ok = list(map(tuple, new_rows)) == list(map(tuple, old_rows))
        print(f"q1 ordered  @ {sf}: {'OK' if ok else 'MISMATCH'} ({len(new_rows)} rows)")
        rc |= 0 if ok else 1

        new_rows = join3_top10(spark, sf).collect()
        old_rows = old_join3(spark, sf).collect()
        ok = list(map(tuple, new_rows)) == list(map(tuple, old_rows))
        print(f"join3 top10 @ {sf}: {'OK' if ok else 'MISMATCH'} ({len(new_rows)} rows)")
        rc |= 0 if ok else 1

        new_rows = sorted(map(tuple, batch_tumbling(spark, sf).collect()))
        old_rows = sorted(map(tuple, old_tumbling(spark, sf).collect()))
        ok = new_rows == old_rows
        print(f"tumbling set@ {sf}: {'OK' if ok else 'MISMATCH'} ({len(new_rows)} rows)")
        rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
