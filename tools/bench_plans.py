"""Capture explain("formatted") for every bench row under the bench's
primary posture (AQE off, 8 shuffle partitions, $SPARK_GRAFT_SF_DIR) —
the evidence files the optimization rounds commit as
plans/r<N>/<query>_<tag>.txt.

Usage: python tools/bench_plans.py <outdir> <tag>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, tag = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import bench_queries
    from wikidata2pg_spark.session import get_session

    spark = get_session("bench-plans")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    for name, fn in bench_queries().items():
        df = fn(spark, sf)
        from wikidata2pg_spark.plan_audit import formatted_plan

        plan = formatted_plan(df)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf}, AQE off, shuffle.partitions=8 ({tag})\n")
            fh.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
