"""Time individual registry keys: plan-build seconds (queries()[k] call,
which includes any eager localCheckpoint passes) and execution seconds
via the noop sink (guide §1.4), job-labeled (§1.5). Median of --reps.

Usage: python tools/opt_time_keys.py [--sf DIR] [--reps N] key [key...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("keys", nargs="+")
    a = ap.parse_args()

    from wikidata2pg_spark import all_queries
    from wikidata2pg_spark.session import get_session

    spark = get_session("opt-time-keys")
    qs = all_queries()
    for k in a.keys:
        if k not in qs:
            print(f"{k}\tUNKNOWN")
            continue
        builds, execs = [], []
        for _ in range(a.reps):
            t0 = time.monotonic()
            df = qs[k](spark, a.sf)
            t1 = time.monotonic()
            spark.sparkContext.setJobDescription(f"opt-time {k}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            t2 = time.monotonic()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{k}\tbuild={statistics.median(builds):.3f}s"
            f"\texec={statistics.median(execs):.3f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
