"""Simulate the driver's correctness pass exactly: a VANILLA SparkSession
(no builder confs — the driver sets none, so this also proves the
runtime-conf path via configure_session/load), entry() smoke, then the
first --window keys of queries() compared against oracle_sql() at sf0.01.

Usage:
    python tools/driver_sim.py [--window 50] [--sf /root/testdata/sf0.01]

This is the strongest pre-round assurance that CORRECTNESS_r{N} will be
green: the local mirror (wikidata2pg_spark.oracle) is stricter on values
but runs under get_session's tuned confs; THIS runs under the driver's.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "keys",
        nargs="*",
        help="explicit keys to check instead of the first --window of "
        "queries() — e.g. the deferred backlog, so future windows are "
        "proven under the driver's exact session/canonicalization "
        "BEFORE their round (VERDICT r6 task 8)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as M

    t0 = time.time()
    assert len(M.entry(spark).collect()) > 0, "entry() returned no rows"
    qs, osql = M.queries(), M.oracle_sql()
    assert set(osql) <= set(qs)

    from wikidata2pg_spark.oracle import compare, duck_connection

    con = duck_connection(args.sf)
    fails: list[tuple[str, str]] = []
    targets = args.keys if args.keys else list(qs)[: args.window]
    for k in targets:
        try:
            df = qs[k](spark, args.sf)
            if k in osql:
                errs = compare(k, df, con, osql[k])
                if errs:
                    fails.append((k, errs[0][:300]))
                else:
                    print(f"ok   {k}", flush=True)
            else:
                print(f"rows {k} {df.count()}", flush=True)
        except Exception as e:  # noqa: BLE001
            fails.append((k, f"EXCEPTION {type(e).__name__}: {e}"))
    for k, e in fails:
        print(f"FAIL {k}\n     {e}")
    print(f"-- window={len(targets)}, {len(fails)} failed, {time.time()-t0:.1f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
