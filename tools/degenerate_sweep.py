"""Degenerate-input sweep over every registered key (fixture recipe +
runner in wikidata2pg_spark/degenerate_audit.py): run each Spark query
AND its DuckDB oracle on an all-constant minimal fixture — zero
variances, singular determinants, tied ranks, single categories, one
EVT block, a regular graph, identical embeddings — and fail on any
ENGINE EXCEPTION on either side. This is the dynamic form of the r7
degenerate-division audit: ANSI Spark throws on x/0.0 where DuckDB
yields NULL, and DuckDB's sqrt aborts on the tiny-negative double a
float variance tree produces at a true zero, so any unguarded
variance-shaped divisor in ANY key surfaces here as a crash instead of
waiting for real degenerate data.

Usage:
    python tools/degenerate_sweep.py [--dir /tmp/w2pg_degenerate] [keys...]

Exit 0 only in the exact-parity steady state: engine errors AND value
mismatches both fail (matching the pytest twin). Documented engine-level
divergences and loud preconditions are allowlisted with reasons in
degenerate_audit.py (EXPECTED_EMPTY_MISMATCH / EXPECTED_RAISE_EMPTY);
the signed-zero hazard class is never allowlistable, and stale allowlist
entries are themselves reported.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/w2pg_degenerate")
    ap.add_argument(
        "--empty", action="store_true",
        help="sweep the ZERO-ROW variant (ungrouped-aggregate row "
             "fabrication / empty-partition robustness) instead of the "
             "all-constant one",
    )
    ap.add_argument(
        "--nulls", action="store_true",
        help="sweep the NULL-injected-measure variant (every 3rd measure "
             "value NULL): crash gate plus exact parity, like the other "
             "variants. The NULL-ordering class this surfaced (Spark ASC "
             "NULLS FIRST vs DuckDB NULLS LAST in rankings over nullable "
             "measures) was closed in r7 — rankings spell NULLS LAST on "
             "both sides, statistics exclude NULL measures on both sides",
    )
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from wikidata2pg_spark.degenerate_audit import (
        EXPECTED_EMPTY_MISMATCH,
        EXPECTED_RAISE_EMPTY,
        build_degenerate_dir,
        build_empty_dir,
        run_sweep,
    )
    from wikidata2pg_spark.session import get_session

    if args.empty:
        sf_dir = build_empty_dir(args.dir + "_empty")
        expected_raise, expected_mismatch = EXPECTED_RAISE_EMPTY, EXPECTED_EMPTY_MISMATCH
    elif args.nulls:
        from wikidata2pg_spark.degenerate_audit import build_nulls_dir

        sf_dir = build_nulls_dir(args.dir + "_nulls")
        expected_raise = expected_mismatch = None
    else:
        sf_dir = build_degenerate_dir(args.dir)
        expected_raise = expected_mismatch = None
    spark = get_session()
    t0 = time.time()
    spark_errors, duck_errors, mismatches = run_sweep(
        spark, sf_dir, args.keys or None,
        expected_raise=expected_raise, expected_mismatch=expected_mismatch,
    )
    for k, m in spark_errors:
        print(f"SPARK-ERROR {k} | {m}")
    for k, m in duck_errors:
        print(f"DUCK-ERROR {k} | {m}")
    for k, m in mismatches:
        print(f"mismatch {k} | {m}")
    n = len(spark_errors) + len(duck_errors) + len(mismatches)
    print(f"-- {len(spark_errors) + len(duck_errors)} engine errors "
          f"({len(spark_errors)} spark / {len(duck_errors)} duck), "
          f"{len(mismatches)} mismatches, {time.time() - t0:.1f}s")
    # mismatches fail too: the steady state is exact parity (the pytest
    # twin already enforces this — tool and twin must agree)
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
