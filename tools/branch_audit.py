"""Branch-liveness sweep over every registered key (the r7 audit class
as a standing gate; rules + allowlist in
wikidata2pg_spark/branch_audit.py): flag categorical output columns
showing a single state, and empty results, at the driver's correctness
scale — a green hash over a dead branch attests nothing.

Usage:
    python tools/branch_audit.py [--sf /root/testdata/sf0.01] [keys...]

Exit 0 in steady state (all flags allowlisted with their covering
probes named); nonzero on a NEW flag or a key error. Run at sf0.01 —
the driver's scale, which is where "dead on the attested data" is the
meaningful statement.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from wikidata2pg_spark.branch_audit import run_audit
    from wikidata2pg_spark.session import get_session

    spark = get_session()
    t0 = time.time()
    violations, allowlisted, errors = run_audit(spark, args.sf, args.keys or None)
    for k, c in allowlisted:
        print(f"allow {k} | {c}")
    for k, c in violations:
        print(f"VIOLATION {k} | {c}")
    for k, e in errors:
        print(f"ERROR {k} | {e}")
    n = len(violations) + len(errors)
    print(f"-- {len(allowlisted)} allowlisted, {len(violations)} violations, "
          f"{len(errors)} errors, {time.time() - t0:.1f}s")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
