"""Blanket static plan sweep over every registered key (VERDICT r6
task 5 — the skyline class as a static gate, extended in r7 to three
anti-pattern classes; see wikidata2pg_spark/plan_audit.py for the
rules): raw-input SinglePartition funnels, CartesianProduct pair
materialization, and row-Python (BatchEvalPython) evaluation outside
the contract-mandated key.

Usage:
    python tools/plan_sweep.py [--sf /root/testdata/sf0.001] [keys...]

Builds each key's DataFrame (side-effectful keys do their setup work —
run at sf0.001 to keep that cheap) and fails if any raw scan feeds an
``Exchange SinglePartition`` without a bounding operator in between.
Prints EVERY hit so the documented predicate-bounded exceptions stay
visible, but exits nonzero only on NON-allowlisted hits or errors (the
allowlist is shared with the pytest twin via
plan_audit.PREDICATE_BOUNDED_ALLOWLIST, so steady state is exit 0 and
a new violation is a visible exit-code regression).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from wikidata2pg_spark.plan_audit import (
        PREDICATE_BOUNDED_ALLOWLIST,
        ROW_PYTHON_ALLOWLIST,
        audit_key,
    )
    from wikidata2pg_spark.registry import all_queries

    allow = {
        "single_partition": PREDICATE_BOUNDED_ALLOWLIST,
        "row_python": ROW_PYTHON_ALLOWLIST,
        "cartesian": frozenset(),
    }
    from wikidata2pg_spark.session import get_session

    spark = get_session("plan-sweep")
    qs = all_queries()
    keys = args.keys or list(qs)
    t0 = time.time()
    hits: dict[str, list[str]] = {}
    errs: dict[str, str] = {}
    for k in keys:
        try:
            v = audit_key(spark, k, qs[k], args.sf)
        except Exception as e:  # noqa: BLE001
            errs[k] = f"{type(e).__name__}: {e}"
            print(f"ERR  {k}: {errs[k][:160]}", flush=True)
            continue
        bad = {g: lines for g, lines in v.items() if k not in allow.get(g, ())}
        allowed = {g: lines for g, lines in v.items() if k in allow.get(g, ())}
        for g, lines in allowed.items():
            print(f"ALLOW {k} [{g}]: {lines[0][:140]}", flush=True)
        if bad:
            hits[k] = [f"[{g}] {ln}" for g, lines in bad.items() for ln in lines]
            print(f"HIT  {k}: {hits[k][0][:160]}", flush=True)
        elif not allowed:
            print(f"ok   {k}", flush=True)
    print(
        f"-- {len(keys)} keys, {len(hits)} non-allowlisted hits, "
        f"{len(errs)} errors, {time.time() - t0:.1f}s"
    )
    for k, v in hits.items():
        print(f"HIT {k}")
        for line in v:
            print(f"    {line}")
    return 1 if (hits or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
