"""r10 optimization survey: capture explain("formatted") for every
registered key and summarize plan shape — Exchange count, join strategies,
Python-eval nodes, scan pushdown — into a TSV. Evidence base for
OPTIMIZATION_r10.md's per-operator checklist (guide §1: measure first).

Usage:
    python tools/opt_survey.py [--sf DIR] [--out DIR] [keys...]

Writes <out>/<key>.txt (formatted plan) and <out>/summary.tsv. Read-only
with respect to the engine: no query code is touched; side-effectful keys
do their setup work at the given SF (default sf0.001, the cheap one).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_JOIN_NODES = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
)
_PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
             "MapInPandas", "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas")


def summarize(plan: str) -> dict:
    # \bExchange\b never matches inside the CamelCase Reused/Broadcast
    # variants (no word boundary there), so count standalone Exchange
    # tokens directly — the old subtraction removed counts that were
    # never included and went negative (r10 review catch).
    n_exchange = len(re.findall(r"(?<![A-Za-z])Exchange\b", plan))
    n_bcast = plan.count("BroadcastExchange")
    joins = sorted({j for j in _JOIN_NODES if j in plan})
    py = sorted({p for p in _PY_NODES if p in plan})
    n_scan = plan.count("Scan parquet") + plan.count("FileScan parquet")
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    # formatted mode prints every node exactly once as a "(N) Sort"
    # detail header — counting tree lines too double-counted nested
    # sorts (r10 review catch)
    sorts = len(re.findall(r"\(\d+\) Sort\b", plan))
    single = plan.count("Exchange SinglePartition")
    expand = plan.count("Expand")
    window = plan.count("Window")
    return {
        "exchanges": n_exchange, "broadcasts": n_bcast, "single_part": single,
        "scans": n_scan, "pushed_scan_filters": pushed, "sorts": sorts,
        "expand": expand, "window": window,
        "joins": "+".join(joins) or "-", "python": "+".join(py) or "-",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/opt_survey")
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from wikidata2pg_spark.registry import all_queries
    from wikidata2pg_spark.session import get_session

    spark = get_session("opt-survey")
    qs = all_queries()
    keys = args.keys or list(qs)
    cols = ["key", "exchanges", "broadcasts", "single_part", "scans",
            "pushed_scan_filters", "sorts", "expand", "window", "joins",
            "python", "error"]
    rows = []
    t0 = time.time()
    for i, k in enumerate(keys):
        try:
            from wikidata2pg_spark.plan_audit import formatted_plan

            df = qs[k](spark, args.sf)
            plan = formatted_plan(df)
            with open(os.path.join(args.out, f"{k}.txt"), "w") as fh:
                fh.write(plan)
            s = summarize(plan)
            s["key"], s["error"] = k, ""
        except Exception as e:  # noqa: BLE001
            s = {c: "" for c in cols}
            s["key"], s["error"] = k, f"{type(e).__name__}: {e}"[:200]
        rows.append(s)
        if (i + 1) % 50 == 0:
            print(f"  {i+1}/{len(keys)} plans, {time.time()-t0:.0f}s", flush=True)
    with open(os.path.join(args.out, "summary.tsv"), "w") as fh:
        fh.write("\t".join(cols) + "\n")
        for s in rows:
            fh.write("\t".join(str(s.get(c, "")) for c in cols) + "\n")
    errs = [s for s in rows if s["error"]]
    print(f"{len(rows)} keys, {len(errs)} errors, {time.time()-t0:.0f}s -> {args.out}/summary.tsv")
    for s in errs:
        print(f"ERR {s['key']}: {s['error']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
