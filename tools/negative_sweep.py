"""Negative-measures sweep — STANDING GATE since r10 (pytest twin:
tests/test_degenerate_sweep.py::test_negative_measure_sweep; this CLI
is the convenience runner).

Negates every measure column of the REAL sf0.001 fixture (refund-shaped
values — negative money/value rows a real 100 TB corpus will contain)
and runs the full engine-vs-oracle sweep over all registered keys. The
extreme-magnitude sweep's sibling: that one probes magnitude overflow,
this one probes sign assumptions.

Catalog: EMPTY (steady state 0 crashes / 0 mismatches). History — the
first run (r9 close) found 3 crashes / 0 value mismatches, all fixed:
  * q_dq_benford — leading-digit substr hit the '-' sign; digits now
    read from abs(cents) on both sides (Benford is defined over the
    magnitude's leading significant digit). Fixed in-window r9.
  * q_agg_log_histogram — Spark's two's-complement bin() bucketed
    negatives at 63 while DuckDB's signed printf('%b') crashed the
    1<<63 shift; non-positive values now take the DDSketch convention
    of a dedicated bucket -1 with NULL bounds on both sides. Fixed
    in-window r9.
  * q_fn_math (DuckDB crash: "cannot take logarithm of a negative
    number") — the F4 contract key's sqrt/ln/log10 columns assumed a
    positive measure; ANSI Spark NULLs where DuckDB throws. Fixed
    tier-A in r10: positive-domain CASE guards on BOTH sides (NULL for
    non-positive input), never abs() — a silently-rewritten magnitude
    hides the sign error the audit exists to surface.

Usage:
    python tools/negative_sweep.py   # exit 0 clean, 1 on any finding
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
TARGETS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice"],
    "events": ["value"],
}


def build_negated_dir(root: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        tb = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        cols = {}
        for name in tb.column_names:
            col = tb[name]
            if name in TARGETS.get(t, ()):
                vals = [None if v is None else -v for v in col.to_pylist()]
                col = pa.array(vals, col.type)
            cols[name] = col
        pq.write_table(pa.table(cols), os.path.join(root, f"{t}.parquet"))
    return root


def main() -> int:
    from wikidata2pg_spark.degenerate_audit import run_sweep
    from wikidata2pg_spark.session import get_session

    root = build_negated_dir("/tmp/wikidata2pg_spark/neg_fixture")
    spark = get_session("negative-sweep")
    se, de, mm = run_sweep(spark, root)
    for label, items in (("spark-crash", se), ("duck-crash", de), ("mismatch", mm)):
        for k, msg in items:
            print(f"{label} {k}: {msg[:200]}")
    print(f"-- negative sweep: {len(se)} spark / {len(de)} duck / {len(mm)} mismatch")
    # standing gate (r10): a hand-run regression must fail the shell too
    return 1 if (se or de or mm) else 0


if __name__ == "__main__":
    sys.exit(main())
