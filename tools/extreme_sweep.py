"""Extreme-magnitude sweep — born exploratory in round 8, PROMOTED to
the fourth standing degenerate-sweep gate in round 9 once its overflow
catalog emptied (pytest twin: tests/test_degenerate_sweep.py::
test_extreme_magnitude_sweep, which imports build_extreme_dir from
here; this CLI remains a convenience runner and always exits 0).

Scales every measure column of the all-constant degenerate fixture by
9e11 (constant 100.0 -> 9e13), chosen so the derived integer cents
(~9e15) stay under 2^53 — double-exact and engine-identical — while any
UNWIDENED product of two cents-scale integers overflows int64. This
probes the decimal(38,0)/HUGEINT widening discipline across all 365
keys at once.

First run (r8 close, all-constant base): 0 value mismatches; 13 keys
CRASHED — per-row squared-cents moment trees that overflow int64 when a
single value reaches ~3e9 cents ($30M). SEVEN were widened the same
session (all either in the r8 window or swapped in, so their driver
rows land on the hardened code): q_agg_stats, q_agg_regression (shared
moment block), q_agg_corr_matrix, q_ab_delta_method, q_agg_welch_ttest,
q_agg_ols2, q_time_volatility — fix shape: multiply wide
(decimal(38,0) Spark-side, one operand CAST AS HUGEINT in the oracle)
instead of long, exact integers so hashes on real data are unchanged
(proven: mirror both SFs, division probes, worked examples, all three
degenerate sweep variants, driver_sim window — all green post-patch).
The remaining SIX were widened in the r9 window (q_time_twa,
q_time_anomaly, q_agg_hhi, q_agg_anova_eta, q_agg_argminmax with the
same recipe; q_agg_skewkurt needed more — its raw 3rd/4th-power sums
overflow even decimal(38,0)/HUGEINT past ~1.8e9 cents, so its moments
are now taken about the per-group MIN, translation-invariant and
bounded by the value RANGE instead of magnitude). CATALOG NOW EMPTY
except the one documented residual (never try_multiply when fixing
future finds — silent NULLs hide real corruption):
  q_ab_delta_method's RESIDUAL display-level mismatch: its 6dp
  floor(x*1e6+0.5) display clamps at |x| >= ~9.2e12 (the r6 LONG-floor
  class — Spark floor saturates to long max while DuckDB's stays
  DOUBLE); aggregation is hardened, only the displayed rounding clamps,
  and real ratio ranges sit ~6 orders below the boundary.
This is NOT the corpus-size overflow class (already closed with
decimal38/HUGEINT sums — counts grow with data, per-row values don't):
fixture and TPC-H value ranges are orders of magnitude below the
boundary, so no driver row is at risk.

Usage:
    python tools/extreme_sweep.py        # prints the catalog, exit 0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = 9e11
TARGETS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice"],
    "events": ["value"],
}


def build_extreme_dir(root: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wikidata2pg_spark.degenerate_audit import build_degenerate_dir

    full = build_degenerate_dir(os.path.join(root, "_schema_src"))
    os.makedirs(root, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = pq.read_table(os.path.join(full, f"{t}.parquet"))
        cols = {}
        for name in src.column_names:
            col = src[name]
            if name in TARGETS.get(t, ()):
                vals = [None if v is None else v * SCALE for v in col.to_pylist()]
                col = pa.array(vals, col.type)
            cols[name] = col
        pq.write_table(pa.table(cols), os.path.join(root, f"{t}.parquet"))
    return root


def main() -> int:
    from wikidata2pg_spark.degenerate_audit import run_sweep
    from wikidata2pg_spark.session import get_session

    root = build_extreme_dir("/tmp/wikidata2pg_spark/extreme_fixture")
    spark = get_session("extreme-sweep")
    se, de, mm = run_sweep(spark, root)
    for label, items in (("spark-crash", se), ("duck-crash", de), ("mismatch", mm)):
        for k, msg in items:
            print(f"{label} {k}: {msg[:160]}")
    print(f"-- extreme sweep: {len(se)} spark / {len(de)} duck / {len(mm)} mismatch")
    # standing gate (r10, aligned with the sibling sweep CLIs): exit 1
    # on any error or any mismatch BEYOND the documented
    # q_ab_delta_method display-level clamp (the pytest twin's rule)
    unexpected_mm = [k for k, _ in mm if k != "q_ab_delta_method"]
    return 1 if (se or de or unexpected_mm) else 0


if __name__ == "__main__":
    sys.exit(main())
