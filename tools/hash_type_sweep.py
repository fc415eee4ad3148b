"""Static driver-hash type sweep over every registered oracle (VERDICT r7
task 2 — the enabling fix for the r7 HUGEINT class).

Why: the mirror compares values via ``fetchall()``, which coerces DuckDB
HUGEINT to Python int — structurally blind to the driver's type-sensitive
value hash, which renders a HUGEINT cell unlike Spark's int64 even when
values are identical (r7: q_win_concurrency, q_text_vocab_growth,
q_sample_token_budget all mirror-green / driver-red). Empirically proven
SAFE width classes (attested green driver rows): INTEGER vs BIGINT
(q_win_ntile r6) and UBIGINT (q_wd_parse_entity / q_wd_sitelinks r3
carried json_array_length's UBIGINT in hash-green results), so only the
types ``fetchall`` renders blind AND the driver has no proven-safe
precedent for are hazards (the authoritative list is
oracle._DUCK_TYPE_HAZARDS):

  * HUGEINT / UHUGEINT — DuckDB's silent promotion of sum(BIGINT),
    the proven-red r7 class;
  * DECIMAL(p,s) — Python Decimal under Arrow, float-or-Decimal drift;
  * FLOAT — float32 repr drift vs Spark DoubleType.

This sweep needs NO Spark: ``con.sql(sql).types`` binds the query against
the sf0.01 views without executing it, so all 357 oracles check in
seconds. The dynamic twin lives in oracle.compare (always-on hazard gate
on both the mirror and driver_sim paths); the pytest twin is
tests/test_plan_audit.py::test_oracle_duck_types_driver_safe.

Usage:
    python tools/hash_type_sweep.py [--sf /root/testdata/sf0.01]

Exit 0 = no hazards (steady state).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from wikidata2pg_spark.oracle import duck_connection, duck_type_hazards
    from wikidata2pg_spark.registry import all_oracles

    con = duck_connection(args.sf)
    oracles = all_oracles()
    n_flag = 0
    for k, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            bad = duck_type_hazards(list(rel.columns), list(rel.types))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {k}: {type(e).__name__}: {e}")
            n_flag += 1
            continue
        if bad:
            n_flag += 1
            print(f"FLAG {k}: {bad}")
    print(f"-- {len(oracles)} oracles, {n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main())
