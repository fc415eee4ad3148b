"""Local mirror of the driver's t2 correctness gate.

Runs ``queries()[k](spark, sf_dir)`` and ``oracle_sql()[k]`` (DuckDB views
over the same parquet), then compares row count, column-name set, and an
order-insensitive canonical value comparison. Stricter than the driver can
possibly be on values (exact equality after canonicalization), so passing
here should imply passing t2.

Also usable as a CLI for fast iteration:
    python -m wikidata2pg_spark.oracle [--sf DIR] [key ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime, timezone
from typing import Any

import duckdb

from wikidata2pg_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    import os

    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")  # match the Spark session timezone
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # directory-style table (multi-file layout, e.g. the
            # partition-invariance harness or any Spark-written table)
            path = f"{path}/*.parquet"
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v: Any) -> Any:
    """Canonicalize a cell so Spark and DuckDB representations compare equal."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # NO -0.0 normalization: the driver's value hash distinguishes
        # signed zeros, and canonicalizing them away made the mirror green
        # where the r5 driver was red (q_agg_stats, VERDICT r5 #1 /
        # ADVICE r5). repr() keeps the sign, so the mirror now reproduces
        # the driver's sensitivity; keys must be sign-safe themselves
        # (floor2 pattern) rather than rely on lenient comparison.
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        # Convert tz-aware values to UTC BEFORE dropping tzinfo: a bare
        # replace() would keep the local wall time (2024-01-01 05:00+05:00
        # must canonicalize as 00:00, not 05:00). Sessions pin UTC so this
        # is normally a no-op, but TIMESTAMPTZ results / non-UTC boxes
        # would silently mis-canonicalize without it.
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc)
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return ("m",) + tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return ("by", v)
    if isinstance(v, str):
        return ("s", v)
    # Decimal, numpy scalars, etc.
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon(v.item())
    except Exception:
        pass
    return ("o", str(v))


def _rows_canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _count_negzero(canon_rows: list[tuple]) -> int:
    """Count -0.0 float cells in canonicalized rows (recursing into
    arrays/maps — _canon encodes every float as ('f', repr(v)))."""
    n = 0
    stack: list[Any] = list(canon_rows)
    while stack:
        v = stack.pop()
        if isinstance(v, tuple):
            if len(v) == 2 and v[0] == "f" and v[1] == "-0.0":
                n += 1
            else:
                stack.extend(v)
    return n


# DuckDB result types the driver's value hash renders UNLIKE the Spark
# column they mirror, while fetchall() coerces them to the same Python
# value the Spark side produces — i.e. the classes this mirror is
# structurally blind to without a type gate (r7: three oracles left a
# windowed sum(BIGINT) uncast, DuckDB promoted to HUGEINT, the mirror
# passed on coerced ints, the driver hashed red). Width-only differences
# (INTEGER vs BIGINT) are proven safe by attested rows (q_win_ntile r6);
# these are not — with one more proven-safe class: UBIGINT hash-passed
# the r3 driver (q_wd_parse_entity / q_wd_sitelinks carried
# json_array_length's UBIGINT in their attested results), so only
#   HUGEINT/UHUGEINT (sum promotion — the proven-red r7 class),
#   DECIMAL (Python Decimal), FLOAT (float32 repr drift)
# remain flagged.
_DUCK_TYPE_HAZARDS = ("HUGEINT", "DECIMAL", "FLOAT")


def duck_type_hazards(cols: list, types: list) -> list[str]:
    """Columns whose DuckDB type (recursively, via the type string — LIST/
    STRUCT elements included) contains a driver-hash hazard class."""
    out = []
    for c, t in zip(cols, types):
        ts = str(t).upper()
        hits = [h for h in _DUCK_TYPE_HAZARDS if h in ts]
        if hits:
            out.append(f"{c}: {ts}")
    return out


def spark_type_hazards(spark_df) -> list[str]:
    """Spark output columns whose type the driver renders unlike the
    plain int/float the oracle side produces (DecimalType is the only
    reachable class — no key should emit it)."""
    return [f"{c}: {t}" for c, t in spark_df.dtypes if "decimal" in t.lower()]


def compare(name: str, spark_df, con, sql: str, max_diff_show: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    d_rel = con.sql(sql)
    d_cols = list(d_rel.columns)
    d_rows = d_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    sc = _rows_canonical(s_cols, s_rows)
    dc = _rows_canonical(d_cols, d_rows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b]
        d_set, s_set = set(dc), set(sc)
        only_s = [r for r in sc if r not in d_set][:max_diff_show]
        only_d = [r for r in dc if r not in s_set][:max_diff_show]
        errors.append(
            f"{name}: values differ ({len(diffs)} aligned diffs); "
            f"spark-only sample={only_s}; duck-only sample={only_d}; "
            f"cols(sorted)={sorted(s_cols)}"
        )
    # Signed-zero hazard sweep (permanent gate, VERDICT r5 task 5): a hash
    # key must never emit -0.0 on EITHER side, even when both sides agree
    # today — which zero an engine produces for a tiny-negative rounded
    # value is version/summation-order dependent, and the driver's value
    # hash distinguishes the signs (the r5 q_agg_stats failure class).
    # Sign-safe keys use floor(x*100+0.5)/100, whose output is integral/100
    # and cannot be -0.0.
    nz_s, nz_d = _count_negzero(sc), _count_negzero(dc)
    if nz_s or nz_d:
        errors.append(
            f"{name}: HAZARD signed zero emitted (spark={nz_s} duck={nz_d} cells); "
            "use the floor2 pattern or a +0.0 guard on the producing expression"
        )
    # Driver-hash type gate (permanent, VERDICT r7 task 2): fetchall()
    # coerces HUGEINT→int / DECIMAL→Decimal, so value equality above says
    # nothing about the driver's TYPE-sensitive hash for those classes.
    # Cast the oracle column (usually `CAST(sum(...) AS BIGINT)`) rather
    # than loosening this gate.
    dt_bad = duck_type_hazards(d_cols, list(d_rel.types))
    if dt_bad:
        errors.append(
            f"{name}: HAZARD driver-divergent DuckDB result type(s) {dt_bad}; "
            "cast in the oracle SQL (the r7 uncast-windowed-sum class)"
        )
    st_bad = spark_type_hazards(spark_df)
    if st_bad:
        errors.append(
            f"{name}: HAZARD Spark decimal output column(s) {st_bad}; "
            "cast to bigint/double before returning"
        )
    return errors


def run_mirror(spark, sf_dir: str, keys: list[str] | None = None) -> dict[str, list[str]]:
    from wikidata2pg_spark.registry import all_oracles, all_queries

    qs = all_queries()
    os_ = all_oracles()
    con = duck_connection(sf_dir)
    results: dict[str, list[str]] = {}
    if keys:
        # A typo'd key must be an error, not a silent '0 queries, 0 failed'
        # success for a query that never executed.
        unknown = [k for k in keys if k not in qs]
        if unknown:
            raise SystemExit(f"unknown query key(s): {unknown}")
    for k, fn in qs.items():
        if keys and k not in keys:
            continue
        try:
            df = fn(spark, sf_dir)
            if k in os_:
                results[k] = compare(k, df, con, os_[k])
            else:
                df.count()  # rows-only key: prove it executes end-to-end
                results[k] = []
        except Exception as e:  # noqa: BLE001
            results[k] = [f"{k}: EXCEPTION {type(e).__name__}: {e}"]
    return results


def main() -> int:
    import argparse
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from wikidata2pg_spark.session import get_session

    spark = get_session("oracle-mirror")
    t0 = time.time()
    results = run_mirror(spark, args.sf, args.keys or None)
    n_fail = 0
    for k in sorted(results):
        errs = results[k]
        if errs:
            n_fail += 1
            print(f"FAIL {k}")
            for e in errs:
                print(f"     {e}")
        else:
            print(f"ok   {k}")
    print(f"-- {len(results)} queries, {n_fail} failed, {time.time()-t0:.1f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
