"""Degenerate-input sweep: run every registered key — Spark query AND
DuckDB oracle — on a crafted all-constant minimal fixture and fail on
any ENGINE EXCEPTION. This is the dynamic generalization of the r7
degenerate-division audit: the grep-driven pass found 14 keys where a
variance-shaped divisor vanishes (ANSI Spark throws on x/0.0 where
DuckDB yields NULL) or a float variance's true zero rounds tiny-negative
(DuckDB's sqrt aborts where Spark yields NaN). Instead of trusting the
grep, this sweep CONSTRUCTS the degeneracy everywhere at once:

  * every numeric column is CONSTANT (all variances/covariances zero,
    every determinant singular, every rank tied);
  * single region / nation structure, single customer segment (1xC
    contingency tables), single document text (closed vocabularies,
    f1/f2 Good-Turing degeneracies), identical embeddings (zero-variance
    PCA/drift, all-ties rankings);
  * one order month (single EVT block), flat daily revenue (all-at-
    median runs test, zero-variance rolling windows);
  * a regular co-purchase graph — two disjoint edges, every degree
    equal — (zero degree variance, EMPTY power-law tail).

Gate: NO key may raise on either engine. NULL outputs are legitimate
degradation (that is what try_divide/the DuckDB division contract
produce); a mismatch between the engines' values is reported separately
for triage (rounding-rule divergence on degenerate data is a weaker
signal than a crash, and the driver only ever hashes fixture data).

Shared by tools/degenerate_sweep.py and the pytest twin
(tests/test_degenerate_sweep.py) so the fixture recipe and the gate
cannot drift. The r7 findings this sweep reproduces (and would have
found unprompted) are pinned value-exactly in
tests/test_degenerate_division_probes.py.
"""

from __future__ import annotations

import datetime as dt
import json
import os

DIM = 64  # fixture embedding dimensionality


def build_degenerate_dir(root: str) -> str:
    """Write the all-constant minimal fixture into ``root``. Tables are
    ALWAYS rewritten (KB-sized): an existence-skip would silently serve
    a stale fixture from the tool's persistent default dir after any
    recipe change (r7 review catch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)

    def write(name, table):
        pq.write_table(table, os.path.join(root, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["AMERICA"], pa.string()),
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["BRAZIL", "CANADA"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, 5)], pa.string()),
        "c_nationkey": pa.array([0, 0, 1, 1], pa.int32()),
        "c_acctbal": pa.array([100.0] * 4, pa.float64()),  # constant
        "c_mktsegment": pa.array(["BUILDING"] * 4, pa.string()),  # 1 segment
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["Supplier#1", "Supplier#2"], pa.string()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([50.0, 50.0], pa.float64()),  # constant
    }))
    write("part", pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(1, 5)], pa.string()),
        "p_brand": pa.array(["Brand#1"] * 4, pa.string()),
        "p_type": pa.array(["STANDARD BRASS"] * 4, pa.string()),
        "p_size": pa.array([10] * 4, pa.int32()),           # constant
        "p_retailprice": pa.array([900.0] * 4, pa.float64()),  # constant
    }))
    # 6 orders, ALL in one month (single EVT block), constant price
    d0 = dt.datetime(2024, 1, 5)
    days = [0, 0, 7, 7, 14, 14]
    write("orders", pa.table({
        "o_orderkey": pa.array(list(range(1, 7)), pa.int64()),
        "o_custkey": pa.array([1, 2, 3, 4, 1, 2], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 6, pa.string()),
        "o_totalprice": pa.array([100.0] * 6, pa.float64()),  # constant
        "o_orderdate": pa.array(
            [d0 + dt.timedelta(days=d) for d in days], pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "2-HIGH"] * 3, pa.string()),
    }))
    # 12 lineitems: every order has EXACTLY 2 lines (constant ols2 x1),
    # constant qty/price/discount/tax, flags split R/A (both welch arms
    # constant), parts pair (1,2) in odd orders and (3,4) in even ones —
    # a REGULAR co-purchase graph (two disjoint edges, all degrees 1)
    # whose power-law tail (dmin=2) is EMPTY.
    li_rows = []
    for o in range(1, 7):
        parts = (1, 2) if o % 2 else (3, 4)
        for ln, p in enumerate(parts, start=1):
            li_rows.append((o, p, 1 + o % 2, ln))
    write("lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li_rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in li_rows], pa.int32()),
        "l_quantity": pa.array([5.0] * 12, pa.float64()),        # constant
        "l_extendedprice": pa.array([100.0] * 12, pa.float64()),  # constant
        "l_discount": pa.array([0.05] * 12, pa.float64()),       # constant
        "l_tax": pa.array([0.02] * 12, pa.float64()),            # constant
        "l_returnflag": pa.array(
            ["R" if r[0] % 2 else "A" for r in li_rows], pa.string()),
        "l_linestatus": pa.array(["O"] * 12, pa.string()),
        "l_shipdate": pa.array(
            [d0 + dt.timedelta(days=r[0])for r in li_rows],
            pa.timestamp("us")),
    }))
    # events: 30 flat days x 2 users x 2 types (120 rows — enough for
    # the late-arrival harness's mid+50 <= n-5 precondition), CONSTANT
    # value -> constant daily revenue (runs test all-at-median,
    # zero-variance rolling windows and lag correlations), both hash
    # arms populated. props mirrors the real fixture's {"k": int} shape
    # so from_json's declared schema sees its keys.
    e0 = dt.datetime(2024, 1, 3, 9, 0, 0)
    ev_rows = []
    for day in range(30):
        for uid in (1, 2):
            for j, etype in enumerate(("view", "purchase")):
                ev_rows.append(
                    (e0 + dt.timedelta(days=day, minutes=10 * uid + j),
                     uid, etype))
    write("events", pa.table({
        "event_id": pa.array(range(1, len(ev_rows) + 1), pa.int64()),
        "ts": pa.array([r[0] for r in ev_rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in ev_rows], pa.int64()),
        "event_type": pa.array([r[2] for r in ev_rows], pa.string()),
        "value": pa.array([10.0] * len(ev_rows), pa.float64()),  # constant
        "props": pa.array(
            [json.dumps({"k": 7})] * len(ev_rows), pa.string()),
    }))
    # documents: 60 IDENTICAL texts — closed vocabulary (every n-gram
    # count 60: f1 = f2 = 0), one 60-member exact-dup cluster, constant
    # lengths (the Hill top-k is ALL-EQUAL: fold of ln(1) terms = 0)
    text = "alpha beta gamma alpha beta gamma delta"
    write("documents", pa.table({
        "doc_id": pa.array(list(range(1, 61)), pa.int64()),
        "text": pa.array([text] * 60, pa.string()),
        "lang": pa.array(["en"] * 60, pa.string()),
        "source": pa.array(["web"] * 60, pa.string()),
        "n_chars": pa.array([len(text)] * 60, pa.int64()),
    }))
    # embeddings: 4 IDENTICAL unit vectors — zero-variance PCA/drift,
    # all-ties similarity rankings, every centroid equal to the points
    vec = [0.0] * DIM
    vec[0] = 1.0
    write("embeddings", pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([vec] * 4, pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int32()),
    }))
    return root


def build_empty_dir(root: str) -> str:
    """Write the same ten tables with ZERO rows (schema only). The
    empty-input variant targets the ungrouped-aggregate row-fabrication
    class (the q_text_hill_tail bug shape: one side groups, the other
    aggregates bare, so one emits a NULL row the other never produces)
    and the empty-partition robustness a 100 TB job needs after any
    selective filter."""
    import pyarrow.parquet as pq

    full = build_degenerate_dir(os.path.join(root, "_schema_src"))
    os.makedirs(root, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = pq.read_table(os.path.join(full, f"{t}.parquet"))
        pq.write_table(src.slice(0, 0), os.path.join(root, f"{t}.parquet"))
    return root


def build_nulls_dir(root: str) -> str:
    """EXPLORATORY variant: the all-constant fixture with NULLs injected
    into MEASURE columns (never into keys, timestamps, categories, or
    texts — those are ordering/grouping contracts the fixture pins).
    Real tables carry NULL measures; this probes NULL propagation
    through the arithmetic/fold/ranking paths of every key at once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    full = build_degenerate_dir(os.path.join(root, "_schema_src"))
    os.makedirs(root, exist_ok=True)
    # (table, column) measure targets; every 3rd row becomes NULL
    targets = {
        "customer": ["c_acctbal"],
        "supplier": ["s_acctbal"],
        "part": ["p_retailprice"],
        "orders": ["o_totalprice"],
        "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "events": ["value"],
        "documents": ["n_chars"],
    }
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        src = pq.read_table(os.path.join(full, f"{t}.parquet"))
        cols = {}
        for name in src.column_names:
            col = src[name]
            if name in targets.get(t, ()):  # every 3rd row NULL
                vals = col.to_pylist()
                vals = [None if i % 3 == 0 else v for i, v in enumerate(vals)]
                col = pa.array(vals, col.type)
            cols[name] = col
        pq.write_table(pa.table(cols), os.path.join(root, f"{t}.parquet"))
    return root


# Keys ALLOWED to raise on the EMPTY variant: each names a loud,
# deliberate input-validation raise (a precondition, not a crash). A key
# raising on empty input WITHOUT an entry here fails the gate.
EXPECTED_RAISE_EMPTY: dict[str, str] = {
    "q_stream_watermark_late": (
        "deliberate precondition: the late-arrival harness needs >= 110 "
        "events to build disjoint base/advance/late files and raises a "
        "loud, named assert otherwise (streaming/harness.py)"
    ),
}

# Keys whose Spark and DuckDB results legitimately DIFFER on the EMPTY
# variant: SQL's GROUP BY ROLLUP/CUBE fabricates the grand-total grouping
# row over zero input rows (the () grouping set behaves like a bare
# aggregate) while Spark's rollup()/cube() emit nothing — an engine-level
# semantic difference, not an oracle bug. These three are r6
# driver-ATTESTED keys, so the divergence is documented here instead of
# editing their oracles (the driver only ever hashes nonempty fixture
# data, where both engines agree — proven by the r1-r6 rows). Unattested
# keys with the same shape (q_agg_grouping_id, q_text_bigram_entropy)
# were instead aligned in their oracles with a no-op HAVING/WHERE.
EXPECTED_EMPTY_MISMATCH: dict[str, str] = {
    "q_agg_rollup": "SQL grand-total row on empty input vs Spark's zero rows",
    "q_agg_cube": "SQL grand-total row on empty input vs Spark's zero rows",
    "q_agg_grouping_sets": (
        "SQL fabricates rows for grouping sets over empty input; "
        "Spark emits none"
    ),
}


def run_sweep(spark, sf_dir: str, keys=None, expected_raise=None,
              expected_mismatch=None):
    """Run every registered key's Spark query and DuckDB oracle on
    ``sf_dir``. Returns (spark_errors, duck_errors, mismatches) — lists
    of (key, first-line-of-message). All three lists are gate failures
    (the steady state is exact parity). ``expected_raise`` maps keys to
    a documented-precondition reason — a raise there is skipped wherever
    it surfaces (build time or collect time: Spark plans are lazy).
    ``expected_mismatch`` documents engine-level semantic divergences;
    it never covers the signed-zero HAZARD class, and a listed key that
    no longer diverges is reported as a stale entry when the full key
    set runs (allowlist-rot rule, as in branch_audit)."""
    from wikidata2pg_spark.oracle import compare, duck_connection
    from wikidata2pg_spark.registry import all_oracles, all_queries

    qs = all_queries()
    oracles = all_oracles()
    spark_errors, duck_errors, mismatches = [], [], []
    if keys:
        # unknown requested keys are ERRORS, not silent no-ops (a typo
        # must not produce a false-green sweep — the branch_audit rule)
        spark_errors.extend(
            (k, "unknown key") for k in keys if k not in qs
        )
        qs = {k: qs[k] for k in keys if k in qs}
    expected_raise = expected_raise or {}
    expected_mismatch = expected_mismatch or {}
    con = duck_connection(sf_dir)
    diverged: set[str] = set()
    for k, fn in qs.items():
        sql = oracles.get(k)
        try:
            df = fn(spark, sf_dir)
            if sql is None:
                df.collect()  # rows-only keys: no-throw is the contract
                continue
        except Exception as e:  # noqa: BLE001 — surfaced per key
            if k not in expected_raise:
                spark_errors.append((k, str(e).splitlines()[0][:160]))
            continue
        try:
            issues = compare(k, df, con, sql)
        except Exception as e:  # noqa: BLE001 — Spark collect or DuckDB
            if k in expected_raise:
                continue  # lazy plans raise here, not at build time
            msg = str(e).splitlines()[0][:160]
            side = duck_errors if "duckdb" in type(e).__module__ else spark_errors
            side.append((k, msg))
            continue
        if issues and k in expected_mismatch:
            diverged.add(k)
            # the allowlist covers row/value divergence, NEVER the
            # signed-zero hazard sweep — that class stays a failure
            issues = [i for i in issues if "HAZARD" in i]
        mismatches.extend((k, i) for i in issues)
    # allowlist rot: a documented divergence that stopped occurring
    # means the entry (and its reasoning) is stale — surface it
    mismatches.extend(
        (k, "stale expected_mismatch entry: engines now agree")
        for k in expected_mismatch
        if k in qs and k not in diverged
    )
    return spark_errors, duck_errors, mismatches
