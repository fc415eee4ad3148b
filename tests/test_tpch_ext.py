"""TPC-H completion staging (operators/tpch_ext.py): the six queries the
base fixture couldn't express (Q2/Q9/Q11/Q20 partsupp, Q12/Q21 commit/
receipt dates) run on DERIVED extensions and are mirror-verified here
exactly the way registered keys are (oracle.compare at sf0.01 — value
hash, signed-zero and driver-type gates included). Registration happens
in round 9 when the attestation backlog has drained; until then this
suite is the parity evidence."""

from __future__ import annotations

import pytest

from wikidata2pg_spark.oracle import compare
from wikidata2pg_spark.operators.tpch_ext import (
    TPCH_EXT_ORACLES,
    TPCH_EXT_QUERIES,
    line_ext,
    partsupp,
)

from tests.conftest import SF_T2


@pytest.mark.parametrize("key", sorted(TPCH_EXT_QUERIES))
def test_tpch_ext_matches_oracle(spark, duck, key):
    errs = compare(
        key, TPCH_EXT_QUERIES[key](spark, SF_T2), duck, TPCH_EXT_ORACLES[key]
    )
    assert not errs, errs


def test_partsupp_shape(spark):
    """The derived partsupp is the dbgen shape: exactly 4 DISTINCT
    suppliers per part, every suppkey a real supplier, availability in
    1..9999 and cost cents in 100..100000 — all pure functions of the
    keys (re-derivation is bit-identical)."""
    from pyspark.sql import functions as F

    from wikidata2pg_spark.tables import load

    ps = partsupp(spark, SF_T2)
    n_part = load(spark, SF_T2, "part").count()
    stats = ps.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_partkey", "ps_suppkey").alias("n_pairs"),
        F.min("ps_availqty").alias("aq_lo"),
        F.max("ps_availqty").alias("aq_hi"),
        F.min("ps_supplycost_cents").alias("c_lo"),
        F.max("ps_supplycost_cents").alias("c_hi"),
    ).collect()[0]
    assert stats.n == 4 * n_part
    assert stats.n_pairs == stats.n  # the 4 stride keys never collide
    assert 1 <= stats.aq_lo and stats.aq_hi <= 9999
    assert 100 <= stats.c_lo and stats.c_hi <= 100000
    sups = {
        r.s_suppkey
        for r in load(spark, SF_T2, "supplier").select("s_suppkey").collect()
    }
    ps_sups = {r.ps_suppkey for r in ps.select("ps_suppkey").distinct().collect()}
    assert ps_sups <= sups  # every derived suppkey is a real supplier


def test_line_ext_derivations_are_pure_and_bounded(spark):
    """commit_d in ship_d-30..+30, receipt_d in ship_d+1..+30 (always
    AFTER shipping — a receipt can't precede the ship date), shipmode
    covers the full 7-value ring, and re-derivation agrees with a
    hand-computed row."""
    import datetime as dt

    from pyspark.sql import functions as F

    lx = line_ext(spark, SF_T2)
    bad = lx.filter(
        (F.datediff("commit_d", "ship_d") < -30)
        | (F.datediff("commit_d", "ship_d") > 30)
        | (F.datediff("receipt_d", "ship_d") < 1)
        | (F.datediff("receipt_d", "ship_d") > 30)
    ).count()
    assert bad == 0
    modes = {r.shipmode for r in lx.select("shipmode").distinct().collect()}
    assert modes == {"TRUCK", "MAIL", "SHIP", "AIR", "RAIL", "FOB", "REG AIR"}
    row = lx.select(
        "l_orderkey", "l_linenumber", "ship_d", "commit_d", "receipt_d"
    ).first()
    co = (row.l_orderkey * 7 + row.l_linenumber * 3) % 61 - 30
    ro = (row.l_orderkey * 11 + row.l_linenumber * 5) % 30 + 1
    assert row.commit_d == row.ship_d + dt.timedelta(days=co)
    assert row.receipt_d == row.ship_d + dt.timedelta(days=ro)


def test_tpch_ext_registered_in_r9():
    """VERDICT r8 task 3 lifts the r7 freeze for exactly these six: all
    are registered WITH hash oracles (registry 365 keys / 357 oracles),
    and no other key slipped in alongside them."""
    from wikidata2pg_spark.registry import all_oracles, all_queries

    qs, os_ = all_queries(), all_oracles()
    assert set(TPCH_EXT_QUERIES) <= set(qs)
    assert set(TPCH_EXT_ORACLES) <= set(os_)
    assert len(qs) == 365 and len(os_) == 357


@pytest.mark.parametrize("key", sorted(TPCH_EXT_QUERIES))
def test_tpch_ext_plan_gates(spark, key):
    """The staged queries inherit the registered keys' plan gates ahead
    of r9 registration: no raw-input SinglePartition funnel, no
    CartesianProduct (the 1-row supplier-count crossJoin must broadcast),
    no row-Python UDF."""
    from wikidata2pg_spark.plan_audit import (
        cartesian_violations,
        python_udf_violations,
        single_partition_violations,
    )

    df = TPCH_EXT_QUERIES[key](spark, SF_T2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert single_partition_violations(plan) == [], plan
    assert cartesian_violations(plan) == [], plan
    assert python_udf_violations(plan) == [], plan


@pytest.mark.parametrize("variant", ["degenerate", "empty", "nulls"])
def test_tpch_ext_degenerate_sweep(spark, variant, tmp_path_factory):
    """The staged keys get the standing gate-#4 treatment BEFORE r9
    registration: on the all-constant, the zero-row, and the
    NULL-injected fixtures, no engine may raise and values must match
    exactly. Stride collisions on the 2-supplier degenerate fixture are
    engine-symmetric (both sides derive partsupp from the same formula),
    so parity — the gate — is unaffected."""
    from wikidata2pg_spark.degenerate_audit import (
        build_degenerate_dir,
        build_empty_dir,
        build_nulls_dir,
    )
    from wikidata2pg_spark.oracle import duck_connection

    build = {
        "degenerate": build_degenerate_dir,
        "empty": build_empty_dir,
        "nulls": build_nulls_dir,
    }[variant]
    d = str(tmp_path_factory.mktemp(f"tpch_ext_{variant}"))
    build(d)
    con = duck_connection(d)
    problems = []
    for key in sorted(TPCH_EXT_QUERIES):
        try:
            errs = compare(key, TPCH_EXT_QUERIES[key](spark, d), con,
                           TPCH_EXT_ORACLES[key])
        except Exception as e:  # noqa: BLE001
            problems.append((key, f"RAISE {type(e).__name__}: {e}"))
            continue
        problems.extend((key, e) for e in errs)
    assert not problems, problems


def test_tpch_ext_partition_invariance(spark, tmp_path_factory):
    """The staged queries inherit the partition-invariance gate too:
    identical oracle-compared results when every fixture table arrives
    split across 7 files (the derived partsupp stride and the per-order
    census must not depend on input split boundaries)."""
    from wikidata2pg_spark.oracle import duck_connection
    from wikidata2pg_spark.util import split_fixture_tables

    from tests.conftest import SF_SMOKE

    root = tmp_path_factory.mktemp("tpch_ext_multifile")
    split_fixture_tables(SF_SMOKE, str(root), 7)
    con = duck_connection(str(root))
    try:
        problems = []
        for key in sorted(TPCH_EXT_QUERIES):
            errs = compare(key, TPCH_EXT_QUERIES[key](spark, str(root)), con,
                           TPCH_EXT_ORACLES[key])
            problems.extend((key, e) for e in errs)
        assert not problems, problems
    finally:
        con.close()
