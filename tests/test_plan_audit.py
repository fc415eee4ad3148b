"""Unit tests for the blanket SinglePartition gate's tree parser
(wikidata2pg_spark/plan_audit.py) on synthetic plan strings — the gate
is institutional now (it caught three full-table global windows in r7),
so its classification rules are pinned here without needing a Spark
session. Plan-text shapes mirror Spark 4's executedPlan().toString():
3-char tree units, ':-'/'+-' child markers, ':  ' continuation bars."""

from __future__ import annotations

from wikidata2pg_spark.plan_audit import single_partition_violations


def test_raw_scan_below_single_partition_is_flagged():
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Window [max(size) windowspecdefinition(...)], [price_c ASC]
   +- Sort [price_c ASC NULLS FIRST], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=5]
         +- Project [p_partkey, price_c, size]
            +- FileScan parquet [p_partkey,p_retailprice,p_size]"""
    v = single_partition_violations(plan)
    assert len(v) == 1 and "FileScan parquet" in v[0]


def test_aggregate_on_path_bounds_the_funnel():
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Window [sum(cnt)], [pid ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- HashAggregate(keys=[pid], functions=[count(1)])
         +- Exchange hashpartitioning(pid, 32), [plan_id=8]
            +- HashAggregate(keys=[pid], functions=[partial_count(1)])
               +- FileScan parquet [o_orderkey]"""
    assert single_partition_violations(plan) == []


def test_nested_hash_exchange_does_not_bound():
    # full table shuffled by key, THEN funneled through one task with no
    # aggregate in between — exactly the class the gate exists to catch
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Window [row_number()], [v ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]
      +- Window [lag(v, 1)], [k], [v ASC]
         +- Exchange hashpartitioning(k, 32), [plan_id=3]
            +- FileScan parquet [k,v]"""
    v = single_partition_violations(plan)
    assert len(v) == 1


def test_reused_hash_exchange_is_a_raw_leaf():
    # the reused shuffle's subtree (and its scan) prints only at the
    # original site — treating it as bounding would hide the funnel
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Window [sum(v)], [v ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=7]
      +- ReusedExchange [k, v], Exchange hashpartitioning(k, 32), [plan_id=3]"""
    v = single_partition_violations(plan)
    assert len(v) == 1 and "ReusedExchange" in v[0]


def test_reused_broadcast_exchange_stays_bounding():
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Sort [m ASC], false, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=6]
      +- BroadcastNestedLoopJoin BuildRight, Cross
         :- HashAggregate(keys=[], functions=[max(x)])
         :  +- FileScan parquet [x]
         +- ReusedExchange [lo, hi], BroadcastExchange HashedRelationBroadcastMode, [plan_id=2]"""
    assert single_partition_violations(plan) == []


def test_sibling_branches_tracked_independently():
    # a join below the funnel: the aggregated branch must not launder
    # the raw sibling, and vice versa
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Sort [a ASC], false, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- SortMergeJoin [a], [b], Inner
         :- HashAggregate(keys=[a], functions=[count(1)])
         :  +- FileScan parquet [a]
         +- Project [b]
            +- FileScan parquet [b]"""
    v = single_partition_violations(plan)
    assert len(v) == 1 and "[b]" in v[0]


def test_broadcast_side_below_funnel_is_bounded():
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Window [sum(v)], [v ASC]
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]
      +- Project [v]
         +- BroadcastHashJoin [k], [k2], Inner, BuildRight
            :- HashAggregate(keys=[k], functions=[sum(x)])
            :  +- FileScan parquet [k,x]
            +- BroadcastExchange HashedRelationBroadcastMode, [plan_id=5]
               +- FileScan parquet [k2]"""
    assert single_partition_violations(plan) == []


def test_take_ordered_and_limits_bound():
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Sort [v ASC], false, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=4]
      +- TakeOrderedAndProject(limit=10, orderBy=[v ASC], output=[v])
         +- FileScan parquet [v]"""
    assert single_partition_violations(plan) == []


def test_scan_outside_the_funnel_subtree_is_ignored():
    # the scan at the exchange's own depth (a SIBLING of the funnel, not
    # below it) must not be attributed to the funnel
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Union
   :- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
   :  +- HashAggregate(keys=[], functions=[count(1)])
   :     +- FileScan parquet [a]
   +- FileScan parquet [b]"""
    assert single_partition_violations(plan) == []


def test_multiple_funnels_each_checked():
    plan = """AdaptiveSparkPlan isFinalPlan=false
+- Union
   :- Sort [a ASC], false, 0
   :  +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=3]
   :     +- FileScan parquet [a]
   +- Sort [b ASC], false, 0
      +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=6]
         +- FileScan parquet [b]"""
    assert len(single_partition_violations(plan)) == 2


def test_cartesian_product_is_flagged_but_broadcast_nlj_is_not():
    from wikidata2pg_spark.plan_audit import cartesian_violations

    bad = """AdaptiveSparkPlan isFinalPlan=false
+- CartesianProduct (e.ts BETWEEN lo AND hi)
   :- FileScan parquet [a]
   +- FileScan parquet [b]"""
    ok = """AdaptiveSparkPlan isFinalPlan=false
+- BroadcastNestedLoopJoin BuildRight, Cross
   :- FileScan parquet [a]
   +- BroadcastExchange IdentityBroadcastMode, [plan_id=2]
      +- HashAggregate(keys=[], functions=[min(x), max(x)])
         +- FileScan parquet [x]"""
    assert len(cartesian_violations(bad)) == 1
    assert cartesian_violations(ok) == []


def test_row_python_nodes_flagged_arrow_nodes_not():
    from wikidata2pg_spark.plan_audit import python_udf_violations

    row = """+- Project [v]
   +- BatchEvalPython [f(v#1)], [pythonUDF0#9]
      +- FileScan parquet [v]"""
    arrow = """+- Project [v]
   +- ArrowEvalPython [g(v#1)], [pythonUDF0#9], 200
      +- FileScan parquet [v]"""
    assert len(python_udf_violations(row)) == 1
    assert python_udf_violations(arrow) == []


def test_no_driver_collect_outside_documented_sites():
    """Source-level twin of the plan gates: `.collect()` / `.toPandas()`
    in package code means the operator is not distributed (the r1 scale
    flag). Exactly three sites are documented and allowed — the oracle
    comparator itself, the 25-row inline wikidata fixture assembly, and
    the streaming test harness's ordered drain. A new site must either
    be removed or argued onto this list with a reason."""
    import glob
    import os

    allowed = {
        ("oracle.py", ".collect("),  # the DuckDB comparator
        ("sources/scans.py", ".collect("),  # 25-row fixture assembly
        ("streaming/harness.py", ".toPandas("),  # test-harness drain
        # the liveness auditor collects ONE aggregated row per key — an
        # analysis gate like the oracle comparator, not an operator
        ("branch_audit.py", ".collect("),
        # the degenerate-input sweep collects rows-only keys' results to
        # assert they don't crash — an analysis gate, same class
        ("degenerate_audit.py", ".collect("),
    }
    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "wikidata2pg_spark",
    )
    bad = []
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        rel = os.path.relpath(f, pkg)
        for i, line in enumerate(open(f), 1):
            for pat in (".collect(", ".toPandas("):
                if pat in line and (rel, pat) not in allowed:
                    bad.append(f"{rel}:{i}: {line.strip()[:100]}")
    assert not bad, bad


def test_oracle_duck_types_driver_safe():
    """Static driver-hash type gate over EVERY registered oracle (the r7
    enabling fix): DuckDB binds each oracle against the sf0.01 views
    without executing it, and no result column may carry a type the
    driver's value hash renders unlike the Spark twin while fetchall()
    coerces them equal — HUGEINT (the proven-red r7 windowed-sum
    promotion), DECIMAL, FLOAT. INTEGER-vs-BIGINT width and UBIGINT are
    proven safe by attested rows (q_win_ntile r6; q_wd_parse_entity /
    q_wd_sitelinks r3). Needs no Spark session, so it runs everywhere
    the unit suite runs; tools/hash_type_sweep.py is the CLI twin, and
    oracle.compare enforces the same gate dynamically on every mirror /
    driver_sim run."""
    from tests.conftest import SF_T2
    from wikidata2pg_spark.oracle import duck_connection, duck_type_hazards
    from wikidata2pg_spark.registry import all_oracles

    con = duck_connection(SF_T2)
    try:
        bad = {}
        for k, sql in all_oracles().items():
            rel = con.sql(sql)
            hits = duck_type_hazards(list(rel.columns), list(rel.types))
            if hits:
                bad[k] = hits
        assert not bad, f"driver-divergent oracle result types: {bad}"
    finally:
        con.close()


def test_type_gate_flags_a_hugeint_oracle(spark):
    """Gate LIVENESS (not just steady-state zero): compare() must FLAG a
    value-identical oracle whose result column is HUGEINT — exactly the
    r7 failure the gate exists for. A passing sweep proves nothing if
    the gate can't fire."""
    from tests.conftest import SF_T2
    from wikidata2pg_spark.oracle import compare, duck_connection

    con = duck_connection(SF_T2)
    df = spark.createDataFrame([(3,)], "s long")
    # windowed sum over BIGINT -> HUGEINT in DuckDB; value identical (3)
    errs = compare(
        "hugeint_probe",
        df,
        con,
        "SELECT sum(x) OVER () AS s FROM (SELECT CAST(3 AS BIGINT) AS x)",
    )
    assert any("HUGEINT" in e for e in errs), errs
    # the cast form passes clean
    assert (
        compare(
            "bigint_probe",
            df,
            con,
            "SELECT CAST(sum(x) OVER () AS BIGINT) AS s "
            "FROM (SELECT CAST(3 AS BIGINT) AS x)",
        )
        == []
    )
