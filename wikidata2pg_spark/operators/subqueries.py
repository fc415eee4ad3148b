"""Subquery operators (r5 extras): EXISTS / NOT EXISTS and correlated
scalar subqueries — the remaining ANSI-SQL query shapes a reference user
coming from Postgres writes daily [R: the reference's query surface is
whatever Postgres accepts over its loaded tables].

Spark-first story: Catalyst REWRITES these into joins — `EXISTS` becomes a
left-semi join, `NOT EXISTS` a left-anti join, and a correlated scalar
subquery becomes an aggregate + left outer join on the correlation key.
None of them execute as per-row subquery probes (the Postgres mental
model); all of them scale as ordinary shuffle/broadcast joins. The tests
in tests/test_plans.py pin the semi/anti rewrite so a regression back to
a nested-loop shape would fail CI.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load

_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM {customer} c
WHERE EXISTS (
        SELECT 1 FROM {orders} o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (
        SELECT 1 FROM {orders} o2
        WHERE o2.o_custkey = c.c_custkey
          AND o2.o_orderstatus = 'F' AND o2.o_totalprice > 200000.0)
"""


@query(
    "q_subquery_exists",
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def q_subquery_exists(spark, sf_dir):
    """Correlated EXISTS + NOT EXISTS: customers with at least one urgent
    order and no completed order above 200k. Catalyst turns the pair into
    one left-semi and one left-anti hash join on c_custkey — two shuffles,
    no per-row probing."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"subq_{t}")
    return spark.sql(_EXISTS_SQL.format(customer="subq_customer", orders="subq_orders"))


# Exact integer-cents arithmetic throughout: row MEMBERSHIP depends on a
# price-vs-average comparison, and avg(double) differs between engines by
# summation order (ulp noise), so a part whose price sits exactly on its
# brand average could flip in/out (FIXTURES rule 5). sum(BIGINT cents) and
# count(*) are exact on both engines, their quotient is the same IEEE
# double, and the comparison/display rounding are then deterministic.
_SCALAR_SQL = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice,
       CAST(floor((SELECT sum(CAST(floor(p2.p_retailprice * 100 + 0.5) AS BIGINT)) * 1e0
                          / count(*)
                   FROM {part} p2
                   WHERE p2.p_brand = p.p_brand) + 0.5) / 100 AS DOUBLE) AS brand_avg
FROM {part} p
WHERE CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
      > (SELECT sum(CAST(floor(p3.p_retailprice * 100 + 0.5) AS BIGINT)) * 1e0
                / count(*)
         FROM {part} p3 WHERE p3.p_brand = p.p_brand)
  AND CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
      > (SELECT sum(CAST(floor(p4.p_retailprice * 100 + 0.5) AS BIGINT)) * 1e0
                / count(*)
         FROM {part} p4)
"""


@query(
    "q_subquery_scalar",
    oracle=_SCALAR_SQL.format(part="part"),
)
def q_subquery_scalar(spark, sf_dir):
    """Correlated scalar subquery (per-brand average, in both SELECT and
    WHERE) plus an uncorrelated global-average guard. Catalyst de-correlates
    to a grouped aggregate joined back on p_brand; the uncorrelated scalar
    becomes a broadcast 1-row subplan — the same shapes the engine's own
    tfidf/pagerank constants use."""
    load(spark, sf_dir, "part").createOrReplaceTempView("subq_part")
    return spark.sql(_SCALAR_SQL.format(part="subq_part"))


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM {cust} c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
WHERE c.c_custkey < 500
"""


@query(
    "q_join_lateral",
    oracle=_LATERAL_SQL.format(cust="customer", orders="orders"),
)
def q_join_lateral(spark, sf_dir):
    """LATERAL correlated subquery join (SQL:1999, supported by Spark 4 and
    DuckDB with the same syntax): per-customer top-2 orders expressed as a
    correlated derived table — the form ORM/report SQL actually ships.
    Catalyst DECORRELATES it: the optimized plan is a window-rank
    (per-partition group limit) over a plain equi-join, not a per-row
    re-execution of the subquery — assert-worthy because a naive engine
    runs the inner query once per outer row (test_plans.py pins the
    rewrite). Semantically identical to q_topk_per_group's DataFrame
    row_number form; this key proves the SQL front door reaches the same
    plan."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_lat_cust")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_lat_orders")
    return spark.sql(_LATERAL_SQL.format(cust="v_lat_cust", orders="v_lat_orders"))


@query(
    "q_subquery_exists_flag",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment,
       EXISTS(SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT') AS has_urgent
FROM customer c WHERE c.c_custkey < 300
""",
)
def q_subquery_exists_flag(spark, sf_dir):
    """EXISTS as a PROJECTED flag (the 'mark join') — unlike
    q_subquery_exists, no row is filtered: every customer survives with
    a boolean feature column, the shape feature-engineering pipelines
    emit. DuckDB plans the projected EXISTS as a mark join natively; the
    Spark formulation is its classic expansion — left join against the
    distinct probe keys, flag = probe IS NOT NULL — which keeps the
    probe side deduped BEFORE the join (no row multiplication) and
    broadcastable when selective. Same result set, engine-idiomatic
    plans on each side."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("u_key"))
        .distinct()
    )
    return c.join(
        F.broadcast(urgent), F.col("c_custkey") == F.col("u_key"), "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.col("u_key").isNotNull().alias("has_urgent"),
    )
