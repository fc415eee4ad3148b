"""TPC-H query suite — every TPC-H query expressible on this fixture
schema, adapted where a column/table the spec uses is absent.

The fixture is TPC-H-ish (TESTDATA.md): no ``partsupp`` table, and
``lineitem`` lacks commitdate/receiptdate/shipmode/shipinstruct,
``customer`` lacks phone/address, ``part`` lacks container/mfgr,
``nation`` names are synthetic (``NATION_0``..``NATION_24``). That rules
out Q2/Q9/Q11/Q20 (partsupp cost/availability) and Q12/Q21 (commit/
receipt dates) entirely; Q4/Q16/Q17/Q19/Q22 are adapted to equivalent
plan shapes on the available columns (each docstring states the
adaptation). Q3/Q5/Q10/Q18 were already registered in analytics.py;
this module adds Q1, Q4, Q6, Q7, Q8, Q13, Q14, Q15, Q16, Q17, Q19, Q22
— completing the suite's expressible subset.

Exactness: all money math uses the exact-integer convention from
analytics.py — cents = floor(price*100+0.5) as BIGINT, discount/tax as
integer percent, so every sum/comparison/ORDER BY is over exact
integers and only ONE final division (or one floor(x+0.5) display
round) touches floats, with an identical expression shape on the
DuckDB side (FIXTURES.md rules; the r5 rounding-divergence class).
Products that scale with corpus size (disc_price, charge, share
numerators) are summed as decimal(38,0) in Spark — at 100 TB
(~7e11 lineitem rows) a BIGINT sum of 1e11-per-row charges would
overflow; DuckDB's sum(BIGINT) is HUGEINT already.

Scale notes (100 TB / 1000 executors): every query keeps dimension
joins broadcast (region/nation always; filtered part lists where the
predicate keeps them dimension-sized) and lets the single unavoidable
fact-fact shuffle (orders |><| lineitem on the order key) dominate;
Q15/Q17 avoid a second fact scan via a broadcast-scalar join and a
per-key window respectively; AQE handles skew/coalescing at runtime.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from wikidata2pg_spark.operators.analytics import _REV_U_SQL, _rev_u
from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load

# Exact integer units (see module docstring): price cents, discount %,
# tax % — BIGINT on both sides.
_PC_SQL = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_D_SQL = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_T_SQL = "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"
_Q_SQL = "CAST(l_quantity AS BIGINT)"


def _pc():
    return F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")


def _dpct():
    return F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")


def _tpct():
    return F.floor(F.col("l_tax") * 100 + F.lit(0.5)).cast("long")


def _qty():
    return F.col("l_quantity").cast("long")


@query(
    "q_sql_tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({_Q_SQL}) AS BIGINT) AS sum_qty,
       CAST(sum({_PC_SQL}) AS DOUBLE) / 100 AS sum_base_price,
       CAST(sum({_PC_SQL} * (100 - {_D_SQL})) AS DOUBLE) / 10000
         AS sum_disc_price,
       CAST(sum({_PC_SQL} * (100 - {_D_SQL}) * (100 + {_T_SQL})) AS DOUBLE)
         / 1000000 AS sum_charge,
       floor(CAST(sum({_Q_SQL}) * 100 AS DOUBLE) / count(*) + 0.5) / 100
         AS avg_qty,
       floor(CAST(sum({_PC_SQL}) AS DOUBLE) / count(*) + 0.5) / 100
         AS avg_price,
       floor(CAST(sum({_D_SQL}) * 100 AS DOUBLE) / count(*) + 0.5) / 10000
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate::TIMESTAMP <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_sql_tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary report): the canonical wide scan +
    4-group aggregate every columnar engine leads its benchmark with.
    All nine aggregates derive from four exact-integer partial sums
    (qty, cents, cents*(100-d), cents*(100-d)*(100+t)) plus the count
    — one map-side-combining shuffle of 4 groups, scan-bound at any
    scale; the shipdate filter pushes to the parquet scan. Charge and
    disc_price sums ride decimal(38,0) (corpus-sized products would
    overflow BIGINT at 100 TB); averages use the single-division floor
    pattern so no float ever re-rounds."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("timestamp")
        <= F.lit("2001-09-02").cast("timestamp")
    )
    pc, d, t, q = _pc(), _dpct(), _tpct(), _qty()
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(q).alias("sum_qty"),
        F.sum(pc.cast("decimal(38,0)")).alias("base_u"),
        F.sum((pc * (100 - d)).cast("decimal(38,0)")).alias("disc_u"),
        F.sum((pc * (100 - d) * (100 + t)).cast("decimal(38,0)")).alias(
            "charge_u"
        ),
        F.sum(d).alias("d_u"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        (F.col("base_u").cast("double") / 100).alias("sum_base_price"),
        (F.col("disc_u").cast("double") / 10000).alias("sum_disc_price"),
        (F.col("charge_u").cast("double") / 1000000).alias("sum_charge"),
        (
            F.floor(
                (F.col("sum_qty") * 100).cast("double")
                / F.col("count_order")
                + F.lit(0.5)
            )
            / 100
        ).alias("avg_qty"),
        (
            F.floor(
                F.col("base_u").cast("double") / F.col("count_order")
                + F.lit(0.5)
            )
            / 100
        ).alias("avg_price"),
        (
            F.floor(
                (F.col("d_u") * 100).cast("double") / F.col("count_order")
                + F.lit(0.5)
            )
            / 10000
        ).alias("avg_disc"),
        "count_order",
    )


@query(
    "q_sql_tpch_q4",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate::DATE >= o.o_orderdate::DATE + 90
  )
GROUP BY o_orderpriority
""",
)
def q_sql_tpch_q4(spark, sf_dir):
    """TPC-H Q4 (order priority checking), adapted: the spec's
    "commitdate < receiptdate" lateness test needs columns this fixture
    lacks, so the EXISTS probes "some line shipped >= 90 days after
    the order date" — same correlated-EXISTS-with-inequality plan
    shape (semi join on the order key + a non-equi residual). The
    quarter filter pushes to the orders scan and shrinks the semi
    join's left side ~25x before the shuffle; date arithmetic is
    integer-day, timezone-proof on both engines."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("lk"),
        F.col("l_shipdate").cast("date").alias("ship_d"),
    )
    hit = o.join(
        li,
        (F.col("o_orderkey") == F.col("lk"))
        & (
            F.col("ship_d")
            >= F.date_add(F.col("o_orderdate").cast("date"), 90)
        ),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q_sql_tpch_q6",
    oracle=f"""
SELECT CAST(sum({_PC_SQL} * {_D_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem
WHERE l_shipdate::TIMESTAMP >= TIMESTAMP '1997-01-01'
  AND l_shipdate::TIMESTAMP < TIMESTAMP '1998-01-01'
  AND {_D_SQL} BETWEEN 5 AND 7
  AND l_quantity < 24
""",
)
def q_sql_tpch_q6(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): pure scan + filter +
    scalar aggregate — the classic predicate-pushdown/vectorization
    probe. The discount band compares the INTEGER percent (5..7), not
    the raw double (0.05/0.07 are not exactly representable; the
    integer band is unambiguous and identical on both engines).
    revenue = sum(cents * disc%) is an exact BIGINT per row, summed as
    decimal(38,0) for corpus scale, divided once for display."""
    li = load(spark, sf_dir, "lineitem")
    d = _dpct()
    f = li.filter(
        (
            F.col("l_shipdate").cast("timestamp")
            >= F.lit("1997-01-01").cast("timestamp")
        )
        & (
            F.col("l_shipdate").cast("timestamp")
            < F.lit("1998-01-01").cast("timestamp")
        )
        & d.between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        (
            F.sum((_pc() * d).cast("decimal(38,0)")).cast("double") / 10000
        ).alias("revenue")
    )


@query(
    "q_sql_tpch_q7",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) / 10000 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         {_REV_U_SQL} AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate::TIMESTAMP >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate::TIMESTAMP < TIMESTAMP '1999-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_sql_tpch_q7(spark, sf_dir):
    """TPC-H Q7 (volume shipping between two nations; the spec's
    FRANCE/GERMANY become the fixture's NATION_1/NATION_2): the
    directional nation-pair query. The 2-row nation subsets broadcast
    into supplier and customer FIRST, cutting both to ~2/25 of their
    rows before any fact shuffle — the same two-sided
    dimension-prefilter a 1000-executor plan needs (supplier/customer
    are NOT broadcastable at 100 TB; the filtered fact-fact joins
    shuffle on their keys). Volume is the exact integer revenue,
    summed per (direction, year) as decimal(38,0)."""
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("cn_key"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (
            F.col("l_shipdate").cast("timestamp")
            >= F.lit("1997-01-01").cast("timestamp")
        )
        & (
            F.col("l_shipdate").cast("timestamp")
            < F.lit("1999-01-01").cast("timestamp")
        )
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(s.select("s_suppkey", "supp_nation"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "cust_nation"),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _rev_u().cast("decimal(38,0)").alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("volume").cast("double") / 10000).alias("revenue"))
    )


@query(
    "q_sql_tpch_q8",
    oracle=f"""
SELECT o_year,
       floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE 0 END) * 1000000 AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) + 0.5) / 1000000 AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         {_REV_U_SQL} AS volume, n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    AND o.o_orderdate < TIMESTAMP '1999-01-01'
) all_nations
GROUP BY o_year
""",
)
def q_sql_tpch_q8(spark, sf_dir):
    """TPC-H Q8 (national market share; the spec's BRAZIL/AMERICA/
    'ECONOMY ANODIZED STEEL' become NATION_3/AMERICA/'ECONOMY' on this
    schema): the 8-way snowflake whose answer is a ratio of two sums
    over the SAME joined stream — computed in one aggregation with a
    conditional numerator (never two passes). Share = exact-integer
    numerator * 1e6 / exact-integer denominator, one floored division
    at 6 decimals, both factors decimal(38,0)/HUGEINT so the *1e6
    cannot overflow at corpus scale. Region/nation broadcast; the
    ECONOMY part subset joins the fact on partkey (shuffle at scale —
    1/6 of a 100 TB part table is not broadcastable)."""
    r = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    n1 = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n1.select(F.col("n_nationkey").alias("cnk"))),
        F.col("c_nationkey") == F.col("cnk"),
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"),
        F.col("n_name").alias("supp_nation"),
    )
    s = load(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("snk")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    j = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s.select("s_suppkey", "supp_nation"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey"),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    vol = _rev_u().cast("decimal(38,0)")
    g = j.select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        vol.alias("volume"),
        "supp_nation",
    ).groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("num"),
        F.sum("volume").alias("den"),
    )
    return g.select(
        "o_year",
        (
            F.floor(
                (F.col("num") * 1000000).cast("double")
                / F.col("den").cast("double")
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mkt_share"),
    )


@query(
    "q_sql_tpch_q13",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def q_sql_tpch_q13(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution; the spec's
    comment NOT LIKE filter becomes priority <> '1-URGENT' — same
    filtered-LEFT-JOIN shape where the filter must live in the JOIN
    condition, not WHERE, so order-less customers survive with count
    0). Two inherent shuffles: customer|><|orders on custkey, then the
    tiny re-group on the count value (at most ~hundreds of distinct
    counts — map-side combine collapses it to nearly nothing)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q_sql_tpch_q14",
    oracle=f"""
SELECT floor(CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_U_SQL}
                           ELSE 0 END) * 1000000 AS DOUBLE)
             / CAST(sum({_REV_U_SQL}) AS DOUBLE) + 0.5) / 10000
         AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate::TIMESTAMP >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate::TIMESTAMP < TIMESTAMP '1997-10-01'
""",
)
def q_sql_tpch_q14(spark, sf_dir):
    """TPC-H Q14 (promotion effect; p_type LIKE 'PROMO%' is p_type =
    'PROMO' in this fixture's single-word type domain): percentage =
    100 * conditional-sum / sum over one joined stream, single
    aggregation, single floored division at 4 decimals
    (num*100*1e4/den in one multiply — the single-division-order rule:
    dividing first and scaling after can re-round on a floor
    boundary). The one-month shipdate filter pushes to the lineitem
    scan; both sums ride decimal(38,0)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (
            F.col("l_shipdate").cast("timestamp")
            >= F.lit("1997-09-01").cast("timestamp")
        )
        & (
            F.col("l_shipdate").cast("timestamp")
            < F.lit("1997-10-01").cast("timestamp")
        )
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _rev_u().cast("decimal(38,0)")
    g = li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", vol).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("num"),
        F.sum(vol).alias("den"),
    )
    return g.select(
        (
            F.floor(
                (F.col("num") * 1000000).cast("double")
                / F.col("den").cast("double")
                + F.lit(0.5)
            )
            / 10000
        ).alias("promo_revenue")
    )


@query(
    "q_sql_tpch_q15",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_U_SQL}) AS total_u
  FROM lineitem
  WHERE l_shipdate::TIMESTAMP >= TIMESTAMP '1997-01-01'
    AND l_shipdate::TIMESTAMP < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_u AS DOUBLE) / 10000 AS total_revenue
FROM revenue0 r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_u = (SELECT max(total_u) FROM revenue0)
""",
)
def q_sql_tpch_q15(spark, sf_dir):
    """TPC-H Q15 (top supplier): the revenue "view" + its max, where
    the aggregate feeds two consumers — localCheckpoint materializes
    the per-supplier totals once so the max probe does NOT re-scan
    lineitem (the sibling-aggregation re-execution trap), then the
    1-row max broadcasts back as a scalar join. Ties are impossible to
    mis-handle: total_u is an exact BIGINT, so `=` against the max is
    exact (float-revenue ties are the spec's known Q15 hazard). At
    scale the per-supplier aggregate is ~1e9 rows — a full-frame
    window would single-partition it; the broadcast-scalar shape
    stays distributed."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (
                F.col("l_shipdate").cast("timestamp")
                >= F.lit("1997-01-01").cast("timestamp")
            )
            & (
                F.col("l_shipdate").cast("timestamp")
                < F.lit("1997-04-01").cast("timestamp")
            )
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_u()).alias("total_u"))
        .localCheckpoint()
    )
    mx = rev.agg(F.max("total_u").alias("mx"))
    winners = rev.join(
        F.broadcast(mx), F.col("total_u") == F.col("mx")
    ).select("supplier_no", "total_u")
    s = load(spark, sf_dir, "supplier")
    return s.join(
        F.broadcast(winners), F.col("s_suppkey") == F.col("supplier_no")
    ).select(
        "s_suppkey",
        "s_name",
        (F.col("total_u").cast("double") / 10000).alias("total_revenue"),
    )


@query(
    "q_sql_tpch_q16",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#16'
  AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_sql_tpch_q16(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship), adapted: no partsupp
    table, so the part-supplier pairs come from lineitem; the spec's
    "complaint" supplier exclusion (a comment LIKE) becomes s_acctbal
    < 0 — same NOT-IN-subquery plan shape (a broadcast anti join on a
    never-NULL key). The surviving 8-sizes/brand/type filter keeps the
    part side dimension-sized even at 100 TB scale-up of the ~1/300
    selectivity, so it broadcasts; count(DISTINCT suppkey) shuffles
    once on the (brand, type, size) group key with partial distinct
    aggregation map-side."""
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#16")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    j = li.join(
        F.broadcast(bad),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@query(
    "q_sql_tpch_q17",
    oracle=f"""
SELECT CAST(sum({_PC_SQL}) AS DOUBLE) / 700 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
JOIN (
  SELECT l_partkey AS agg_pk, sum(CAST(l_quantity AS BIGINT)) AS sq,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
) a ON a.agg_pk = l.l_partkey
WHERE CAST(l.l_quantity AS BIGINT) * 5 * a.cnt < a.sq
""",
)
def q_sql_tpch_q17(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue; the spec's container
    filter is dropped — this fixture has no p_container — leaving the
    Brand#23 filter): lines with quantity below 20% of their part's
    average. The correlated avg is a PER-PART WINDOW over the already
    part-filtered lines (one shuffle on partkey, NO second lineitem
    scan — the classic Q17 self-join done Spark-first), and the 20%
    test is exact integer algebra: qty*5*cnt < sum_qty avoids the
    0.2*avg float entirely (q < 0.2*sq/cnt <=> 5*q*cnt < sq for
    positive integers, strict both ways since sq is never a multiple
    boundary hit by equality — inequality is strict on both sides).
    Display is one division of an exact cents sum by 700."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lines = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("l_partkey")
    lines = lines.withColumn("sq", F.sum(_qty()).over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(w)
    )
    small = lines.filter(_qty() * 5 * F.col("cnt") < F.col("sq"))
    return small.agg(
        (
            F.sum(_pc().cast("decimal(38,0)")).cast("double") / 700
        ).alias("avg_yearly")
    )


@query(
    "q_sql_tpch_q19",
    oracle=f"""
SELECT CAST(sum({_REV_U_SQL}) AS DOUBLE) / 10000 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_sql_tpch_q19(spark, sf_dir):
    """TPC-H Q19 (discounted revenue; the spec's container/shipmode
    legs are dropped — columns absent — keeping the three OR'd
    (brand, size-band, quantity-band) branches): the disjunctive
    join-filter query optimizers love to get wrong. The part-side
    disjunction (brand+size) is separable from the lineitem-side
    (quantity), so the part table is pre-filtered to the UNION of the
    three brand/size windows before the join (broadcastable), and the
    full three-way OR applies as the post-join residual — Catalyst
    pushes the separable conjuncts to both scans. Exact-integer
    revenue, one display division."""
    p = load(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
        )
    ).select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 30)
    )
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    hit = j.filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return hit.agg(
        (
            F.sum(_rev_u().cast("decimal(38,0)")).cast("double") / 10000
        ).alias("revenue")
    )


@query(
    "q_sql_tpch_q22",
    oracle="""
WITH pos AS (
  SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS s,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n.n_name AS cntry, count(*) AS numcust,
       CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100 AS totacctbal
FROM customer c
CROSS JOIN pos
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY n.n_name
""",
)
def q_sql_tpch_q22(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity), adapted: the spec's
    phone-prefix country grouping becomes the nation join (customer
    has no phone column), keeping the interesting machinery — a
    global scalar aggregate compared per-row, and an anti join for
    "no recent orders". The above-average test is EXACT integer
    algebra: cents * positive_count > positive_cents_sum avoids the
    avg double entirely (both engines would compute the same double,
    but the integer form is proof, not luck). The 1-row (sum, count)
    broadcasts as a cross join; recent orders anti-join on custkey;
    nation broadcasts. Balance display is one exact-cents division."""
    cust = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        cents * F.col("n") > F.col("s")
    )
    lapsed = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        lapsed.join(
            F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents).cast("double") / 100).alias("totacctbal"),
        )
    )
