"""TPC-H completion queries (Q2, Q9, Q11, Q12, Q20, Q21) on DERIVED
fixture extensions — staged in round 8 under the r7 key freeze,
REGISTERED in round 9 (VERDICT r8 task 3 lifts the freeze for exactly
these six; registry now 365 keys / 357 hash oracles).

The fixture lacks ``partsupp`` and lineitem commit/receipt/shipmode
(operators/tpch.py module docstring). Regenerating /root/testdata is
off-limits, so both sides DERIVE the missing data from the tables that
exist, with pure-integer formulas that are bit-identical across engines:

* ``partsupp`` — the dbgen shape: each part gets exactly 4 suppliers at
  ``(p_partkey + j*((S//4)+1)) % S`` for j in 0..3 (S = |supplier|; the
  4 keys are distinct whenever no j in 1..3 has j*((S//4)+1) divisible
  by S — true at every fixture scale (S = 10/100/1000) and pinned by
  test_partsupp_shape's n_pairs check, which is the gate to extend if a
  fixture ever ships a pathological S like 4 or 12), with availability
  and cost cents as mod-arithmetic functions of (partkey, suppkey).
  Everything is BIGINT arithmetic — no hash function whose seed could
  differ between engines, no float.
* ``commitdate`` / ``receiptdate`` / ``shipmode`` — deterministic
  day-offsets from l_shipdate keyed on (l_orderkey, l_linenumber), and a
  7-value shipmode ring. DATE + integer-days on both sides.

Adaptations vs the spec (each documented on its query):
* lineitem's (l_partkey, l_suppkey) pairs are independent of partsupp in
  this fixture (different generators), so Q9 prices each lineitem with
  the SAME cost formula partsupp is built from instead of an inner join
  that would silently drop ~96% of lineitems; Q20 keeps the spec's
  partsupp-to-shipments join and therefore correlates only the pairs
  that exist — the spec's plan shape on sparser data.

Exactness follows operators/tpch.py: money in integer cents, one final
cast-to-double division per displayed column, LIMIT always backed by a
unique ORDER BY tiebreak. Scale notes per query docstring.

Registration happens at the bottom of this module straight from
TPCH_EXT_QUERIES/_ORACLES (single source of truth with the tests);
tests/test_tpch_ext.py mirror-verifies all six.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load

# ---------------------------------------------------------------------------
# Derived partsupp
# ---------------------------------------------------------------------------

# Shared SQL for the derived partsupp (DuckDB side). range(4) t(j) is the
# DuckDB lateral; Spark uses explode(sequence(0,3)).
# Cost formula as an inline SQL expression over arbitrary (partkey,
# suppkey) columns — partsupp derives from it AND Q9's adaptation prices
# lineitems directly with it, so the constants live in exactly one place
# per language (_cost_cents is the Spark twin).
def _cost_cents_sql(pk: str, sk: str) -> str:
    return f"({pk} * 53 + {sk} * 211) % 99901 + 100"


PARTSUPP_CTE = f"""
scnt AS (SELECT CAST(count(*) AS BIGINT) AS s_n FROM supplier),
pskeys AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + j * ((s_n // 4) + 1)) % s_n AS ps_suppkey
  FROM part, scnt, range(4) t(j)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 37 + ps_suppkey * 101) % 9999 + 1 AS ps_availqty,
         {_cost_cents_sql("ps_partkey", "ps_suppkey")} AS ps_supplycost_cents
  FROM pskeys
)"""


def _cost_cents(pk, sk):
    return (pk * 53 + sk * 211) % 99901 + 100


def partsupp(spark, sf_dir, part_filtered=None):
    """The derived partsupp DataFrame. ``part_filtered`` lets a caller
    push its part predicate BELOW the 4-way explode (Q2/Q20), so the
    derivation runs on the filtered dimension, not all parts. The 1-row
    supplier count joins via broadcast — no driver-side action."""
    p = (part_filtered if part_filtered is not None
         else load(spark, sf_dir, "part")).select("p_partkey")
    s_n = (
        load(spark, sf_dir, "supplier")
        .agg(F.count(F.lit(1)).cast("long").alias("s_n"))
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    base = p.crossJoin(F.broadcast(s_n)).select(
        "p_partkey", "s_n", j
    )
    sk = (F.col("p_partkey") + F.col("j").cast("long")
          * ((F.col("s_n") / 4).cast("long") + 1)) % F.col("s_n")
    return base.select(
        F.col("p_partkey").alias("ps_partkey"),
        sk.alias("ps_suppkey"),
        ((F.col("p_partkey") * 37 + sk * 101) % 9999 + 1).alias("ps_availqty"),
        _cost_cents(F.col("p_partkey"), sk).alias("ps_supplycost_cents"),
    )


# ---------------------------------------------------------------------------
# Derived lineitem ship extension
# ---------------------------------------------------------------------------

_SHIPMODES = ["TRUCK", "MAIL", "SHIP", "AIR", "RAIL", "FOB", "REG AIR"]

LINEEXT_CTE = f"""
lx AS (
  SELECT l.*,
         CAST(l_shipdate AS DATE) AS ship_d,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 7 + l_linenumber * 3) % 61 - 30 AS INT)
           AS commit_d,
         CAST(l_shipdate AS DATE)
           + CAST((l_orderkey * 11 + l_linenumber * 5) % 30 + 1 AS INT)
           AS receipt_d,
         ['TRUCK', 'MAIL', 'SHIP', 'AIR', 'RAIL', 'FOB', 'REG AIR'][
           CAST((l_orderkey + l_linenumber) % 7 AS INT) + 1] AS shipmode
  FROM lineitem l
)"""


def line_ext(spark, sf_dir):
    """lineitem + derived commit_d / receipt_d / shipmode (module
    docstring formulas). Pure projection — no shuffle, no UDF; the
    derivation vectorizes inside whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem")
    ship = F.to_date("l_shipdate")
    commit_off = ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 3) % 61
                  - 30).cast("int")
    receipt_off = ((F.col("l_orderkey") * 11 + F.col("l_linenumber") * 5) % 30
                   + 1).cast("int")
    mode_ix = ((F.col("l_orderkey") + F.col("l_linenumber")) % 7).cast("int")
    return li.select(
        "*",
        ship.alias("ship_d"),
        F.date_add(ship, commit_off).alias("commit_d"),
        F.date_add(ship, receipt_off).alias("receipt_d"),
        F.element_at(
            F.array(*[F.lit(m) for m in _SHIPMODES]), mode_ix + 1
        ).alias("shipmode"),
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier per part in a region
# ---------------------------------------------------------------------------

def q_sql_tpch_q2(spark, sf_dir):
    """Q2 adapted to the fixture: p_size = 10 AND p_type = 'LARGE'
    (the spec's '%BRASS' family doesn't exist here), region EUROPE,
    minimum ps_supplycost per part via a per-part window min (one pass —
    no correlated re-scan), output limited 100 with a fully unique
    ORDER BY tiebreak (ps_suppkey last). Scale: the part predicate is
    pushed BELOW the partsupp derivation; supplier|><|nation|><|region is
    a broadcast dim; the only shuffle keys the window on ps_partkey."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 10) & (F.col("p_type") == "LARGE")
    )
    ps = partsupp(spark, sf_dir, part_filtered=p)
    sup = (
        load(spark, sf_dir, "supplier")
        .join(
            load(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    best = j.withColumn(
        "min_cost", F.min("ps_supplycost_cents").over(w)
    ).filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            (F.col("ps_supplycost_cents").cast("double") / 100).alias(
                "supplycost"
            ),
            "ps_suppkey",
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            "n_name",
            "s_name",
            "p_partkey",
            "ps_suppkey",
        )
        .limit(100)
    )


_Q2_SQL = f"""
WITH {PARTSUPP_CTE.strip()},
fp AS (SELECT p_partkey FROM part WHERE p_size = 10 AND p_type = 'LARGE'),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
j AS (
  SELECT ps.*, eu.s_acctbal, eu.s_name, eu.n_name,
         min(ps_supplycost_cents)
           OVER (PARTITION BY ps_partkey) AS min_cost
  FROM partsupp ps
  JOIN fp ON ps.ps_partkey = fp.p_partkey
  JOIN eu ON ps.ps_suppkey = eu.s_suppkey
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
       CAST(ps_supplycost_cents AS DOUBLE) / 100 AS supplycost, ps_suppkey
FROM j WHERE ps_supplycost_cents = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, ps_suppkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# ---------------------------------------------------------------------------

def q_sql_tpch_q9(spark, sf_dir):
    """Q9 adapted: parts whose name contains 'red'; profit per (supplier
    nation, order year) = sum(extprice*(1-disc) - supplycost*qty), with
    the supply cost computed by the SAME deterministic formula partsupp
    derives from — lineitem's (partkey, suppkey) pairs are independent
    of the derived partsupp here (module docstring), so the spec's
    partsupp join would drop ~96% of lineitems. All terms are summed in
    exact integer cents-x-100 units; one final cast/10000 per group.
    Scale: part filter broadcasts onto the lineitem scan; the orders
    join is the one fact-fact shuffle; nation broadcasts."""
    red = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    pc = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    d = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    cost = _cost_cents(F.col("l_partkey"), F.col("l_suppkey"))
    amount = (
        pc * (100 - d) - cost * F.col("l_quantity").cast("long") * 100
    ).cast("decimal(38,0)")
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(load(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    j = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        j.withColumn("amt", amount)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum("amt").cast("double") / 10000).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                     - ({_cost_cents_sql("l_partkey", "l_suppkey")})
                       * CAST(l_quantity AS BIGINT) * 100
                AS HUGEINT)) AS DOUBLE) / 10000 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q11 — important stock identification
# ---------------------------------------------------------------------------

def q_sql_tpch_q11(spark, sf_dir):
    """Q11 adapted: nation NATION_7's partsupp value (cost x availqty,
    exact integer) per part, kept where the part's value exceeds
    0.01% of the national total. The threshold compare stays in exact
    integers (value * 10000 > total), display is one final division.
    Scale: partsupp derives from the part dim; the grand total rides a
    broadcast 1-row aggregate — no second scan of the aggregated data."""
    ps = partsupp(spark, sf_dir)
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    j = ps.join(F.broadcast(sup), ps.ps_suppkey == F.col("s_suppkey"))
    per_part = j.groupBy("ps_partkey").agg(
        F.sum(
            (F.col("ps_supplycost_cents") * F.col("ps_availqty")).cast(
                "decimal(38,0)"
            )
        ).alias("val")
    )
    total = per_part.agg(
        F.sum("val").cast("decimal(38,0)").alias("total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") * 10000 > F.col("total"))
        .select(
            "ps_partkey",
            (F.col("val").cast("double") / 100).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


_Q11_SQL = f"""
WITH {PARTSUPP_CTE.strip()},
nat AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
),
pp AS (
  SELECT ps_partkey,
         sum(CAST(ps_supplycost_cents * ps_availqty AS HUGEINT)) AS val
  FROM partsupp JOIN nat ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey
),
tot AS (SELECT sum(val) AS total FROM pp)
SELECT ps_partkey, CAST(val AS DOUBLE) / 100 AS value
FROM pp, tot
WHERE val * 10000 > total
ORDER BY value DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# Q12 — shipping modes and order priority
# ---------------------------------------------------------------------------

def q_sql_tpch_q12(spark, sf_dir):
    """Q12 on the derived ship extension: MAIL/SHIP lineitems received
    in 1998 whose commit date beat the receipt date and whose ship date
    beat the commit date, split into urgent-or-high vs other order
    priorities. Counts are exact integers. Scale: the mode/date filter
    prunes before the single orders join; priorities come broadcast-free
    off the orders row itself."""
    lx = line_ext(spark, sf_dir).filter(
        F.col("shipmode").isin("MAIL", "SHIP")
        & (F.col("commit_d") < F.col("receipt_d"))
        & (F.col("ship_d") < F.col("commit_d"))
        & (F.col("receipt_d") >= F.lit("1998-01-01").cast("date"))
        & (F.col("receipt_d") < F.lit("1999-01-01").cast("date"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lx.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("shipmode")
    )


_Q12_SQL = f"""
WITH {LINEEXT_CTE.strip()}
SELECT shipmode,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lx JOIN orders ON l_orderkey = o_orderkey
WHERE shipmode IN ('MAIL', 'SHIP')
  AND commit_d < receipt_d
  AND ship_d < commit_d
  AND receipt_d >= DATE '1998-01-01'
  AND receipt_d < DATE '1999-01-01'
GROUP BY shipmode
ORDER BY shipmode
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion
# ---------------------------------------------------------------------------

def q_sql_tpch_q20(spark, sf_dir):
    """Q20 adapted: suppliers in NATION_3 holding excess stock of 'blue'
    parts — ps_availqty > 50% of the quantity they themselves shipped of
    that part during 1997 (exact integers: availqty*2 > shipped). The
    partsupp-to-shipments join keeps only pairs that exist in lineitem
    (module docstring). Scale: the part filter pushes below both the
    partsupp derivation and the lineitem aggregation; the final supplier
    projection is a broadcast semi-join."""
    blue = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%blue%")
    ).select("p_partkey")
    ps = partsupp(spark, sf_dir, part_filtered=blue)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    excess = ps.join(
        shipped,
        (ps.ps_partkey == shipped.l_partkey)
        & (ps.ps_suppkey == shipped.l_suppkey),
    ).filter(F.col("ps_availqty") * 2 > F.col("qty"))
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        sup.join(
            excess.select("ps_suppkey").distinct(),
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_Q20_SQL = f"""
WITH {PARTSUPP_CTE.strip()},
blue AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
shipped AS (
  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN blue ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN blue ON ps_partkey = p_partkey
  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_availqty * 2 > qty
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting
# ---------------------------------------------------------------------------

def q_sql_tpch_q21(spark, sf_dir):
    """Q21 on the derived dates: suppliers in NATION_1 who were the ONLY
    late supplier (receipt_d > commit_d) on a multi-supplier finalized
    ('F') order. The exists/not-exists pair becomes two integer
    aggregates over one grouped pass — n_suppliers and n_late_suppliers
    per order via countDistinct, then the late line's supplier kept when
    it is the sole late one; no correlated re-scan of lineitem. Counts
    per supplier, top 100 with s_suppkey tiebreak. Scale: one shuffle on
    l_orderkey for the per-order supplier census, one on suppkey for the
    final count; nation/supplier broadcast."""
    lx = line_ext(spark, sf_dir).select(
        "l_orderkey", "l_suppkey",
        (F.col("receipt_d") > F.col("commit_d")).alias("late"),
    )
    census = lx.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_sup"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_sup"),
    )
    fo = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    culprits = (
        lx.filter("late")
        .join(census, "l_orderkey")
        .filter((F.col("n_sup") > 1) & (F.col("n_late_sup") == 1))
        .join(fo, F.col("l_orderkey") == F.col("o_orderkey"), "semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(
            load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        culprits.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(100)
    )


_Q21_SQL = f"""
WITH {LINEEXT_CTE.strip()},
lk AS (
  SELECT l_orderkey, l_suppkey, receipt_d > commit_d AS late FROM lx
),
census AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_sup,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_sup
  FROM lk GROUP BY l_orderkey
),
culprits AS (
  SELECT DISTINCT lk.l_orderkey, lk.l_suppkey
  FROM lk
  JOIN census USING (l_orderkey)
  JOIN orders ON lk.l_orderkey = o_orderkey AND o_orderstatus = 'F'
  WHERE lk.late AND census.n_sup > 1 AND census.n_late_sup = 1
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM culprits
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 100
"""


TPCH_EXT_QUERIES = {
    "q_sql_tpch_q2": q_sql_tpch_q2,
    "q_sql_tpch_q9": q_sql_tpch_q9,
    "q_sql_tpch_q11": q_sql_tpch_q11,
    "q_sql_tpch_q12": q_sql_tpch_q12,
    "q_sql_tpch_q20": q_sql_tpch_q20,
    "q_sql_tpch_q21": q_sql_tpch_q21,
}

TPCH_EXT_ORACLES = {
    "q_sql_tpch_q2": _Q2_SQL,
    "q_sql_tpch_q9": _Q9_SQL,
    "q_sql_tpch_q11": _Q11_SQL,
    "q_sql_tpch_q12": _Q12_SQL,
    "q_sql_tpch_q20": _Q20_SQL,
    "q_sql_tpch_q21": _Q21_SQL,
}

# r9 registration (VERDICT r8 task 3 lifts the freeze for exactly these
# six): the staged dicts ARE the registration source, so the keys cannot
# drift from what tests/test_tpch_ext.py mirror-verifies. All six are
# slotted in _ROUND9_PRIORITY (registration is a change — their first
# driver rows must land this round).
for _k in TPCH_EXT_QUERIES:
    query(_k, oracle=TPCH_EXT_ORACLES[_k])(TPCH_EXT_QUERIES[_k])
del _k
