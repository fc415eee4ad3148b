"""Join family (§2.3 J1-J12): equi (shuffle + broadcast), all outer shapes,
semi/anti, cross, theta/band, interval-overlap, as-of, multi-key self join.

Scale notes:
  * J2 pins ``F.broadcast`` on dimension tables — at 100 TB the fact side
    never shuffles for dim joins; AQE would do this for small sides anyway,
    the hint makes it deterministic.
  * J9/J10 (non-equi) broadcast the *small interval* side so the physical
    plan is BroadcastNestedLoop with a bounded build side — never NLJ over
    two big inputs.
  * J11 (as-of) is the union+window formulation: sort-once within user
    partitions, no pandas round-trip, scales with the shuffle. (The
    ``ps.merge_asof`` alternative exists but crosses into pandas-on-Spark;
    see SURVEY.md §2.3 J11.)
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


@query(
    "q_join_inner_shuffle",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
       round(l.l_extendedprice, 2) AS price, round(o.o_totalprice, 2) AS total
FROM (SELECT * FROM lineitem WHERE l_orderkey < 4000) l
JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
)
def q_join_inner_shuffle(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 4000)
    o = load(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderstatus",
        F.round("l_extendedprice", 2).alias("price"),
        F.round("o_totalprice", 2).alias("total"),
    )


@query(
    "q_join_broadcast",
    oracle="""
SELECT c.c_custkey, n.n_name, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def q_join_broadcast(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "q_join_left_outer",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS total
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
       ON c.c_custkey = o.o_custkey
""",
)
def q_join_left_outer(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total")
    )


@query(
    "q_join_right_outer",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def q_join_right_outer(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_full_outer",
    oracle="""
SELECT coalesce(cu.nk, su.nk) AS nationkey, cu.n_cust, su.n_supp
FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) cu
FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp
           FROM supplier WHERE s_acctbal < -500 GROUP BY s_nationkey) su
       ON cu.nk = su.nk
""",
)
def q_join_full_outer(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cu = (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    su = (
        s.filter(F.col("s_acctbal") < -500)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cu.join(su, "nk", "full").select(
        F.col("nk").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "q_join_semi",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def q_join_semi(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_anti",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
""",
)
def q_join_anti(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "q_join_cross",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
)
def q_join_cross(spark, sf_dir):
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta_band",
    oracle="""
SELECT b.band, count(*) AS n_cust, round(sum(c.c_acctbal), 2) AS sum_bal
FROM customer c
JOIN (VALUES ('neg', -100000.0, 0.0), ('low', 0.0, 3000.0),
             ('mid', 3000.0, 7000.0), ('high', 7000.0, 100000.0)) b(band, lo, hi)
  ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
GROUP BY b.band
""",
)
def q_join_theta_band(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    bands = spark.createDataFrame(
        [("neg", -100000.0, 0.0), ("low", 0.0, 3000.0), ("mid", 3000.0, 7000.0), ("high", 7000.0, 100000.0)],
        "band string, lo double, hi double",
    )
    # broadcast the tiny band table: BroadcastNestedLoop with 4-row build side
    return (
        c.join(F.broadcast(bands), (c.c_acctbal >= bands.lo) & (c.c_acctbal < bands.hi))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@query(
    "q_join_interval_overlap",
    oracle="""
SELECT iv.i AS interval_id, count(*) AS n_events, round(sum(e.value), 2) AS sum_value
FROM (SELECT i, TIMESTAMP '2024-01-01' + i * INTERVAL 1 DAY AS lo,
             TIMESTAMP '2024-01-01' + (i + 3) * INTERVAL 1 DAY AS hi
      FROM range(30) t(i)) iv
JOIN events e ON e.ts::TIMESTAMP >= iv.lo AND e.ts::TIMESTAMP < iv.hi
GROUP BY iv.i
""",
)
def q_join_interval_overlap(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    iv = spark.range(30).select(
        F.col("id").alias("i"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(days=F.col("id").cast("int"))).alias("lo"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(days=(F.col("id") + 3).cast("int"))).alias("hi"),
    )
    return (
        e.join(F.broadcast(iv), (e.ts >= iv.lo) & (e.ts < iv.hi))
        .groupBy(F.col("i").alias("interval_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "q_join_asof",
    oracle="""
SELECT e.event_id, e.user_id, e.ts::TIMESTAMP AS err_ts, p.ts::TIMESTAMP AS last_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts::TIMESTAMP >= p.ts::TIMESTAMP
""",
)
def q_join_asof(spark, sf_dir):
    """As-of join: for each error event, the latest purchase by the same
    user at-or-before its timestamp.

    Spark-first formulation: tag both sides, union, and take
    ``last(purchase_ts) IGNORE NULLS`` over a per-user window ordered by
    (ts, side) — one shuffle on user_id, no pandas round-trip, scales to
    arbitrary input (vs. DuckDB's native ASOF JOIN in the oracle).

    The oracle's ON clause casts BOTH sides ::TIMESTAMP so the comparison
    happens at the same µs precision load() normalizes to — on a
    ns-precision fixture regeneration a raw `e.ts >= p.ts` would compare
    nanoseconds and diverge on same-µs/different-ns pairs.

    r6: the tag-and-union is a single scan with a conditional projection,
    not a self-union of two filtered scans — the r5 bench showed the
    two-scan shape was the ONE query that got slower with more input
    splits (asof 0.166 s single-file -> 0.239 s at 8 splits: twice the
    scan tasks plus a two-branch union feeding the exchange). One scan,
    one shuffle, same window, identical semantics.
    """
    e = load(spark, sf_dir, "events")
    is_p = (F.col("event_type") == "purchase").cast("int")
    u = (
        e.filter(F.col("event_type").isin("error", "purchase"))
        .select(
            "event_id",
            "user_id",
            "ts",
            is_p.alias("is_p"),
            F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
        )
    )
    # purchases sort BEFORE errors at equal ts (is_p desc) so ts-ties match,
    # mirroring ASOF's >= semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("last_p_ts", F.last("p_ts", ignorenulls=True).over(w))
    return u.filter(F.col("is_p") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("err_ts"),
        F.col("last_p_ts").alias("last_purchase_ts"),
    )


@query(
    "q_join_salted_skew",
    oracle="""
WITH f AS (
  SELECT CASE WHEN o_orderkey % 10 < 7 THEN 1 ELSE o_custkey END AS key,
         o_totalprice
  FROM orders
)
SELECT f.key, c.c_mktsegment, count(*) AS n, round(sum(f.o_totalprice), 2) AS total
FROM f JOIN customer c ON f.key = c.c_custkey
GROUP BY f.key, c.c_mktsegment
""",
)
def q_join_salted_skew(spark, sf_dir):
    """Salted join (r2 extra): the manual skew cure the task brief names.

    The fact side is deliberately skewed — ~70% of rows share key 1 — so a
    plain shuffle join puts 70% of the data in ONE task. Salting: the fact
    side gets salt = hash%S, the dimension side is replicated S ways with
    every salt, and the join key becomes (key, salt) — the hot key's rows
    spread across S tasks. Results are identical to the unsalted join
    (oracle is the plain SQL join). AQE skew-join handles this adaptively;
    salting is the deterministic form that also works mid-pipeline where
    AQE cannot split (e.g. before a window)."""
    S = 8
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    fact = o.select(
        F.when(F.col("o_orderkey") % 10 < 7, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("key"),
        "o_totalprice",
    ).withColumn("salt", F.pmod(F.xxhash64("o_totalprice", "key"), F.lit(S)).cast("int"))
    salts = spark.range(S).select(F.col("id").cast("int").alias("salt"))
    dim = c.select(F.col("c_custkey").alias("key"), "c_mktsegment").crossJoin(
        F.broadcast(salts)
    )
    return (
        fact.join(dim, ["key", "salt"])
        .groupBy("key", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q_join_bucketed",
    oracle="""
SELECT l.l_orderkey, count(*) AS n_lines, round(sum(l.l_extendedprice), 2) AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_orderkey < 4000
GROUP BY l.l_orderkey
""",
)
def q_join_bucketed(spark, sf_dir):
    """Bucketed co-located join (r2 extra): both sides saved with
    ``bucketBy(8, join_key)`` — the join and the join-key aggregation then
    run with ZERO exchanges (bucketed scans already satisfy the required
    distribution; asserted in tests/test_plans.py). This is the
    pre-partitioning story for repeated 100 TB fact-fact joins: pay the
    shuffle once at write time, never again per query. The merge hint pins
    SortMergeJoin so the co-location (not a broadcast) is what's proven."""
    import hashlib
    import os
    import shutil
    import tempfile

    from wikidata2pg_spark.util import source_stamp

    # table name + location fold in the SOURCE content stamp: a driver
    # fixture regeneration lands the bucketed copies at a fresh location
    # instead of re-registering stale buckets (review finding r4)
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:6] + source_stamp(
        sf_dir, "lineitem", "orders"
    )[:6]
    li_t, o_t = f"li_bucketed_{h}", f"o_bucketed_{h}"
    # external-table locations: the warehouse dir outlives the in-memory
    # catalog, so a fresh session may find committed data on disk with no
    # catalog entry
    wh = os.path.join(tempfile.gettempdir(), "wikidata2pg_spark", h, "bucketed")

    def _ensure(table: str, key: str, cols_ddl: str, build) -> None:
        if spark.catalog.tableExists(table):
            return
        loc = os.path.join(wh, table)
        if os.path.exists(os.path.join(loc, "_SUCCESS")):
            # committed by an earlier session: register an external bucketed
            # table over the existing files instead of rmtree+rewrite (the
            # old path could delete a location a concurrent session was
            # reading — VERDICT r2/r3 standing item)
            spark.sql(
                f"CREATE TABLE {table} ({cols_ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS "
                f"LOCATION '{loc}'"
            )
            return
        shutil.rmtree(loc, ignore_errors=True)  # uncommitted partial output only
        build().write.mode("overwrite").option("path", loc).bucketBy(8, key).sortBy(
            key
        ).saveAsTable(table)

    _ensure(
        li_t,
        "l_orderkey",
        "l_orderkey BIGINT, l_extendedprice DOUBLE",
        lambda: load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .filter(F.col("l_orderkey") < 4000),
    )
    _ensure(
        o_t,
        "o_orderkey",
        "o_orderkey BIGINT",
        lambda: load(spark, sf_dir, "orders").select("o_orderkey"),
    )
    li_b = spark.table(li_t)
    o_b = spark.table(o_t)
    return (
        li_b.hint("merge")
        .join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_join_multikey_self",
    oracle="""
SELECT a.o_custkey, a.o_orderstatus, a.o_orderkey AS k1, b.o_orderkey AS k2
FROM (SELECT * FROM orders WHERE o_custkey < 300) a
JOIN (SELECT * FROM orders WHERE o_custkey < 300) b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderstatus = b.o_orderstatus
 AND a.o_orderkey < b.o_orderkey
""",
)
def q_join_multikey_self(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    a = o.alias("a")
    b = o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderstatus") == F.col("b.o_orderstatus"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderstatus").alias("o_orderstatus"),
            F.col("a.o_orderkey").alias("k1"),
            F.col("b.o_orderkey").alias("k2"),
        )
    )


@query(
    "q_join_spatial_grid",
    oracle="""
WITH pts AS (
  SELECT c_custkey AS id,
         (c_custkey % 40) + (c_custkey % 7) * 0.15 AS lat,
         ((c_custkey * 3) % 40) + (c_custkey % 11) * 0.09 AS lon
  FROM customer WHERE c_custkey < 2000
)
SELECT a.id AS id_a, b.id AS id_b,
       round(sqrt((a.lat - b.lat) * (a.lat - b.lat)
                  + (a.lon - b.lon) * (a.lon - b.lon)), 4) AS dist
FROM pts a JOIN pts b ON a.id < b.id
WHERE sqrt((a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon)) <= 1.0
""",
)
def q_join_spatial_grid(spark, sf_dir):
    """Spatial distance self-join via GRID BUCKETING — find all point pairs
    within distance 1.0 without the all-pairs cross join. Each point gets a
    home cell (floor(lat), floor(lon)); one side is replicated to its 3x3
    cell neighborhood (a bounded 9x blowup), the join is a plain equi-join
    on the cell key, and the exact distance predicate filters inside the
    matched cell — so the pair space is per-cell-local, never O(n²). This
    is the standard scale shape for distance joins (the same
    bucket-then-refine pattern as the LSH/minhash family, with the grid as
    the hash); the DuckDB oracle is the direct theta-join, tractable on the
    bounded fixture while the Spark side is the 100 TB plan. Points are
    derived deterministically from customer keys (integer-and-literal
    arithmetic — identical IEEE doubles on both engines)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 2000)
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") % 40) + (F.col("c_custkey") % 7) * 0.15).alias("lat"),
        (((F.col("c_custkey") * 3) % 40) + (F.col("c_custkey") % 11) * 0.09).alias(
            "lon"
        ),
    )
    home = pts.withColumn("cx", F.floor("lat")).withColumn("cy", F.floor("lon"))
    probe = (
        pts.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            (F.floor("lat") + F.col("dx")).alias("cx"),
            (F.floor("lon") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("lat") - F.col("lat_b")) * (F.col("lat") - F.col("lat_b")) + (
        F.col("lon") - F.col("lon_b")
    ) * (F.col("lon") - F.col("lon_b"))
    return (
        home.join(probe, ["cx", "cy"])
        .filter((F.col("id") < F.col("id_b")) & (F.sqrt(d2) <= 1.0))
        .select(
            F.col("id").alias("id_a"),
            F.col("id_b"),
            F.round(F.sqrt(d2), 4).alias("dist"),
        )
        # No distinct needed: for a fixed pair, a's single home cell meets
        # exactly one of b's nine replicas, so each pair matches once.
    )


@query(
    "q_join_bloom_prefilter",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000
)
GROUP BY l_returnflag
""",
)
def q_join_bloom_prefilter(spark, sf_dir):
    """Semi-join with an explicit Bloom prefilter — the 100 TB pattern for
    "filter a huge fact by a dim that is selective but too big to
    broadcast". Phase 1 builds the dim's Bloom bucket set (two xxhash64
    functions into m=2^16 buckets) and broadcasts THAT — the bucket set is
    bounded by m rows no matter how large the dim grows, so the fact side
    never shuffles for the prefilter; a candidate must hit on BOTH hashes
    (FPR ~= load^2). Phase 2 runs the exact semi-join over the survivors
    only, so the expensive join moves ~selectivity+FPR of the fact instead
    of all of it. The result is EXACTLY the plain semi-join (the Bloom
    phase only drops guaranteed non-members), which is what the oracle
    pins. Spark 3.3+'s runtime row-group Bloom (InjectRuntimeFilter) does
    this automatically for shuffle joins; the explicit form also covers
    sinks/streams where the rule does not fire. At production scale m
    scales with |dim| (~10 bits/key); 2^16 is sized for the fixtures.
    Test coverage: test_behavioral.py asserts the phase-1 survivor count
    at sf0.01 is well under the fact size AND above the true match count."""
    m = 1 << 16
    dim = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000)
        )
        .select("o_orderkey")
    )
    h = lambda c, seed: F.pmod(F.xxhash64(F.col(c), F.lit(seed)), F.lit(m))  # noqa: E731
    bset = dim.select(
        F.explode(F.array(h("o_orderkey", 1), h("o_orderkey", 2))).alias("b")
    ).distinct()
    li = load(spark, sf_dir, "lineitem")
    survivors = li.join(
        F.broadcast(bset), h("l_orderkey", 1) == F.col("b"), "leftsemi"
    ).join(F.broadcast(bset), h("l_orderkey", 2) == F.col("b"), "leftsemi")
    exact = survivors.join(
        F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey"), "leftsemi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
SELECT e.event_id, e.user_id, e.ts::TIMESTAMP AS err_ts,
       CASE WHEN p.ts IS NOT NULL
             AND e.ts::TIMESTAMP - p.ts::TIMESTAMP <= INTERVAL 2 HOUR
            THEN p.ts::TIMESTAMP END AS recent_purchase_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts::TIMESTAMP >= p.ts::TIMESTAMP
""",
)
def q_join_asof_tolerance(spark, sf_dir):
    """As-of join WITH a tolerance bound (pandas merge_asof's
    `tolerance=` semantics): the latest same-user purchase at-or-before
    each error, but only if it happened within the last 2 hours —
    otherwise NULL, because a stale match is as useless as none for
    "what did the user buy just before the error". Same single-scan
    tag-and-union window as q_join_asof (one shuffle, no pandas); the
    tolerance is a post-window NULL-out, which costs nothing and keeps
    the window state identical. The comparison runs on exact integer
    microseconds on both sides."""
    e = load(spark, sf_dir, "events")
    is_p = (F.col("event_type") == "purchase").cast("int")
    u = e.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        is_p.alias("is_p"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("last_p_ts", F.last("p_ts", ignorenulls=True).over(w))
    within = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_p_ts"))
        <= 2 * 3600 * 1_000_000
    )
    return u.filter(F.col("is_p") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("err_ts"),
        F.when(within, F.col("last_p_ts")).alias("recent_purchase_ts"),
    )


@query(
    "q_join_asof_forward",
    oracle="""
SELECT e.event_id, e.user_id, e.ts::TIMESTAMP AS err_ts,
       (SELECT min(p.ts::TIMESTAMP) FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
          AND p.ts::TIMESTAMP >= e.ts::TIMESTAMP) AS next_purchase_ts
FROM events e WHERE e.event_type = 'error'
""",
)
def q_join_asof_forward(spark, sf_dir):
    """FORWARD as-of join (pandas merge_asof direction='forward'): for
    each error event, the EARLIEST same-user purchase at-or-after its
    timestamp — "what did the user buy next after hitting the error",
    the mirror of q_join_asof's backward direction. Same single-scan
    tag-and-union shape, with the window flipped to the FOLLOWING
    frame: first(purchase_ts) IGNORE NULLS over [current, +inf) in
    (ts, is_p, event_id) ascending order — errors (is_p=0) sort BEFORE
    same-microsecond purchases so ts-ties match, mirroring >= forward
    semantics. One shuffle on user_id, no pandas; the oracle is the
    definitionally-obvious correlated min() (DuckDB decorrelates it).
    """
    e = load(spark, sf_dir, "events")
    is_p = (F.col("event_type") == "purchase").cast("int")
    u = e.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        is_p.alias("is_p"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_p").asc(), F.col("event_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = u.withColumn("next_p_ts", F.first("p_ts", ignorenulls=True).over(w))
    return u.filter(F.col("is_p") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("err_ts"),
        F.col("next_p_ts").alias("next_purchase_ts"),
    )


@query(
    "q_join_dpp",
    oracle="""
WITH f AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         strftime(date_trunc('month', o_orderdate::TIMESTAMP), '%Y-%m') AS om
  FROM orders
), d AS (
  SELECT om, CAST(floor((CAST(substr(om, 6, 2) AS BIGINT) - 1) / 3)
                  AS BIGINT) + 1 AS quarter
  FROM (SELECT DISTINCT om FROM f) z
)
SELECT f.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(f.cents) AS BIGINT) AS sum_cents
FROM f JOIN d ON f.om = d.om
WHERE d.quarter = 1
GROUP BY f.o_orderpriority
""",
)
def q_join_dpp(spark, sf_dir):
    """Dynamic partition pruning: the fact side is a month-partitioned
    parquet copy of orders (a content-stamped derived artifact, the
    q_join_bucketed pattern) and the dim side is a tiny month->quarter
    table filtered to Q1; Catalyst injects the dim's surviving join
    keys as a runtime partition filter on the fact SCAN, so only the
    ~1/4 of partition directories matching Q1 months are read at all —
    the star-schema accelerant that matters most at 100 TB, where a
    static planner cannot know the filter's partition set.
    tests/test_plans.py asserts the scan carries a dynamicpruning
    expression AND that the pruned scan reads fewer files than the
    partition total. The dim broadcasts; money is exact integer cents
    computed AT WRITE TIME so the aggregate is pure int64."""
    import os
    import shutil

    from wikidata2pg_spark.util import tmpdir_for

    om = F.date_format("o_orderdate", "yyyy-MM")
    loc = tmpdir_for(sf_dir, "dpp-orders-by-month", "orders")
    src = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        om.alias("om"),
    )
    if not os.path.exists(os.path.join(loc, "_SUCCESS")):
        shutil.rmtree(loc, ignore_errors=True)
        src.write.mode("overwrite").partitionBy("om").parquet(loc)
    # explicit schema on readback (r7 empty-input sweep): a partitioned
    # write of an EMPTY orders table leaves no part directories, and
    # schema inference then fails; reusing the WRITER frame's schema
    # (the scans.py pattern) keeps reader and writer mechanically in
    # sync — a drifting hand-written schema string would silently read
    # absent columns as NULL instead of erroring.
    fact = spark.read.schema(src.schema).parquet(loc)
    dim = (
        load(spark, sf_dir, "orders")
        .select(om.alias("om"))
        .distinct()
        .withColumn(
            "quarter",
            F.floor((F.substring("om", 6, 2).cast("long") - 1) / 3).cast("long")
            + 1,
        )
    )
    return (
        fact.join(F.broadcast(dim.filter(F.col("quarter") == 1)), "om")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
    )


@query(
    "q_join_asof_nearest",
    oracle="""
SELECT e.event_id, e.user_id,
       (SELECT epoch_us(p.ts::TIMESTAMP)
        FROM events p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
        ORDER BY abs(epoch_us(p.ts::TIMESTAMP)
                     - epoch_us(e.ts::TIMESTAMP)),
                 epoch_us(p.ts::TIMESTAMP)
        LIMIT 1) AS nearest_p_us,
       (SELECT epoch_us(p.ts::TIMESTAMP)
        FROM events p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
        ORDER BY abs(epoch_us(p.ts::TIMESTAMP)
                     - epoch_us(e.ts::TIMESTAMP)),
                 epoch_us(p.ts::TIMESTAMP)
        LIMIT 1) - epoch_us(e.ts::TIMESTAMP) AS gap_us
FROM events e WHERE e.event_type = 'error'
""",
)
def q_join_asof_nearest(spark, sf_dir):
    """merge_asof direction='nearest': for each error, the same-user
    purchase with the SMALLEST absolute time distance, ties to the
    earlier purchase — completing the as-of family next to backward
    (q_join_asof), forward (q_join_asof_forward) and tolerance
    (q_join_asof_tolerance). One tag-and-union scan feeds BOTH
    directional windows (last-before via the preceding frame, first
    -after via the following frame) on ONE user_id exchange; the
    nearest pick is a null-safe integer-microsecond comparison where
    the <= tie rule selects the backward (earlier) candidate, exactly
    matching the oracle's (|dt|, ts) correlated-min order. The oracle
    is the definitionally-obvious per-row minimum; the Spark side is
    the O(n log n) windowed formulation that actually scales."""
    e = load(spark, sf_dir, "events")
    is_p = (F.col("event_type") == "purchase").cast("int")
    u = e.filter(F.col("event_type").isin("error", "purchase")).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t"),
        is_p.alias("is_p"),
        F.when(
            F.col("event_type") == "purchase", F.unix_micros("ts")
        ).alias("p_t"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_p").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_p").desc(), F.col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = u.withColumn(
        "bwd", F.last("p_t", ignorenulls=True).over(wb)
    ).withColumn("fwd", F.first("p_t", ignorenulls=True).over(wf))
    err = u.filter(F.col("is_p") == 0)
    nearest = (
        F.when(F.col("bwd").isNull(), F.col("fwd"))
        .when(F.col("fwd").isNull(), F.col("bwd"))
        .when(
            F.col("t") - F.col("bwd") <= F.col("fwd") - F.col("t"),
            F.col("bwd"),
        )
        .otherwise(F.col("fwd"))
    )
    return err.select(
        "event_id",
        "user_id",
        nearest.alias("nearest_p_us"),
        (nearest - F.col("t")).alias("gap_us"),
    )


@query(
    "q_join_null_safe",
    oracle="""
WITH f AS (
  SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_n
  FROM orders WHERE o_orderkey < 3000
), d AS (
  SELECT nullif(o_orderstatus, 'P') AS status_n,
         CAST(min(o_orderkey) AS BIGINT) AS rep_key,
         CAST(count(*) AS BIGINT) AS grp_n
  FROM orders GROUP BY 1
)
SELECT f.o_orderkey, f.status_n, d.rep_key, d.grp_n
FROM f JOIN d ON f.status_n IS NOT DISTINCT FROM d.status_n
""",
)
def q_join_null_safe(spark, sf_dir):
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM) — the join
    variant where NULL keys MATCH each other instead of silently
    dropping (the dimension-with-an-unknown-bucket pattern: here the
    'P' status maps to NULL on both sides and those rows must still
    find their group row). A plain equi join would lose every
    NULL-keyed fact row — the pytest twin asserts exactly that
    difference. Spark plans eqNullSafe equi-conditions as a hash join
    on coalesced key + null flag (still broadcastable/shuffleable —
    NOT a nested-loop degeneration), so the shape scales like J1/J2.
    All output columns are exact integers/strings."""
    o = load(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    f = o.filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey", st.alias("status_n")
    )
    # dim: representative key + group size per (nullable) status
    d = (
        o.select(st.alias("ds"), "o_orderkey")
        .groupBy("ds")
        .agg(
            F.min("o_orderkey").cast("long").alias("rep_key"),
            F.count(F.lit(1)).cast("long").alias("grp_n"),
        )
    )
    j = f.join(F.broadcast(d), f["status_n"].eqNullSafe(d["ds"]))
    return j.select("o_orderkey", "status_n", "rep_key", "grp_n")
