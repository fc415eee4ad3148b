"""Window functions (§2.5 W1-W8): ranking, offsets, moving/range frames.

Determinism rule (FIXTURES.md rule 2): every ORDER BY inside a window ends
with a unique tiebreaker so ranking/offset results are stable across engines
and partitionings. Computed integer ranks are cast to BIGINT on both sides
(Spark emits int32, DuckDB int64 — schema must agree).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


@query(
    "q_win_row_number",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
FROM orders
WHERE o_custkey < 500
""",
)
def q_win_row_number(spark, sf_dir):
    # o_custkey < 500 bounds every windowed result to ~5k rows — partition
    # contents stay intact (the filter is on the partition key), only the
    # driver-side canonicalization gets cheaper (VERDICT r1 #1b).
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
    )


@query(
    "q_win_rank_dense",
    oracle="""
SELECT p_brand, p_partkey,
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS BIGINT) AS rk,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS BIGINT) AS drk
FROM part
""",
)
def q_win_rank_dense(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    w_rk = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    w_drk = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w_rk).cast("long").alias("rk"),
        F.dense_rank().over(w_drk).cast("long").alias("drk"),
    )


@query(
    "q_win_ntile",
    oracle="""
SELECT o_orderkey,
       CAST(ntile(4) OVER (ORDER BY o_totalprice NULLS LAST, o_orderkey) AS BIGINT)
         AS quartile
FROM orders
WHERE o_orderkey < 16000
""",
)
def q_win_ntile(spark, sf_dir):
    # GLOBAL window by design (ntile needs a total order): single-task at
    # any size, so the input is filter-bounded. This key proves the ntile
    # API surface; q_win_ntile_distributed below is the scale form — the
    # same answer from a two-pass rank+count with no full-input funnel.
    # NULL prices rank LAST, explicit on BOTH sides (Spark's ASC default
    # is NULLS FIRST, DuckDB's NULLS LAST — r7 NULL-measure sweep catch).
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 16000)
    w = Window.orderBy(F.col("o_totalprice").asc_nulls_last(), "o_orderkey")
    return o.select("o_orderkey", F.ntile(4).over(w).cast("long").alias("quartile"))


@query(
    "q_win_ntile_distributed",
    oracle="""
SELECT o_orderkey,
       CAST(ntile(4) OVER (ORDER BY o_totalprice NULLS LAST, o_orderkey) AS BIGINT)
         AS quartile
FROM orders
""",
)
def q_win_ntile_distributed(spark, sf_dir):
    """Global ntile WITHOUT the single-task total-order window (closes the
    q_win_ntile caveat, VERDICT r4 task 2). Two-pass distributed global
    rank, the q_pack_sequences prefix-sum shape:

      1. range-partition on the ordering key — partition p holds keys all
         smaller than partition p+1's (range partition ids are ascending
         in key order);
      2. row_number WITHIN each partition (parallel, no global sort);
      3. per-partition counts -> P-row broadcast prefix offsets, so
         global_rank = offset[pid] + local_rank;
      4. ntile's bucket boundaries from (global_rank, N): the first
         N mod n buckets get ceil(N/n) rows, the rest floor(N/n) —
         exactly SQL NTILE semantics, computed as column arithmetic.

    The ONLY single-partition funnel is the P-row offsets aggregate
    (asserted in tests/test_plans.py): at 100 TB the full input never
    passes through one task, unlike the ntile()-over-global-Window plan."""
    NBUCKETS = 4
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = _global_rank(o, "o_totalprice", "o_orderkey")
    rn = F.col("global_rank")
    n = F.col("n_total")
    q = (n / NBUCKETS).cast("long")  # floor bucket size
    r = n % NBUCKETS  # first r buckets take q+1 rows
    boundary = r * (q + F.lit(1))
    quartile = F.when(
        rn <= boundary, ((rn - 1) / (q + 1)).cast("long") + 1
    ).otherwise(
        r + ((rn - boundary - 1) / F.greatest(q, F.lit(1))).cast("long") + 1
    )
    return ranked.select("o_orderkey", quartile.cast("long").alias("quartile"))


def floor_round6(c):
    """floor(x*1e6 + 0.5)/1e6 — the dialect-free half-away-from-zero
    rounding both percent_rank keys (and their oracles) rely on: rank
    ratios land EXACTLY on 6-decimal halves, where Spark round() (HALF_UP
    on the decimal expansion) and DuckDB round() (half-to-even) disagree.
    One definition so the two keys cannot diverge in rounding rule."""
    return F.floor(c * 1e6 + F.lit(0.5)) / 1e6


def ordered_bucket(df, order_col: str, nparts: int):
    """Deterministic, order-preserving bucket id ``pid`` in [0, nparts):
    equal-width over (min, max) of ``order_col``, the range coming from a
    broadcast 1-row aggregate.

    This replaces ``repartitionByRange + spark_partition_id()`` in every
    two-pass prefix-sum/rank operator. That pattern is NOT deterministic:
    the ranged exchange samples its boundaries per execution, and when the
    same subtree feeds two consumers (the per-partition pass AND the
    per-partition-totals pass) Spark may execute it twice with DIFFERENT
    sampled boundaries — observed at sf0.1 as q_pipeline_pretraining
    offsets drifting by ~1200 tokens mid-corpus while sf0.01 stayed green
    (exchange reuse happened to hold there). A pid that is a pure function
    of the row can never disagree between branches, at any scale, under
    any reuse decision. Equal-width is fine for roughly uniform keys; for
    heavily clustered keys substitute equi-depth cutpoints from
    percentile_approx (q_agg_bucketize_equidepth's shape) — also a pure
    function of the data.

    NULL order values go to the LAST bucket (the repo's NULLS LAST
    ranking convention — DuckDB's ASC default and both engines' DESC
    default): without the explicit branch a NULL value propagates a
    NULL pid, and the downstream inner join on pid silently DROPS the
    row (r7 NULL-measure sweep catch). Within-bucket ordering must
    pair this with asc_nulls_last so NULLs also sort after the
    largest real values sharing that bucket (_global_rank does)."""
    lo, hi = f"_blo_{order_col}", f"_bhi_{order_col}"
    rng = df.agg(F.min(order_col).alias(lo), F.max(order_col).alias(hi))
    b = df.crossJoin(F.broadcast(rng))
    span = (F.col(hi) - F.col(lo)).cast("double")
    pos = (F.col(order_col) - F.col(lo)).cast("double")
    pid = (
        F.when(F.col(order_col).isNull(), F.lit(nparts - 1))
        .when(span <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(nparts - 1).cast("long"),
                F.floor(pos * nparts / (span * (1.0 + 1e-12))),
            )
        )
        .cast("int")
    )
    return b.withColumn("pid", pid).drop(lo, hi)


def _global_rank(df, *order_cols: str, nparts: int = 8):
    """Two-pass distributed global row_number over ``order_cols`` (must be
    a unique composite for determinism): deterministic ordered bucketing
    on the leading column, rank within each bucket, add broadcast P-row
    prefix offsets. Output = input columns plus ``global_rank`` (1-based)
    and ``n_total``. The only single-partition stage is the P-row offsets
    window. Bucket ids are a pure function of the row (ordered_bucket) —
    see its docstring for why physical partition ids are unsafe here.
    NULL order values rank LAST (asc_nulls_last within the bucket +
    ordered_bucket's last-bucket assignment — the repo convention every
    ranking oracle spells as NULLS LAST)."""
    parts = ordered_bucket(df, order_cols[0], nparts)
    within = Window.partitionBy("pid").orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    ranked = parts.withColumn("local_rank", F.row_number().over(within))
    counts = parts.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    wtot = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("poff"),
        F.sum("cnt").over(wtot).alias("n_total"),
    )
    return (
        ranked.join(F.broadcast(offs), "pid")
        .withColumn("global_rank", F.col("poff") + F.col("local_rank"))
        .drop("pid", "local_rank", "poff")
    )


def global_cumsum(df, order_cols: tuple, cols: dict, nparts: int = 16):
    """Distributed global running sums over ``order_cols`` (leading
    column must place ties in one bucket, which ordered_bucket
    guarantees for any pure value): ``cols`` maps input column ->
    output running-sum column. Two-pass: within-bucket running sums
    share one pid-keyed window, per-bucket totals collapse to P rows,
    and the broadcast EXCLUSIVE prefix totals lift each bucket to the
    global frame. Exact for integer inputs (addition is
    order-invariant); the only single-partition stage carries the
    P-row totals (the _global_rank shape — r7, closing the
    q_win_concurrency / q_text_vocab_growth hits of the blanket
    SinglePartition sweep in tools/plan_sweep.py). NULL order values
    rank LAST (asc_nulls_last, pairing with ordered_bucket's
    last-bucket routing — enforced here, not left to callers)."""
    parts = ordered_bucket(df, order_cols[0], nparts)
    wloc = (
        Window.partitionBy("pid")
        .orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = parts.select(
        "*", *[F.sum(src).over(wloc).alias(dst) for src, dst in cols.items()]
    )
    totals = parts.groupBy("pid").agg(
        *[F.sum(src).alias(f"_t_{dst}") for src, dst in cols.items()]
    )
    wpre = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    pre = totals.select(
        "pid",
        *[
            F.coalesce(F.sum(f"_t_{dst}").over(wpre), F.lit(0)).alias(f"_p_{dst}")
            for dst in cols.values()
        ],
    )
    out = loc.join(F.broadcast(pre), "pid")
    for dst in cols.values():
        out = out.withColumn(dst, F.col(dst) + F.col(f"_p_{dst}"))
    return out.drop("pid", *[f"_p_{dst}" for dst in cols.values()])


@query(
    "q_win_percent_rank_distributed",
    oracle="""
SELECT o_orderkey,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd
FROM orders
WINDOW w AS (ORDER BY o_totalprice NULLS LAST, o_orderkey)
""",
)
def q_win_percent_rank_distributed(spark, sf_dir):
    """q_win_percent_rank's scale form, over the FULL orders table: with a
    unique ordering key, percent_rank = (rank-1)/(N-1) and
    cume_dist = rank/N, both derivable from the two-pass global rank —
    no single-task window over the input (same shape as
    q_win_ntile_distributed; closes the other global-window caveat).
    floor(x*1e6 + 0.5) rounding — see q_win_percent_rank (half-to-even vs
    half-up flips on exact 6-decimal halves at sf0.1)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = _global_rank(o, "o_totalprice", "o_orderkey")
    rn, n = F.col("global_rank"), F.col("n_total")
    pr = F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0))  # SQL: 0 for N=1
    return ranked.select(
        "o_orderkey",
        floor_round6(pr).alias("pr"),
        floor_round6(rn / n).alias("cd"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice, 1, -1.0) OVER w, 2) AS prev_total,
       round(lead(o_totalprice, 1, -1.0) OVER w, 2) AS next_total
FROM orders
WHERE o_custkey < 500
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q_win_lag_lead(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice", 1, -1.0).over(w), 2).alias("prev_total"),
        F.round(F.lead("o_totalprice", 1, -1.0).over(w), 2).alias("next_total"),
    )


@query(
    "q_win_moving_rows",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(avg(l_quantity) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity,
                    l_extendedprice
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS mov_avg
FROM lineitem
WHERE l_suppkey < 50
""",
)
def q_win_moving_rows(spark, sf_dir):
    # avg over the integer-valued l_quantity: the frame sum is exact in both
    # engines regardless of association order, so round(..,2) is hash-stable
    # (avg(l_extendedprice) hit round-boundary flips from sliding-sum vs
    # segment-tree accumulation — observed ~60402.495 rounding both ways).
    # l_suppkey < 50: filter on the partition key — frames intact, result
    # bounded for the driver's canonicalizer.
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 50)
    w = (
        Window.partitionBy("l_suppkey")
        # (l_orderkey, l_linenumber) is NOT unique in this fixture (143k
        # dup pairs at sf0.1, one full (suppkey, shipdate, okey, lineno)
        # collision) — a ROWS frame is content-sensitive to tie order, so
        # extend the ORDER BY until it is verifiably unique on both SFs
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice",
        )
        .rowsBetween(-3, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 2).alias("mov_avg"),
    )


@query(
    "q_win_range_frame",
    oracle="""
SELECT o_orderpriority, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice NULLS LAST
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
FROM orders
WHERE o_orderkey < 16000
""",
)
def q_win_range_frame(spark, sf_dir):
    # NULLS LAST explicit on both sides: a NULL price's RANGE frame is
    # then the whole partition (sum skips the NULL inputs), identical in
    # both engines (r7 NULL-measure sweep catch).
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 16000)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc_nulls_last())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running"),
    )


@query(
    "q_win_cumsum",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_total
FROM orders
WHERE o_custkey < 500
""",
)
def q_win_cumsum(spark, sf_dir):
    # orders, not lineitem: (l_orderkey, l_linenumber) is NOT unique in the
    # fixture (11,785 dup pairs) so a lineitem cumsum has no deterministic
    # ordering; (o_orderdate, o_orderkey) is unique.
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_total"),
    )


@query(
    "q_win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_ok,
       last_value(o_orderkey) OVER w AS last_ok
FROM orders
WHERE o_custkey < 500
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_win_first_last(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
    )


@query(
    "q_win_percent_rank",
    oracle="""
SELECT o_orderkey,
       floor(percent_rank() OVER w * 1000000 + 0.5) / 1000000 AS pr,
       floor(cume_dist() OVER w * 1000000 + 0.5) / 1000000 AS cd
FROM orders
WHERE o_orderkey < 16000
WINDOW w AS (ORDER BY o_totalprice NULLS LAST, o_orderkey)
""",
)
def q_win_percent_rank(spark, sf_dir):
    """Window family extension (r2): percent_rank + cume_dist — the
    normalized-rank pair (quantile position without a global count join).
    GLOBAL window by design (filter-bounded input);
    q_win_percent_rank_distributed is the scale form over the full table.

    floor(x*1e6 + 0.5), not round(x, 6): (rank-1)/(n-1) lands EXACTLY on
    6-decimal halves for round denominators, and Spark rounds halves up
    while DuckDB rounds half-to-even — 93 flipped rows at sf0.1 (sf0.01's
    n dodged the boundary, which is why the round() form survived four
    rounds of driver checks). floor-plus-half is dialect-free: both
    engines compute the identical IEEE double, so the same side of every
    boundary (the q_vec_quantize rule, FIXTURES.md)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 16000)
    w = Window.orderBy(F.col("o_totalprice").asc_nulls_last(), "o_orderkey")
    return o.select(
        "o_orderkey",
        floor_round6(F.percent_rank().over(w)).alias("pr"),
        floor_round6(F.cume_dist().over(w)).alias("cd"),
    )


@query(
    "q_scd2_intervals",
    oracle="""
SELECT user_id, event_id, ts::TIMESTAMP AS valid_from,
       lead(ts::TIMESTAMP) OVER w AS valid_to,
       value,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
""",
)
def q_scd2_intervals(spark, sf_dir):
    """SCD-2 history build — turn an append-only change log into validity
    intervals [valid_from, valid_to) per key with an is_current flag: the
    standard warehouse pattern for dimension history and the batch half of
    any CDC pipeline. One shuffle on the key, then lead() inside the
    partition; event_id tiebreaks equal timestamps so the intervals are
    deterministic. At scale the events table is already partitioned by
    key/time, so the window runs without a second exchange."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        "value",
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "q_win_count_distinct",
    oracle="""
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN row_number() OVER (
             PARTITION BY o_custkey, o_orderpriority
             ORDER BY o_orderdate, o_orderkey) = 1 THEN 1 ELSE 0 END AS first_seen
  FROM orders
  WHERE o_custkey < 500
)
SELECT o_custkey, o_orderkey, o_orderdate,
       sum(first_seen) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )::BIGINT AS distinct_prios_so_far
FROM flagged
""",
)
def q_win_count_distinct(spark, sf_dir):
    """Running COUNT(DISTINCT) over a window — an operator Spark's window
    engine does not support directly (DISTINCT window aggregates raise).
    Composed from existing ops instead: flag each (key, value) pair's first
    occurrence with row_number()==1, then running-sum the flags — the
    standard two-window rewrite, fully distributed (both windows hash-
    partition on o_custkey; the second sort piggybacks on the first's
    ordering). The oracle runs the SAME rewrite in ANSI SQL, so the
    equivalence is checked value-for-value."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w_first = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum("first_seen").over(w_run).cast("bigint").alias("distinct_prios_so_far"),
    )


@query(
    "q_win_moving_median",
    oracle="""
SELECT user_id, event_id,
       round(median(value) OVER (
           PARTITION BY user_id
           ORDER BY ts::TIMESTAMP, event_id
           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
FROM events
WHERE user_id < 50
""",
)
def q_win_moving_median(spark, sf_dir):
    """Moving MEDIAN over a 5-row window — Spark's window engine has no
    median/percentile window aggregate, so it is composed from primitives:
    collect the frame into an array, sort it, and interpolate the middle
    (odd frame: the middle element; even: mean of the two middles —
    exactly quantile_cont 0.5, which is what DuckDB's windowed median
    computes on its side). The frame is bounded (5 rows), so the array
    never exceeds the frame length — per-row state is O(frame), the same
    budget a native implementation would use, and the plan is one
    key-partitioned window."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return e.select(
        "user_id",
        "event_id",
        # n > 0 guard (r7 NULL-measure sweep): collect_list skips NULLs
        # — exactly the aggregate semantics DuckDB's windowed median has
        # — so an ALL-NULL frame leaves an empty array whose middle
        # index is 0 (ANSI element_at throws); the median of no values
        # is NULL on both sides. CaseWhen evaluates lazily, so the
        # element_at never runs on the empty branch.
        F.when(n > 0, F.round((lo + hi) / 2.0, 4))
        .otherwise(F.lit(None).cast("double"))
        .alias("med5"),
    )


@query(
    "q_time_ewma",
    oracle="""
WITH w AS (
  SELECT event_id, user_id, ts::TIMESTAMP AS ts, value,
         -- list_filter mirrors Spark's collect_list NULL-skipping (r7
         -- NULL-measure sweep: DuckDB's windowed list() KEEPS NULLs,
         -- which would poison the fold); an all-NULL frame folds to
         -- NULL via the len guard (list_reduce aborts on empty input)
         list_filter(list(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
           x -> x IS NOT NULL) AS lv
  FROM events WHERE user_id < 200
)
SELECT event_id, user_id, ts, value,
       CASE WHEN len(lv) = 0 THEN NULL
            ELSE list_reduce(lv, (acc, x) -> acc * 0.5 + 0.5 * x) END AS ewma
FROM w
""",
)
def q_time_ewma(spark, sf_dir):
    """Exponentially weighted moving average (alpha=0.5) — the recurrence
    y_i = 0.5*y_{i-1} + 0.5*x_i seeded with the frame's oldest value,
    over a 20-row lookback. Recurrences have no built-in window aggregate
    in either engine; the distributed form is a pinned-order fold over
    the bounded frame (the kmeans/PQ hash-certification recipe applied
    to a recurrence): collect_list over the (ts, event_id)-ordered frame
    is frame-ordered, alpha=0.5 makes every multiply an EXACT power-of-2
    scaling, so the only rounding is one addition per fold step — and
    both engines fold the identical sequence in the identical order,
    giving bit-identical doubles with NO display rounding. Spark's
    left-fold seeds with element 1 to match DuckDB list_reduce's
    no-init semantics (fold starts at element 2). The 20-row truncation
    bounds per-row state at O(frame) — beyond it the dropped terms carry
    weight < 2^-20. One key-partitioned window, no shuffle beyond it."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    arr = F.collect_list("value").over(w)
    # try_element_at seed (r7 NULL-measure sweep): collect_list skips
    # NULLs, so an ALL-NULL frame leaves an empty array — the seed
    # lookup must degrade to NULL (the fold over the empty tail then
    # returns it) instead of ANSI-throwing on index 1. Nonempty frames
    # are untouched: element 1 exists and the fold is identical.
    ewma = F.aggregate(
        F.slice(arr, 2, 19),
        F.try_element_at(arr, F.lit(1)),
        lambda acc, x: acc * F.lit(0.5) + F.lit(0.5) * x,
    )
    return e.select("event_id", "user_id", "ts", "value", ewma.alias("ewma"))


@query(
    "q_time_ohlc",
    oracle="""
WITH x AS (
  SELECT date_trunc('hour', ts::TIMESTAMP) AS bucket, event_type,
         ts::TIMESTAMP AS ts, event_id, value
  FROM events
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM x
)
SELECT event_type, bucket,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n
FROM r GROUP BY event_type, bucket
""",
)
def q_time_ohlc(spark, sf_dir):
    """OHLC bars — open/high/low/close per (event_type, hour), the
    canonical financial downsample. Open/close are SELECTED raw values
    (first/last by (ts, event_id) — unique tiebreaker per FIXTURES rule
    2), not arithmetic, so no rounding is needed anywhere: every output
    is byte-identical on both engines. Two opposite-direction
    row_number windows + the rollup all share one (type, bucket) hash
    partitioning — a single exchange; at 100 TB this is the standard
    one-shuffle bar builder (min_by/max_by would save the windows but
    have no deterministic tiebreak in either engine)."""
    e = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("bucket"),
        "event_type",
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return r.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_win_ratio_to_report",
    oracle="""
WITH c AS (
  SELECT o_custkey, o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_custkey < 200
)
SELECT o_custkey, o_orderkey, cents AS price_cents,
       floor(CAST(cents AS DOUBLE) * 1000000
             / sum(cents) OVER (PARTITION BY o_custkey) + 0.5) / 1000000
         AS share_of_customer
FROM c
""",
)
def q_win_ratio_to_report(spark, sf_dir):
    """RATIO_TO_REPORT — each order's share of its customer's total
    spend, the classic reporting window function Oracle/Teradata ship
    natively and Spark composes as value / sum() OVER (partition). Exact
    integer cents over an unordered-frame window sum (one exchange, no
    sort), int-ratio floor pattern with the single-division op order.
    Numerator and denominator are both exact, so shares per partition
    sum to ~1 by construction (asserted in pytest)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    c = o.select("o_custkey", "o_orderkey", cents.alias("cents"))
    w = Window.partitionBy("o_custkey")
    return c.select(
        "o_custkey",
        "o_orderkey",
        F.col("cents").alias("price_cents"),
        (
            F.floor(
                F.col("cents").cast("double") * 1000000 / F.sum("cents").over(w)
                + F.lit(0.5)
            )
            / 1000000
        ).alias("share_of_customer"),
    )


@query(
    "q_time_holt",
    oracle="""
WITH x AS (
  SELECT user_id, epoch_us(ts::TIMESTAMP) AS t, event_id, value
  FROM events WHERE user_id < 200
), seq AS (
  SELECT user_id, count(*) AS n,
         list(value ORDER BY t, event_id) AS vs
  FROM x GROUP BY user_id
), folded AS (
  -- accumulator is a DOUBLE[2] pair [level, trend]: DuckDB list_reduce
  -- updates a STRUCT accumulator field-by-field (a later field sees the
  -- EARLIER field's new value), so the textbook two-field recurrence
  -- must fold over a list pair, which is constructed atomically
  SELECT user_id, n,
         list_reduce(
           list_transform(vs, v -> [CAST(v AS DOUBLE), CAST(0 AS DOUBLE)]),
           (acc, x) -> [
             CAST(0.5 AS DOUBLE) * x[1]
               + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
             CAST(0.5 AS DOUBLE)
               * ((CAST(0.5 AS DOUBLE) * x[1]
                   + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]))
                  - acc[1])
               + CAST(0.5 AS DOUBLE) * acc[2]
           ]
         ) AS st
  FROM seq
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       st[1] AS level, st[2] AS trend, st[1] + st[2] AS forecast
FROM folded
""",
)
def q_time_holt(spark, sf_dir):
    """Holt's linear (double exponential) smoothing with
    alpha = beta = 1/2 — level tracks the series, trend tracks the
    level's drift, forecast = level + trend is the one-step-ahead
    prediction (Holt 1957; the workhorse short-horizon forecaster
    before seasonal models). The coupled recurrence
        l_i = a*x_i + (1-a)*(l + b);  b_i = g*(l_i - l) + (1-g)*b
    has no window-aggregate form in either engine; this is the
    EWMA/kmeans hash-certification recipe extended to a STRUCT
    accumulator: both engines left-fold the identical (ts, event_id)-
    ordered value list seeded with {l: x_1, b: 0}, and with the
    smoothing constants at 1/2 every multiply is an exact power-of-two
    scaling — the only rounding is the additions, performed in the
    identical order, so level/trend/forecast are BIT-IDENTICAL doubles
    with no display rounding at all. One user_id-partitioned groupBy
    (map-side list building), per-entity state = the entity's history
    (cap to a trailing window like q_time_ewma when entities are
    unbounded); the user_id < 200 filter keeps the fixture fold short
    the same way q_time_ewma does."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    seq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("arr"),
    )
    vs = F.transform(F.col("arr"), lambda s: s["value"])
    structs = F.transform(
        vs,
        lambda v: F.struct(
            v.cast("double").alias("l"), F.lit(0.0).alias("b")
        ),
    )
    half = F.lit(0.5)

    def step(acc, x):
        new_l = half * x["l"] + half * (acc["l"] + acc["b"])
        return F.struct(
            new_l.alias("l"),
            (half * (new_l - acc["l"]) + half * acc["b"]).alias("b"),
        )

    st = F.aggregate(
        F.slice(structs, 2, 100000), F.element_at(structs, 1), step
    )
    return seq.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        st["l"].alias("level"),
        st["b"].alias("trend"),
        (st["l"] + st["b"]).alias("forecast"),
    )


@query(
    "q_win_cume_dist_nth",
    oracle="""
SELECT o_custkey, o_orderkey,
       cume_dist() OVER (PARTITION BY o_custkey
                         ORDER BY o_totalprice NULLS LAST, o_orderkey) AS cd,
       nth_value(o_orderkey, 3) OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice NULLS LAST, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS third_order
FROM orders
WHERE o_custkey < 500
""",
)
def q_win_cume_dist_nth(spark, sf_dir):
    """cume_dist + nth_value — the two rank-family window functions §2.5
    did not yet exercise. The ORDER BY carries a unique tiebreaker
    (orderkey), so cume_dist's peer groups are singletons and the ratio
    is rank/n — two exact integers, one identical double division per
    row in both engines; nth_value reads the 3rd row of the FULL frame
    (explicit ROWS UNBOUNDED..UNBOUNDED — the default running frame
    would make it null for the first two rows), null for customers
    with fewer than 3 orders. Same single custkey exchange as the rest
    of the window family."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc_nulls_last(), "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_order"),
    )


@query(
    "q_win_rolling_corr",
    oracle="""
WITH d AS (
  SELECT l_returnflag AS flag,
         CAST(floor(epoch_us(l_shipdate::TIMESTAMP) / 86400000000)
              AS BIGINT) AS day,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS HUGEINT) AS x,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS HUGEINT) AS y
  FROM lineitem GROUP BY 1, 2
), w AS (
  SELECT flag, day,
         CAST(count(*) OVER fr AS HUGEINT) AS n,
         sum(x) OVER fr AS sx, sum(y) OVER fr AS sy,
         sum(x * y) OVER fr AS sxy,
         sum(x * x) OVER fr AS sxx, sum(y * y) OVER fr AS syy
  FROM d
  WINDOW fr AS (PARTITION BY flag ORDER BY day
                RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
)
SELECT flag, day, CAST(n AS BIGINT) AS n_obs,
       floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS corr
FROM w
WHERE n >= 10 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
""",
)
def q_win_rolling_corr(spark, sf_dir):
    """Rolling 30-calendar-day Pearson correlation between daily
    shipped quantity and daily revenue, per return flag — the windowed
    co-movement monitor (is volume still tracking revenue this month?).
    The frame is RANGE on the integer day value, not ROWS (the r6
    calendar-trap rule: a '30-day' window must not silently span gaps).
    All five moments are exact-integer window sums widened to
    decimal(38,0)/HUGEINT BEFORE any product — n*syy is ~2.7e19 at
    sf0.1 (past int64), and at 1000x scale the cents^2 terms keep
    growing, so the wide-integer moments are the 100 TB-correct form.
    The correlation itself is ONE shared float expression over
    IEEE-nearest double casts of those exact integers, floored 6dp;
    degenerate-variance days are excluded by an exact integer
    predicate (n*sxx - sx^2 > 0), never a float epsilon. Plan: lineitem
    collapses map-side to (flag, day) rows; one flag-partitioned range
    window computes all six frame aggregates in a single Window node;
    post-aggregate series stay tiny at any corpus size."""
    li = load(spark, sf_dir, "lineitem")
    day = F.floor(
        F.unix_micros(F.col("l_shipdate").cast("timestamp"))
        / F.lit(86400000000)
    ).cast("long")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    d = (
        li.groupBy(F.col("l_returnflag").alias("flag"), day.alias("day"))
        .agg(
            F.sum(qty).cast("decimal(38,0)").alias("x"),
            F.sum(cents).cast("decimal(38,0)").alias("y"),
        )
    )
    return rolling_corr_frame(d)


def rolling_corr_frame(d):
    """Rolling-correlation core over a (flag, day, x, y) frame with
    decimal(38,0) x/y — the production expression tree, importable so
    worked-example tests (perfect linear co-movement -> corr == 1.0)
    drive the exact code path."""
    fr = (
        Window.partitionBy("flag")
        .orderBy("day")
        .rangeBetween(-29, Window.currentRow)
    )
    w = d.select(
        "flag",
        "day",
        F.count(F.lit(1)).over(fr).cast("decimal(38,0)").alias("n"),
        F.sum("x").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fr).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fr).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = num.cast("double") / F.sqrt(
        vx.cast("double") * vy.cast("double")
    )
    return w.filter(
        (F.col("n") >= 10) & (vx > 0) & (vy > 0)
    ).select(
        "flag",
        "day",
        F.col("n").cast("long").alias("n_obs"),
        (F.floor(corr * 1000000 + F.lit(0.5)) / 1000000).alias("corr"),
    )
