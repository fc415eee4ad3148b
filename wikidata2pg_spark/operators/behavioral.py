"""Behavioral / product-analytics operators over the events table: ordered
funnel conversion and cohort retention — the two canonical clickstream
rollups every events warehouse ships (SURVEY.md §2 events family).

Scale notes:
  * Both operators are single-shuffle on ``user_id``: the funnel's four
    stage timestamps are unordered-frame windows over ONE user partition
    (Catalyst chains the four Window nodes after a single Exchange), and
    the cohort join re-uses the per-user aggregate.
  * The final rollups reduce to a handful of rows (stages / cohort×week),
    so the second Exchange moves bytes, not data.
  * Ratios of exact integer counts use the floor(x*10^n+0.5)/10^n pattern
    on BOTH sides (verify-skill int-ratio rounding class): with small
    denominators exact decimal halves are reachable, where Spark HALF_UP
    and DuckDB half-to-even disagree.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load

_STEP_HOURS = 24  # max gap between consecutive funnel stages


@query(
    "q_funnel_conversion",
    oracle="""
WITH w1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts::TIMESTAMP END)
           OVER (PARTITION BY user_id) AS t1,
         event_type, ts::TIMESTAMP AS ts
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t1
                      AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t2 FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t2
                      AND ts <= t2 + INTERVAL 24 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t3 FROM w2
), w4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t3
                      AND ts <= t3 + INTERVAL 24 HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t4 FROM w3
), u AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
  FROM w4 GROUP BY user_id
)
SELECT count(t1) AS signup_users,
       count(t2) AS view_users,
       count(t3) AS click_users,
       count(t4) AS purchase_users,
       floor(CAST(count(t2) AS DOUBLE) * 10000 / NULLIF(count(t1), 0) + 0.5)
         / 10000 AS conv_view,
       floor(CAST(count(t3) AS DOUBLE) * 10000 / NULLIF(count(t1), 0) + 0.5)
         / 10000 AS conv_click,
       floor(CAST(count(t4) AS DOUBLE) * 10000 / NULLIF(count(t1), 0) + 0.5)
         / 10000 AS conv_purchase
FROM u
""",
)
def q_funnel_conversion(spark, sf_dir):
    """Ordered 4-stage funnel (signup -> view -> click -> purchase), each
    stage within 24 h of the previous one: t_k = first qualifying event at
    or after t_{k-1}. The stage times are per-user constants computed by
    four chained unordered-frame windows over the SAME user partitioning —
    one Exchange, four in-memory passes, no re-scan of events (the naive
    formulation self-joins events once per stage). Conversion ratios are
    exact-integer counts under the floor pattern. Discriminating at every
    sf (e.g. sf0.01: 150 -> 39 -> 16 -> 5)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    step = F.expr(f"INTERVAL {_STEP_HOURS} HOURS")

    def stage(prev, etype):
        cond = (F.col("event_type") == etype) & (F.col("ts") >= F.col(prev)) & (
            F.col("ts") <= F.col(prev) + step
        )
        return F.min(F.when(cond, F.col("ts"))).over(w)

    d = (
        e.withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn("t2", stage("t1", "view"))
        .withColumn("t3", stage("t2", "click"))
        .withColumn("t4", stage("t3", "purchase"))
    )
    u = d.groupBy("user_id").agg(
        *[F.max(t).alias(t) for t in ("t1", "t2", "t3", "t4")]
    )
    counts = u.agg(
        F.count("t1").alias("signup_users"),
        F.count("t2").alias("view_users"),
        F.count("t3").alias("click_users"),
        F.count("t4").alias("purchase_users"),
    )
    # floor((v*10000)/s + 0.5)/10000 with EXACTLY the oracle's float-op
    # order: v*10000 is an exact integer in double, the division is the
    # single rounding step — (v/s)*10000 would round twice and can differ
    # by 1 ulp right on a floor boundary.
    base = F.nullif(F.col("signup_users"), F.lit(0)).cast("double")
    conv = lambda c: (  # noqa: E731
        F.floor(F.col(c).cast("double") * 10000 / base + F.lit(0.5)) / 10000
    )
    return counts.select(
        "signup_users",
        "view_users",
        "click_users",
        "purchase_users",
        conv("view_users").alias("conv_view"),
        conv("click_users").alias("conv_click"),
        conv("purchase_users").alias("conv_purchase"),
    )


@query(
    "q_cohort_retention",
    oracle="""
WITH f AS (
  SELECT user_id, CAST(date_trunc('week', min(ts::TIMESTAMP)) AS DATE)
           AS cohort_week
  FROM events WHERE event_type = 'purchase' AND value >= 120
  GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts::TIMESTAMP) AS DATE)
           AS act_week
  FROM events WHERE event_type = 'purchase' AND value >= 100
), s AS (
  SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week
), c AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS BIGINT)
           AS week_offset,
         count(*) AS active_users
  FROM a JOIN f USING (user_id)
  WHERE a.act_week >= f.cohort_week
  GROUP BY 1, 2
)
SELECT c.cohort_week, c.week_offset, c.active_users, s.cohort_size,
       floor(CAST(c.active_users AS DOUBLE) * 10000 / s.cohort_size + 0.5)
         / 10000 AS retention
FROM c JOIN s USING (cohort_week)
""",
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention: cohort = ISO week of a user's first high-value
    purchase (value >= 120); a cohort member is retained in week k if they
    made a purchase with value >= 100 during cohort_week + k. Classic
    triangular retention table (cohort_week x week_offset x rate).

    Both date_trunc('week', ...) implementations truncate to the ISO
    Monday, so the cohort keys agree byte-for-byte as DATE. The offset is
    an exact multiple of 7 days -> integer division is exact on both
    sides. Plan: one user-keyed aggregate for cohorts (broadcastable —
    #users << #events), a distinct over (user, week) pairs, then a
    broadcast join of the tiny per-cohort size table; only the
    (user)-keyed shuffles touch event-scale data. Retention denominators
    are small ints -> floor pattern (int-ratio class)."""
    e = load(spark, sf_dir, "events")
    hv = e.filter((F.col("event_type") == "purchase") & (F.col("value") >= 120))
    f = hv.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    a = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") >= 100))
        .select(
            "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("act_week")
        )
        .distinct()
    )
    s = f.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    c = (
        a.join(f, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("act_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return c.join(F.broadcast(s), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        "cohort_size",
        # same single-division float-op order as the oracle (see funnel)
        (
            F.floor(
                F.col("active_users").cast("double") * 10000 / F.col("cohort_size")
                + F.lit(0.5)
            )
            / 10000
        ).alias("retention"),
    )
