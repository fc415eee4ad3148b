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

# Shared funnel-stage CTE prefix (w1..w4 + the per-user rollup `u` holding
# t1..t4) — both funnel oracles build on it so the stage definition cannot
# drift between keys.
_FUNNEL_CTE = f"""
WITH w1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts::TIMESTAMP END)
           OVER (PARTITION BY user_id) AS t1,
         event_type, ts::TIMESTAMP AS ts
  FROM events
), w2 AS (
  SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t1
                      AND ts <= t1 + INTERVAL {_STEP_HOURS} HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t2 FROM w1
), w3 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t2
                      AND ts <= t2 + INTERVAL {_STEP_HOURS} HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t3 FROM w2
), w4 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t3
                      AND ts <= t3 + INTERVAL {_STEP_HOURS} HOUR THEN ts END)
              OVER (PARTITION BY user_id) AS t4 FROM w3
), u AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3, max(t4) AS t4
  FROM w4 GROUP BY user_id
)
"""


def _funnel_stage_times(spark, sf_dir):
    """Per-user funnel stage timestamps t1..t4 (the Spark twin of
    _FUNNEL_CTE's `u`): t_k = first qualifying event within _STEP_HOURS of
    t_{k-1}, all four as chained unordered-frame windows over ONE user
    partitioning. Both funnel keys derive from this single definition."""
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
    return d.groupBy("user_id").agg(
        *[F.max(t).alias(t) for t in ("t1", "t2", "t3", "t4")]
    )


@query(
    "q_funnel_conversion",
    oracle=_FUNNEL_CTE
    + """
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
    u = _funnel_stage_times(spark, sf_dir)
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


@query(
    "q_agg_entropy",
    oracle="""
WITH b AS (
  SELECT event_type, extract(hour FROM ts::TIMESTAMP) AS hr, count(*) AS c
  FROM events GROUP BY event_type, hr
), s AS (
  SELECT event_type, sum(c) AS n FROM b GROUP BY event_type
)
SELECT b.event_type, CAST(max(s.n) AS BIGINT) AS n,
       round(ln(CAST(max(s.n) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(max(s.n) AS DOUBLE), 2) AS entropy
FROM b JOIN s USING (event_type)
GROUP BY b.event_type
""",
)
def q_agg_entropy(spark, sf_dir):
    """Shannon entropy of each event type's hour-of-day distribution —
    the usage-diversity profile (uniform usage -> ln(24), one burst hour
    -> 0). Computed as ln(n) - (1/n)*sum(c*ln(c)) from EXACT integer
    bucket counts, so the only cross-engine divergence is ulp noise in
    the transcendental ln and the summation order — the class FIXTURES
    rule 1 leaves on round(,2) (a transcendental result has measure-zero
    probability of sitting on a half boundary, unlike int ratios). Two
    partial-aggregable groupBys, the second over <= 24*|types| rows."""
    e = load(spark, sf_dir, "events")
    b = e.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    s = b.groupBy("event_type").agg(F.sum("c").alias("n"))
    j = b.join(F.broadcast(s), "event_type")
    nd = F.max("n").cast("double")
    return j.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.round(
            F.log(nd)
            - F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))) / nd,
            2,
        ).alias("entropy"),
    )


@query(
    "q_time_mom_growth",
    oracle="""
WITH m AS (
  SELECT o_orderpriority,
         CAST(date_trunc('month', o_orderdate::TIMESTAMP) AS DATE) AS month,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM orders GROUP BY o_orderpriority, month
), g AS (
  SELECT o_orderpriority, month, rev,
         lag(rev) OVER (PARTITION BY o_orderpriority ORDER BY month) AS prev
  FROM m
)
SELECT o_orderpriority, month, CAST(rev AS BIGINT) AS revenue_cents,
       floor(CAST(rev - prev AS DOUBLE) * 10000 / prev + 0.5) / 10000
         AS mom_growth
FROM g
""",
)
def q_time_mom_growth(spark, sf_dir):
    """Month-over-month revenue growth per order priority — the
    period-over-period report every finance dashboard runs. Monthly
    revenue is an exact integer (cents), the lag is a key-partitioned
    window over the SAME grouping the rollup produced (one exchange for
    both), and growth is an int ratio under the floor pattern with the
    single-division op order; months with no predecessor yield NULL on
    both sides. Negative growth floors identically — both engines hold
    the same double before the floor."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
            "rev"
        )
    )
    w = W.partitionBy("o_orderpriority").orderBy("month")
    g = m.withColumn("prev", F.lag("rev").over(w))
    return g.select(
        "o_orderpriority",
        "month",
        F.col("rev").cast("long").alias("revenue_cents"),
        (
            F.floor(
                (F.col("rev") - F.col("prev")).cast("double")
                * 10000
                / F.col("prev")
                + F.lit(0.5)
            )
            / 10000
        ).alias("mom_growth"),
    )


@query(
    "q_funnel_time_to_convert",
    oracle=_FUNNEL_CTE
    + """
, lat AS (
  SELECT epoch_us(t4) - epoch_us(t1) AS us FROM u WHERE t4 IS NOT NULL
)
SELECT count(*) AS n_converted,
       floor(quantile_cont(us, 0.5) / 3600000000.0 * 1000 + 0.5) / 1000
         AS median_hours,
       floor(CAST(min(us) AS DOUBLE) / 3600000000.0 * 1000 + 0.5) / 1000
         AS min_hours,
       floor(CAST(max(us) AS DOUBLE) / 3600000000.0 * 1000 + 0.5) / 1000
         AS max_hours
FROM lat
""",
)
def q_funnel_time_to_convert(spark, sf_dir):
    """Conversion-latency rollup over the q_funnel_conversion stage logic:
    among users completing the whole signup->purchase funnel, the median
    / min / max signup-to-purchase latency. Latencies are EXACT integer
    microseconds (unix_micros twin of epoch_us), the median interpolates
    integers onto the exact .5 grid, and the hour conversion is a single
    correctly-rounded division of identical doubles, floor-rounded at
    3dp. Same single user-shuffle plan as the funnel; the latency set
    collapses to |converters| rows before the global aggregate."""
    u = _funnel_stage_times(spark, sf_dir)
    lat = u.filter(F.col("t4").isNotNull()).select(
        (F.unix_micros("t4") - F.unix_micros("t1")).alias("us")
    )
    hours = lambda c: F.floor(c / F.lit(3600000000.0) * 1000 + F.lit(0.5)) / 1000  # noqa: E731
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        hours(F.percentile("us", F.lit(0.5))).alias("median_hours"),
        hours(F.min("us").cast("double")).alias("min_hours"),
        hours(F.max("us").cast("double")).alias("max_hours"),
    )


@query(
    "q_time_streaks",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts::TIMESTAMP) AS DATE)
           AS day
  FROM events
), g AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INT) AS grp
  FROM d
), s AS (
  SELECT user_id, min(day) AS streak_start, count(*) AS streak_days
  FROM g GROUP BY user_id, grp
)
SELECT user_id, max(streak_days) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       min(streak_start) AS first_day
FROM s GROUP BY user_id
""",
)
def q_time_streaks(spark, sf_dir):
    """Gaps-and-islands over calendar days: each user's LONGEST run of
    consecutive active days, streak count, and first active day — the
    engagement-streak metric, and the canonical dense-grouping trick
    (day minus its rank is constant exactly within a consecutive run,
    so one subtraction replaces any iterative chaining). Distinct from
    q_time_sessionize_batch: that splits on a TIME gap, this on missing
    CALENDAR DAYS. One user-keyed exchange serves the distinct, the
    rank window, and both rollups."""
    e = load(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    s = g.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.count(F.lit(1)).alias("streak_days"),
    )
    return s.groupBy("user_id").agg(
        F.max("streak_days").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.min("streak_start").alias("first_day"),
    )


@query(
    "q_agg_churn",
    oracle="""
WITH a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts::TIMESTAMP) AS DATE)
           AS week
  FROM events
), w AS (SELECT DISTINCT week FROM a), nxt AS (
  SELECT w.week,
         (SELECT min(w2.week) FROM w AS w2 WHERE w2.week > w.week) AS next_week
  FROM w
)
SELECT a.week, count(*) AS active_users,
       count(*) FILTER (WHERE r.user_id IS NULL) AS churned_users,
       floor(CAST(count(*) FILTER (WHERE r.user_id IS NULL) AS DOUBLE)
             * 10000 / count(*) + 0.5) / 10000 AS churn_rate
FROM a
JOIN nxt ON a.week = nxt.week
LEFT JOIN a AS r ON r.user_id = a.user_id AND r.week = nxt.next_week
WHERE nxt.next_week IS NOT NULL
GROUP BY a.week
""",
)
def q_agg_churn(spark, sf_dir):
    """Week-over-week churn: of the users active in week W, the share
    with NO activity in the next observed week — the retention
    complement every growth dashboard tracks. The (user, week) activity
    set joins against itself shifted by one week (a self left-join on
    the same user partitioning — Catalyst reuses the exchange), churn is
    a null-probe count, and the rate is an int ratio under the floor
    pattern. 'Next week' is the next OBSERVED week, so a dark week
    doesn't churn everyone twice; the last week has no successor and is
    excluded on both sides."""
    e = load(spark, sf_dir, "events")
    a = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    weeks = a.select("week").distinct()
    w2 = weeks.select(F.col("week").alias("next_week"))
    nxt = (
        weeks.join(w2, F.col("next_week") > F.col("week"))
        .groupBy("week")
        .agg(F.min("next_week").alias("next_week"))
    )
    r = a.select(F.col("user_id").alias("r_user"), F.col("week").alias("r_week"))
    j = (
        a.join(F.broadcast(nxt), "week")
        .join(
            r,
            (F.col("r_user") == F.col("user_id"))
            & (F.col("r_week") == F.col("next_week")),
            "left",
        )
    )
    return j.groupBy("week").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum(F.col("r_user").isNull().cast("long")).cast("long").alias(
            "churned_users"
        ),
        (
            F.floor(
                F.sum(F.col("r_user").isNull().cast("long")).cast("double")
                * 10000
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / 10000
        ).alias("churn_rate"),
    )


@query(
    "q_cohort_ltv",
    oracle="""
WITH f AS (
  SELECT user_id, CAST(date_trunc('week', min(ts::TIMESTAMP)) AS DATE)
           AS cohort_week
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
), s AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM f GROUP BY cohort_week
), p AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts::TIMESTAMP) AS DATE))
              / 7 AS BIGINT) AS week_offset,
         CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN f USING (user_id)
  WHERE e.event_type = 'purchase'
), w AS (
  SELECT cohort_week, week_offset,
         CAST(sum(cents) AS BIGINT) AS rev_cents
  FROM p GROUP BY cohort_week, week_offset
), c AS (
  SELECT *, CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
                                      ORDER BY week_offset) AS BIGINT)
              AS cum_rev_cents
  FROM w
)
SELECT c.cohort_week, c.week_offset, c.rev_cents, c.cum_rev_cents,
       s.cohort_size,
       CAST(floor(CAST(c.cum_rev_cents AS DOUBLE) / s.cohort_size + 0.5)
            AS BIGINT) AS ltv_cents
FROM c JOIN s USING (cohort_week)
""",
)
def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curve: cohort = ISO week of the user's
    first purchase; for each cohort x week-offset, the purchase revenue
    earned that week, the running total, and LTV-per-user (cumulative
    revenue / cohort size) — the revenue twin of q_cohort_retention's
    activity triangle and the curve a growth team integrates to price
    acquisition. Money is exact integer cents, the running total an
    integer cumulative window over the tiny (cohort x offset) matrix,
    LTV one floored division. Plan: one user-keyed first-purchase agg
    (broadcastable), the fact scan joins it on user_id (co-partitioned
    shuffle at 100 TB — users not broadcastable at the extreme, and
    the join key is the natural event partitioning), rollup to the
    triangle BEFORE the cumulative window (window moves |cohorts| x
    |offsets| rows, not events)."""
    e = load(spark, sf_dir, "events")
    pur = e.filter(F.col("event_type") == "purchase")
    f = pur.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    s = f.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    p = pur.join(f, "user_id").select(
        "cohort_week",
        F.floor(
            F.datediff(
                F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week")
            )
            / 7
        )
        .cast("long")
        .alias("week_offset"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = p.groupBy("cohort_week", "week_offset").agg(
        F.sum("cents").alias("rev_cents")
    )
    wc = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = w.withColumn("cum_rev_cents", F.sum("rev_cents").over(wc))
    return c.join(F.broadcast(s), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "rev_cents",
        "cum_rev_cents",
        "cohort_size",
        F.floor(
            F.col("cum_rev_cents").cast("double") / F.col("cohort_size")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ltv_cents"),
    )


_KM_VALUE = 150  # the event of interest: first purchase >= this value


@query(
    "q_survival_km",
    oracle=f"""
WITH x AS (
  SELECT user_id,
         CAST(floor(epoch_us(min(ts::TIMESTAMP)) / 86400000000) AS BIGINT)
           AS d0,
         CAST(floor(epoch_us(max(ts::TIMESTAMP)) / 86400000000) AS BIGINT)
           AS d1
  FROM events GROUP BY user_id
), hp AS (
  SELECT user_id,
         CAST(floor(epoch_us(min(ts::TIMESTAMP)) / 86400000000) AS BIGINT)
           AS dd
  FROM events
  WHERE event_type = 'purchase' AND value >= {_KM_VALUE}
  GROUP BY user_id
), u AS (
  SELECT coalesce(hp.dd, x.d1) - x.d0 AS t,
         CASE WHEN hp.dd IS NULL THEN 0 ELSE 1 END AS ev
  FROM x LEFT JOIN hp USING (user_id)
), g AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
         CAST(sum(1 - ev) AS BIGINT) AS c
  FROM u GROUP BY t
), r AS (
  SELECT *,
         CAST((SELECT count(*) FROM u) AS BIGINT)
           - CAST(coalesce(sum(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM g
), arr AS (
  SELECT list(t ORDER BY t) AS ts, list(n_risk ORDER BY t) AS ns,
         list(d ORDER BY t) AS ds, list(c ORDER BY t) AS cs,
         list(1 - CAST(d AS DOUBLE) / n_risk ORDER BY t) AS terms
  FROM r
), s AS (
  SELECT unnest(range(1, len(ts) + 1)) AS k, ts, ns, ds, cs, terms
  FROM arr
)
SELECT ts[k] AS t_days, ns[k] AS n_risk, ds[k] AS d_events,
       cs[k] AS n_censored,
       floor(list_reduce(terms[1:k], (a, b) -> a * b) * 1000000 + 0.5)
         / 1000000 AS survival
FROM s
""",
)
def q_survival_km(spark, sf_dir):
    """Kaplan-Meier time-to-conversion: duration = days from a user's
    first event to their first purchase of value >= 150 (the event of
    interest); users who never convert are right-CENSORED at their last
    observed day — the estimator conversion/churn teams use because a
    naive average-time-to-convert silently drops exactly the users who
    haven't converted yet.
    S(t) = prod over event-times <= t of (1 - d_i/n_i). Exactness:
    durations, death/censor counts and risk sets are pure integers
    (risk set via one exclusive-frame cumulative window, never a
    self-join); each KM factor is ONE division of exact ints; prefix
    products are per-prefix left folds over the time-sorted factor
    list (seeded 1.0 — exact against DuckDB's no-init list_reduce
    since 1.0*x == x), so survival is bit-identical before one 6dp
    display floor. Plan: events collapse to per-user rows in one
    map-side-combinable agg; everything after runs on <= |distinct
    durations| rows (~30) — at 100 TB the curve costs one scan."""
    e = load(spark, sf_dir, "events")
    day = lambda c: F.floor(F.unix_micros(c) / F.lit(86400000000)).cast(  # noqa: E731
        "long"
    )
    # r10 (guide §2.3/§2.4): the span and first-conversion aggregations
    # previously ran as two separate events scans joined on user_id —
    # a conditional min inside ONE map-side-combinable agg computes the
    # same dd (min over the when() ignores NULLs; no qualifying purchase
    # -> NULL, exactly the old left-join miss). 2 scans + 2 shuffles +
    # join -> 1 scan + 1 shuffle; measured 2.3 -> 1.3 s median for the
    # per-user stage at sf0.01, rows identical.
    x = e.groupBy("user_id").agg(
        day(F.min("ts")).alias("d0"),
        day(F.max("ts")).alias("d1"),
        day(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= _KM_VALUE),
                    F.col("ts"),
                )
            )
        ).alias("dd"),
    )
    u = x.select(
        (F.coalesce(F.col("dd"), F.col("d1")) - F.col("d0")).alias("t"),
        F.when(F.col("dd").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("ev"),
    )
    g = u.groupBy("t").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    wcum = W.orderBy("t").rowsBetween(W.unboundedPreceding, -1)
    wfull = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    # total-at-risk from the collapsed duration table itself (sum of
    # deaths + censors) — re-aggregating u would re-run both events
    # aggregations and their join a second time
    r = g.withColumn("nt", F.sum(F.col("d") + F.col("c")).over(wfull)).withColumn(
        "n_risk",
        F.col("nt")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wcum), F.lit(0)),
    )
    arr = r.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "t",
                    "n_risk",
                    "d",
                    "c",
                    (
                        1 - F.col("d").cast("double") / F.col("n_risk")
                    ).alias("term"),
                )
            )
        ).alias("a")
    )
    terms = F.transform(F.col("a"), lambda s: s["term"])
    # Guard the index ladder (r7 empty-input sweep): Spark's
    # sequence(1, 0) DESCENDS to [1, 0] on an empty event table, and
    # element_at(a, 1) then overruns the 0-element array — an empty
    # ladder makes the explode produce zero rows like the oracle.
    ks = F.when(
        F.size("a") > 0, F.sequence(F.lit(1), F.size("a"))
    ).otherwise(F.array().cast("array<int>"))
    rows = F.transform(
        ks,
        lambda k: F.struct(
            F.element_at(F.col("a"), k.cast("int"))["t"].alias("t_days"),
            F.element_at(F.col("a"), k.cast("int"))["n_risk"].alias("n_risk"),
            F.element_at(F.col("a"), k.cast("int"))["d"].alias("d_events"),
            F.element_at(F.col("a"), k.cast("int"))["c"].alias("n_censored"),
            (
                F.floor(
                    F.aggregate(
                        F.slice(terms, 1, k.cast("int")),
                        F.lit(1.0),
                        lambda acc, x: acc * x,
                    )
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("survival"),
        ),
    )
    return arr.select(F.explode(rows).alias("r")).select("r.*")


_PATH_LEN = 5  # events per user kept for the path signature
_PATH_TOPK = 10  # paths returned


@query(
    "q_seq_topk_paths",
    oracle=f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts::TIMESTAMP), event_id)
           AS rn
  FROM events
), p AS (
  SELECT user_id,
         array_to_string(list(event_type ORDER BY rn), '>') AS path
  FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id
), c AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY path
)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY n_users DESC, path) AS INT)
           AS rank,
         path, n_users
  FROM c
) z WHERE rank <= {_PATH_TOPK}
""",
)
def q_seq_topk_paths(spark, sf_dir):
    """Top-10 opening clickstream paths: each user's first 5 events
    (ts, event_id)-ordered collapse to a 'view>click>purchase' path
    signature, counted across users — the entry-path mining view every
    product-analytics tool ships (where do journeys actually start?).
    Purely categorical: ordered string concat, integer counts, and a
    (count DESC, path ASC) total order, so the hash is trivially
    stable. Plan: one user_id shuffle for the row_number + per-user
    collapse (map-side combinable), then the path rollup reduces to
    |distinct paths| rows (<= 5^|event types|-ish in practice) before
    the tiny global top-k — the same narrow-rollup shape as
    q_topk_per_group, and at 100 TB the only full-data exchange is the
    one keyed on user_id."""
    e = load(spark, sf_dir, "events")
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    )
    p = (
        e.select("user_id", "event_type", rn.alias("rn"))
        .filter(F.col("rn") <= _PATH_LEN)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    c = p.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    wk = W.orderBy(F.col("n_users").desc(), "path")
    return (
        c.withColumn("rank", F.row_number().over(wk).cast("int"))
        .filter(F.col("rank") <= _PATH_TOPK)
        .select("rank", "path", "n_users")
    )


@query(
    "q_cohort_stickiness",
    oracle="""
WITH d AS (
  SELECT CAST(year(ts::TIMESTAMP) * 100 + month(ts::TIMESTAMP) AS BIGINT)
           AS ym,
         CAST(floor(epoch_us(ts::TIMESTAMP) / 86400000000) AS BIGINT) AS day,
         user_id
  FROM events
), dau AS (
  SELECT ym, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM d GROUP BY ym, day
), mau AS (
  SELECT ym, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM d GROUP BY ym
)
SELECT dau.ym, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(dau.dau) AS BIGINT) AS dau_sum,
       any_value(mau.mau) AS mau,
       floor(CAST(sum(dau.dau) AS DOUBLE) * 10000
             / (count(*) * any_value(mau.mau)) + 0.5) / 10000
         AS stickiness
FROM dau JOIN mau ON dau.ym = mau.ym
GROUP BY dau.ym
""",
)
def q_cohort_stickiness(spark, sf_dir):
    """DAU/MAU stickiness per calendar month — THE engagement ratio
    (what share of the month's audience shows up on an average day).
    avg-DAU/MAU is computed as one division of exact integers:
    sum-of-daily-distincts * 10^4 / (n_days * monthly-distinct), so
    no intermediate average float exists. Two distinct-counts share
    the same (month, user) shuffle; the month rollup is a handful of
    rows. At 100 TB you'd swap countDistinct for the mergeable bitmap
    agg (q_agg_bitmap_distinct) without changing the shape — the
    per-day and per-month states then merge map-side."""
    e = load(spark, sf_dir, "events").select(
        (F.year("ts") * 100 + F.month("ts")).cast("long").alias("ym"),
        F.floor(F.unix_micros("ts") / F.lit(86400000000))
        .cast("long")
        .alias("day"),
        "user_id",
    )
    dau = e.groupBy("ym", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    mau = e.groupBy("ym").agg(F.countDistinct("user_id").alias("mau"))
    j = dau.join(mau, "ym")
    return j.groupBy("ym").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("dau_sum"),
        F.first("mau").alias("mau"),
        (
            F.floor(
                F.sum("dau").cast("double")
                * 10000
                / (F.count(F.lit(1)) * F.first("mau"))
                + F.lit(0.5)
            )
            / 10000
        ).alias("stickiness"),
    )


@query(
    "q_feature_point_in_time",
    oracle="""
WITH x AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts::TIMESTAMP) AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), f AS (
  SELECT user_id, event_id, event_type, t,
         CAST(count(*) OVER wprev AS BIGINT) AS n_prior,
         CAST(coalesce(sum(cents) OVER wprev, 0) AS BIGINT)
           AS sum_prior_cents,
         lag(event_type) OVER w AS last_prior_type,
         lag(t) OVER w AS last_t
  FROM x
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
         wprev AS (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id AS pred_event, n_prior, sum_prior_cents,
       last_prior_type,
       CAST(floor((t - last_t) / 60000000) AS BIGINT) AS mins_since_prior
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY t DESC, event_id DESC) AS rn
  FROM f WHERE event_type = 'purchase'
) z WHERE rn = 1
""",
)
def q_feature_point_in_time(spark, sf_dir):
    """Point-in-time feature assembly — the feature-store primitive:
    for each user's LAST purchase (the label event), features computed
    ONLY from events strictly before it in (ts, event_id) order
    (prior-event count, prior spend, last prior action, minutes since
    it). Computing features at every row via an exclusive cumulative
    frame + lag, then selecting the label row, is what makes the
    assembly leakage-free BY CONSTRUCTION — no feature expression can
    see the label row or anything after it, the bug class 'train-time
    features used post-label data' cannot occur. All features are
    exact integers/strings (nulls for first-event purchases). Plan:
    ONE user_id shuffle shared by every window and the label
    selection; adding a feature adds a column to the same exchange,
    not a new join — exactly how a production feature store batches
    its backfills at 100 TB."""
    x = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    wprev = w.rowsBetween(W.unboundedPreceding, -1)
    f = x.select(
        "user_id",
        "event_id",
        "event_type",
        "t",
        F.count(F.lit(1)).over(wprev).alias("n_prior"),
        F.coalesce(F.sum("cents").over(wprev), F.lit(0)).alias(
            "sum_prior_cents"
        ),
        F.lag("event_type").over(w).alias("last_prior_type"),
        F.lag("t").over(w).alias("last_t"),
    )
    wlast = W.partitionBy("user_id").orderBy(
        F.col("t").desc(), F.col("event_id").desc()
    )
    return (
        f.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("pred_event"),
            "n_prior",
            "sum_prior_cents",
            "last_prior_type",
            F.floor((F.col("t") - F.col("last_t")) / F.lit(60000000))
            .cast("long")
            .alias("mins_since_prior"),
        )
    )
