"""Scalar function packs (§2.8 F1-F5): string, regexp, date, math,
conditional. One query per pack exercising the whole pack, row-level (no
aggregation), so values are deterministic and hash-exact.

Cross-engine parity pitfalls handled here:
  * computed integers → BIGINT on both sides (Spark length() is int32,
    DuckDB's is int64);
  * DuckDB regexp_replace is first-match-only by default → 'g' flag to
    match Spark's replace-all;
  * DuckDB ceil(double)→double vs Spark ceil→long → cast oracle side;
  * transcendentals (ln/log10/pow) rounded to 4 decimals — libm vs JVM may
    differ in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


@query(
    "q_fn_string",
    oracle="""
SELECT p_partkey,
       concat(p_brand, '|', p_type) AS brand_type,
       substring(p_name, 1, 8) AS name8,
       upper(p_type) AS up,
       lower(p_brand) AS lo,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
       CAST(length(p_name) AS BIGINT) AS name_len,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       string_split(p_name, ' ')[1] AS first_word
FROM part
""",
)
def q_fn_string(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_type").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )


@query(
    "q_fn_regexp",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       regexp_matches(p_type, '^(ECONOMY|PROMO)') AS is_cheap
FROM part
""",
)
def q_fn_regexp(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").rlike("^(ECONOMY|PROMO)").alias("is_cheap"),
    )


@query(
    "q_fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dy,
       date_trunc('month', o_orderdate)::TIMESTAMP AS month_start,
       o_orderdate::DATE + 30 AS due_date,
       CAST(date_diff('day', o_orderdate::DATE, DATE '2002-01-01') AS BIGINT) AS days_to_2002,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       o_orderdate + INTERVAL 90 DAY AS plus_90d
FROM orders
WHERE o_orderkey < 16000
""",
)
def q_fn_date(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 16000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        (F.col("o_orderdate") + F.make_interval(days=F.lit(90))).alias("plus_90d"),
    )


@query(
    "q_fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS r1,
       abs(l_discount - 0.05) AS adiff,
       CAST(ceil(l_extendedprice / 100) AS BIGINT) AS ceil_h,
       CAST(floor(l_extendedprice / 100) AS BIGINT) AS floor_h,
       CASE WHEN l_quantity >= 0 THEN sqrt(l_quantity) END AS sq,
       CASE WHEN l_extendedprice > 0
            THEN round(ln(l_extendedprice), 4) END AS lnp,
       CASE WHEN l_extendedprice > 0
            THEN round(log10(l_extendedprice), 4) END AS lgp,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       l_partkey % 7 AS pk_mod,
       CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn
FROM lineitem
WHERE l_orderkey < 4000
""",
)
def q_fn_math(spark, sf_dir):
    """F4: math scalar functions. The transcendental columns (sqrt/ln/log10)
    are guarded with an explicit positive-domain CASE on BOTH sides —
    refund-shaped (negative) measures get NULL, never a silently-abs'd
    magnitude: DuckDB throws on ln(<0) where ANSI Spark NULLs, so the
    unguarded forms diverge on real mixed-sign data (r9 negative-measures
    sweep catalog, tools/negative_sweep.py)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 4000)
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("adiff"),
        F.ceil(price / 100).alias("ceil_h"),
        F.floor(price / 100).alias("floor_h"),
        F.when(qty >= 0, F.sqrt("l_quantity")).alias("sq"),
        F.when(price > 0, F.round(F.log(price), 4)).alias("lnp"),
        F.when(price > 0, F.round(F.log10(price), 4)).alias("lgp"),
        F.round(F.pow(F.col("l_quantity"), 2), 4).alias("qty_sq"),
        (F.col("l_partkey") % 7).alias("pk_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("sgn"),
    )


@query(
    "q_fn_conditional",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       nullif(c_nationkey, 0) AS nk_nullable,
       greatest(c_acctbal, 0.0) AS bal_floor,
       least(c_acctbal, 5000.0) AS bal_cap
FROM customer
""",
)
def q_fn_conditional(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg_or_other"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_nullable"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap"),
    )


@query(
    "q_fn_string2",
    oracle="""
SELECT p_partkey,
       translate(p_brand, '#', '_') AS brand_t,
       reverse(p_type) AS type_rev,
       repeat('-', p_size % 5) AS dashes,
       CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
       left(p_type, 4) AS type4,
       right(p_brand, 2) AS brand2,
       initcap_sim AS type_title
FROM (
  SELECT *, list_aggregate(list_transform(string_split(p_type, ' '),
              x -> upper(x[1:1]) || lower(x[2:])), 'string_agg', ' ') AS initcap_sim
  FROM part
)
""",
)
def q_fn_string2(spark, sf_dir):
    """Second string pack: translate/reverse/repeat/instr/left/right/initcap
    (DuckDB has no initcap — the oracle rebuilds it with per-token case
    transforms, which doubles as a higher-order-function cross-check)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.translate("p_brand", "#", "_").alias("brand_t"),
        F.reverse(F.col("p_type")).alias("type_rev"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("dashes"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.substring("p_type", 1, 4).alias("type4"),
        F.substring(F.col("p_brand"), -2, 2).alias("brand2"),
        F.initcap(F.lower("p_type")).alias("type_title"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_partkey & 255 AS low_byte,
       l_partkey | 4096 AS with_flag,
       xor(l_partkey, l_suppkey) AS x,
       l_partkey << 2 AS shl,
       l_partkey >> 3 AS shr,
       CAST(bit_count(l_partkey) AS BIGINT) AS popcnt
FROM lineitem
WHERE l_orderkey < 2000
""",
)
def q_fn_bitwise(spark, sf_dir):
    """Bitwise pack: and/or/xor/shifts/popcount — the bit-mask idioms of
    flag columns and bloom/signature code."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("l_partkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("l_partkey").bitwiseXOR(F.col("l_suppkey")).alias("x"),
        F.expr("shiftleft(l_partkey, 2)").alias("shl"),
        F.expr("shiftright(l_partkey, 3)").alias("shr"),
        F.bit_count("l_partkey").cast("long").alias("popcnt"),
    )


@query(
    "q_fn_url",
    oracle="""
SELECT c_custkey,
       'https://shop.example.com/' || lower(c_mktsegment) || '/cust-'
           || c_custkey || '?nation=' || c_nationkey AS url,
       'shop.example.com' AS host,
       '/' || lower(c_mktsegment) || '/cust-' || c_custkey AS path,
       'nation=' || c_nationkey AS query,
       c_nationkey::VARCHAR AS nation_param
FROM customer
WHERE c_custkey < 500
""",
)
def q_fn_url(spark, sf_dir):
    """URL function pack: parse_url component extraction (HOST / PATH /
    QUERY / named query parameter) — the per-document URL normalization any
    web-corpus pipeline runs before domain-level dedup or filtering. The
    URL is constructed from fixture columns so the oracle can state the
    expected components directly; parse_url is a pure JVM expression
    (codegen, no UDF). DuckDB has no parse_url, so the oracle derives the
    same components from the same source columns — the equality checked is
    'parse(build(x)) == components(x)', i.e. a roundtrip assertion."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    url = F.concat(
        F.lit("https://shop.example.com/"),
        F.lower("c_mktsegment"),
        F.lit("/cust-"),
        F.col("c_custkey"),
        F.lit("?nation="),
        F.col("c_nationkey"),
    )
    c = c.select("c_custkey", url.alias("url"))
    return c.select(
        "c_custkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("nation")).alias("nation_param"),
    )


@query(
    "q_fn_try_safe",
    oracle="""
SELECT o_orderkey,
       floor(o_totalprice / nullif(o_custkey % 7, -1) * 100 + 0.5) / 100 AS safe_div,
       TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast,
       TRY_CAST(string_split(o_orderpriority, '-')[1] AS INTEGER) AS prio_num,
       string_split(o_orderpriority, '-')[5] AS oob_elem
FROM orders
WHERE o_orderkey < 16000
""",
)
def q_fn_try_safe(spark, sf_dir):
    """Error-safe expression family — load-bearing since Spark 4 runs ANSI
    mode by DEFAULT, where a single division by zero or malformed cast
    KILLS the query instead of yielding NULL (the Spark 3 behavior users
    ported pipelines from). At 100 TB one dirty row in a trillion must
    degrade to NULL, not abort the job: try_divide / try_cast /
    try_element_at are the per-expression opt-outs that keep ANSI's
    correctness everywhere else. DuckDB's twins: x/0 is natively NULL,
    TRY_CAST, and out-of-bounds list indexing is natively NULL. The
    o_custkey%7==0 rows prove the zero path, o_orderstatus ('O'/'F'/'P')
    the failed-cast path, and element 5 of a 2-element split the
    out-of-bounds path. floor(x*100+0.5) rounding: price/k lands on exact
    2-decimal halves (the half-up vs half-even flip, FIXTURES rule)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 16000)
    parts = F.split("o_orderpriority", "-")
    return o.select(
        "o_orderkey",
        (
            F.floor(
                F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 7) * 100
                + F.lit(0.5)
            )
            / 100
        ).alias("safe_div"),
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.element_at(parts, 1).try_cast("int").alias("prio_num"),
        F.try_element_at(parts, F.lit(5)).alias("oob_elem"),
    )


@query(
    "q_fn_date2",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate::TIMESTAMP + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(o_orderdate::TIMESTAMP) AS INT) AS qtr,
       CAST(isodow(o_orderdate::TIMESTAMP) AS INT) AS iso_dow,
       CAST(week(o_orderdate::TIMESTAMP) AS INT) AS iso_week,
       CAST(date_diff('day', DATE '1995-06-17',
                      CAST(o_orderdate AS DATE)) AS INT) AS days_since_fix
FROM orders WHERE o_orderkey < 2000
""",
)
def q_fn_date2(spark, sf_dir):
    """Calendar arithmetic beyond F3: month addition WITH end-of-month
    clamping (Jan 31 + 1 month = Feb 29/28 — add_months and DuckDB's
    +INTERVAL agree on the clamp), last_day, quarter, ISO day-of-week
    (Spark's dayofweek is Sunday=1 — weekday()+1 is the ISO twin of
    DuckDB's isodow), ISO week number, and signed day differences across
    a fixed epoch. All map-side codegen; no shuffle at any scale."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus_3m"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        (F.weekday(d) + 1).cast("int").alias("iso_dow"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.datediff(d, F.lit("1995-06-17").cast("date")).cast("int").alias(
            "days_since_fix"
        ),
    )
