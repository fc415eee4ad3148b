"""Property-based invariants (SURVEY §5.3.2) over generated mini-tables.
Few examples per property — each example pays a Spark job; the generators
cover the structural edge cases (empty, single-group, all-duplicates).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(-100, 100)),
    min_size=0,
    max_size=40,
)


@given(data=rows)
@settings(**SETTINGS)
def test_rollup_row_count_is_sum_of_prefix_groupings(spark, data):
    if not data:
        return
    df = spark.createDataFrame(data, "a int, b int, v int")
    n_ab = df.select("a", "b").distinct().count()
    n_a = df.select("a").distinct().count()
    got = df.rollup("a", "b").agg(F.sum("v")).count()
    assert got == n_ab + n_a + 1  # (a,b) + (a) + grand total


@given(data=rows)
@settings(**SETTINGS)
def test_dedup_idempotent(spark, data):
    df = spark.createDataFrame(data, "a int, b int, v int") if data else None
    if df is None:
        return
    once = df.dropDuplicates(["a", "b"])
    twice = once.dropDuplicates(["a", "b"])
    assert once.count() == twice.count() == df.select("a", "b").distinct().count()


@given(left=rows, right=rows)
@settings(**SETTINGS)
def test_join_cardinality_bounds(spark, left, right):
    if not left or not right:
        return
    l = spark.createDataFrame(left, "a int, b int, v int")
    r = spark.createDataFrame(right, "a int, b int, v int")
    inner = l.join(r, "a").count()
    assert inner <= len(left) * len(right)
    louter = l.join(r.select("a").distinct(), "a", "left").count()
    assert louter == len(left)  # joining a deduped key preserves left count


@given(data=rows)
@settings(**SETTINGS)
def test_union_all_counts_add(spark, data):
    if not data:
        return
    df = spark.createDataFrame(data, "a int, b int, v int")
    assert df.unionByName(df).count() == 2 * len(data)
    assert df.intersect(df).count() == df.distinct().count()
    assert df.subtract(df).count() == 0


@given(data=rows)
@settings(**SETTINGS)
def test_window_partition_counts(spark, data):
    if not data:
        return
    from pyspark.sql import Window

    df = spark.createDataFrame(data, "a int, b int, v int")
    w = Window.partitionBy("a").orderBy("b", "v")
    rn = df.withColumn("rn", F.row_number().over(w))
    # max row_number per partition == partition size
    per = rn.groupBy("a").agg(F.max("rn").alias("mx"), F.count(F.lit(1)).alias("n"))
    assert per.filter(F.col("mx") != F.col("n")).count() == 0


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60, unique=True),
    nparts=st.integers(1, 5),
    nbuckets=st.integers(1, 6),
)
@settings(**SETTINGS)
def test_global_rank_matches_sorted_position(spark, vals, nparts, nbuckets):
    """_global_rank over any unique key list at any partition count equals
    the 1-based position in the sorted order, and the derived ntile bucket
    arithmetic equals F.ntile over a global window (the r5 distributed
    forms' core invariant)."""
    from pyspark.sql import Window

    from wikidata2pg_spark.operators.windows import _global_rank

    df = spark.createDataFrame([(v,) for v in vals], "k long")
    ranked = _global_rank(df, "k", nparts=nparts)
    got = {r.k: r.global_rank for r in ranked.collect()}
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want
    assert set(r.n_total for r in ranked.collect()) == {len(vals)}

    # ntile bucket arithmetic == built-in ntile
    rn, n = F.col("global_rank"), F.col("n_total")
    q = (n / nbuckets).cast("long")
    r_ = n % nbuckets
    boundary = r_ * (q + F.lit(1))
    bucket = F.when(rn <= boundary, ((rn - 1) / (q + 1)).cast("long") + 1).otherwise(
        r_ + ((rn - boundary - 1) / F.greatest(q, F.lit(1))).cast("long") + 1
    )
    got_b = {r.k: r.b for r in ranked.select("k", bucket.cast("long").alias("b")).collect()}
    w = Window.orderBy("k")
    want_b = {
        r.k: r.b
        for r in df.select("k", F.ntile(nbuckets).over(w).cast("long").alias("b")).collect()
    }
    assert got_b == want_b
