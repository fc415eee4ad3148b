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
    # one collect serves all three assertions (this is the slowest property
    # test; three separate collects tripled its Spark-job count)
    rn, n = F.col("global_rank"), F.col("n_total")
    q = (n / nbuckets).cast("long")
    r_ = n % nbuckets
    boundary = r_ * (q + F.lit(1))
    bucket = F.when(rn <= boundary, ((rn - 1) / (q + 1)).cast("long") + 1).otherwise(
        r_ + ((rn - boundary - 1) / F.greatest(q, F.lit(1))).cast("long") + 1
    )
    rows = ranked.select(
        "k", "global_rank", "n_total", bucket.cast("long").alias("b")
    ).collect()
    got = {r.k: r.global_rank for r in rows}
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want
    assert set(r.n_total for r in rows) == {len(vals)}
    # ntile bucket arithmetic == built-in ntile
    got_b = {r.k: r.b for r in rows}
    w = Window.orderBy("k")
    want_b = {
        r.k: r.b
        for r in df.select("k", F.ntile(nbuckets).over(w).cast("long").alias("b")).collect()
    }
    assert got_b == want_b


def test_global_rank_null_keys_rank_last_not_dropped(spark):
    """NULL order values through _global_rank: ranked AFTER every real
    value (the repo's NULLS LAST ranking convention) and — the r7
    NULL-measure sweep catch — NOT silently dropped. Before the fix a
    NULL value propagated a NULL ordered_bucket pid and the inner join
    on pid ate the row whenever the bucket span was nonzero (i.e. on
    any non-constant data), so the regression fixture must have a real
    value spread."""
    from wikidata2pg_spark.operators.windows import _global_rank

    df = spark.createDataFrame(
        [(1, 50), (2, None), (3, 10), (4, None), (5, 90)], "id long, k long"
    )
    rows = _global_rank(df, "k", "id", nparts=3).collect()
    assert len(rows) == 5  # nothing dropped
    assert {r.n_total for r in rows} == {5}
    got = {r.id: r.global_rank for r in rows}
    # reals by value (10, 50, 90), then NULLs last, tie-broken by id
    assert got == {3: 1, 1: 2, 5: 3, 2: 4, 4: 5}


@given(
    pts=st.lists(
        st.tuples(
            st.integers(0, 1000),
            st.floats(0, 8, allow_nan=False, width=32),
            st.floats(0, 8, allow_nan=False, width=32),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_spatial_grid_join_equals_brute_force(spark, pts):
    """Grid bucket-then-refine must return EXACTLY the brute-force pair set
    for any point cloud — coverage (3x3 replication) and no-dup (single
    home-cell match) are both structural claims worth fuzzing."""
    if len(pts) < 2:
        return
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    home = df.withColumn("cx", F.floor("lat")).withColumn("cy", F.floor("lon"))
    probe = (
        df.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
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
    grid = (
        home.join(probe, ["cx", "cy"])
        .filter((F.col("id") < F.col("id_b")) & (F.sqrt(d2) <= 1.0))
        .select("id", "id_b")
    )
    a, b = df.alias("a"), df.alias("b")
    bd2 = (F.col("a.lat") - F.col("b.lat")) * (F.col("a.lat") - F.col("b.lat")) + (
        F.col("a.lon") - F.col("b.lon")
    ) * (F.col("a.lon") - F.col("b.lon"))
    brute = (
        a.crossJoin(b)
        .filter((F.col("a.id") < F.col("b.id")) & (F.sqrt(bd2) <= 1.0))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("id_b"))
    )
    got = sorted(map(tuple, grid.collect()))
    want = sorted(map(tuple, brute.collect()))
    assert got == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_pagerank_mass_is_conserved_without_dangling(spark, edges):
    """On a graph where every node has an outlink (we add a self-loop to
    each node to guarantee it), total PageRank mass stays 1 after each
    power iteration — the conservation law of the recurrence."""
    from wikidata2pg_spark.operators.graph import pagerank_ranks

    nodes = sorted({x for e in edges for x in e})
    loops = [(n, n) for n in nodes]
    e = spark.createDataFrame(
        sorted(set(edges + loops)), "src long, dst long"
    )
    ndf = spark.createDataFrame([(x,) for x in nodes], "id long")
    # drive the PRODUCTION recurrence, not a local copy of it
    ranks = pagerank_ranks(ndf, e, iters=2)
    total = ranks.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_semi_naive_closure_matches_naive_bfs(spark, edges):
    """The semi-naive frontier iteration must produce the same
    (src, dst, min_depth<=4) set as a plain per-depth BFS in Python."""
    from wikidata2pg_spark.operators.graph import semi_naive_closure

    e = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    # drive the PRODUCTION iteration, not a local copy of it
    got = sorted(map(tuple, semi_naive_closure(e, max_depth=4).collect()))

    adj = {}
    for s_, d_ in set(edges):
        adj.setdefault(s_, set()).add(d_)
    # Model: BFS from each source over the edge list; (s, s) IS reachable
    # when a cycle returns to s (matches the recursive-CTE semantics).
    want = {}
    for s_ in adj:
        seen: dict[int, int] = {}
        frontier_py = {s_}
        for depth in range(1, 5):
            nxt_py = {d for f in frontier_py for d in adj.get(f, ())}
            new = {d for d in nxt_py if d not in seen}
            for d in new:
                seen[d] = depth
                want[(s_, d)] = depth
            frontier_py = new
    want_rows = sorted((s_, d_, dep) for (s_, d_), dep in want.items())
    assert got == want_rows


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1, max_size=40, unique=True,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_morton16_is_bijective_and_decodable(spark, pairs):
    """_morton16 must be a bijection on [0,65535]²: distinct (a,b) map to
    distinct z, and de-interleaving the bits of z recovers (a,b) exactly —
    otherwise the Z-order layout silently collapses distinct grid cells."""
    from wikidata2pg_spark.sources.scans import _morton16

    df = spark.createDataFrame(pairs, "a LONG, b LONG")
    rows = df.select("a", "b", _morton16(F.col("a"), F.col("b")).alias("z")).collect()
    assert len({r.z for r in rows}) == len(pairs)
    for r in rows:
        a = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


evt_rows = st.lists(
    st.tuples(
        st.integers(0, 3),  # user
        st.integers(0, 10_000),  # ts (seconds)
        st.integers(-50, 50),  # signed cents
    ),
    min_size=1,
    max_size=30,
)


@given(data=evt_rows)
@settings(**SETTINGS)
def test_drawdown_invariants_on_generated_series(spark, data):
    """Max drawdown of ANY series is >= 0, <= peak - min cum, and the
    nested-window formulation equals the sequential fold."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(u, i, t, v) for i, (u, t, v) in enumerate(data)],
        "user int, eid int, t long, v long",
    )
    run = (
        Window.partitionBy("user")
        .orderBy("t", "eid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = (
        df.withColumn("cum", F.sum("v").over(run))
        .withColumn("peak", F.max(F.col("cum")).over(run))
        .groupBy("user")
        .agg(F.max(F.col("peak") - F.col("cum")).alias("dd"))
    )
    by_user: dict = {}
    for i, (u, t, v) in enumerate(data):
        by_user.setdefault(u, []).append((t, i, v))
    for row in got.collect():
        evs = sorted(by_user[row.user])
        cum = peak = dd = 0
        first = True
        cums = []
        for _, _, v in evs:
            cum += v
            cums.append(cum)
            peak = cum if first else max(peak, cum)
            first = False
            dd = max(dd, peak - cum)
        assert row.dd == dd
        assert 0 <= row.dd <= max(cums) - min(cums)


@given(data=st.lists(st.integers(0, 1000), min_size=1, max_size=25))
@settings(**SETTINGS)
def test_concurrency_sweepline_bounds_on_generated_times(spark, data):
    """Sweep-line peak over generated start times: 1 <= peak <= n, and
    equals the brute-force interval-stabbing maximum."""
    from pyspark.sql import Window

    span = 100
    df = spark.createDataFrame([(t,) for t in data], "t long")
    pts = df.select("t", F.lit(1).alias("d")).unionByName(
        df.select((F.col("t") + span).alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.orderBy("t", "d").rowsBetween(Window.unboundedPreceding, 0)
    peak = pts.withColumn("c", F.sum("d").over(w)).agg(
        F.max("c").alias("p")
    ).collect()[0].p
    brute = max(
        sum(1 for s in data if s <= t < s + span) for t in data
    )
    assert peak == brute
    assert 1 <= peak <= len(data)


series = st.lists(st.integers(-1000, 1000), min_size=1, max_size=12)


@given(vals=series)
@settings(**SETTINGS)
def test_mann_kendall_antisymmetry(spark, vals):
    """Negating a series flips S exactly (and hence the trend verdict)
    while n and the tie-corrected variance are invariant — the defining
    symmetry of the rank-based statistic, on the production tree."""
    from wikidata2pg_spark.operators.analytics import mann_kendall_frame

    m = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)]
        + [("b", i, -v) for i, v in enumerate(vals)],
        "priority string, ym int, v long",
    )
    got = {r.priority: r for r in mann_kendall_frame(m).collect()}
    a, b = got["a"], got["b"]
    assert b.s_stat == -a.s_stat
    assert (b.n_periods, b.var18) == (a.n_periods, a.var18)
    assert b.z == -a.z or (a.z == 0.0 and b.z == 0.0)
    flip = {"increasing": "decreasing", "decreasing": "increasing"}
    assert b.trend == flip.get(a.trend, a.trend)


@given(vals=st.lists(st.integers(0, 10000), min_size=2, max_size=10),
       shift=st.integers(-5000, 5000))
@settings(**SETTINGS)
def test_hodges_lehmann_translation_equivariance(spark, vals, shift):
    """HL(x + c) = HL(x) + c — the location-estimator contract (Walsh
    sums shift by 2c, order statistics by 2c, the /4 by c). Exact
    because nothing in the operator rounds; drives the production
    hodges_lehmann_frame tree."""
    from wikidata2pg_spark.operators.analytics import hodges_lehmann_frame

    def hl(series):
        m = spark.createDataFrame(
            [("a", i, v) for i, v in enumerate(series)],
            "priority string, ym int, v long",
        )
        [row] = hodges_lehmann_frame(m).collect()
        return row.hl_cents

    base = hl(vals)
    shifted = hl([v + shift for v in vals])
    assert shifted == base + shift  # /4 and integer sums: exact equality


@given(
    data=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-100, 100), st.integers(-5, 5)),
        min_size=1,
        max_size=50,
    ),
    nparts=st.integers(1, 6),
)
@settings(**SETTINGS)
def test_global_cumsum_matches_sequential_prefix_sums(spark, data, nparts):
    """global_cumsum (the r7 two-pass helper behind q_win_concurrency and
    q_text_vocab_growth) over ANY bucket count equals the sequential
    prefix sums in (k, uid) order — duplicate keys, negative values, and
    multiple simultaneous sum columns included. uid makes the total
    order unique so the reference is well-defined; the production keys'
    tie semantics are covered by their oracle mirrors."""
    from wikidata2pg_spark.operators.windows import global_cumsum

    rows_ = [(k, i, v1, v2) for i, (k, v1, v2) in enumerate(data)]
    df = spark.createDataFrame(rows_, "k long, uid long, v1 long, v2 long")
    out = global_cumsum(
        df, ("k", "uid"), {"v1": "c1", "v2": "c2"}, nparts=nparts
    )
    got = {(r.k, r.uid): (r.c1, r.c2) for r in out.collect()}
    want, s1, s2 = {}, 0, 0
    for k, i, v1, v2 in sorted(rows_, key=lambda r: (r[0], r[1])):
        s1 += v1
        s2 += v2
        want[(k, i)] = (s1, s2)
    assert got == want


@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    nparts=st.integers(1, 8),
)
@settings(**SETTINGS)
def test_ordered_bucket_pid_is_monotone_pure_function(spark, vals, nparts):
    """ordered_bucket's pid — the foundation under every two-pass global
    operator (rank, cumsum, skyline prefix-max) — must be a nondecreasing
    function of the value with EQUAL VALUES SHARING A BUCKET (ties
    co-bucket, so 'earlier bucket' always means 'strictly smaller'), and
    must stay within [0, nparts)."""
    from wikidata2pg_spark.operators.windows import ordered_bucket

    df = spark.createDataFrame([(v,) for v in vals], "k long")
    rows = ordered_bucket(df, "k", nparts).select("k", "pid").collect()
    by_val = {}
    for r in rows:
        assert 0 <= r.pid < nparts
        by_val.setdefault(r.k, set()).add(r.pid)
    # ties co-bucket
    assert all(len(p) == 1 for p in by_val.values())
    # monotone in the value
    ordered = [next(iter(by_val[v])) for v in sorted(by_val)]
    assert all(a <= b for a, b in zip(ordered, ordered[1:]))
