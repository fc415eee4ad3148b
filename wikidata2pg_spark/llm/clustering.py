"""Distributed k-means over the embeddings table — the codebook-training
half of the IVF/SemDeDup story (q_sim_ann_ivf's docstring promises "a
k-means codebook drops in without changing the plan shape"; this is that
codebook). The fixture's `label` column is only weakly geometric
(measured: same-label mean cosine 0.0016 vs 0.0003 cross — near-uniform
vectors, the same property that bounds IVF recall there), so the pytest
quality gates are a bit-exact numpy reference twin and monotone SSE
descent, not label purity.

Why this is hash-certifiable when textbook k-means is not: every
cross-engine / cross-partitioning divergence in floating k-means comes
from ORDER-DEPENDENT double summation (centroid accumulation) and from
the half-rule on rounded output. Here the accumulation is EXACT INTEGER
arithmetic — coordinates are fixed-point scaled once
(`floor(x*1e6 + 0.5)`, the FIXTURES floor pattern, identical in both
engines), so per-cluster sums are order-invariant bigints and the
centroid `sum/n` division is ONE correctly-rounded double op on exact
inputs. Distances then evaluate an identical expression tree over
identical doubles with an identical left-fold order, so assignments are
bit-for-bit reproducible across engines, partitionings, and cluster
sizes — the output (vec_id, cluster) contains integers only.

Plan shape at 100 TB (classic broadcast-Lloyd): each iteration's
assignment is MAP-ONLY — the K x D centroid pack is a broadcast 1-row
array, so scoring never shuffles points; the update shuffles only the
map-side-combined (cluster, dim) partial sums (partitions x K x D rows,
independent of data size). Iterations are barriers by nature (Lloyd is
iterative passes); each tiny K-row centroid frame is localCheckpoint'd
so the lazy plan does not double per round (the q_dedup_semantic_cluster
precedent, dedup.py:266)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load
from wikidata2pg_spark.util import truncate_plan

K = 10  # fixture generator uses 10 labeled clusters; K matches it
ITERS = 3  # fixed unrolled Lloyd rounds — enough to separate the fixture
SCALE = 1_000_000.0  # fixed-point factor: ~1e-6 quantization of [-1, 1]


def _points(spark, sf_dir):
    """(vec_id, p: array<bigint>) — coordinates fixed-point scaled to
    exact integers with the half-safe floor pattern (identical floor in
    both engines; round() would diverge on exact halves)."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(SCALE) + F.lit(0.5)).cast("long"),
        ).alias("p"),
    )


def _dist2(p, c):
    """Squared L2 distance, double, identical tree both engines: per-dim
    (double(p_d) - c_d)^2 via explicit multiply (pow() implementations
    differ), left-fold sum with 0.0 init (0.0 + t1 == t1 exactly, so this
    equals DuckDB's init-less list_reduce)."""
    terms = F.zip_with(p, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y))
    return F.aggregate(terms, F.lit(0.0), lambda a, b: a + b)


def _assign(pts, cents):
    """Map-only assignment: pack the K centroids into ONE broadcast row
    (sorted by cent_id so the fold visits candidates in id order), score
    each point against the pack in a single codegen'd expression, keep
    the argmin with strict `<` so ties go to the lowest cent_id."""
    pack = cents.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cent_id").alias("i"), F.col("c").alias("c")))
        ).alias("cl")
    )
    scored = F.transform(
        F.col("cl"),
        lambda e: F.struct(_dist2(F.col("p"), e["c"]).alias("d"), e["i"].alias("i")),
    )
    best = F.aggregate(
        scored,
        F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("i")),
        lambda acc, e: F.when(e["d"] < acc["d"], e).otherwise(acc),
    )
    return pts.crossJoin(F.broadcast(pack)).select(
        "vec_id", "p", best["i"].alias("cluster")
    )


def _update(assigned, prev_cents):
    """Exact-integer centroid update: per-dimension bigint sums per
    cluster (map-side combined; shuffle volume is K x D partials), then
    ONE double division per coordinate. The member count rides INSIDE the
    same aggregation — each member contributes exactly one row per pos,
    so count(*) per (cluster, pos) IS the cluster size; a separate sizes
    branch would re-execute the whole assignment scan a second time
    (Catalyst does not dedupe sibling aggregations over an un-cached
    subplan). Clusters that lost every member keep their previous
    centroid (left join + coalesce — same guard in the oracle)."""
    dims = (
        assigned.select("cluster", F.posexplode("p").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    new = (
        dims.select(
            "cluster",
            "pos",
            (F.col("s").cast("double") / F.col("n").cast("double")).alias("cd"),
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos").alias("o"), F.col("cd").alias("v")))
                ),
                lambda r: r["v"],
            ).alias("c")
        )
    )
    return (
        prev_cents.alias("prev")
        .join(new.withColumnRenamed("cluster", "cent_id").alias("new"), "cent_id", "left")
        .select("cent_id", F.coalesce(F.col("new.c"), F.col("prev.c")).alias("c"))
    )


def _duck_kmeans_sql() -> str:
    """Generate the identical computation as chained DuckDB CTEs: same
    fixed-point scaling, same fold orders, same strict-< argmin, same
    integer-sum update with the empty-cluster carry-forward."""
    dist = (
        "list_reduce(list_transform(list_zip(a.p, e.c), "
        "r -> (CAST(r[1] AS DOUBLE) - r[2]) * (CAST(r[1] AS DOUBLE) - r[2])), "
        "(x, y) -> x + y)"
    )
    assign = (
        "SELECT a.vec_id, a.p, "
        "list_reduce(list_transform(k.cl, "
        f"e -> struct_pack(d := {dist}, i := e.i)), "
        "(x, y) -> CASE WHEN y.d < x.d THEN y ELSE x END).i AS cluster "
        "FROM pts a CROSS JOIN (SELECT list(struct_pack(i := cent_id, c := c) "
        "ORDER BY cent_id) AS cl FROM {prev}) k"
    )
    update = (
        "SELECT p.cent_id, COALESCE(n.c, p.c) AS c FROM {prev} p LEFT JOIN ("
        "SELECT s.cluster AS cent_id, "
        "list(CAST(s.s AS DOUBLE) / CAST(z.n AS DOUBLE) ORDER BY s.pos) AS c "
        "FROM (SELECT cluster, pos, SUM(v) AS s FROM "
        "(SELECT cluster, generate_subscripts(p, 1) AS pos, unnest(p) AS v "
        "FROM {assigned}) u GROUP BY cluster, pos) s "
        "JOIN (SELECT cluster, COUNT(*) AS n FROM {assigned} GROUP BY cluster) z "
        "ON z.cluster = s.cluster "
        "GROUP BY s.cluster) n ON n.cent_id = p.cent_id"
    )
    parts = [
        "WITH pts AS (SELECT vec_id, "
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) AS BIGINT)) AS p "
        "FROM embeddings)",
        "cents0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cent_id, "
        "list_transform(p, v -> CAST(v AS DOUBLE)) AS c "
        f"FROM (SELECT vec_id, p FROM pts ORDER BY vec_id LIMIT {K}) q)",
    ]
    for t in range(ITERS):
        parts.append(f"asg{t} AS ({assign.format(prev=f'cents{t}')})")
        parts.append(f"cents{t + 1} AS ({update.format(prev=f'cents{t}', assigned=f'asg{t}')})")
    final = assign.format(prev=f"cents{ITERS}")
    return (
        ",\n".join(parts)
        + f",\nfinal AS ({final})\nSELECT vec_id, cluster FROM final"
    )


@query("q_cluster_kmeans", oracle=_duck_kmeans_sql())
def q_cluster_kmeans(spark, sf_dir):
    """Hash-certified distributed k-means (see module docstring): K=10
    centroids, 3 Lloyd iterations, deterministic init (the K lowest
    vec_id points), output = final (vec_id, cluster) — integers only.
    Each iteration's K-row centroid frame is localCheckpoint'd: Lloyd is
    inherently one pass per iteration, and checkpointing the tiny frame
    keeps the lazy plan from doubling per round."""
    pts = _points(spark, sf_dir)
    w_init = pts.orderBy("vec_id").limit(K)
    cents = w_init.select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cent_id"),
        F.transform("p", lambda v: v.cast("double")).alias("c"),
    )
    cents = truncate_plan(cents, eager=False)
    for _ in range(ITERS):
        assigned = _assign(pts, cents)
        cents = truncate_plan(_update(assigned, cents), eager=False)
    return _assign(pts, cents).select("vec_id", "cluster")


# ---------------------------------------------------------------------------
# Grouped Lloyd (per-subspace) — the product-quantization training core.
# Same determinism contract as the flat version above: exact-integer
# accumulation, identical fold orders, strict-< argmin. Kept as separate
# functions rather than a group_cols parameter on _assign/_update so the
# driver-bound flat key's plan is byte-stable.
# ---------------------------------------------------------------------------


def _grouped_assign(pts, cents, id_col: str = "vec_id"):
    """pts: (grp, id, p) x cents: (grp, cent_id, c) -> (grp, id, p, cluster).
    The pack is one row PER GROUP (still broadcast: M groups x K cents),
    joined on grp — assignment stays map-only per point."""
    pack = cents.groupBy("grp").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cent_id").alias("i"), F.col("c").alias("c")))
        ).alias("cl")
    )
    scored = F.transform(
        F.col("cl"),
        lambda e: F.struct(_dist2(F.col("p"), e["c"]).alias("d"), e["i"].alias("i")),
    )
    best = F.aggregate(
        scored,
        F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("i")),
        lambda acc, e: F.when(e["d"] < acc["d"], e).otherwise(acc),
    )
    return pts.join(F.broadcast(pack), "grp").select(
        "grp", id_col, "p", best["i"].alias("cluster")
    )


def _grouped_update(assigned, prev_cents):
    """Per-(grp, cluster) exact-integer centroid update with the same
    empty-cluster carry-forward and single-aggregation member count as
    the flat form (count(*) per (grp, cluster, pos) IS the cell size —
    no second pass over the assignment)."""
    dims = (
        assigned.select("grp", "cluster", F.posexplode("p").alias("pos", "v"))
        .groupBy("grp", "cluster", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    new = (
        dims.select(
            "grp",
            "cluster",
            "pos",
            (F.col("s").cast("double") / F.col("n").cast("double")).alias("cd"),
        )
        .groupBy("grp", "cluster")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos").alias("o"), F.col("cd").alias("v")))
                ),
                lambda r: r["v"],
            ).alias("c")
        )
        .withColumnRenamed("cluster", "cent_id")
    )
    return (
        prev_cents.alias("prev")
        .join(new.alias("new"), ["grp", "cent_id"], "left")
        .select("grp", "cent_id", F.coalesce(F.col("new.c"), F.col("prev.c")).alias("c"))
    )


def grouped_kmeans(pts, init_cents, iters: int):
    """Run `iters` Lloyd rounds per group and return the final centroids;
    pts = (grp, vec_id, p: array<bigint>), init = (grp, cent_id, c:
    array<double>). Checkpoints the tiny centroid frame per round."""
    cents = truncate_plan(init_cents, eager=False)
    for _ in range(iters):
        assigned = _grouped_assign(pts, cents)
        cents = truncate_plan(_grouped_update(assigned, cents), eager=False)
    return cents


M, DSUB, KC, PQ_ITERS, PQ_NQ, PQ_K = 8, 8, 16, 2, 8, 5


def _pq_sql() -> str:
    """The full PQ pipeline as generated DuckDB CTEs — grouped-kmeans
    training, code assignment, ADC lookup tables, fixed-order fold, final
    ranked top-k. Mirrors the Spark plan expression-for-expression."""
    dist = (
        "list_reduce(list_transform(list_zip(a.p, e.c), "
        "r -> (CAST(r[1] AS DOUBLE) - r[2]) * (CAST(r[1] AS DOUBLE) - r[2])), "
        "(x, y) -> x + y)"
    )
    assign = (
        "SELECT a.grp, a.vec_id, a.p, "
        "list_reduce(list_transform(k.cl, "
        f"e -> struct_pack(d := {dist}, i := e.i)), "
        "(x, y) -> CASE WHEN y.d < x.d THEN y ELSE x END).i AS cluster "
        "FROM sub a JOIN (SELECT grp, list(struct_pack(i := cent_id, c := c) "
        "ORDER BY cent_id) AS cl FROM {prev} GROUP BY grp) k ON k.grp = a.grp"
    )
    update = (
        "SELECT p.grp, p.cent_id, COALESCE(n.c, p.c) AS c FROM {prev} p LEFT JOIN ("
        "SELECT s.grp, s.cluster AS cent_id, "
        "list(CAST(s.s AS DOUBLE) / CAST(z.n AS DOUBLE) ORDER BY s.pos) AS c "
        "FROM (SELECT grp, cluster, pos, SUM(v) AS s FROM "
        "(SELECT grp, cluster, generate_subscripts(p, 1) AS pos, unnest(p) AS v "
        "FROM {assigned}) u GROUP BY grp, cluster, pos) s "
        "JOIN (SELECT grp, cluster, COUNT(*) AS n FROM {assigned} "
        "GROUP BY grp, cluster) z ON z.grp = s.grp AND z.cluster = s.cluster "
        "GROUP BY s.grp, s.cluster) n ON n.grp = p.grp AND n.cent_id = p.cent_id"
    )
    parts = [
        "WITH pts AS (SELECT vec_id, "
        f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {SCALE} + 0.5) AS BIGINT)) AS p "
        "FROM embeddings)",
        f"sub AS (SELECT vec_id, g.grp AS grp, p[g.grp*{DSUB}+1 : g.grp*{DSUB}+{DSUB}] AS p "
        f"FROM pts, (SELECT unnest(range(0, {M})) AS grp) g)",
        "cents0 AS (SELECT grp, CAST(rn - 1 AS INTEGER) AS cent_id, "
        "list_transform(p, v -> CAST(v AS DOUBLE)) AS c FROM "
        "(SELECT grp, p, row_number() OVER (PARTITION BY grp ORDER BY vec_id) AS rn "
        f"FROM sub) q WHERE rn <= {KC})",
    ]
    for t in range(PQ_ITERS):
        parts.append(f"asg{t} AS ({assign.format(prev=f'cents{t}')})")
        parts.append(
            f"cents{t + 1} AS ({update.format(prev=f'cents{t}', assigned=f'asg{t}')})"
        )
    parts += [
        f"asgF AS ({assign.format(prev=f'cents{PQ_ITERS}')})",
        "codes AS (SELECT vec_id, list(cluster ORDER BY grp) AS codes "
        "FROM asgF GROUP BY vec_id)",
        f"qsub AS (SELECT vec_id, grp, p FROM sub WHERE vec_id < {PQ_NQ})",
        "dtab AS (SELECT a.vec_id AS qid, e.grp, e.cent_id, "
        + dist
        + f" AS d2 FROM qsub a JOIN cents{PQ_ITERS} e ON e.grp = a.grp)",
        "dlist AS (SELECT qid, list(d2 ORDER BY grp, cent_id) AS dl "
        "FROM dtab GROUP BY qid)",
        # the ADC stride is the ACTUAL per-group codebook size
        # (len(dl)//M), not the nominal KC: a corpus smaller than KC
        # seeds fewer centroids and Lloyd drops empty clusters, so a
        # hardcoded KC stride overruns the table (found by the r7
        # degenerate-input sweep; identical on real data where every
        # group trains the full KC codes)
        "adc AS (SELECT d.qid, x.vec_id AS nid, "
        f"list_reduce(list_transform(list_zip(x.codes, range(0, {M})), "
        f"r -> d.dl[r[2]*(len(d.dl)//{M}) + r[1] + 1]), (a, b) -> a + b) AS dist "
        "FROM dlist d, codes x WHERE x.vec_id != d.qid)",
    ]
    return (
        ",\n".join(parts)
        + "\nSELECT qid AS query_id, nid AS neighbor_id, rank FROM ("
        "SELECT qid, nid, CAST(row_number() OVER (PARTITION BY qid "
        "ORDER BY dist, nid) AS INTEGER) AS rank FROM adc) z "
        f"WHERE rank <= {PQ_K}"
    )


@query("q_vec_pq_adc", oracle=_pq_sql())
def q_vec_pq_adc(spark, sf_dir):
    """Product-quantization retrieval, hash-certified end-to-end — the
    billion-vector ANN scale path (IVF-PQ's compression half): train
    per-subspace codebooks (M=8 subspaces x 8 dims, 16 codes, grouped
    integer-accumulation Lloyd — bit-reproducible, see module docstring),
    assign each vector an M-byte code, then answer queries with
    ASYMMETRIC DISTANCE COMPUTATION: one small distance table per query
    (M x 16 exact subspace distances) and a fixed-order M-term fold per
    candidate — the corpus is never touched beyond its codes. Output
    (query_id, neighbor_id, rank) is integers only; every double on the
    way (codebooks, ADC sums) is bit-identical in both engines, so even
    the RANKING hash-checks. At 100 TB: codes are 8 bytes/vector (64x
    smaller than the raw vectors), the per-query tables broadcast, and
    scoring is a map-only pass over the code table — recall is measured
    against exact top-k in pytest, not assumed."""
    pts = _points(spark, sf_dir)
    subs = pts.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("grp"),
                        F.slice("p", s * DSUB + 1, DSUB).alias("sp"),
                    )
                    for s in range(M)
                ]
            )
        ).alias("e"),
    ).select(F.col("e.grp").alias("grp"), "vec_id", F.col("e.sp").alias("p"))
    init = (
        subs.withColumn(
            "rn", F.row_number().over(Window.partitionBy("grp").orderBy("vec_id"))
        )
        .filter(F.col("rn") <= KC)
        .select(
            "grp",
            (F.col("rn") - 1).cast("int").alias("cent_id"),
            F.transform("p", lambda v: v.cast("double")).alias("c"),
        )
    )
    cb = grouped_kmeans(subs, init, PQ_ITERS)
    codes = (
        _grouped_assign(subs, cb)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("grp").alias("g"), F.col("cluster").alias("v")))
                ),
                lambda r: r["v"],
            ).alias("codes")
        )
    )
    qsub = subs.filter(F.col("vec_id") < PQ_NQ)
    dtab = qsub.join(F.broadcast(cb), "grp").select(
        F.col("vec_id").alias("qid"),
        "grp",
        "cent_id",
        _dist2(F.col("p"), F.col("c")).alias("d2"),
    )
    dlist = dtab.groupBy("qid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("grp").alias("g"), F.col("cent_id").alias("i"), F.col("d2").alias("v")
                    )
                )
            ),
            lambda r: r["v"],
        ).alias("dl")
    )
    # The ADC stride is the ACTUAL per-group codebook size (len(dl)/M),
    # not the nominal KC: a corpus smaller than KC seeds fewer centroids
    # and Lloyd drops empty clusters, so a hardcoded KC stride overran
    # the table (r7 degenerate-input sweep catch — identical on real
    # data where every group trains the full KC codes). try_element_at
    # + NULLS LAST keep Spark on DuckDB's out-of-range semantics
    # (list[i] -> NULL, NULL dists rank after real ones) should group
    # codebook sizes ever diverge.
    stride = (F.size(F.col("dl")) / F.lit(M)).cast("int")
    adc = (
        codes.crossJoin(F.broadcast(dlist))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.aggregate(
                F.transform(
                    "codes",
                    lambda c, i: F.try_element_at(
                        F.col("dl"), (i * stride + c + 1).cast("int")
                    ),
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("dist").asc_nulls_last(), F.col("nid").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank"),
        )
    )
