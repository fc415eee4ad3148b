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
    """Exact-integer centroid update: per-cluster member counts and
    per-dimension bigint sums (map-side combined; shuffle volume is
    K x D partials), then ONE double division per coordinate. Clusters
    that lost every member keep their previous centroid (left join +
    coalesce — same guard in the oracle)."""
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    dims = (
        assigned.select("cluster", F.posexplode("p").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.sum("v").alias("s"))
    )
    new = (
        dims.join(sizes, "cluster")
        .select(
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
    ).localCheckpoint(eager=False)
    for _ in range(ITERS):
        assigned = _assign(pts, cents)
        cents = _update(assigned, cents).localCheckpoint(eager=False)
    return _assign(pts, cents).select("vec_id", "cluster")
