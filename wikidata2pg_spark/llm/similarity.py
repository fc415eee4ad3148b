"""Similarity search over the embeddings table (§2.12 L3/L4/L9/L10 + the
task-mandated cosine near-dup threshold variant).

Scale posture: brute-force cosine is the correctness baseline — at 100 TB
you bucket first (LSH, L4) or partition by IVF-style coarse cells and only
brute-force inside a cell. The dot-product kernel stays in Catalyst
higher-order expressions (zip_with/aggregate → codegen), NOT a Python UDF,
so the 64-dim fold runs JVM-side. Norms are computed once and joined, never
recomputed per pair. The DuckDB oracle must materialize the similarity CTE
(FIXTURES.md: the naive re-evaluating form runs >10 min at sf0.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load


def _vec_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _vectors_with_norms(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    v = _vec_double(F.col("embedding"))
    return e.select(F.col("vec_id"), F.col("label"), v.alias("v")).withColumn("nrm", _norm(F.col("v")))


_SIMS_CTE = """WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sims AS MATERIALIZED (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.v, b.v) AS sim
  FROM v a JOIN v b ON a.vec_id != b.vec_id
)"""


@query(
    "q_sim_cosine_topk",
    oracle=_SIMS_CTE
    + """
SELECT vec_id, neighbor_id, rank, round(sim, 6) AS sim
FROM (
  SELECT vec_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
  FROM sims
) WHERE rank <= 5
""",
)
def q_sim_cosine_topk(spark, sf_dir):
    """L3: exact cosine top-5 neighbors.

    Kernel shape: broadcast the (normalized) corpus matrix, stream query
    rows through an Arrow-batched matmul (numpy BLAS), emit only each row's
    top-k — the similarity matrix is never materialized as a DataFrame, so
    there is no O(n²)-row join/shuffle. (A pure-Catalyst nested-loop pair
    join computes the same thing but allocates 64-float arrays per pair —
    measured orders of magnitude slower at 2k×2k.) At 100 TB the broadcast
    side becomes an IVF codebook / LSH buckets (see q_sim_ann_lsh); the
    per-cell brute force keeps exactly this kernel."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = e.collect()  # corpus side: small enough to broadcast by design
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat_n = ids[order], mat_n[order]
    bc = spark.sparkContext.broadcast((ids, mat_n))

    k = 5

    def topk(batches):
        b_ids, b_mat = bc.value
        for pdf in batches:
            q = np.array(list(pdf["embedding"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ b_mat.T  # (batch, corpus)
            qid = pdf["vec_id"].to_numpy()
            self_mask = b_ids[None, :] == qid[:, None]
            sims[self_mask] = -np.inf
            # top-k with deterministic (sim desc, neighbor_id asc) order
            idx = np.argpartition(-sims, k, axis=1)[:, : k + 1]
            out = []
            for i in range(len(qid)):
                cand = idx[i]
                cand = cand[np.lexsort((b_ids[cand], -sims[i, cand]))][:k]
                for r, j in enumerate(cand):
                    out.append((int(qid[i]), int(b_ids[j]), r + 1, float(sims[i, j])))
            yield pd.DataFrame(out, columns=["vec_id", "neighbor_id", "rank", "sim"])

    res = e.repartition(32).mapInPandas(
        topk, "vec_id BIGINT, neighbor_id BIGINT, rank BIGINT, sim DOUBLE"
    )
    return res.select("vec_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))


@query(
    "q_sim_cosine_neardup",
    oracle=_SIMS_CTE
    + """
SELECT vec_id AS vec_a, neighbor_id AS vec_b, round(sim, 6) AS sim
FROM sims
WHERE vec_id < neighbor_id AND sim >= 0.2
""",
)
def q_sim_cosine_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: all pairs above a similarity threshold —
    the dedup-by-embedding primitive (threshold chosen to yield rows on the
    random fixture)."""
    v = _vectors_with_norms(spark, sf_dir)
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("v"), F.col("nrm"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("w"), F.col("nrm").alias("nrm_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn(
        "sim", _dot(F.col("v"), F.col("w")) / (F.col("nrm") * F.col("nrm_b"))
    )
    return pairs.filter(F.col("sim") >= 0.2).select(
        "vec_a", "vec_b", F.round("sim", 6).alias("sim")
    )


@query("q_sim_ann_lsh", oracle=None)  # randomized hyperplanes → rows-only
def q_sim_ann_lsh(spark, sf_dir):
    """L4: approximate NN via random-hyperplane LSH (BucketedRandomProjection)
    — the scale path: candidates come from bucket joins, not all pairs."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings")
    feat = e.select("vec_id", array_to_vector(_vec_double(F.col("embedding"))).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="buckets", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 8.0, distCol="l2_dist")
    return pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id")).select(
        F.col("datasetA.vec_id").alias("vec_a"),
        F.col("datasetB.vec_id").alias("vec_b"),
        F.round(F.col("l2_dist"), 4).alias("l2_dist"),
    )


@query(
    "q_vec_centroid",
    oracle="""
WITH ex AS (
  SELECT label, p.i AS pos, v.embedding[p.i + 1]::DOUBLE AS x
  FROM embeddings v, range(64) p(i)
)
SELECT label, pos, round(avg(x), 4) AS c
FROM ex GROUP BY label, pos
""",
)
def q_vec_centroid(spark, sf_dir):
    """L9: per-label centroid, one row per (label, dimension) — the grouped
    shape keeps the agg a plain hash-agg (map-side combine) at any scale."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(_vec_double(F.col("embedding"))).alias("pos", "x")
    ).select("label", F.col("pos").cast("long").alias("pos"), "x")
    return ex.groupBy("label", "pos").agg(F.round(F.avg("x"), 4).alias("c"))


@query(
    "q_vec_normalize",
    oracle="""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum')) AS nrm
  FROM embeddings
)
SELECT vec_id, round(nrm, 6) AS norm,
       round(v[1] / nrm, 6) AS u1,
       round(v[2] / nrm, 6) AS u2,
       round(list_aggregate(list_transform(v, x -> (x / nrm) * (x / nrm)), 'sum'), 6) AS unit_len
FROM n
""",
)
def q_vec_normalize(spark, sf_dir):
    """L10: L2 normalization (the fixture vectors are NOT normalized);
    unit_len==1.0 doubles as the invariant check."""
    v = _vectors_with_norms(spark, sf_dir)
    u = F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    return v.select(
        "vec_id",
        F.round("nrm", 6).alias("norm"),
        F.round(F.element_at(u, 1), 6).alias("u1"),
        F.round(F.element_at(u, 2), 6).alias("u2"),
        F.round(
            F.aggregate(F.transform(u, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("unit_len"),
    )
