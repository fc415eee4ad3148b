"""Hybrid retrieval: lexical + dense rankings fused with reciprocal-rank
fusion (RRF, Cormack et al. 2009 — the fusion rule Elasticsearch/OpenSearch
ship for BM25+kNN hybrid search). The modern RAG retrieval stack is
exactly this shape: a term-based ranking and an embedding ranking each
see matches the other misses, and rank-based fusion needs no score
calibration between them.

Hash-certifiability: ranks are integers once each ranking is
deterministic — lexical scores are exact-integer Jaccard ratios, dense
scores are cosine folds over identical doubles with one association
order on BOTH engines (we do NOT use DuckDB's list_cosine_similarity:
its internal summation order is not ours to pin), every ranking breaks
ties by doc id, and the RRF sum adds its two reciprocal terms in one
fixed order. The fixture's embeddings table is row-aligned with
documents (vec_id == doc_id, both 0..N-1)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load
from wikidata2pg_spark.util import truncate_plan

NQ = 8  # query docs: doc_id < 8 (the q_vec_pq_adc convention)
TOPN = 10  # per-ranking candidate depth
K_FUSE = 5  # fused results per query
RRF_K = 60  # the standard RRF constant


def _rrf_sql() -> str:
    cos = (
        "list_reduce(list_transform(list_zip(q.v, c.v), r -> r[1] * r[2]), (a, b) -> a + b) "
        "/ (sqrt(list_reduce(list_transform(q.v, x -> x * x), (a, b) -> a + b)) "
        "* sqrt(list_reduce(list_transform(c.v, x -> x * x), (a, b) -> a + b)))"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
), lex_pairs AS (
  SELECT q.doc_id AS qid, d.doc_id AS did, count(*) AS ns
  FROM toks q JOIN toks d ON q.tok = d.tok AND q.doc_id < {NQ} AND d.doc_id != q.doc_id
  GROUP BY 1, 2
), lex_rank AS (
  SELECT qid, did, CAST(row_number() OVER (
           PARTITION BY qid
           ORDER BY CAST(p.ns AS DOUBLE) / (sq.n + sd.n - p.ns) DESC, did ASC
         ) AS BIGINT) AS r
  FROM lex_pairs p
  JOIN sizes sq ON sq.doc_id = p.qid
  JOIN sizes sd ON sd.doc_id = p.did
), vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), dense_rank_ AS (
  SELECT q.vec_id AS qid, c.vec_id AS did, CAST(row_number() OVER (
           PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id ASC
         ) AS BIGINT) AS r
  FROM vecs q JOIN vecs c ON q.vec_id < {NQ} AND c.vec_id != q.vec_id
), fused AS (
  SELECT COALESCE(l.qid, d.qid) AS query_id,
         COALESCE(l.did, d.did) AS doc_id,
         COALESCE(1.0 / ({RRF_K} + l.r), 0.0) + COALESCE(1.0 / ({RRF_K} + d.r), 0.0)
           AS rrf
  FROM (SELECT * FROM lex_rank WHERE r <= {TOPN}) l
  FULL OUTER JOIN (SELECT * FROM dense_rank_ WHERE r <= {TOPN}) d
    ON l.qid = d.qid AND l.did = d.did
)
SELECT query_id, doc_id, fused_rank,
       floor(rrf * 1000000 + 0.5) / 1000000 AS rrf
FROM (
  SELECT query_id, doc_id, rrf, CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC
         ) AS INTEGER) AS fused_rank
  FROM fused
) z
WHERE fused_rank <= {K_FUSE}
"""


@query("q_retrieval_hybrid_rrf", oracle=_rrf_sql())
def q_retrieval_hybrid_rrf(spark, sf_dir):
    """Hybrid search, hash-certified end-to-end: per query doc, a lexical
    top-10 (exact token-set Jaccard via the postings join — the
    q_dedup_ngram_jaccard kernel shape with the query side filtered to
    {NQ} docs, so the join is postings x tiny-broadcast) and a dense
    top-10 (cosine over the row-aligned embeddings, identical fold order
    in both engines), fused with RRF: score = 1/(60+r_lex) + 1/(60+r_dense),
    missing list membership contributing 0, final top-5 by (score, doc_id).

    Plan at 100 TB: the lexical side shuffles only postings that match a
    query token (query term set broadcast); the dense side is the
    broadcast-queries x corpus map-only pass of q_sim_query_topk; fusion
    itself joins two <= NQ x 10-row frames — negligible. Rank integers
    make fusion immune to score-scale drift between the two retrievers,
    which is exactly why RRF is the production default for BM25 + kNN."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    toks = d.select("doc_id", F.explode("toks").alias("tok"))
    sizes = d.select("doc_id", F.size("toks").alias("n"))
    qt = toks.filter(F.col("doc_id") < NQ).select(
        F.col("doc_id").alias("qid"), "tok"
    )
    pairs = (
        F.broadcast(qt)
        .join(toks.withColumnRenamed("doc_id", "did"), "tok")
        .filter(F.col("did") != F.col("qid"))
        .groupBy("qid", "did")
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    jac = (
        pairs.join(sizes.withColumnRenamed("doc_id", "qid").withColumnRenamed("n", "nq"), "qid")
        .join(sizes.withColumnRenamed("doc_id", "did").withColumnRenamed("n", "nd"), "did")
        .select(
            "qid",
            "did",
            (F.col("ns").cast("double") / (F.col("nq") + F.col("nd") - F.col("ns"))).alias(
                "score"
            ),
        )
    )
    w_lex = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("did").asc())
    lex = (
        jac.withColumn("r", F.row_number().over(w_lex).cast("long"))
        .filter(F.col("r") <= TOPN)
        .select("qid", "did", "r")
    )

    # reuse similarity.py's pinned-fold helpers (ONE place owns the
    # cross-engine fold order), and compute each vector's norm ONCE —
    # inlining the norm fold in the cosine expression would re-run it per
    # (query, candidate) pair inside the crossJoin (review r6)
    from wikidata2pg_spark.llm.similarity import _norm, _vec_double

    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id", _vec_double(F.col("embedding")).alias("v")
    ).withColumn("cn", _norm(F.col("v")))
    qv = vecs.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qvec"), F.col("cn").alias("qn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    cos = dot / (F.col("qn") * F.col("cn"))
    w_dense = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("did").asc())
    dense = (
        vecs.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("did"), cos.alias("score"))
        .withColumn("r", F.row_number().over(w_dense).cast("long"))
        .filter(F.col("r") <= TOPN)
        .select("qid", "did", "r")
    )

    rec = lambda c: F.coalesce(1.0 / (F.lit(RRF_K) + c), F.lit(0.0))  # noqa: E731
    fused = (
        lex.withColumnRenamed("r", "rl")
        .join(dense.withColumnRenamed("r", "rd"), ["qid", "did"], "full_outer")
        .select(
            F.col("qid").alias("query_id"),
            F.col("did").alias("doc_id"),
            (rec(F.col("rl")) + rec(F.col("rd"))).alias("rrf_raw"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_raw").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f).cast("int"))
        .filter(F.col("fused_rank") <= K_FUSE)
        .select(
            "query_id",
            "doc_id",
            "fused_rank",
            (F.floor(F.col("rrf_raw") * 1000000 + F.lit(0.5)) / 1000000).alias("rrf"),
        )
    )


K_CAND = 20  # MMR candidate pool per query
K_MMR = 5  # reranked results per query
_FP = 1_000_000  # fixed-point scale for embedding components


def _mmr_sql() -> str:
    """Unrolled greedy MMR oracle (the kmeans/PQ hash-certification
    recipe): candidate relevance and pairwise penalties are EXACT
    integer dot products of fixed-point vectors, and with lambda = 1/2
    the argmax of lambda*rel - (1-lambda)*penalty is the argmax of the
    pure-integer rel - max_penalty — the whole selection trace is
    integer-decided, so a 5-step CTE unroll reproduces Spark's loop
    bit-for-bit."""
    steps = []
    union = "SELECT qid, vec_id FROM sel1"
    for k in range(2, K_MMR + 1):
        steps.append(f"""
t{k} AS (
  SELECT c.qid, c.vec_id, CAST(c.rel - max(p.s) AS BIGINT) AS score
  FROM cand c
  JOIN pw p ON p.qid = c.qid AND p.ai = c.vec_id
  JOIN ({union}) s ON s.qid = p.qid AND s.vec_id = p.bi
  WHERE NOT EXISTS (SELECT 1 FROM ({union}) x
                    WHERE x.qid = c.qid AND x.vec_id = c.vec_id)
  GROUP BY c.qid, c.vec_id, c.rel
), sel{k} AS (
  SELECT qid, vec_id, score, {k} AS rank FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY score DESC, vec_id) AS rn2
    FROM t{k}) z WHERE rn2 = 1
)""")
        union += f" UNION ALL SELECT qid, vec_id FROM sel{k}"
    final_union = " UNION ALL ".join(
        f"SELECT qid, vec_id, score, rank FROM sel{k}"
        for k in range(1, K_MMR + 1)
    )
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_FP} + 0.5) AS BIGINT)) AS f
  FROM embeddings
), q AS (SELECT vec_id AS qid, f AS qf FROM v WHERE vec_id < {NQ}),
d AS (
  SELECT q.qid, v.vec_id, v.f,
         CAST(list_sum(list_transform(list_zip(q.qf, v.f),
                                      r -> r[1] * r[2])) AS BIGINT) AS rel
  FROM q, v WHERE v.vec_id <> q.qid
), cand AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY rel DESC, vec_id) AS rn
    FROM d) z WHERE rn <= {K_CAND}
), pw AS (
  SELECT a.qid, a.vec_id AS ai, b.vec_id AS bi,
         CAST(list_sum(list_transform(list_zip(a.f, b.f),
                                      r -> r[1] * r[2])) AS BIGINT) AS s
  FROM cand a JOIN cand b ON a.qid = b.qid AND a.vec_id <> b.vec_id
), sel1 AS (
  SELECT qid, vec_id, CAST(rel AS BIGINT) AS score, 1 AS rank
  FROM cand WHERE rn = 1
),{",".join(steps)}
SELECT qid AS query_id, CAST(rank AS INT) AS rank, vec_id,
       CAST(score AS BIGINT) AS mmr_score
FROM ({final_union}) u
"""


@query("q_retrieval_mmr", oracle=_mmr_sql())
def q_retrieval_mmr(spark, sf_dir):
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998)
    with lambda = 1/2 — the diversity pass RAG stacks run over the
    raw top-k so five near-duplicate passages don't fill the context
    window. Greedy: seed with the most relevant candidate, then
    repeatedly take argmax of lambda*rel(q,d) - (1-lambda)*max_{s in
    S} sim(d,s).

    Hash-certification: vectors snap to fixed-point micros, so
    relevance and penalties are EXACT integer dot products (|component|
    <= ~3.2e5 fp, 64 dims => |dot| < 7e12, comfortably int64), and
    lambda = 1/2 turns the argmax objective into the pure-integer
    rel - max_penalty — every selection decision is integer-compared
    with a vec_id tiebreak, making the full greedy trace bit-exact
    against the oracle's 5-step CTE unroll.

    Scale shape: the candidate generation is the q_sim_query_topk map
    pass (corpus x broadcast query block, SALTED two-phase top-20 so no
    single task ever sees a query's full corpus ranking); the greedy
    loop then runs on localCheckpointed 20-row-per-query candidates —
    4 tiny co-partitioned joins, independent of corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    fp = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * _FP + F.lit(0.5)).cast("long"),
    )
    v = emb.select("vec_id", fp.alias("f"))
    q = v.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("qid"), F.col("f").alias("qf")
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "f", dot(F.col("qf"), F.col("f")).alias("rel"))
    )
    # salted two-phase top-K_CAND: local winners per (qid, salt), then the
    # exact global top per qid over <= 32*K_CAND survivors
    salted = d.withColumn("salt", F.pmod(F.hash("vec_id"), F.lit(32)))
    w1 = Window.partitionBy("qid", "salt").orderBy(
        F.col("rel").desc(), F.col("vec_id").asc()
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("rel").desc(), F.col("vec_id").asc())
    cand = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= K_CAND)
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= K_CAND)
        .select("qid", "vec_id", "f", "rel", "rn")
        # 20 rows/query; materialize once so the 4 greedy iterations do
        # not each re-run the corpus pass (sibling-subtree recompute)
    )
    cand = truncate_plan(cand)
    sel = cand.filter(F.col("rn") == 1).select(
        "qid",
        "vec_id",
        F.col("rel").alias("score"),
        F.lit(1).alias("rank"),
        "f",
    )
    selected = sel
    for k in range(2, K_MMR + 1):
        remaining = cand.join(
            selected.select("qid", "vec_id"), ["qid", "vec_id"], "left_anti"
        )
        pairs = remaining.join(
            selected.select(
                "qid", F.col("f").alias("sf")
            ),
            "qid",
        ).select(
            "qid", "vec_id", "rel", dot(F.col("f"), F.col("sf")).alias("p")
        )
        scored = pairs.groupBy("qid", "vec_id").agg(
            F.max("rel").alias("rel"), F.max("p").alias("mp")
        )
        wk = Window.partitionBy("qid").orderBy(
            (F.col("rel") - F.col("mp")).desc(), F.col("vec_id").asc()
        )
        pick = (
            scored.withColumn("rn2", F.row_number().over(wk))
            .filter(F.col("rn2") == 1)
            .select(
                "qid",
                "vec_id",
                (F.col("rel") - F.col("mp")).alias("score"),
                F.lit(k).alias("rank"),
            )
            .join(cand.select("qid", "vec_id", "f"), ["qid", "vec_id"])
        )
        # r10: checkpoint the tiny (<= k rows/query) selected set each
        # greedy round — cand was already materialized, but selected's
        # lineage re-embedded every previous round's joins/windows, giving
        # a 480-exchange final plan whose PLANNING dominated execution
        # (guide §3.3). Identical greedy trace (integer argmax over the
        # checkpointed candidates); measured build+exec 7.8 -> 4.4 s at
        # sf0.01, 14.1 -> 1.8 s at sf0.1 (OPTIMIZATION_r10.md).
        selected = truncate_plan(selected.unionByName(
            pick.select(*selected.columns)
        ))
    return selected.select(
        F.col("qid").alias("query_id"),
        F.col("rank").cast("int").alias("rank"),
        "vec_id",
        F.col("score").cast("long").alias("mmr_score"),
    )
