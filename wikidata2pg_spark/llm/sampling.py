"""Deterministic sampling and source-mixing operators (r2 extras) — the
subsample/mixture primitives of a training-data pipeline.

Both use content-hash thresholds instead of an RNG: `md5(key) % 100 < pct`
is reproducible across reruns, engines, partitionings, and cluster sizes —
exactly the property a dataset-versioned pipeline needs (an RNG sample
changes under repartitioning; a hash sample is a pure function of the
row). Both are single narrow scans — no shuffle at all — so they cost one
pass at any scale, and both hash-check against the identical DuckDB
computation. For rate-based sampling Spark also offers TABLESAMPLE /
df.sample (RNG, no cross-engine twin); the hash form subsumes it for
pipeline use.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from wikidata2pg_spark.registry import query
from wikidata2pg_spark.tables import load
from wikidata2pg_spark.util import truncate_plan


def hash_u32(col):
    """THE md5-prefix 32-bit uniform: ('0x' || substr(md5(key), 1, 8))
    ::BIGINT in DuckDB. The single hash recipe behind every sampler,
    splitter, A/B bucketing (q_dq_srm) and resampler (q_agg_bootstrap_ci)
    — widening the prefix or changing the digest must change them all
    together, or the guardrails stop auditing the bucketing they claim
    to audit."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("long")


def _hash_pct(col, mod: int = 100):
    """hash_u32 reduced to a uniform int in [0, mod)."""
    return hash_u32(col) % mod


@query(
    "q_sample_hash",
    oracle="""
SELECT doc_id, lang,
       ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 10
""",
)
def q_sample_hash(spark, sf_dir):
    """Deterministic ~10% sample by content hash of the key."""
    d = load(spark, sf_dir, "documents")
    b = _hash_pct(F.col("doc_id"))
    return d.select("doc_id", "lang", b.alias("bucket")).filter(F.col("bucket") < 10)


@query(
    "q_mix_weighted",
    oracle="""
WITH h AS (
  SELECT doc_id, lang, source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket
FROM h
WHERE (source IN ('src0', 'src1', 'src2', 'src3', 'src4') AND bucket < 80)
   OR (source NOT IN ('src0', 'src1', 'src2', 'src3', 'src4') AND bucket < 30)
""",
)
def q_mix_weighted(spark, sf_dir):
    """Weighted source mixing: keep 80% of the high-priority sources
    (src0-src4 here) and 30% of everything else — the data-mixture knob of
    a pre-training corpus, as per-source hash thresholds (deterministic,
    shuffle-free; changing the mixture is a threshold edit, not a
    reshuffle)."""
    hi = ["src0", "src1", "src2", "src3", "src4"]
    d = load(spark, sf_dir, "documents")
    b = _hash_pct(F.col("doc_id"))
    keep = F.when(F.col("source").isin(hi), b < 80).otherwise(b < 30)
    return d.select("doc_id", "lang", "source", b.alias("bucket")).filter(keep)


@query(
    "q_sample_stratified",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
  FROM documents
)
SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 20
""",
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sample: exactly k=20 docs per language,
    chosen by hash order (md5 of the key ranks rows pseudo-randomly but
    reproducibly — same sample under any partitioning, engine, or rerun,
    unlike sampleBy's RNG). One shuffle on the stratum key; Catalyst's
    WindowGroupLimit pushes the rank filter below the sort so each
    partition keeps only k candidates — the balanced-eval-set /
    per-language-cap primitive."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
    )


@query(
    "q_split_leakage_safe",
    oracle="""
WITH b AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(source), 1, 8))::BIGINT % 10 AS bucket
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN bucket <= 7 THEN 'train'
            WHEN bucket = 8 THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
)
def q_split_leakage_safe(spark, sf_dir):
    """Leakage-safe train/val/test split: the split is a hash of the GROUP
    key (``source``), not the row — every document from one source lands in
    the same split, so near-duplicates and templated pages from a site can
    never straddle the train/test boundary (row-level splits leak; this is
    the standard fix). Content-hash, not RNG: the assignment is a pure
    function of the data — stable across reruns, partitionings, and
    cluster sizes, with no shuffle (one narrow scan). 80/10/10 by
    hash-bucket."""
    d = load(spark, sf_dir, "documents")
    bucket = _hash_pct(F.col("source"), mod=10)
    return d.select(
        "doc_id",
        "source",
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@query(
    "q_sample_token_budget",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
         md5(doc_id::VARCHAR) AS h
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tok,
         CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
              AS BIGINT) AS cum_tok
  FROM t
)
SELECT doc_id, lang, n_tok, cum_tok FROM c WHERE cum_tok - n_tok < 3000
""",
)
def q_sample_token_budget(spark, sf_dir):
    """Token-budget sampling: take documents per language, in a
    deterministic content-hash order, until each language's running token
    count reaches the budget (3000 here) — how a pretraining mix hits "N
    billion tokens per language" targets. The md5 order is a pure function
    of the data (_hash_pct's rationale: reruns, engines, partitionings and
    cluster sizes all agree — an RNG sample would not), and the keep rule
    admits the document that crosses the budget (its predecessor prefix is
    under budget), so the output is a deterministic prefix per language.

    Scale posture: one shuffle on lang for the running-sum window; exact
    integer token counts so the cumulative sums hash. A language so large
    its window partition breaks memory is exactly the q_pack_sequences
    situation — the two-pass ordered_bucket prefix sum (operators/
    windows.py:129) is the drop-in distributed form; at the per-language
    budget scale this operator targets, the single window is the cheaper
    plan."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum_tok", F.sum("n_tok").over(w))
    return c.filter(F.col("cum_tok") - F.col("n_tok") < 3000).select(
        "doc_id", "lang", "n_tok", "cum_tok"
    )


@query(
    "q_sample_balanced",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents
), k AS (
  SELECT min(c) AS k FROM (SELECT count(*) AS c FROM documents GROUP BY lang)
)
SELECT lang, doc_id FROM r, k WHERE rn <= k.k
""",
)
def q_sample_balanced(spark, sf_dir):
    """Class-balanced downsampling — equalize every language's document
    count to the SMALLEST class (the classic class-balancing step before
    fine-tuning on skewed data): rank each class's members in
    deterministic content-hash order (md5 of the id — agrees
    byte-for-byte across engines and partitionings, the q_sample_hash
    recipe) and keep the first k of each, k = min class size. One
    class-keyed rank window + a broadcast 1-row threshold — the take-k
    never collects a class to one machine beyond its sort, and at 100 TB
    the same plan holds because k derives from a partial-aggregable
    count. Balance (every class exactly k) is asserted in pytest."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    r = d.withColumn("rn", F.row_number().over(w))
    k = d.groupBy("lang").count().agg(F.min("count").alias("k"))
    return (
        r.crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("lang", "doc_id")
    )


_MIX_BUDGET = 10000  # document budget the temperature mix allocates


@query(
    "q_mix_temperature",
    oracle=f"""
WITH g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         sqrt(CAST(count(*) AS DOUBLE)) AS w
  FROM documents GROUP BY lang
), s AS (
  SELECT list(w ORDER BY lang) AS ws FROM g
), tot AS (
  SELECT list_reduce(ws, (acc, x) -> acc + x) AS sumw FROM s
)
SELECT g.lang, g.n_docs,
       floor(g.w * 1000000 / tot.sumw + 0.5) / 1000000 AS share,
       CAST(floor(g.w * {_MIX_BUDGET} / tot.sumw) AS BIGINT) AS target_docs
FROM g CROSS JOIN tot
""",
)
def q_mix_temperature(spark, sf_dir):
    """Temperature-weighted corpus mixing (the multilingual upsampling
    rule of mC4/XLM-R: p_l ~ n_l^alpha) with alpha = 1/2 — low-resource
    languages are upsampled relative to their raw share, and alpha = 1/2
    keeps every weight a CORRECTLY-ROUNDED sqrt of an exact integer
    count (IEEE-754 guarantees sqrt, unlike pow/ln), so both engines
    hold the identical double per language. The one order-sensitive
    float reduction (sum of weights) is a pinned-order left fold over
    the lang-sorted weight list (the EWMA/kmeans recipe); shares and
    the budget allocation are then single divisions of identical
    doubles (floor-displayed / floor-allocated). Plan: one scan to a
    partial-aggregable per-lang count (|langs| rows), a 1-row broadcast
    of the weight sum, zero wide operations — at 100 TB the mixture
    table costs one pass regardless of corpus size."""
    g = (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("w", F.sqrt(F.col("n_docs").cast("double")))
    )
    arr = g.agg(F.array_sort(F.collect_list(F.struct("lang", "w"))).alias("a"))
    ws = F.transform(F.col("a"), lambda x: x["w"])
    sumw = F.aggregate(
        F.slice(ws, 2, 10000), F.element_at(ws, 1), lambda acc, x: acc + x
    )
    tot = arr.select(sumw.alias("sumw"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.floor(F.col("w") * 1000000 / F.col("sumw") + F.lit(0.5)) / 1000000).alias(
            "share"
        ),
        F.floor(F.col("w") * _MIX_BUDGET / F.col("sumw"))
        .cast("long")
        .alias("target_docs"),
    )


_SPLIT_TRAIN_PCT = 70  # share of the time span that is training data
_SPLIT_PURGE_US = 86_400_000_000  # 1-day purge gap after the cutoff


@query(
    "q_sample_time_split",
    oracle=f"""
WITH e AS (
  SELECT event_type, epoch_us(ts::TIMESTAMP) AS t FROM events
), b AS (
  SELECT min(t) + CAST(floor((max(t) - min(t)) * {_SPLIT_TRAIN_PCT} / 100)
                       AS BIGINT) AS cutoff
  FROM e
), s AS (
  SELECT e.event_type,
         CASE WHEN e.t < b.cutoff THEN 'train'
              WHEN e.t < b.cutoff + {_SPLIT_PURGE_US} THEN 'purged'
              ELSE 'validation' END AS split,
         e.t
  FROM e CROSS JOIN b
)
SELECT split, event_type, CAST(count(*) AS BIGINT) AS n,
       min(t) AS min_ts_us, max(t) AS max_ts_us
FROM s GROUP BY split, event_type
""",
)
def q_sample_time_split(spark, sf_dir):
    """Walk-forward train/validation split with a purge gap — the
    leakage-safe split for TIME-DEPENDENT data (financial backtests,
    churn models): train on the first 70% of the time span, discard one
    full day after the cutoff (so no label window straddles the
    boundary — the 'purged cross-validation' rule), validate on the
    rest. Complements q_split_leakage_safe, which hashes ENTITIES:
    entity hashing kills user leakage, time purging kills temporal
    leakage — a production split often composes both. The cutoff is an
    exact integer-microsecond expression of min/max (one floored
    multiply-divide), assignment is pure comparison, and the audit
    output (counts + boundaries per split x type) is all integers.
    Plan: one 2-row agg broadcasts the cutoff; assignment is a
    map-only projection — at 100 TB the split costs one scan and the
    assignment column can be written back as a partition key."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t")
    )
    b = e.agg(
        (
            F.min("t")
            + F.floor(
                (F.max("t") - F.min("t")) * _SPLIT_TRAIN_PCT / F.lit(100)
            ).cast("long")
        ).alias("cutoff")
    )
    s = e.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(F.col("t") < F.col("cutoff"), F.lit("train"))
        .when(
            F.col("t") < F.col("cutoff") + _SPLIT_PURGE_US, F.lit("purged")
        )
        .otherwise(F.lit("validation"))
        .alias("split"),
        "t",
    )
    return s.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("t").alias("min_ts_us"),
        F.max("t").alias("max_ts_us"),
    )


_NEG_PCT = 100  # candidate pool: hash(cust:part) % 1000 < 100 (~10%)
_NEG_K = 3  # negatives emitted per customer


@query(
    "q_sample_negatives",
    oracle=f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), cust AS (SELECT DISTINCT o_custkey FROM pos),
pool AS (
  SELECT c.o_custkey, p.p_partkey,
         ('0x' || substr(md5(c.o_custkey || ':' || p.p_partkey), 1, 8))
           ::BIGINT % 1000 AS h
  FROM cust c CROSS JOIN part p
), cand AS (
  SELECT pool.* FROM pool
  WHERE h < {_NEG_PCT}
    AND NOT EXISTS (SELECT 1 FROM pos
                    WHERE pos.o_custkey = pool.o_custkey
                      AND pos.l_partkey = pool.p_partkey)
)
SELECT o_custkey, CAST(rk AS INT) AS rank, p_partkey AS neg_partkey
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY h, p_partkey) AS rk
      FROM cand) z
WHERE rk <= {_NEG_K}
""",
)
def q_sample_negatives(spark, sf_dir):
    """Deterministic negative sampling for recommender training: for
    every customer, 3 parts they never purchased, drawn by content
    hash — the (user, item-, item+) triple generator behind BPR-style
    training, with the module's reproducibility guarantee (an RNG
    sampler draws different negatives per rerun/partitioning; the
    md5 recipe is a pure function of (customer, part)). The candidate
    pool is hash-pruned to ~10% BEFORE the anti-join, which is what
    makes the plan scale: the cross join never materializes — at
    100 TB the pool filter becomes a hash-range band join and the
    per-customer candidate count stays |parts|/10 regardless of
    cluster size. Selection is (hash, partkey)-ranked, integer
    end-to-end. Positives come from the orders |><| lineitem
    interaction set; the anti-join is co-partitioned on customer."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
        # r10 (guide §2.4/§5): pos feeds BOTH the customer derivation and
        # the anti-join; without truncation Catalyst re-executes the whole
        # orders |><| lineitem pass for each consumer (2 scans -> 1).
    )
    pos = truncate_plan(pos)
    # r10 (guide §2.5, input parallelism): the distinct customer list is
    # tiny after AQE coalescing, so the cross join's md5 over |cust|x|parts|
    # pairs otherwise runs on ONE core (~3M hashes at sf0.01, 300M at
    # sf0.1). Spreading the left side across the session's cores is a
    # row-identical no-op that parallelizes the hash; measured 7.6 -> 1.6 s
    # median at sf0.01 (rows proven equal).
    cust = (
        pos.select("o_custkey")
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
    )
    parts = load(spark, sf_dir, "part").select("p_partkey")
    pool = cust.crossJoin(parts).withColumn(
        "h",
        _hash_pct(
            F.concat_ws(":", F.col("o_custkey"), F.col("p_partkey")), 1000
        ),
    )
    cand = pool.filter(F.col("h") < _NEG_PCT).join(
        pos.select(
            "o_custkey", F.col("l_partkey").alias("p_partkey")
        ),
        ["o_custkey", "p_partkey"],
        "left_anti",
    )
    wk = Window.partitionBy("o_custkey").orderBy("h", "p_partkey")
    return (
        cand.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _NEG_K)
        .select(
            "o_custkey",
            F.col("rk").cast("int").alias("rank"),
            F.col("p_partkey").alias("neg_partkey"),
        )
    )
