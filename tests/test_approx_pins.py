"""Accuracy pins for the rows-only-by-design keys (§2: approx sketches
have no DuckDB oracle because the sketch algorithms differ across
engines). Rows-only means the driver only counts rows — these tests are
the semantic evidence: each approximate answer is checked against the
EXACT answer with a bound derived from the sketch's guarantee (HLL rsd,
GK rank error, LSH recall measured-then-pinned on the deterministic
seed), so a wiring bug (wrong column, wrong group, wrong distance) fails
loudly even though no hash can."""

from __future__ import annotations

import bisect
import zlib
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load


def test_approx_count_distinct_within_hll_bounds(spark):
    rows = {r.l_returnflag: r for r in all_queries()["q_agg_approx_cd"](spark, SF_SMOKE).collect()}
    exact = {
        r.l_returnflag: (r.p, r.o)
        for r in load(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_orderkey").alias("o"))
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        p, o = exact[flag]
        # default rsd = 5%; explicit rsd = 2% — allow 4 sigma
        assert abs(r.approx_parts - p) / p < 0.20, flag
        assert abs(r.approx_orders - o) / o < 0.08, flag


def test_percentile_approx_rank_error_within_gk_bound(spark):
    ap = {r.l_returnflag: r.ap50_qty for r in all_queries()["q_agg_percentile_approx"](spark, SF_SMOKE).collect()}
    groups = defaultdict(list)
    for r in load(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_quantity").collect():
        groups[r.l_returnflag].append(r.l_quantity)
    assert set(ap) == set(groups)
    for flag, v in ap.items():
        xs = sorted(groups[flag])
        n = len(xs)
        # the returned value must be an actual data value whose rank
        # interval covers the median up to the accuracy=1000 rank error
        # (plus slack for the round(,2) display)
        lo = bisect.bisect_left(xs, v - 0.005) / n
        hi = bisect.bisect_right(xs, v + 0.005) / n
        assert lo <= 0.51 and hi >= 0.49, (flag, v, lo, hi)


def test_ann_lsh_recall_and_distance_fidelity(spark):
    out = all_queries()["q_sim_ann_lsh"](spark, SF_SMOKE).collect()
    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    ids = [int(r.vec_id) for r in emb]
    V = np.array([r.embedding for r in emb], dtype=np.float64)
    D = np.sqrt(((V[:, None, :] - V[None, :, :]) ** 2).sum(-1))
    pos = {v: i for i, v in enumerate(ids)}
    # orient pairs by vec_id VALUE (the query emits vec_a < vec_b), never
    # by collect position; approxSimilarityJoin's threshold is strict <
    ordered = sorted(ids)
    true_pairs = {
        (a, b) for i, a in enumerate(ordered) for b in ordered[i + 1:]
        if D[pos[a], pos[b]] < 8.0
    }
    got = {(r.vec_a, r.vec_b): r.l2_dist for r in out}
    # approxSimilarityJoin verifies exact distance on candidates =>
    # precision 1 by construction; every reported distance is the true one
    for (a, b), d in got.items():
        assert abs(d - D[pos[a], pos[b]]) < 1e-4, (a, b)
    # recall measured 0.935 on the deterministic seed=42 tables — pin a
    # floor with margin (a bucketing/join wiring bug collapses to ~0)
    recall = len(set(got) & true_pairs) / len(true_pairs)
    assert recall >= 0.8, recall


def test_native_hashes_deterministic_and_crc32_matches_zlib(spark):
    q = all_queries()["q_fn_hash_spark_native"]
    rows = {r.p_partkey: r for r in q(spark, SF_SMOKE).collect()}
    names = {p.p_partkey: p.p_name for p in load(spark, SF_SMOKE, "part").select("p_partkey", "p_name").collect()}
    assert set(rows) == set(names)
    for pk, r in rows.items():
        # crc32 has an independent stdlib reference — proves the column
        # plumbing for the whole projection
        assert r.h_crc32 == zlib.crc32(names[pk].encode()), pk
    # xxhash64/murmur3 have no stdlib twin: pin determinism under a
    # different INPUT partitioning — the repartition must sit BELOW the
    # hash projection or the expressions are never re-evaluated
    again = {
        r.p_partkey: r
        for r in load(spark, SF_SMOKE, "part")
        .repartition(7, "p_partkey")
        .select(
            "p_partkey",
            F.crc32(F.col("p_name")).alias("h_crc32"),
            F.xxhash64(F.col("p_name")).alias("h_xxhash64"),
            F.hash(F.col("p_name")).alias("h_murmur3"),
        )
        .collect()
    }
    for pk, r in rows.items():
        assert (again[pk].h_crc32, again[pk].h_xxhash64, again[pk].h_murmur3) == (
            r.h_crc32, r.h_xxhash64, r.h_murmur3
        )
