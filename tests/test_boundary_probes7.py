"""Crafted-fixture boundary probe, batch 7: the truncation-fidelity
audit's top1_match column is constant 0 at sf0.01 (random unit vectors
— 16-dim prefixes always scramble the top-1), so the 'preserved'
branch never fires on fixture data. A crafted 64-dim corpus pins both
outcomes: a query whose nearest neighbor lives in the prefix dims
(top-1 survives truncation) and a query whose full-dim winner hides
its similarity in the tail dims (truncation flips the top-1)."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries

DIM = 64


def _unit(*components):
    v = [0.0] * DIM
    for i, x in components:
        v[i] = x
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def trunc_dir(tmp_path_factory):
    r2 = 1 / math.sqrt(2)
    vecs = {
        # queries (vec_id < 8). Every vector keeps energy in dims < 16 so
        # no truncated norm is zero (0/0 sims would make ranking undefined)
        0: _unit((0, 1.0)),
        1: _unit((1, r2), (20, r2)),
        2: _unit((8, 1.0)),
        3: _unit((9, 1.0)),
        4: _unit((10, 1.0)),
        5: _unit((11, 1.0)),
        6: _unit((12, 1.0)),
        7: _unit((13, 1.0)),
        # corpus:
        # v8 ~ query 0 in PREFIX dims -> top-1 for q0 under both rankings
        8: _unit((0, 0.9), (2, 0.1)),
        # v9 beats v10 on FULL similarity to q1 (tail dim 20), but its
        # prefix part is orthogonal to q1 -> truncated sim ~0
        9: _unit((14, 0.3), (20, 0.95)),
        # v10 matches q1's prefix dim 1 -> wins the TRUNCATED ranking
        10: _unit((1, 0.9), (15, 0.44)),
        # generic filler with prefix energy
        11: _unit((5, 0.2), (25, 0.98)),
    }
    ids = sorted(vecs)
    root = tmp_path_factory.mktemp("trunc_fid")
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids], pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    }), str(root / "embeddings.parquet"))
    return str(root)


def test_truncation_top1_both_outcomes(spark, trunc_dir):
    got = {r.query_id: r for r in
           all_queries()["q_vec_truncation_fidelity"](spark, trunc_dir).collect()}
    # sanity on the construction: v9 vs v10 similarities to q1
    r2 = 1 / math.sqrt(2)
    full_v9 = r2 * 0.95 / math.sqrt(0.3 ** 2 + 0.95 ** 2)
    full_v10 = r2 * 0.9 / math.sqrt(0.9 ** 2 + 0.44 ** 2)
    assert full_v9 > full_v10  # v9 wins the full ranking for q1
    assert got[0].top1_match == 1  # prefix neighbor survives truncation
    assert got[1].top1_match == 0  # tail-dim winner flips under truncation
    # overlap is bounded by the corpus: at most 11 non-self neighbors
    for r in got.values():
        assert 0 <= r.n_overlap <= 10
