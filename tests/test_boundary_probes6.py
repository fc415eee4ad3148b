"""Crafted-fixture boundary probes, batch 6 — numeric/null liveness
audit findings: the full-outer join's left-null side never fires at
sf0.01 (every cold-supplier nation also has rich customers), the
freshness gate never reports stale, and the semantic-dedup component
labels collapse to a single cluster (the sf0.01 similarity graph is
connected), leaving the multi-component and transitive-chain branches
of min-label propagation unproven on any fixture."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries


@pytest.fixture(scope="module")
def nations_dir(tmp_path_factory):
    # (nation, rich_customer?, cold_supplier?)
    custs = [(1, 1, 9500.0), (2, 2, 9500.0), (4, 4, 100.0)]
    supps = [(1, 1, -600.0), (3, 3, -600.0), (4, 4, 0.0)]
    root = tmp_path_factory.mktemp("fo_nations")
    pq.write_table(pa.table({
        "c_custkey": pa.array([c[1] * 10 for c in custs], pa.int64()),
        "c_name": pa.array([f"Customer#{c[1]}" for c in custs], pa.string()),
        "c_nationkey": pa.array([c[0] for c in custs], pa.int32()),
        "c_acctbal": pa.array([c[2] for c in custs], pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * len(custs), pa.string()),
    }), str(root / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([s[1] * 10 for s in supps], pa.int64()),
        "s_name": pa.array([f"Supplier#{s[1]}" for s in supps], pa.string()),
        "s_nationkey": pa.array([s[0] for s in supps], pa.int32()),
        "s_acctbal": pa.array([s[2] for s in supps], pa.float64()),
    }), str(root / "supplier.parquet"))
    return str(root)


def test_full_outer_emits_nulls_on_both_sides(spark, nations_dir):
    got = {r.nationkey: (r.n_cust, r.n_supp)
           for r in all_queries()["q_join_full_outer"](spark, nations_dir).collect()}
    assert got == {
        1: (1, 1),        # matched
        2: (1, None),     # right side null (live at sf0.01 too)
        3: (None, 1),     # LEFT side null — dead on every fixture SF
        # nation 4 fails both filters and must be absent entirely
    }


@pytest.fixture(scope="module")
def stale_orders_dir(tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # URGENT arrives daily through day 40 (sets the global max)
    for d in range(0, 41, 5):
        rows.append(("1-URGENT", base + dt.timedelta(days=d)))
    rows.append(("1-URGENT", base + dt.timedelta(days=40)))
    # HIGH stops at day 32 -> lag 8 > 7 -> STALE
    for d in range(0, 33, 4):
        rows.append(("2-HIGH", base + dt.timedelta(days=d)))
    # MEDIUM stops at day 33 -> lag exactly 7 -> NOT stale (strict >)
    for d in range(0, 34, 3):
        rows.append(("3-MEDIUM", base + dt.timedelta(days=d)))
    root = tmp_path_factory.mktemp("stale_orders")
    n = len(rows)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array([100.0] * n, pa.float64()),
        "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
    }), str(root / "orders.parquet"))
    return str(root)


def test_freshness_stale_branch_and_exact_lag_boundary(spark, stale_orders_dir):
    got = {r.priority: r for r in all_queries()["q_dq_freshness"](spark, stale_orders_dir).collect()}
    assert got["1-URGENT"].lag_days == 0 and got["1-URGENT"].stale == 0
    assert got["2-HIGH"].lag_days == 8 and got["2-HIGH"].stale == 1   # > 7
    assert got["3-MEDIUM"].lag_days == 7 and got["3-MEDIUM"].stale == 0  # == 7 not stale


@pytest.fixture(scope="module")
def clusters_dir(tmp_path_factory):
    dim = 8

    def unit(*components):
        v = [0.0] * dim
        for i, x in components:
            v[i] = x
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    r2 = 1 / math.sqrt(2)
    vecs = {
        # chain cluster: 0 ~ 1 (0.707) and 1 ~ 2 (0.707) but 0 ~ 2 (0.0):
        # only TRANSITIVE closure puts all three in cluster 0
        0: unit((0, 1.0)),
        1: unit((0, r2), (1, r2)),
        2: unit((1, 1.0)),
        # tight pair on another axis -> cluster 3
        3: unit((2, 1.0)),
        4: unit((2, 0.95), (3, 0.05)),
        # singleton on its own axis -> cluster 5
        5: unit((4, 1.0)),
    }
    ids = sorted(vecs)
    root = tmp_path_factory.mktemp("two_clusters")
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids], pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    }), str(root / "embeddings.parquet"))
    return str(root)


def test_semantic_cluster_multi_component_and_chain(spark, clusters_dir):
    got = {r.vec_id: (r.cluster_id, r.is_canonical)
           for r in all_queries()["q_dedup_semantic_cluster"](spark, clusters_dir).collect()}
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),  # chain closed transitively
        3: (3, True), 4: (3, False),
        5: (5, True),                                # singleton self-cluster
    }
