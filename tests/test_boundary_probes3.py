"""Crafted-fixture boundary probes, batch 3: the MERGE upsert's three
action branches at their key-range edges. At sf0.001 the fixture's
update window [4000, 12000) is empty, so the registered key emits ONLY
'kept' rows there — the inserted/updated branches and both range
boundaries are pinned here on a crafted orders table instead."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries

KEYS = [1, 3999, 4000, 7999, 8000, 11999, 12000]


@pytest.fixture(scope="module")
def merge_dir(tmp_path_factory):
    tbl = pa.table({
        "o_orderkey": pa.array(KEYS, pa.int64()),
        "o_custkey": pa.array([1] * len(KEYS), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(KEYS), pa.string()),
        "o_totalprice": pa.array([float(100 * k % 997) + 0.25 for k in KEYS], pa.float64()),
        "o_orderdate": pa.array([dt.datetime(2024, 1, 1)] * len(KEYS), pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(KEYS), pa.string()),
    })
    root = tmp_path_factory.mktemp("merge_edges")
    pq.write_table(tbl, str(root / "orders.parquet"))
    return str(root)


def test_merge_upsert_branches_and_range_edges(spark, merge_dir):
    rows = {r.o_orderkey: r for r in all_queries()["q_merge_upsert"](spark, merge_dir).collect()}
    price = {k: float(100 * k % 997) + 0.25 for k in KEYS}
    # base = keys < 8000; updates = keys in [4000, 12000); 12000 in neither
    assert set(rows) == {1, 3999, 4000, 7999, 8000, 11999}
    for k in (1, 3999):  # base only — survives untouched
        assert rows[k].merge_action == "kept"
        assert (rows[k].o_orderstatus, rows[k].o_totalprice) == ("O", price[k])
    for k in (4000, 7999):  # both sides — update wins (4000 proves >= lo)
        assert rows[k].merge_action == "updated"
        assert rows[k].o_orderstatus == "U"
        assert rows[k].o_totalprice == price[k] + 1000.0
    for k in (8000, 11999):  # updates only — inserted (8000 proves hi excl.)
        assert rows[k].merge_action == "inserted"
        assert rows[k].o_orderstatus == "U"
        assert rows[k].o_totalprice == price[k] + 1000.0
