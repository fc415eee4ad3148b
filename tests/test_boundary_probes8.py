"""Crafted-fixture boundary probes, batch 8 — the two flags the
numeric-liveness rule hardening surfaced (all-NULL columns slipped the
original min==max test): q_fn_try_safe's bad_cast never SUCCEEDS on
fixture data (o_orderstatus is never numeric), and q_pivot's status_p
pivot bucket never fills (the fixture has no linestatus 'P'). Each
probe lights the dead branch by running the REGISTERED key on a
crafted table carrying the missing state."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries


@pytest.fixture(scope="module")
def numeric_status_dir(tmp_path_factory):
    # order 1 carries a NUMERIC status string -> try_cast succeeds;
    # order 2 keeps the fixture shape -> NULL. Priorities exercise
    # prio_num on both rows.
    root = tmp_path_factory.mktemp("numeric_status")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([3, 4], pa.int64()),
        "o_orderstatus": pa.array(["42", "O"], pa.string()),
        "o_totalprice": pa.array([100.0, 200.0], pa.float64()),
        "o_orderdate": pa.array(
            [dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
    }), str(root / "orders.parquet"))
    return str(root)


def test_try_cast_success_branch(spark, numeric_status_dir):
    got = {r.o_orderkey: r for r in
           all_queries()["q_fn_try_safe"](spark, numeric_status_dir).collect()}
    assert got[1].bad_cast == 42      # numeric status parses
    assert got[2].bad_cast is None    # fixture-shaped status degrades
    assert got[1].prio_num == 1 and got[2].prio_num == 2


@pytest.fixture(scope="module")
def linestatus_p_dir(tmp_path_factory):
    rows = [  # (flag, status, qty)
        ("R", "F", 1.0),
        ("R", "O", 2.0),
        ("R", "P", 4.0),   # the never-seen pivot bucket
        ("A", "F", 8.0),   # A has no P row -> that cell stays NULL
    ]
    root = tmp_path_factory.mktemp("linestatus_p")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_linestatus": pa.array([r[1] for r in rows], pa.string()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_pivot_fills_and_leaves_null_cells(spark, linestatus_p_dir):
    got = {r.l_returnflag: r for r in
           all_queries()["q_pivot"](spark, linestatus_p_dir).collect()}
    assert got["R"].status_f == 1.0
    assert got["R"].status_o == 2.0
    assert got["R"].status_p == 4.0          # the dead bucket, lit
    assert got["A"].status_f == 8.0
    assert got["A"].status_o is None and got["A"].status_p is None
