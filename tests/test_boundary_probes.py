"""More crafted-fixture boundary probes (the test_asof_tie_probe
pattern): the fixture contains NO customer exactly on a band edge and
NO event exactly on a day boundary (checked at sf0.01), so the
half-open [lo, hi) rules of the theta-band and interval-overlap joins
are never exercised where they bite. Each probe writes a boundary-heavy
table, runs the REGISTERED key on it, and checks hand-derived
membership."""

from __future__ import annotations

import datetime as dt
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries

DAY0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def band_dir(tmp_path_factory):
    # one customer exactly on each edge, plus interior sentinels
    bals = [0.0, 3000.0, 7000.0, -1.0, 1.0, 2999.99, 3000.01, 6999.99, 7000.01]
    tbl = pa.table({
        "c_custkey": pa.array(range(1, len(bals) + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, len(bals) + 1)], pa.string()),
        "c_nationkey": pa.array([0] * len(bals), pa.int32()),
        "c_acctbal": pa.array(bals, pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * len(bals), pa.string()),
    })
    root = tmp_path_factory.mktemp("band_edges")
    pq.write_table(tbl, str(root / "customer.parquet"))
    return str(root)


def test_theta_band_edges_close_lo_open_hi(spark, band_dir):
    out = {r.band: r for r in all_queries()["q_join_theta_band"](spark, band_dir).collect()}
    # edge values land in the band whose LO they are, never the one whose
    # HI they are: 0.0 -> low, 3000.0 -> mid, 7000.0 -> high
    assert out["neg"].n_cust == 1                      # only -1.0
    assert out["low"].n_cust == 3                      # 0.0, 1.0, 2999.99
    assert out["mid"].n_cust == 3                      # 3000.0, 3000.01, 6999.99
    assert out["high"].n_cust == 2                     # 7000.0, 7000.01
    assert abs(out["low"].sum_bal - (0.0 + 1.0 + 2999.99)) < 1e-6
    assert abs(out["mid"].sum_bal - (3000.0 + 3000.01 + 6999.99)) < 1e-6
    assert abs(out["high"].sum_bal - (7000.0 + 7000.01)) < 1e-6


@pytest.fixture(scope="module")
def midnight_dir(tmp_path_factory):
    rows = [
        # exactly at day-5 midnight: IN interval 5 (its lo) and intervals
        # 3, 4 (interior), OUT of interval 2 (its hi, exclusive)
        (1, DAY0 + dt.timedelta(days=5)),
        # 1 us before that midnight: in intervals 2, 3, 4 — not 5
        (2, DAY0 + dt.timedelta(days=5) - dt.timedelta(microseconds=1)),
        # exactly at the grid start: only interval 0
        (3, DAY0),
        # 1 us before the grid: in NO interval
        (4, DAY0 - dt.timedelta(microseconds=1)),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array([json.dumps({})] * len(rows), pa.string()),
    })
    root = tmp_path_factory.mktemp("midnight_events")
    pq.write_table(tbl, str(root / "events.parquet"))
    return str(root)


def test_interval_overlap_day_boundaries(spark, midnight_dir):
    out = {r.interval_id: r.n_events
           for r in all_queries()["q_join_interval_overlap"](spark, midnight_dir).collect()}
    # interval i covers [day i, day i+3)
    assert out == {
        0: 1,        # event 3 only (event 4 misses by 1 us)
        2: 1,        # event 2 only — event 1 is exactly interval 2's hi
        3: 2,        # events 1 and 2
        4: 2,        # events 1 and 2
        5: 1,        # event 1 at its lo — inclusive
    }
