"""Crafted-fixture probe for the as-of join's tie boundary: the fixture
has ZERO same-microsecond (error, purchase) pairs (checked at sf0.01),
so the `>=` inclusivity — and the is_p-desc tie ordering that implements
it in the tag-and-union window form — is never exercised by any mirror
or driver run. This probe writes a tie-heavy events table, runs the
REGISTERED key on it, checks hand-derived expectations, and co-runs the
DuckDB ASOF oracle on the same file to prove both engines agree at the
boundary (the q_stream_* empirical-bound discipline applied to batch)."""

from __future__ import annotations

import datetime as dt
import json

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
US = dt.timedelta(microseconds=1)


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    rows = [
        # user 1: purchase and error at the SAME microsecond -> >= matches
        (101, T0, 1, "purchase", 10.0),
        (102, T0, 1, "error", 0.0),
        # user 2: purchase 1 us AFTER the error -> no match
        (201, T0, 2, "error", 0.0),
        (202, T0 + US, 2, "purchase", 20.0),
        # user 3: purchases straddling the error -> latest at-or-before wins
        (301, T0 - dt.timedelta(minutes=5), 3, "purchase", 30.0),
        (302, T0, 3, "error", 0.0),
        (303, T0 + dt.timedelta(minutes=5), 3, "purchase", 31.0),
        # user 4: two purchases at the SAME us as the error -> still one
        # match, the tie pair is deterministic (same p_ts either way)
        (401, T0, 4, "purchase", 40.0),
        (402, T0, 4, "purchase", 41.0),
        (403, T0, 4, "error", 0.0),
        # noise the key must filter out
        (501, T0, 1, "click", 1.0),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([json.dumps({}) for _ in rows], pa.string()),
    })
    root = tmp_path_factory.mktemp("asof_tie")
    pq.write_table(tbl, str(root / "events.parquet"))
    return str(root)


# ONE expectation shared by both engine tests — the file's claim is that
# both engines agree at the boundary, so the expectation must be single
EXPECTED = {
    102: T0,                              # same-us purchase IS matched (>=)
    201: None,                            # 1 us later is not
    302: T0 - dt.timedelta(minutes=5),    # latest at-or-before, not after
    403: T0,                              # double tie still matches T0
}


def test_asof_tie_semantics_on_crafted_fixture(spark, tie_dir):
    out = {r.event_id: r.last_purchase_ts
           for r in all_queries()["q_join_asof"](spark, tie_dir).collect()}
    assert out == EXPECTED


def test_duckdb_asof_oracle_agrees_at_the_boundary(tie_dir):
    got = dict(duckdb.connect().execute(f"""
        SELECT e.event_id, p.ts
        FROM (SELECT * FROM read_parquet('{tie_dir}/events.parquet')
              WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM read_parquet('{tie_dir}/events.parquet')
                        WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """).fetchall())
    assert got == EXPECTED
