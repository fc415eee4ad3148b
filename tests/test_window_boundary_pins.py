"""Window-boundary pins for the streaming window keys: the exact
inclusion rules (hour-floor half-open tumbling, the two-window sliding
invariant, and the session gap boundary) recomputed in pure Python, plus
an empirical micro-probe pinning Spark's session_window semantics at the
EXACT gap — an event precisely 30:00.000000 after its predecessor MERGES
(the break rule is strictly '>'), which is what the DuckDB oracle's
`> INTERVAL 30 MINUTE` encodes; the fixture alone cannot distinguish
the two rules, so this probe is the only thing holding that boundary."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load

HOUR = dt.timedelta(hours=1)
HALF = dt.timedelta(minutes=30)


def _events(spark):
    return load(spark, SF_SMOKE, "events").select("user_id", "event_id", "ts", "event_type", "value").collect()


def _floor(ts, step: dt.timedelta):
    us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    step_us = int(step.total_seconds() * 1_000_000)
    return dt.datetime.utcfromtimestamp((us - us % step_us) / 1_000_000)


def test_session_window_exact_gap_boundary(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base), (1, base + HALF),                                   # == gap
        (2, base), (2, base + HALF - dt.timedelta(microseconds=1)),    # inside
        (3, base), (3, base + HALF + dt.timedelta(microseconds=1)),    # outside
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = defaultdict(list)
    for r in (df.groupBy("user_id", F.session_window("ts", "30 minutes"))
                .agg(F.count(F.lit(1)).alias("n")).collect()):
        out[r.user_id].append((r.session_window.start, r.session_window.end, r.n))
    assert out[1] == [(base, base + HOUR, 2)]          # merged at == gap
    assert len(out[2]) == 1 and out[2][0][2] == 2      # merged inside
    assert len(out[3]) == 2                            # split just outside
    # session end = last event + gap, exactly
    assert out[3][0] == (base, base + HALF, 1) or out[3][1] == (base, base + HALF, 1)


def test_stream_tumbling_matches_python_hour_floor(spark):
    rows = {(r.window_start, r.window_end, r.event_type): (r.n, r.sum_value)
            for r in all_queries()["q_stream_tumbling"](spark, SF_SMOKE).collect()}
    want = defaultdict(lambda: [0, 0.0])
    for e in _events(spark):
        ws = _floor(e.ts, HOUR)
        c = want[(ws, ws + HOUR, e.event_type)]
        c[0] += 1
        c[1] += e.value
    assert set(rows) == set(want)
    for key, (n, s) in want.items():
        assert rows[key][0] == n
        # compare against the UNROUNDED Python sum within half a cent:
        # replaying Spark's HALF_UP tie rule against Python's half-even
        # round() is exactly the divergence class FIXTURES.md bans
        assert abs(rows[key][1] - s) < 0.00501, key


def test_sliding_every_event_in_exactly_two_windows(spark):
    rows = {(r.window_start, r.window_end): (r.n, r.sum_value)
            for r in all_queries()["q_stream_sliding"](spark, SF_SMOKE).collect()}
    want = defaultdict(lambda: [0, 0.0])
    events = _events(spark)
    for e in events:
        half = _floor(e.ts, HALF)
        for ws in (half, half - HALF):  # the two 1h/30m windows covering ts
            c = want[(ws, ws + HOUR)]
            c[0] += 1
            c[1] += e.value
    assert set(rows) == set(want)
    for key, (n, s) in want.items():
        assert rows[key][0] == n
        assert abs(rows[key][1] - s) < 0.00501, key  # see tumbling note
    # the two-window invariant: total window membership = 2 * |events|
    assert sum(n for n, _ in rows.values()) == 2 * len(events)


def test_session_islands_match_python_strict_gt_rule(spark):
    rows = {(r.user_id, r.session_start): (r.session_end, r.n)
            for r in all_queries()["q_stream_session"](spark, SF_SMOKE).collect()}
    by_user = defaultdict(list)
    for e in _events(spark):
        by_user[e.user_id].append((e.ts, e.event_id))
    want = {}
    n_multi = 0
    for uid, ts_list in by_user.items():
        ts_list.sort()
        sessions = []
        for t, _ in ts_list:
            if sessions and t - sessions[-1][-1] <= HALF:  # strict >: == gap merges
                sessions[-1].append(t)
            else:
                sessions.append([t])
        for s in sessions:
            want[(uid, s[0])] = (s[-1] + HALF, len(s))
            if len(s) > 1:
                n_multi += 1
    assert rows == want
    assert n_multi > 0  # the fixture produces real multi-event sessions
