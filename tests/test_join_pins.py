"""Join-boundary and reshape pins: the band/interval half-open
inclusivity recomputed in Python (boundary rows asserted to exist), the
semi ∪ anti = left-table partition law, pivot/unpivot mass conservation
against plain groupBy totals, and NA-fill ordering (was_null computed
before filling) — algebraic invariants no hash compare states
explicitly."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load

BANDS = [("neg", -100000.0, 0.0), ("low", 0.0, 3000.0),
         ("mid", 3000.0, 7000.0), ("high", 7000.0, 100000.0)]


def test_theta_band_half_open_boundaries(spark):
    rows = {r.band: r for r in all_queries()["q_join_theta_band"](spark, SF_SMOKE).collect()}
    bals = [c.c_acctbal for c in load(spark, SF_SMOKE, "customer").select("c_acctbal").collect()]
    want = defaultdict(lambda: [0, 0.0])
    for b in bals:
        for name, lo, hi in BANDS:
            if lo <= b < hi:  # half-open: lo in, hi out
                want[name][0] += 1
                want[name][1] += b
    assert set(rows) == set(want)
    for name, (n, s) in want.items():
        assert rows[name].n_cust == n
        assert abs(rows[name].sum_bal - s) < 0.006, name
    # bands partition the domain: every customer lands in exactly one band
    assert sum(n for n, _ in want.values()) == len(bals)


def test_interval_overlap_membership_matches_python(spark):
    rows = {r.interval_id: r for r in all_queries()["q_join_interval_overlap"](spark, SF_SMOKE).collect()}
    ev = load(spark, SF_SMOKE, "events").select("ts", "value").collect()
    base = dt.datetime(2024, 1, 1)
    want = defaultdict(lambda: [0, 0.0])
    for e in ev:
        for i in range(30):
            lo = base + dt.timedelta(days=i)
            hi = base + dt.timedelta(days=i + 3)
            if lo <= e.ts < hi:
                want[i][0] += 1
                want[i][1] += e.value
    assert set(rows) == set(want)
    for i, (n, s) in want.items():
        assert rows[i].n_events == n
        assert abs(rows[i].sum_value - s) < 0.006, i


def test_semi_union_anti_partitions_left_table(spark):
    semi = {r.c_custkey for r in all_queries()["q_join_semi"](spark, SF_SMOKE).collect()}
    anti = {r.c_custkey for r in all_queries()["q_join_anti"](spark, SF_SMOKE).collect()}
    # the two keys share one left table and predicate; the law is
    # EXISTS ∪ NOT-EXISTS = all customers, EXISTS ∩ NOT-EXISTS = ∅
    custs = {c.c_custkey for c in load(spark, SF_SMOKE, "customer").select("c_custkey").collect()}
    assert not (semi & anti)
    assert semi | anti == custs
    big_cust = {o.o_custkey for o in load(spark, SF_SMOKE, "orders")
                .filter("o_totalprice > 400000").select("o_custkey").collect()}
    assert semi == custs & big_cust
    assert anti == custs - big_cust
    assert semi and anti  # the threshold splits the fixture both ways


def test_pivot_conserves_mass_and_matches_groupby(spark):
    rows = {r.l_returnflag: r for r in all_queries()["q_pivot"](spark, SF_SMOKE).collect()}
    li = load(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity").collect()
    cells = defaultdict(float)
    statuses = set()
    for r in li:
        cells[(r.l_returnflag, r.l_linestatus)] += r.l_quantity
        statuses.add(r.l_linestatus)
    assert statuses <= {"F", "O", "P"}  # the explicit pivot list is complete
    for flag, r in rows.items():
        for st, col in (("F", r.status_f), ("O", r.status_o), ("P", r.status_p)):
            if (flag, st) in cells:
                assert col is not None and abs(col - cells[(flag, st)]) < 0.006
            else:
                assert col is None  # absent cell pivots to NULL, not 0
        # mass conservation: row sum equals the unpivoted group total
        total = sum(v for (f, _), v in cells.items() if f == flag)
        got = sum(c for c in (r.status_f, r.status_o, r.status_p) if c is not None)
        assert abs(got - total) < 0.02


def test_unpivot_is_lossless_melt(spark):
    rows = all_queries()["q_unpivot"](spark, SF_SMOKE).collect()
    parts = {p.p_partkey: p for p in load(spark, SF_SMOKE, "part").select(
        "p_partkey", "p_size", "p_retailprice").collect()}
    by_key = defaultdict(dict)
    for r in rows:
        by_key[r.p_partkey][r.metric] = r.value
    assert set(by_key) == set(parts)
    for pk, m in by_key.items():
        assert set(m) == {"size", "retailprice"}  # 2 rows per part, always
        assert m["size"] == float(parts[pk].p_size)
        assert abs(m["retailprice"] - parts[pk].p_retailprice) < 0.006


def test_na_fill_happens_after_was_null(spark):
    out = all_queries()["q_na_handling"](spark, SF_SMOKE).collect()
    big_cust = {o.o_custkey for o in load(spark, SF_SMOKE, "orders")
                .filter("o_totalprice > 450000").select("o_custkey").collect()}
    custs = {c.c_custkey for c in load(spark, SF_SMOKE, "customer").select("c_custkey").collect()}
    assert {r.c_custkey for r in out} == custs  # left join keeps every customer
    matched = unmatched = 0
    for r in out:
        if r.was_null:
            # the fill value appears AND the flag still says null — proving
            # was_null was computed before na.fill
            assert (r.orderkey_filled, r.total_filled) == (-1, 0.0)
            assert r.c_custkey not in big_cust
            unmatched += 1
        else:
            assert r.c_custkey in big_cust and r.orderkey_filled != -1
            matched += 1
    assert matched > 0 and unmatched > 0
