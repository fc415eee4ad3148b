"""Brute-force references for the TPC-H suite (operators/tpch.py) —
each query recomputed in pure Python over pyarrow-read fixtures with
EXACT integer arithmetic (Python ints), independently of both Spark and
the DuckDB oracle the driver re-runs. Floats appear only in the final
display divisions, replicated with the identical expression shape, so
comparisons are ``==`` (same IEEE ops on both sides), not approx."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_T2
from wikidata2pg_spark.registry import all_queries

SF = SF_T2


def _cents(x: float) -> int:
    return int(math.floor(x * 100 + 0.5))


def _tbl(name: str, cols: list[str]) -> list[tuple]:
    t = pq.read_table(f"{SF}/{name}.parquet", columns=cols)
    return list(zip(*(t.column(c).to_pylist() for c in cols)))


def _li_units() -> list[tuple]:
    """lineitem rows as exact integer units:
    (orderkey, partkey, suppkey, qty, cents, d%, t%, returnflag,
    linestatus, shipdate)."""
    rows = _tbl(
        "lineitem",
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )
    return [
        (ok, pk, sk, int(q), _cents(ep), _cents(d), _cents(t), rf, ls, sd)
        for ok, pk, sk, q, ep, d, t, rf, ls, sd in rows
    ]


def _run(key: str, spark):
    return all_queries()[key](spark, SF).collect()


def test_tpch_q1_bruteforce(spark):
    agg: dict = {}
    for _ok, _pk, _sk, q, pc, d, t, rf, ls, sd in _li_units():
        if sd > dt.datetime(2001, 9, 2):
            continue
        a = agg.setdefault((rf, ls), [0, 0, 0, 0, 0, 0])
        a[0] += q
        a[1] += pc
        a[2] += pc * (100 - d)
        a[3] += pc * (100 - d) * (100 + t)
        a[4] += d
        a[5] += 1
    out = {(r.l_returnflag, r.l_linestatus): r for r in _run("q_sql_tpch_q1", spark)}
    assert set(out) == set(agg) and len(agg) >= 3
    for k, (sq, spc, sdp, sch, sd_, cnt) in agg.items():
        r = out[k]
        assert r.sum_qty == sq
        assert r.sum_base_price == spc / 100
        assert r.sum_disc_price == sdp / 10000
        assert r.sum_charge == sch / 1000000
        assert r.avg_qty == math.floor(sq * 100 / cnt + 0.5) / 100
        assert r.avg_price == math.floor(spc / cnt + 0.5) / 100
        assert r.avg_disc == math.floor(sd_ * 100 / cnt + 0.5) / 10000
        assert r.count_order == cnt


def test_tpch_q4_bruteforce(spark):
    orders = _tbl("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    ship_by_order: dict = {}
    for ok, *_rest, sd in [
        (r[0], r[9]) for r in _li_units()
    ]:
        ship_by_order.setdefault(ok, []).append(sd)
    want: dict = {}
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1997, 4, 1)
    for ok, od, pri in orders:
        if not (lo <= od < hi):
            continue
        cutoff = od.date() + dt.timedelta(days=90)
        if any(sd.date() >= cutoff for sd in ship_by_order.get(ok, [])):
            want[pri] = want.get(pri, 0) + 1
    got = {r.o_orderpriority: r.order_count for r in _run("q_sql_tpch_q4", spark)}
    assert got == want
    assert len(want) == 5 and all(v > 0 for v in want.values())


def test_tpch_q6_bruteforce(spark):
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1)
    s = sum(
        pc * d
        for _ok, _pk, _sk, q, pc, d, _t, _rf, _ls, sd in _li_units()
        if lo <= sd < hi and 5 <= d <= 7 and q < 24
    )
    [r] = _run("q_sql_tpch_q6", spark)
    assert s > 0
    assert r.revenue == s / 10000


def _nation_names() -> dict:
    return {k: v for k, v in _tbl("nation", ["n_nationkey", "n_name"])}


def test_tpch_q7_bruteforce(spark):
    nn = _nation_names()
    supp_n = {k: nn[v] for k, v in _tbl("supplier", ["s_suppkey", "s_nationkey"])}
    cust_n = {k: nn[v] for k, v in _tbl("customer", ["c_custkey", "c_nationkey"])}
    ocust = {k: v for k, v in _tbl("orders", ["o_orderkey", "o_custkey"])}
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1999, 1, 1)
    want: dict = {}
    for ok, _pk, sk, _q, pc, d, _t, _rf, _ls, sd in _li_units():
        if not (lo <= sd < hi):
            continue
        sn, cn = supp_n[sk], cust_n[ocust[ok]]
        if {sn, cn} != {"NATION_1", "NATION_2"}:
            continue
        k = (sn, cn, sd.year)
        want[k] = want.get(k, 0) + pc * (100 - d)
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): r.revenue
        for r in _run("q_sql_tpch_q7", spark)
    }
    assert got == {k: v / 10000 for k, v in want.items()}
    # both directions and both years present
    assert len(got) == 4


def test_tpch_q8_bruteforce(spark):
    nn = _nation_names()
    nreg = {k: v for k, v in _tbl("nation", ["n_nationkey", "n_regionkey"])}
    rname = {k: v for k, v in _tbl("region", ["r_regionkey", "r_name"])}
    supp_n = {k: nn[v] for k, v in _tbl("supplier", ["s_suppkey", "s_nationkey"])}
    cust_reg = {
        k: rname[nreg[v]] for k, v in _tbl("customer", ["c_custkey", "c_nationkey"])
    }
    orders = {
        ok: (ck, od)
        for ok, ck, od in _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    }
    ptype = {k: v for k, v in _tbl("part", ["p_partkey", "p_type"])}
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1999, 1, 1)
    num: dict = {}
    den: dict = {}
    for ok, pk, sk, _q, pc, d, _t, _rf, _ls, _sd in _li_units():
        ck, od = orders[ok]
        if not (lo <= od < hi) or ptype[pk] != "ECONOMY":
            continue
        if cust_reg[ck] != "AMERICA":
            continue
        v = pc * (100 - d)
        y = od.year
        den[y] = den.get(y, 0) + v
        if supp_n[sk] == "NATION_3":
            num[y] = num.get(y, 0) + v
    got = {r.o_year: r.mkt_share for r in _run("q_sql_tpch_q8", spark)}
    # cast-then-divide mirror (see Q14): num*1e6 can exceed 2^53
    want = {
        y: math.floor(float(num.get(y, 0) * 1000000) / float(den[y]) + 0.5)
        / 1000000
        for y in den
    }
    assert got == want and set(want) == {1997, 1998}
    assert all(0 < v < 1 for v in want.values())


def test_tpch_q13_bruteforce(spark):
    counts: dict = {}
    for _ok, ck, pri in _tbl("orders", ["o_orderkey", "o_custkey", "o_orderpriority"]):
        if pri != "1-URGENT":
            counts[ck] = counts.get(ck, 0) + 1
    dist: dict = {}
    for (ck,) in _tbl("customer", ["c_custkey"]):
        c = counts.get(ck, 0)
        dist[c] = dist.get(c, 0) + 1
    got = {r.c_count: r.custdist for r in _run("q_sql_tpch_q13", spark)}
    assert got == dist
    assert 0 in dist  # order-less customers survive the left join


def test_tpch_q14_bruteforce(spark):
    ptype = {k: v for k, v in _tbl("part", ["p_partkey", "p_type"])}
    lo, hi = dt.datetime(1997, 9, 1), dt.datetime(1997, 10, 1)
    num = den = 0
    for _ok, pk, _sk, _q, pc, d, _t, _rf, _ls, sd in _li_units():
        if not (lo <= sd < hi):
            continue
        v = pc * (100 - d)
        den += v
        if ptype[pk] == "PROMO":
            num += v
    [r] = _run("q_sql_tpch_q14", spark)
    assert 0 < num < den
    # mirror the engines' cast-then-divide: num*1e6 exceeds 2^53, so an
    # exact-int division would round once where the engines round twice
    assert r.promo_revenue == math.floor(
        float(num * 1000000) / float(den) + 0.5
    ) / 10000


def test_tpch_q15_bruteforce(spark):
    lo, hi = dt.datetime(1997, 1, 1), dt.datetime(1997, 4, 1)
    rev: dict = {}
    for _ok, _pk, sk, _q, pc, d, _t, _rf, _ls, sd in _li_units():
        if lo <= sd < hi:
            rev[sk] = rev.get(sk, 0) + pc * (100 - d)
    mx = max(rev.values())
    winners = {k for k, v in rev.items() if v == mx}
    sname = {k: v for k, v in _tbl("supplier", ["s_suppkey", "s_name"])}
    got = _run("q_sql_tpch_q15", spark)
    assert {r.s_suppkey for r in got} == winners
    for r in got:
        assert r.s_name == sname[r.s_suppkey]
        assert r.total_revenue == mx / 10000


def test_tpch_q16_bruteforce(spark):
    bad = {
        k
        for k, b in _tbl("supplier", ["s_suppkey", "s_acctbal"])
        if b < 0
    }
    part = {
        k: (b, t, s)
        for k, b, t, s in _tbl("part", ["p_partkey", "p_brand", "p_type", "p_size"])
    }
    sizes = {1, 3, 9, 14, 19, 23, 36, 45}
    groups: dict = {}
    for _ok, pk, sk, *_rest in _li_units():
        b, t, s = part[pk]
        if b == "Brand#16" or t == "MEDIUM" or s not in sizes or sk in bad:
            continue
        groups.setdefault((b, t, s), set()).add(sk)
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in _run("q_sql_tpch_q16", spark)
    }
    assert got == {k: len(v) for k, v in groups.items()}
    assert bad and len(got) > 20


def test_tpch_q17_bruteforce(spark):
    brand = {
        k
        for k, b in _tbl("part", ["p_partkey", "p_brand"])
        if b == "Brand#23"
    }
    per_part: dict = {}
    for _ok, pk, _sk, q, *_rest in _li_units():
        if pk in brand:
            a = per_part.setdefault(pk, [0, 0])
            a[0] += q
            a[1] += 1
    total = 0
    n_small = 0
    for _ok, pk, _sk, q, pc, *_rest in _li_units():
        if pk in brand:
            sq, cnt = per_part[pk]
            if q * 5 * cnt < sq:
                total += pc
                n_small += 1
    [r] = _run("q_sql_tpch_q17", spark)
    assert n_small > 0
    assert r.avg_yearly == total / 700
    # the integer form is the float form: q < 0.2*avg <=> 5*q*cnt < sq
    for pk, (sq, cnt) in per_part.items():
        for q in range(1, 51):
            assert (q * 5 * cnt < sq) == (q < 0.2 * (sq / cnt)) or (
                q * 5 * cnt == sq
            )


def test_tpch_q19_bruteforce(spark):
    part = {
        k: (b, s)
        for k, b, s in _tbl("part", ["p_partkey", "p_brand", "p_size"])
    }
    total = 0
    hits = 0
    for _ok, pk, _sk, q, pc, d, *_rest in _li_units():
        b, s = part[pk]
        if (
            (b == "Brand#12" and 1 <= s <= 5 and 1 <= q <= 11)
            or (b == "Brand#23" and 1 <= s <= 10 and 10 <= q <= 20)
            or (b == "Brand#34" and 1 <= s <= 15 and 20 <= q <= 30)
        ):
            total += pc * (100 - d)
            hits += 1
    [r] = _run("q_sql_tpch_q19", spark)
    assert hits > 10
    assert r.revenue == total / 10000


def test_tpch_q22_bruteforce(spark):
    cust = _tbl("customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    s = sum(_cents(b) for _k, _n, b in cust if b > 0.0)
    n = sum(1 for _k, _n, b in cust if b > 0.0)
    recent = {
        ck
        for _ok, ck, od in _tbl("orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        if od >= dt.datetime(1999, 1, 1)
    }
    nn = _nation_names()
    want: dict = {}
    for ck, nk, b in cust:
        if _cents(b) * n > s and ck not in recent:
            a = want.setdefault(nn[nk], [0, 0])
            a[0] += 1
            a[1] += _cents(b)
    got = {r.cntry: (r.numcust, r.totacctbal) for r in _run("q_sql_tpch_q22", spark)}
    assert got == {k: (c, tc / 100) for k, (c, tc) in want.items()}
    assert len(want) >= 10  # most nations have at least one lapsed rich customer
