"""Independent-Python pins for the scalar-function keys with real
divergence classes: URL component extraction vs urllib.parse, calendar
date arithmetic vs datetime, bitwise ops vs Python ints, the try_*
error-degradation family vs hand-evaluated NULL rules, and three-valued
NULL logic — the families where two SQL engines could plausibly share a
convention that differs from the spec."""

from __future__ import annotations

import datetime as dt
from urllib.parse import parse_qs, urlsplit

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load


def test_url_components_match_urllib(spark):
    rows = all_queries()["q_fn_url"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        u = urlsplit(r.url)
        assert r.host == u.hostname
        assert r.path == u.path
        assert r.query == u.query
        assert r.nation_param == parse_qs(u.query)["nation"][0]


def test_date_arithmetic_matches_datetime(spark):
    rows = all_queries()["q_fn_date"](spark, SF_SMOKE).collect()
    orders = {o.o_orderkey: o.o_orderdate
              for o in load(spark, SF_SMOKE, "orders").filter("o_orderkey < 16000")
              .select("o_orderkey", "o_orderdate").collect()}
    assert {r.o_orderkey for r in rows} == set(orders)
    target = dt.date(2002, 1, 1)
    for r in rows:
        d = orders[r.o_orderkey]
        day = d.date() if isinstance(d, dt.datetime) else d
        assert (r.yr, r.mo, r.dy) == (day.year, day.month, day.day)
        assert r.month_start.date() == day.replace(day=1)
        assert r.due_date == day + dt.timedelta(days=30)
        assert r.days_to_2002 == (target - day).days
        # epoch of a date at UTC midnight
        assert r.epoch_s == int(dt.datetime(day.year, day.month, day.day,
                                            tzinfo=dt.timezone.utc).timestamp())
        assert r.plus_90d.date() == day + dt.timedelta(days=90)


def test_bitwise_matches_python_ints(spark):
    # (l_orderkey, l_linenumber) is NOT unique in this fixture — compare
    # full-row multisets instead of keying by the pseudo-PK
    rows = sorted(tuple(r) for r in all_queries()["q_fn_bitwise"](spark, SF_SMOKE).collect())
    want = sorted(
        (r.l_orderkey, r.l_linenumber, r.l_partkey & 255, r.l_partkey | 4096,
         r.l_partkey ^ r.l_suppkey, r.l_partkey << 2, r.l_partkey >> 3,
         bin(r.l_partkey).count("1"))
        for r in load(spark, SF_SMOKE, "lineitem").filter("l_orderkey < 2000")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").collect()
    )
    assert rows == want and rows


def test_try_safe_null_degradation(spark):
    rows = all_queries()["q_fn_try_safe"](spark, SF_SMOKE).collect()
    orders = {o.o_orderkey: o
              for o in load(spark, SF_SMOKE, "orders").filter("o_orderkey < 16000")
              .select("o_orderkey", "o_totalprice", "o_custkey", "o_orderstatus",
                      "o_orderpriority").collect()}
    import math
    zero_rows = 0
    for r in rows:
        o = orders[r.o_orderkey]
        if o.o_custkey % 7 == 0:
            assert r.safe_div is None  # divide-by-zero degrades to NULL
            zero_rows += 1
        else:
            want = math.floor(o.o_totalprice / (o.o_custkey % 7) * 100 + 0.5) / 100
            assert r.safe_div == want
        assert r.bad_cast is None  # 'O'/'F'/'P' never casts
        assert r.prio_num == int(o.o_orderpriority.split("-")[0])
        assert r.oob_elem is None  # index 5 of a 2-element split
    assert zero_rows > 0  # the zero path is actually exercised


def test_null_semantics_three_valued_logic(spark):
    rows = all_queries()["q_null_semantics"](spark, SF_SMOKE).collect()
    orders = {o.o_orderkey: o.o_orderstatus
              for o in load(spark, SF_SMOKE, "orders").filter("o_orderkey < 16000")
              .select("o_orderkey", "o_orderstatus").collect()}
    p_rows = 0
    for r in rows:
        st = orders[r.o_orderkey]
        if st == "P":
            # NULLIF fired: value NULL, IS NULL true, and the null-safe
            # compare NULL <=> 'P' is FALSE (not NULL — that is the point)
            assert r.st_nullable is None and r.is_null_p and r.nse_same is False
            p_rows += 1
        else:
            assert r.st_nullable == st and not r.is_null_p and r.nse_same is True
    assert p_rows > 0  # the fixture has 'P' orders to exercise the branch
