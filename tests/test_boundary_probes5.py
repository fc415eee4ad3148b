"""Crafted-fixture boundary probes, batch 5: the quality gate's fail
branches and exact thresholds (every sf0.01 document passes — audit
flag), and the boolean aggregate pack's false/true branches (sf0.01
yields constant bool columns)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_boundary_probes2 import _docs_dir
from wikidata2pg_spark.registry import all_queries


def _words(n, distinct=True):
    if distinct:
        return " ".join(f"w{i}" for i in range(n))
    return " ".join("w" for _ in range(n))


def test_quality_gate_fail_branches_and_exact_thresholds(spark, tmp_path_factory):
    texts = [
        _words(9),                                   # 1: too short (<10) -> fail
        _words(10),                                  # 2: exactly 10 -> length ok
        _words(1000),                                # 3: exactly 1000 -> length ok
        _words(1001),                                # 4: too long -> fail
        _words(2) + " " + _words(8, distinct=False), # 5: ttr 3/10 = 0.3 -> pass
        "a b " + " ".join("c" for _ in range(8)),    # 6: ttr 3/10 pass twin
        " ".join("x" for _ in range(10)),            # 7: ttr 0.1 -> fail
        "a b " + " ".join("z" for _ in range(8)),    # 8: ttr 3/10 = 0.3 -> pass
        "a " + " ".join("z" for _ in range(9)),      # 9: ttr 2/10 = 0.2 EXACT -> fail (strict >)
    ]
    root = _docs_dir(tmp_path_factory, "quality_edges", texts)
    got = {r.doc_id: r for r in all_queries()["q_text_quality"](spark, root).collect()}
    assert got[1].passes_quality is False   # 9 tokens
    assert got[2].passes_quality is True    # 10 tokens inclusive
    assert got[3].passes_quality is True    # 1000 tokens inclusive
    assert got[4].passes_quality is False   # 1001 tokens
    assert got[5].passes_quality is True    # ttr 0.3 via _words mix
    assert got[6].passes_quality is True    # ttr 0.3 via literal repeats
    assert got[7].passes_quality is False   # ttr 0.1
    assert got[8].passes_quality is True    # ttr 0.3
    assert got[9].passes_quality is False   # ttr EXACTLY 0.2, strict >


@pytest.fixture(scope="module")
def bool_dir(tmp_path_factory):
    rows = [  # (flag, qty, disc, tax)
        ("A", 5.0, 0.05, 0.0),    # A: all qty >= 1 -> all_qty_pos True,
        ("A", 3.0, 0.02, 0.02),   #    no deep discount -> any_deep_disc False
        ("R", 0.0, 0.15, 0.0),    # R: a zero qty -> all_qty_pos False,
        ("R", 9.0, 0.10, 0.05),   #    0.10 and 0.15 -> any_deep_disc True
    ]
    n = len(rows)
    tbl = pa.table({
        "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([100.0] * n, pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
        "l_tax": pa.array([r[3] for r in rows], pa.float64()),
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([dt.datetime(2024, 1, 1)] * n, pa.timestamp("us")),
    })
    root = tmp_path_factory.mktemp("bool_edges")
    pq.write_table(tbl, str(root / "lineitem.parquet"))
    return str(root)


def test_bool_aggregates_fire_both_ways(spark, bool_dir):
    got = {r.l_returnflag: r for r in all_queries()["q_agg_bool"](spark, bool_dir).collect()}
    a, r = got["A"], got["R"]
    assert (a.all_qty_pos, a.any_deep_disc) == (True, False)
    assert (r.all_qty_pos, r.any_deep_disc) == (False, True)   # 0.10 is >= 0.10
    assert (a.n_tax_free, r.n_tax_free) == (1, 1)
    assert (a.n_bulk, r.n_bulk) == (0, 0)
