"""Crafted-fixture probes for the degenerate-division class (r7 catalog,
verify-skill note): four registered keys divided by a variance-shaped
denominator that is zero (or sqrt a float-zero that lands tiny-NEGATIVE)
on degenerate input — ANSI Spark THROWS on x/0.0 and DuckDB THROWS on
sqrt(-eps), so both engines needed aligning (try_divide + greatest-clamp
on both sides; bit-identical on non-degenerate input). Fixture data never
reaches these branches (mirrors stayed green), so each probe crafts the
degenerate table, runs the REGISTERED key, asserts hand-derived values,
and co-runs the REGISTERED oracle SQL in DuckDB via oracle.compare to
prove both engines now agree.

Covered degeneracies:
  * q_agg_corr_matrix    — a CONSTANT column within a group (variance 0)
  * q_graph_assortativity — a REGULAR co-purchase graph (cycle, all deg 2)
  * q_ab_delta_method    — a single-user arm (n-1 = 0) AND an arm whose
    users are exactly proportional (float variance numerator ~ -4e-12:
    the sqrt-of-tiny-negative class DuckDB aborts on without the clamp)
  * q_time_extreme_value — a single monthly block (sample sd over n-1 = 0)
"""

from __future__ import annotations

import datetime as dt
import json

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.oracle import compare
from wikidata2pg_spark.registry import all_oracles, all_queries


def _duck(sf_dir: str, tables: list[str]) -> duckdb.DuckDBPyConnection:
    """duck_connection for a crafted dir holding only ``tables``."""
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    for t in tables:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# --- q_agg_corr_matrix: constant discount (group A) / quantity (group N) ---


@pytest.fixture(scope="module")
def const_col_dir(tmp_path_factory):
    # group A: qty varies, price varies, DISCOUNT CONSTANT -> dz = 0
    # group N: QTY CONSTANT -> dx = 0; price/discount vary together
    rows = [
        ("A", 1.0, 10.00, 0.05),
        ("A", 2.0, 20.00, 0.05),
        ("A", 3.0, 40.00, 0.05),
        ("N", 5.0, 10.00, 0.01),
        ("N", 5.0, 20.00, 0.02),
        ("N", 5.0, 30.00, 0.04),
    ]
    root = tmp_path_factory.mktemp("const_col")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_discount": pa.array([r[3] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_corr_matrix_constant_column_nulls(spark, const_col_dir):
    got = {r.l_returnflag: r for r in
           all_queries()["q_agg_corr_matrix"](spark, const_col_dir).collect()}
    a, n = got["A"], got["N"]
    # A: dz = 0 -> both discount correlations NULL; qty/price real.
    # hand check: dx=6, dy=14e6, dxy=9000 -> 9000/sqrt(84e6) = 0.98198...
    assert a.corr_qty_price == 0.982
    assert a.corr_qty_disc is None and a.corr_price_disc is None
    # N: dx = 0 -> both quantity correlations NULL; price/disc real
    # (9e5/sqrt(6e6*1.4e5) = same 0.98198... by construction).
    assert n.corr_qty_price is None and n.corr_qty_disc is None
    assert n.corr_price_disc == 0.982


def test_corr_matrix_duckdb_agrees(spark, const_col_dir):
    con = _duck(const_col_dir, ["lineitem"])
    df = all_queries()["q_agg_corr_matrix"](spark, const_col_dir)
    assert compare("q_agg_corr_matrix", df, con,
                   all_oracles()["q_agg_corr_matrix"]) == []


# --- q_graph_assortativity: 3-cycle co-purchase graph (regular) ---


@pytest.fixture(scope="module")
def cycle_graph_dir(tmp_path_factory):
    # parts {1,2} share orders 1,2; {2,3} share 3,4; {1,3} share 5,6 ->
    # three edges at the min_orders=2 threshold, every degree exactly 2
    pairs = [(1, 2), (2, 3), (1, 3)]
    rows = []
    for i, (u, v) in enumerate(pairs):
        for o in (2 * i + 1, 2 * i + 2):
            rows.append((o, u))
            rows.append((o, v))
    root = tmp_path_factory.mktemp("cycle_graph")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_assortativity_regular_graph_null(spark, cycle_graph_dir):
    rows = all_queries()["q_graph_assortativity"](spark, cycle_graph_dir).collect()
    assert len(rows) == 1
    assert rows[0].n_edges == 3
    assert rows[0].assortativity is None  # zero degree variance -> 0/0


def test_assortativity_duckdb_agrees(spark, cycle_graph_dir):
    con = _duck(cycle_graph_dir, ["lineitem"])
    df = all_queries()["q_graph_assortativity"](spark, cycle_graph_dir)
    assert compare("q_graph_assortativity", df, con,
                   all_oracles()["q_graph_assortativity"]) == []


# --- q_ab_delta_method: single-user arm + proportional-users arm ---

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def degenerate_arms_dir(tmp_path_factory):
    # arm 1 = {user 1}: n=1 -> n-1 division by zero -> se/ci NULL.
    # arm 0 = {user 2: x=38 cents, y=13; user 4: x=114, y=39}: exactly
    # proportional (k=3), true variance 0 but the float numerator lands
    # ~ -3.6e-12 -> WITHOUT the greatest-clamp DuckDB's sqrt throws.
    per_user = {1: (0.50, 2), 2: (0.38, 13), 4: (1.14, 39)}
    rows = []
    for uid, (purchase_value, total_events) in per_user.items():
        rows.append((uid, "purchase", purchase_value))
        rows.extend((uid, "click", 1.0) for _ in range(total_events - 1))
    root = tmp_path_factory.mktemp("degenerate_arms")
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(seconds=i) for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array([json.dumps({}) for _ in rows], pa.string()),
    }), str(root / "events.parquet"))
    return str(root)


def test_delta_method_degenerate_arms(spark, degenerate_arms_dir):
    got = {r.arm: r for r in
           all_queries()["q_ab_delta_method"](spark, degenerate_arms_dir).collect()}
    a0, a1 = got[0], got[1]
    # proportional arm: ratio = 152/52, clamped variance -> se exactly 0
    assert a0.n == 2
    assert a0.ratio_cents_per_event == 2.923077
    assert a0.se == 0.0
    assert a0.ci_lo == a0.ci_hi == 2.923077
    # single-user arm: ratio real, inference NULL (0/0 on n-1)
    assert a1.n == 1
    assert a1.ratio_cents_per_event == 25.0
    assert a1.se is None and a1.ci_lo is None and a1.ci_hi is None


def test_delta_method_duckdb_agrees(spark, degenerate_arms_dir):
    con = _duck(degenerate_arms_dir, ["events"])
    df = all_queries()["q_ab_delta_method"](spark, degenerate_arms_dir)
    assert compare("q_ab_delta_method", df, con,
                   all_oracles()["q_ab_delta_method"]) == []


# --- q_time_extreme_value: single monthly block ---


@pytest.fixture(scope="module")
def one_block_dir(tmp_path_factory):
    # all orders inside ONE month -> one block maximum -> n-1 = 0
    days = [
        (dt.datetime(2024, 1, 3), [100.00, 50.00]),   # 15000 cents
        (dt.datetime(2024, 1, 10), [200.00]),         # 20000 = block max
        (dt.datetime(2024, 1, 20), [120.00]),         # 12000
    ]
    rows = [(d, v) for d, vals in days for v in vals]
    root = tmp_path_factory.mktemp("one_block")
    n = len(rows)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array([1] * n, pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[0] for r in rows], pa.timestamp("us")),
    }), str(root / "orders.parquet"))
    return str(root)


def test_extreme_value_single_block_nulls(spark, one_block_dir):
    rows = all_queries()["q_time_extreme_value"](spark, one_block_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_blocks == 1
    assert r.block_mean == 200.0  # the single block max, whole cents
    assert r.gumbel_scale is None
    assert r.gumbel_loc is None
    assert r.return_level_12 is None


def test_extreme_value_duckdb_agrees(spark, one_block_dir):
    con = _duck(one_block_dir, ["orders"])
    df = all_queries()["q_time_extreme_value"](spark, one_block_dir)
    assert compare("q_time_extreme_value", df, con,
                   all_oracles()["q_time_extreme_value"]) == []


# --- constant-quantity lineitem: spearman + stats + ols2 + welch(n1=0) ---


@pytest.fixture(scope="module")
def const_qty_dir(tmp_path_factory):
    # flag A: qty CONSTANT (rank variance 0), prices vary, 3 single-line
    # orders (so ols2's x1 is constant -> det = 0); flag B: single row
    # (n-1 = 0 for stats' sample sd). No R rows at all, so welch's
    # n1 side is EMPTY (0/0 on the mean and variance).
    rows = [  # (orderkey, flag, qty, price)
        (1, "A", 7.0, 10.00),
        (2, "A", 7.0, 20.00),
        (3, "A", 7.0, 40.00),
        (4, "B", 3.0, 15.00),
    ]
    root = tmp_path_factory.mktemp("const_qty")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_returnflag": pa.array([r[1] for r in rows], pa.string()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_spearman_constant_rank_null(spark, const_qty_dir):
    got = {r.flag: r for r in
           all_queries()["q_agg_spearman"](spark, const_qty_dir).collect()}
    assert got["A"].n == 3 and got["A"].rho is None   # tied ranks, var 0
    assert got["B"].n == 1 and got["B"].rho is None   # single row


def test_stats_constant_and_single_row_groups(spark, const_qty_dir):
    got = {r.l_returnflag: r for r in
           all_queries()["q_agg_stats"](spark, const_qty_dir).collect()}
    a, b = got["A"], got["B"]
    assert a.corr_qty_price is None  # dx = 0 -> 0-divisor
    assert a.sd_qty == 0.0           # sqrt(0/6) is a real 0, NOT null
    assert a.covar_qp == 0.0         # dxy = 0 exactly (constant x)
    assert b.corr_qty_price is None
    assert b.sd_qty is None          # n-1 = 0 -> 0/0 -> NULL


def test_ols2_collinear_det_zero(spark, const_qty_dir):
    rows = all_queries()["q_agg_ols2"](spark, const_qty_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n == 4
    # constant x1 (every order has exactly 1 line) -> det exactly 0
    assert r.beta1 is None and r.beta2 is None
    assert r.beta0_cents is None and r.r2 is None


def test_welch_empty_arm_nulls(spark, const_qty_dir):
    rows = all_queries()["q_agg_welch_ttest"](spark, const_qty_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n1 == 0 and r.n2 == 3  # no R rows at all
    assert r.t_stat is None and r.df is None


@pytest.mark.parametrize("key", [
    "q_agg_spearman", "q_agg_stats", "q_agg_ols2", "q_agg_welch_ttest",
])
def test_const_qty_duckdb_agrees(spark, const_qty_dir, key):
    con = _duck(const_qty_dir, ["lineitem"])
    assert compare(key, all_queries()[key](spark, const_qty_dir), con,
                   all_oracles()[key]) == []


# --- both-arms-constant lineitem: welch se2 = 0 under t, df 0/0 ---


@pytest.fixture(scope="module")
def welch_const_dir(tmp_path_factory):
    rows = [(1, "R", 5.00), (2, "R", 5.00), (3, "A", 7.00), (4, "A", 7.00)]
    root = tmp_path_factory.mktemp("welch_const")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_returnflag": pa.array([r[1] for r in rows], pa.string()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_welch_both_arms_constant(spark, welch_const_dir):
    rows = all_queries()["q_agg_welch_ttest"](spark, welch_const_dir).collect()
    r = rows[0]
    assert r.n1 == 2 and r.n2 == 2
    # both variances exactly 0 -> se2 = 0 -> t = x/0 and df = 0/0 -> NULL
    assert r.t_stat is None and r.df is None
    con = _duck(welch_const_dir, ["lineitem"])
    df = all_queries()["q_agg_welch_ttest"](spark, welch_const_dir)
    assert compare("q_agg_welch_ttest", df, con,
                   all_oracles()["q_agg_welch_ttest"]) == []


# --- flat daily events: runs_test (n1 = 0) + lag_corr (variance 0) ---


@pytest.fixture(scope="module")
def flat_days_dir(tmp_path_factory):
    # 5 consecutive days, each with one view (10.00) and one purchase
    # (5.00): daily revenue is CONSTANT, so cents > median never holds
    # (n1 = 0 -> sig = 0 under z) and both lag-corr series have zero
    # variance at every lag.
    base = dt.datetime(2024, 2, 1, 9, 0, 0)
    rows = []
    for d in range(5):
        rows.append((base + dt.timedelta(days=d), "view", 10.00))
        rows.append((base + dt.timedelta(days=d, hours=1), "purchase", 5.00))
    root = tmp_path_factory.mktemp("flat_days")
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array([json.dumps({}) for _ in rows], pa.string()),
    }), str(root / "events.parquet"))
    return str(root)


def test_runs_test_all_at_median_null_z(spark, flat_days_dir):
    rows = all_queries()["q_agg_runs_test"](spark, flat_days_dir).collect()
    r = rows[0]
    assert r.n1 == 0 and r.n2 == 5  # constant revenue: nothing above median
    assert r.runs == 1
    assert r.z is None              # sig = 0 -> x/0 -> NULL


def test_lag_corr_constant_series_null(spark, flat_days_dir):
    got = {r.lag: r for r in
           all_queries()["q_time_lag_corr"](spark, flat_days_dir).collect()}
    assert set(got) == set(range(-3, 4))  # only joinable lags survive
    assert all(r.xcorr is None for r in got.values())


@pytest.mark.parametrize("key", ["q_agg_runs_test", "q_time_lag_corr"])
def test_flat_days_duckdb_agrees(spark, flat_days_dir, key):
    con = _duck(flat_days_dir, ["events"])
    assert compare(key, all_queries()[key](spark, flat_days_dir), con,
                   all_oracles()[key]) == []


# --- volatility: constant 7-day window whose FLOAT variance is negative ---

_NEG_CENTS = 1_000_000_004  # 7.0*float(7*c*c) - float(7c)**2 == -8192.0


@pytest.fixture(scope="module")
def const_vol_dir(tmp_path_factory):
    assert 7.0 * float(7 * _NEG_CENTS**2) - float(7 * _NEG_CENTS) ** 2 < 0
    base = dt.datetime(2024, 3, 1, 0, 30, 0)
    value = _NEG_CENTS / 100.0
    # the cents round-trip must land exactly back on _NEG_CENTS
    import math
    assert math.floor(value * 100 + 0.5) == _NEG_CENTS
    rows = [(base + dt.timedelta(days=d), value) for d in range(7)]
    root = tmp_path_factory.mktemp("const_vol")
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["purchase"] * n, pa.string()),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": pa.array([json.dumps({}) for _ in rows], pa.string()),
    }), str(root / "events.parquet"))
    return str(root)


def test_volatility_clamps_negative_float_variance(spark, const_vol_dir):
    rows = all_queries()["q_time_volatility"](spark, const_vol_dir).collect()
    assert len(rows) == 1  # only the 7th day completes the window
    r = rows[0]
    assert r.cents == _NEG_CENTS
    # without the greatest-clamp: Spark NaN, DuckDB OutOfRange abort
    assert r.std_cents == 0.0
    con = _duck(const_vol_dir, ["events"])
    df = all_queries()["q_time_volatility"](spark, const_vol_dir)
    assert compare("q_time_volatility", df, con,
                   all_oracles()["q_time_volatility"]) == []


def test_mannwhitney_one_sided_null_auc(spark, degenerate_arms_dir):
    # the delta-method fixture has purchases but ZERO views -> n2 = 0
    rows = all_queries()["q_agg_mannwhitney"](spark, degenerate_arms_dir).collect()
    r = rows[0]
    assert r.n1 == 3 and r.n2 == 0
    assert r.u1_x2 == 0 and r.u2_x2 == 0
    assert r.auc is None
    con = _duck(degenerate_arms_dir, ["events"])
    df = all_queries()["q_agg_mannwhitney"](spark, degenerate_arms_dir)
    assert compare("q_agg_mannwhitney", df, con,
                   all_oracles()["q_agg_mannwhitney"]) == []


# --- cramers_v: 1xC contingency table (min(r,c) - 1 = 0) ---


@pytest.fixture(scope="module")
def one_segment_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("one_segment")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "BUILDING"], pa.string()),
    }), str(root / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        "o_orderpriority": pa.array(
            ["1-URGENT", "2-HIGH", "2-HIGH"], pa.string()),
    }), str(root / "orders.parquet"))
    return str(root)


def test_cramers_v_single_row_table_null(spark, one_segment_dir):
    rows = all_queries()["q_dq_cramers_v"](spark, one_segment_dir).collect()
    r = rows[0]
    assert r.n == 3
    assert r.chi2 == 0.0          # 1xC grid: every term exactly 0
    assert r.cramers_v is None    # min(r,c)-1 = 0 -> 0/0 -> NULL
    con = _duck(one_segment_dir, ["customer", "orders"])
    df = all_queries()["q_dq_cramers_v"](spark, one_segment_dir)
    assert compare("q_dq_cramers_v", df, con,
                   all_oracles()["q_dq_cramers_v"]) == []


# --- hill tail: EMPTY document as the k+1-th order statistic ---


@pytest.fixture(scope="module")
def zero_ref_docs_dir(tmp_path_factory):
    # 50 equal-length docs fill the top-k; the 51st (the Hill reference
    # order statistic) is EMPTY -> x_ref = 0 -> every ln(len/x_ref)
    # term divides by zero. Empty documents are routine in real crawls.
    n_docs = 51
    texts = ["alpha beta gamma"] * 50 + [""]
    root = tmp_path_factory.mktemp("zero_ref_docs")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n_docs + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n_docs, pa.string()),
        "source": pa.array(["web"] * n_docs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(root / "documents.parquet"))
    return str(root)


def test_hill_tail_zero_reference_nulls(spark, zero_ref_docs_dir):
    rows = all_queries()["q_text_hill_tail"](spark, zero_ref_docs_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.k == 50 and r.x_ref == 0
    assert r.hill is None and r.alpha is None  # every term NULLs on x/0
    con = _duck(zero_ref_docs_dir, ["documents"])
    df = all_queries()["q_text_hill_tail"](spark, zero_ref_docs_dir)
    assert compare("q_text_hill_tail", df, con,
                   all_oracles()["q_text_hill_tail"]) == []


# --- burstiness: single-document corpus (n-1 = 0) ---


@pytest.fixture(scope="module")
def one_doc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("one_doc")
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["alpha beta alpha"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
        "source": pa.array(["crafted"], pa.string()),
        "n_chars": pa.array([16], pa.int64()),
    }), str(root / "documents.parquet"))
    return str(root)


def test_burstiness_single_doc_null_vmr(spark, one_doc_dir):
    got = {r.tok: r for r in
           all_queries()["q_text_burstiness"](spark, one_doc_dir).collect()}
    assert got["alpha"].total == 2 and got["beta"].total == 1
    assert all(r.vmr is None for r in got.values())  # n*(n-1) = 0
    con = _duck(one_doc_dir, ["documents"])
    df = all_queries()["q_text_burstiness"](spark, one_doc_dir)
    assert compare("q_text_burstiness", df, con,
                   all_oracles()["q_text_burstiness"]) == []
