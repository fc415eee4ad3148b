"""Crafted-fixture boundary probes, batch 10 — the r9 review catch on
q_agg_skewkurt's anchored restructure: the per-group-min anchor joins
back onto the scan, and a plain equi-join would silently DROP a
NULL-l_returnflag group that the pre-r9 direct groupBy reported. Both
engines agree on the drop, so the mirror/degenerate gates can never
catch it; the fixture's l_returnflag is never NULL and the --nulls
sweep keeps categories non-null, hence this crafted probe. The fix is
a null-safe join (eqNullSafe / IS NOT DISTINCT FROM) on both sides.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.oracle import compare
from wikidata2pg_spark.registry import all_oracles, all_queries


@pytest.fixture(scope="module")
def null_flag_lineitem_dir(tmp_path_factory):
    # two groups: 'A' (constant -> m2 = 0 -> NULL moments via try_divide)
    # and NULL (non-constant -> real skew/kurt), so the probe pins BOTH
    # that the NULL group survives AND that its values are computed.
    rows = [
        ("A", 5.00),
        ("A", 5.00),
        (None, 1.00),
        (None, 2.00),
        (None, 3.00),
        (None, 6.00),
    ]
    root = tmp_path_factory.mktemp("null_flag_li")
    pq.write_table(pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def _expected_null_group():
    """Brute-force reference replicating the production float tree
    (anchored integer moments -> one cast each -> shared expression)."""
    import math

    cents = [100, 200, 300, 600]
    a = min(cents)
    d = [y - a for y in cents]
    n = float(len(d))
    m1 = sum(d) / n
    r2 = sum(x * x for x in d) / n
    r3 = sum(x**3 for x in d) / n
    r4 = sum(x**4 for x in d) / n
    m2 = r2 - m1 * m1
    m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
    m4 = r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1**4
    fl4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    return fl4(m3 / (m2 * math.sqrt(m2))), fl4(m4 / (m2 * m2) - 3.0)


def test_skewkurt_null_flag_group_is_kept(spark, null_flag_lineitem_dir):
    rows = {r.l_returnflag: r for r in
            all_queries()["q_agg_skewkurt"](
                spark, null_flag_lineitem_dir).collect()}
    assert set(rows) == {"A", None}  # the NULL group survives the anchor join
    assert rows["A"].n == 2
    # constant group: m2 = 0 -> try_divide NULLs both moments
    assert rows["A"].skewness is None and rows["A"].kurtosis is None
    exp_skew, exp_kurt = _expected_null_group()
    assert rows[None].n == 4
    assert rows[None].skewness == exp_skew
    assert rows[None].kurtosis == exp_kurt


def test_skewkurt_null_flag_group_oracle_corun(spark, null_flag_lineitem_dir):
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    con.sql(
        "CREATE OR REPLACE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{null_flag_lineitem_dir}/lineitem.parquet')"
    )
    errors = compare(
        "q_agg_skewkurt",
        all_queries()["q_agg_skewkurt"](spark, null_flag_lineitem_dir),
        con,
        all_oracles()["q_agg_skewkurt"],
    )
    assert not errors, errors


# --- r9 negative-measures sweep catches (tools/negative_sweep.py) ---


@pytest.fixture(scope="module")
def negative_money_dir(tmp_path_factory):
    """Refund-shaped rows: negative and zero money values next to
    positive ones, for the two keys fixed by the r9 negative sweep."""
    root = tmp_path_factory.mktemp("neg_money")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        # cents: 31400, -27100 (abs digit 2), 90, -5 (abs digit 5... -0.05)
        "o_totalprice": pa.array([314.00, -271.00, 0.90, -0.05], pa.float64()),
    }), str(root / "orders.parquet"))
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "A", "A"], pa.string()),
        # cents: 500 (bucket 8), -500 (bucket -1), 0 (bucket -1), 1 (bucket 0)
        "l_extendedprice": pa.array([5.00, -5.00, 0.00, 0.01], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_benford_negative_totals_use_magnitude_digit(
    spark, negative_money_dir
):
    rows = {r.digit: r.n for r in
            all_queries()["q_dq_benford"](spark, negative_money_dir).collect()}
    # |31400| -> 3, |-27100| -> 2, |90| -> 9, |-5| -> 5 (one order each)
    assert rows == {3: 1, 2: 1, 9: 1, 5: 1}


def test_log_histogram_nonpositive_bucket(spark, negative_money_dir):
    rows = {r.bucket: r for r in
            all_queries()["q_agg_log_histogram"](
                spark, negative_money_dir).collect()}
    # 500 cents -> bit length 9 -> bucket 8, bounds [256, 511]
    assert rows[8].n == 1
    assert rows[8].lo_cents == 256 and rows[8].hi_cents == 511
    # 1 cent -> bucket 0, bounds [1, 1]
    assert rows[0].n == 1
    assert rows[0].lo_cents == 1 and rows[0].hi_cents == 1
    # -500 and 0 cents -> the DDSketch non-positive bucket, NULL bounds
    assert rows[-1].n == 2
    assert rows[-1].lo_cents is None and rows[-1].hi_cents is None


@pytest.mark.parametrize("key", ["q_dq_benford", "q_agg_log_histogram"])
def test_negative_money_oracle_corun(spark, negative_money_dir, key):
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    for t in ("orders", "lineitem"):
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{negative_money_dir}/{t}.parquet')"
        )
    errors = compare(
        key,
        all_queries()[key](spark, negative_money_dir),
        con,
        all_oracles()[key],
    )
    assert not errors, errors
