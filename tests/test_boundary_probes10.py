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
