"""Crafted-fixture boundary probes, batch 9 — the NULL-ordering close's
review catch: q_pareto_abc is the one direct ordered_bucket consumer
whose order column derives from a nullable measure, and the --nulls
sweep fixture cannot produce its degenerate case (every part there
keeps 2 of 3 non-NULL prices, so no per-part sum is ever NULL). This
probe crafts a part whose EVERY lineitem price is NULL: its revenue
aggregate is NULL, ordered_bucket routes it to the last bucket, the
asc_nulls_last within-bucket window ranks it after every real part, and
its cumulative frame then spans all real revenue — cum = total,
cum_share = 1.0, class C, identical to the oracle's DESC NULLS LAST.
Before the fix the row was either dropped (NULL pid inner join) or
ranked NULLS FIRST with a NULL cumulative sum, diverging from DuckDB.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.oracle import compare
from wikidata2pg_spark.registry import all_oracles, all_queries


@pytest.fixture(scope="module")
def null_revenue_part_dir(tmp_path_factory):
    # (partkey, price): part 3's prices are ALL NULL -> sum(cents) NULL
    rows = [
        (1, 100.00),
        (1, 200.00),
        (2, None),     # partial NULL: sum skips it, part 2 stays real
        (2, 50.00),
        (3, None),     # all-NULL part: the degenerate case under test
        (3, None),
        (4, 400.00),
    ]
    root = tmp_path_factory.mktemp("null_rev_part")
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_pareto_abc_all_null_revenue_part(spark, null_revenue_part_dir):
    got = {r.l_partkey: r for r in
           all_queries()["q_pareto_abc"](spark, null_revenue_part_dir).collect()}
    assert set(got) == {1, 2, 3, 4}  # the NULL part is kept, not dropped
    # totals: p4 40000 -> p1 30000 -> p2 5000 -> p3 NULL; total 75000
    assert got[4].revenue_cents == 40000
    assert got[4].cum_share == 0.533333 and got[4].abc_class == "A"
    assert got[1].revenue_cents == 30000
    # cum*10 = 700000 > total*9 = 675000: past the 90% boundary -> C
    assert got[1].cum_share == 0.933333 and got[1].abc_class == "C"
    assert got[2].revenue_cents == 5000
    assert got[2].cum_share == 1.0 and got[2].abc_class == "C"
    # the all-NULL part ranks LAST: frame spans all real revenue
    assert got[3].revenue_cents is None
    assert got[3].cum_share == 1.0 and got[3].abc_class == "C"


def test_pareto_abc_all_null_revenue_part_oracle_corun(
    spark, null_revenue_part_dir
):
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    con.sql(
        "CREATE OR REPLACE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{null_revenue_part_dir}/lineitem.parquet')"
    )
    errors = compare(
        "q_pareto_abc",
        all_queries()["q_pareto_abc"](spark, null_revenue_part_dir),
        con,
        all_oracles()["q_pareto_abc"],
    )
    assert not errors, errors


@pytest.fixture(scope="module")
def constant_revenue_null_part_dir(tmp_path_factory):
    # ADVICE r7 corner: every REAL part has EQUAL revenue, so
    # ordered_bucket's span is <= 0 and all real parts land in bucket 0 —
    # the all-NULL part then sits ALONE in the last bucket and its
    # within-bucket running sum is NULL (no real cents in its frame). In
    # the probe above the NULL part shares its bucket with the smallest
    # real part, so that frame sum stays non-NULL and the pre-fix code
    # passed; THIS fixture reaches the uncovered branch where cum must be
    # poff + coalesce(cum_in, 0) to report cum = total / share 1.0.
    rows = [(1, 100.00), (2, 100.00), (3, 100.00), (4, None), (4, None)]
    root = tmp_path_factory.mktemp("const_rev_null_part")
    pq.write_table(pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
    }), str(root / "lineitem.parquet"))
    return str(root)


def test_pareto_abc_constant_revenue_with_all_null_part(
    spark, constant_revenue_null_part_dir
):
    got = {r.l_partkey: r for r in
           all_queries()["q_pareto_abc"](spark, constant_revenue_null_part_dir)
           .collect()}
    assert set(got) == {1, 2, 3, 4}
    # equal revenues tie-break on partkey: 10000 / 20000 / 30000 of 30000
    assert got[1].cum_share == 0.333333 and got[1].abc_class == "A"
    assert got[2].cum_share == 0.666667 and got[2].abc_class == "A"
    assert got[3].cum_share == 1.0 and got[3].abc_class == "C"
    # the all-NULL part alone in the last bucket: cum = poff + 0 = total
    assert got[4].revenue_cents is None
    assert got[4].cum_share == 1.0 and got[4].abc_class == "C"


def test_pareto_abc_constant_revenue_null_part_oracle_corun(
    spark, constant_revenue_null_part_dir
):
    con = duckdb.connect()
    con.sql("SET TimeZone = 'UTC'")
    con.sql(
        "CREATE OR REPLACE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{constant_revenue_null_part_dir}/lineitem.parquet')"
    )
    errors = compare(
        "q_pareto_abc",
        all_queries()["q_pareto_abc"](spark, constant_revenue_null_part_dir),
        con,
        all_oracles()["q_pareto_abc"],
    )
    assert not errors, errors
