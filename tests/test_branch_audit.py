"""Pytest twin of tools/branch_audit.py (rules + allowlist shared via
wikidata2pg_spark/branch_audit.py): every registered key's categorical
output columns must show >= 2 states at the driver's sf0.01 — or carry
an allowlist entry naming the crafted-fixture probe that lights the
dead branch. The r7 audit caught five real gaps this way (empty EXCEPT,
three never-firing gates, a single-status dedup); this test turns the
class into a standing build-time check.

Runtime note: one tiny aggregation job per key (~4-5 min total) — the
same order as the blanket plan sweep. Unit tests of the rule itself are
at the bottom and run in milliseconds.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_T2
from wikidata2pg_spark.branch_audit import (
    EXPECTED_CONSTANT,
    EXPECTED_EMPTY,
    audit_key,
    run_audit,
)


def test_branch_liveness_blanket_sweep(spark):
    violations, allowlisted, errors = run_audit(spark, SF_T2)
    assert not errors, errors
    assert not violations, (
        "categorical column stuck at one state at the driver scale with no "
        "allowlist entry — write a crafted-fixture probe that lights the "
        "branch (tests/test_boundary_probes*.py pattern), then allowlist "
        f"with the probe's name: {violations}"
    )
    # the allowlist must not rot: every entry still corresponds to a live
    # flag (a key whose column became two-state should be de-listed)
    from wikidata2pg_spark.branch_audit import EXPECTED_CONSTANT_NUM

    seen = set(allowlisted)
    stale_const = [kc for kc in EXPECTED_CONSTANT if kc not in seen]
    stale_num = [(k, c) for (k, c) in EXPECTED_CONSTANT_NUM if (k, f"num:{c}") not in seen]
    stale_empty = [k for k in EXPECTED_EMPTY if (k, "__EMPTY__") not in seen]
    assert not stale_const and not stale_num and not stale_empty, (
        stale_const, stale_num, stale_empty
    )


# ---- rule unit tests (no fixture scan) -----------------------------------


def test_audit_rule_flags_constant_and_empty(spark):
    const = spark.createDataFrame([(1, "x"), (2, "x")], "id long, lab string")
    assert audit_key(spark, lambda s, d: const, "unused") == ["lab"]
    empty = const.filter("id > 99")
    assert audit_key(spark, lambda s, d: empty, "unused") == ["__EMPTY__"]


def test_audit_rule_counts_null_as_a_state(spark):
    mixed = spark.createDataFrame([(1, "x"), (2, None)], "id long, lab string")
    assert audit_key(spark, lambda s, d: mixed, "unused") == []
    all_null = spark.createDataFrame([(1, None), (2, None)], "id long, lab string")
    assert audit_key(spark, lambda s, d: all_null, "unused") == ["lab"]


def test_audit_rule_numeric_min_max_and_null_state(spark):
    one = spark.createDataFrame([(1, "x")], "id long, lab string")
    assert audit_key(spark, lambda s, d: one, "unused") == []
    # a numeric stuck at one value flags as num:<col>; the varying id
    # column does not
    nums = spark.createDataFrame([(1, 5), (2, 5)], "id long, v long")
    assert audit_key(spark, lambda s, d: nums, "unused") == ["num:v"]
    # a NULL among constant values is a second state (outer-join shape)
    withnull = spark.createDataFrame([(1, 5), (2, None)], "id long, v long")
    assert audit_key(spark, lambda s, d: withnull, "unused") == []
    varying = spark.createDataFrame([(1, 5), (2, 6)], "id long, v long")
    assert audit_key(spark, lambda s, d: varying, "unused") == []
    # a numeric-only key returning zero rows is still the q_except class
    empty_nums = nums.filter("id > 99")
    assert audit_key(spark, lambda s, d: empty_nums, "unused") == ["__EMPTY__"]


def test_audit_rule_flags_all_null_and_all_nan_numerics(spark):
    # ALL-NULL numeric: one state, must flag (r7 review catch #1 — the
    # try_divide guards could silently null a column on every row)
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v double"
    )
    assert audit_key(spark, lambda s, d: all_null, "unused") == ["num:v"]
    # ALL-NaN numeric: nan != nan must not slip the min==max test
    # (r7 review catch #2)
    nan = float("nan")
    all_nan = spark.createDataFrame([(1, nan), (2, nan)], "id long, v double")
    assert audit_key(spark, lambda s, d: all_nan, "unused") == ["num:v"]
    # NaN among real values: Spark's max returns NaN (sorts greatest),
    # min the real value -> two states, no flag
    mixed_nan = spark.createDataFrame([(1, nan), (2, 5.0)], "id long, v double")
    assert audit_key(spark, lambda s, d: mixed_nan, "unused") == []


def test_run_audit_reports_unknown_key_as_error(spark):
    from wikidata2pg_spark.branch_audit import run_audit

    violations, allowlisted, errors = run_audit(spark, "unused", ["q_no_such_key"])
    assert errors == [("q_no_such_key", "unknown key")]
    assert not violations and not allowlisted
