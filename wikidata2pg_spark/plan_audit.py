"""Blanket physical-plan gate for single-partition funnels (VERDICT r6
task 5).

The repo's scale discipline says a global order may only ever funnel
AGGREGATED / k-BOUNDED rows through one task (the ordered_bucket two-pass
offsets, 1-row moment aggregates, TakeOrderedAndProject tails) — never a
raw table. 64 hand-written plan audits enforced that per-key, and the
class still slipped through once (q_win_skyline shipped a full-table
``Window.orderBy`` for two rounds). This module turns the class into a
static check that runs over EVERY registered key: walk the executed
plan's tree, and for each ``Exchange SinglePartition`` node require that
every raw parquet scan in its subtree has a bounding operator on the
path between the exchange and the scan.

Bounding operators (row count at the funnel is O(groups), O(k) or
O(broadcast threshold), not O(input)):
  * hash/object-hash/sort aggregates — grouped rows;
  * TakeOrderedAndProject / limits — k rows;
  * BroadcastExchange (+ its AQE query-stage spelling) — data already
    bounded by the broadcast threshold, e.g. the 1-row range aggregate
    every ordered_bucket crossJoins.

A nested hash/range Exchange is deliberately NOT bounding: a full table
shuffled by key and THEN funneled to one task is exactly the class this
gate exists to catch. For the same reason a ``ReusedExchange`` of a
hash/range exchange counts as a RAW leaf (its printed node has no
children, so the raw scan below it would otherwise be invisible to this
funnel — and "audited at the original site" does not hold, since the
original site need not sit under any SinglePartition). A reused
BROADCAST exchange stays bounding, and a reused SinglePartition
exchange is audited where its full subtree prints.

``Scan ExistingRDD`` (localCheckpoint results) is deliberately NOT raw:
the repo's checkpoint rule (verify skill, r6 review catches) already
requires checkpoints to materialize collapsed/bounded frames only, and
the checkpoint's own producing plan is audited when the key builds it.

Keys whose single-partition input is raw-but-bounded BY TABLE SEMANTICS
(e.g. a global window over the 25-row region/nation dimensions) must be
allowlisted EXPLICITLY in tests/test_plans.py with the justification —
the gate's job is to make that exception visible, not implicit.
"""

from __future__ import annotations

import re

# operators that bound the row count flowing further up the path
_BOUNDING = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "BroadcastExchange",
    "BroadcastQueryStage",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
)
# unbounded leaf inputs (raw table data)
_RAW = ("Scan parquet", "FileScan parquet", "Scan orc", "Scan csv", "Scan json", "Scan text")


def _is_raw_leaf(line: str) -> bool:
    if any(r in line for r in _RAW):
        return True
    # a reused full-table shuffle is an unbounded leaf here: its subtree
    # (and the scan inside it) prints only at the original site
    return "ReusedExchange" in line and (
        "hashpartitioning" in line or "rangepartitioning" in line
    )

_TREE = re.compile(r"^((?: {3}|:  )*)(?::-|\+-)")


def _depth(line: str) -> int:
    m = _TREE.match(line)
    return len(m.group(1)) // 3 + 1 if m else 0


def single_partition_violations(plan: str) -> list[str]:
    """Raw-scan lines that feed an ``Exchange SinglePartition`` with no
    bounding operator on the tree path in between. Empty list == the
    plan's single-partition stages all carry aggregate/k-bounded rows."""
    lines = plan.splitlines()
    out: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d0 = _depth(ln)
        bounded_at: dict[int, bool] = {}
        for j in range(i + 1, len(lines)):
            d = _depth(lines[j])
            if d <= d0:
                break  # left the exchange's subtree
            parent = bounded_at.get(d - 1, False) if d - 1 > d0 else False
            here = parent or any(b in lines[j] for b in _BOUNDING)
            bounded_at[d] = here
            if not here and _is_raw_leaf(lines[j]):
                out.append(lines[j].strip()[:200])
    return out


# Keys whose single-partition input is raw-but-bounded BY PREDICATE,
# not by plan — shared by the pytest gate and tools/plan_sweep.py so
# the exception list cannot drift between them. Every entry needs a
# reason and a plan-asserted distributed twin.
PREDICATE_BOUNDED_ALLOWLIST = {
    # §2 contract-shape single windows over a fixed key range
    # (o_orderkey < 16000 — constant row count at any corpus scale);
    # 100 TB forms: q_win_ntile_distributed /
    # q_win_percent_rank_distributed (both plan-asserted).
    "q_win_ntile",
    "q_win_percent_rank",
}


def cartesian_violations(plan: str) -> list[str]:
    """``CartesianProduct`` nodes — Spark emits one only when a non-equi
    join has NO broadcastable side, i.e. the O(|L|·|R|) pair
    materialization the repo's join discipline exists to avoid (banded /
    bucketed / prefix-filtered rewrites). BroadcastNestedLoopJoin is NOT
    flagged: its build side is bounded by the broadcast threshold, which
    is the pattern every 1-row/k-row aggregate crossJoin compiles to."""
    return [
        ln.strip()[:200] for ln in plan.splitlines() if "CartesianProduct" in ln
    ]


def python_udf_violations(plan: str) -> list[str]:
    """Row-at-a-time Python evaluation nodes (``BatchEvalPython``) — the
    ~10-100x-slower-than-Arrow path. The repo's rule: row Python UDFs
    exist ONLY where the contract mandates the shape itself
    (ROW_PYTHON_ALLOWLIST); everything else must be Arrow-vectorized
    (ArrowEvalPython / mapInPandas / cogrouped pandas), which this gate
    deliberately does not flag."""
    return [
        ln.strip()[:200] for ln in plan.splitlines() if "BatchEvalPython" in ln
    ]


# Keys whose plan legitimately carries a row-Python node: D1 and D4 are
# the §2 contract keys FOR the row-at-a-time UDF / Python-UDTF surfaces
# themselves (D1's Arrow twin q_udf_pandas_scalar is the production
# path and is benchmarked against it; D4's BatchEvalPythonUDTF runs
# over the 5-row region table — flipping the session to Arrow UDTFs
# would change an attested key's plan for no workload it serves).
ROW_PYTHON_ALLOWLIST = {
    "q_udf_python",
    "q_udtf_python",
}


def formatted_plan(df) -> str:
    """``explain("formatted")`` as a string. Uses the PythonSQLUtils
    private API (no public PySpark accessor returns the formatted text);
    kept in ONE place so a Spark upgrade or Connect migration breaks a
    single site (r10 review catch — two tools carried private copies)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit_key(spark, key: str, fn, sf_dir: str) -> dict[str, list[str]]:
    """Build the key's DataFrame and run every static gate over its
    executed plan. Returns {gate_name: violations} with empty lists
    dropped — truthy result == something to look at."""
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = {}
    for name, checker in (
        ("single_partition", single_partition_violations),
        ("cartesian", cartesian_violations),
        ("row_python", python_udf_violations),
    ):
        v = checker(plan)
        if v:
            out[name] = v
    return out
