"""Branch-liveness audit: flag registered keys whose categorical output
columns (string/boolean) show a single state at the driver's
correctness scale — the class the r7 audit surfaced, where a CASE/WHEN
branch, a join side, or an entire result set is DEAD on fixture data
and a green hash row attests nothing about it (q_except hash-matched on
ZERO rows; the decontamination/repetition/quality gates never flagged a
document; q_dedup_incremental only ever said 'new').

Rule: for every string/bool output column, states = countDistinct +
(1 if any NULL). A column with states <= 1 over a multi-row result is
flagged, as is an empty result. Every steady-state flag must be
allowlisted here WITH the evidence that covers the dead branch — a
crafted-fixture probe running the REGISTERED key on data that lights
it (tests/test_boundary_probes*.py), or a constant-by-construction
argument. A NEW flag means a new key shipped with an unattested branch:
write the probe, then allowlist.

Shared by tools/branch_audit.py and the pytest twin
(tests/test_branch_audit.py) so the two cannot drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

# (key, column) -> reason. "probe:" entries name the crafted-fixture
# test that exercises the dead branch; "construction:" entries are
# constant for structural reasons no probe can change.
EXPECTED_CONSTANT: dict[tuple[str, str], str] = {
    # wikidata micro-fixture: one entity carries qualifiers, one carries
    # aliases, references are all snaktype=value — the json-walk pins
    # (tests/test_wikidata_pins*.py) recompute these from the dump lines,
    # and the fixture is pinned by FIXTURES.md (changing DUMP_LINES
    # changes every wikidata oracle hash — not during a freeze)
    ("q_wd_qualifiers", "subject"): "construction: single qualifier-bearing entity; json-walk pinned",
    ("q_wd_qualifiers", "property"): "construction: single qualifier-bearing statement; json-walk pinned",
    ("q_wd_qualifiers", "qual_snaktype"): "construction: fixture qualifiers all snaktype=value; json-walk pinned",
    ("q_wd_two_hop", "src"): "construction: one entity has 2-hop paths on the micro-fixture; json-walk pinned",
    ("q_wd_aliases", "id"): "construction: single alias-bearing entity; json-walk pinned",
    ("q_wd_aliases", "lang"): "construction: single alias language; json-walk pinned",
    ("q_wd_references", "ref_snaktype"): "construction: fixture reference snaks all value; json-walk pinned",
    # samplers / gates whose flagging branch is dead on clean fixture data
    ("q_dedup_incremental", "status"): "probe: test_boundary_probes4 lights new/dup_batch/dup_corpus",
    ("q_text_quality", "passes_quality"): "probe: test_boundary_probes5 lights both verdicts + exact thresholds",
    ("q_text_decontaminate", "is_contaminated"): "probe: test_boundary_probes4 lights the 8-gram hit",
    ("q_text_repetition", "passes_repetition"): "probe: test_boundary_probes4 lights the fail branch + exact 0.2",
    ("q_agg_bool", "all_qty_pos"): "probe: test_boundary_probes5 lights both truth values",
    ("q_agg_bool", "any_deep_disc"): "probe: test_boundary_probes5 lights both truth values",
    ("q_time_control_chart", "side"): "probe: xmr worked example pins above AND below spikes",
    # constant by construction — the column states an invariant or a
    # single-valued projection
    ("q_fn_url", "host"): "construction: one host built from a literal; parse roundtrip is the test",
    ("q_fn_try_safe", "oob_elem"): "construction: index 5 of a 2-element split is ALWAYS null (pinned in test_fn_pins)",
    ("q_fn_map", "keys_sorted"): "construction: same literal map keys per row",
    ("q_agg_hll_mergeable", "est_within_5pct"): "construction: accuracy invariant, true everywhere by contract",
    ("q_agg_listagg", "statuses"): "construction: every priority sees all 3 statuses at sf>=0.01; pinned vs Python",
}

# keys allowed to return ZERO rows at the audit scale
EXPECTED_EMPTY: dict[str, str] = {
    "q_except": "probe: test_boundary_probes4 pins non-empty EXCEPT semantics on crafted parts",
}


def audit_key(spark, fn, sf_dir: str):
    """Return a list of flags for one key: ('__EMPTY__',) or (column,)
    entries. Raises whatever the key itself raises."""
    df = fn(spark, sf_dir)
    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, (StringType, BooleanType))]
    if not cols:
        # numeric-only keys still get the empty-result check — the
        # q_except class does not require a categorical column
        return ["__EMPTY__"] if df.limit(1).count() == 0 else []
    aggs = [F.countDistinct(c).alias(f"d_{c}") for c in cols]
    aggs += [F.max(F.col(c).isNull().cast("int")).alias(f"n_{c}") for c in cols]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    r = df.agg(*aggs).collect()[0]
    if r["__n"] == 0:
        return ["__EMPTY__"]
    if r["__n"] == 1:
        return []  # a single-row result cannot show two states
    return [
        c for c in cols if (r[f"d_{c}"] + (r[f"n_{c}"] or 0)) <= 1
    ]


def run_audit(spark, sf_dir: str, keys=None):
    """Audit every registered key; return (violations, allowlisted,
    errors) where violations are NON-allowlisted flags."""
    from wikidata2pg_spark.registry import all_queries

    qs = all_queries()
    violations, allowlisted, errors = [], [], []
    if keys:
        unknown = [k for k in keys if k not in qs]
        errors.extend((k, "unknown key") for k in unknown)
        qs = {k: qs[k] for k in keys if k in qs}
    for k, fn in qs.items():
        try:
            for flag in audit_key(spark, fn, sf_dir):
                if flag == "__EMPTY__":
                    (allowlisted if k in EXPECTED_EMPTY else violations).append((k, flag))
                elif (k, flag) in EXPECTED_CONSTANT:
                    allowlisted.append((k, flag))
                else:
                    violations.append((k, flag))
        except Exception as e:  # noqa: BLE001 - surfaced to the caller per key
            errors.append((k, str(e).splitlines()[0][:120]))
    return violations, allowlisted, errors
