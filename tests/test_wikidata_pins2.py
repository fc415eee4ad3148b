"""Wikidata json-walk pins, batch 2: statement anatomy (triples,
qualifiers, references), the termstore tables (labels, descriptions,
aliases with positions), the fallback-chain label lookup, per-property
stats, and the raw parse census — completing the pure-Python third
implementation over the family (batch 1: tests/test_wikidata_pins.py)."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMOKE
from tests.test_wikidata_pins import _dv_str, _entities, _latest, _stmts, _values_equal
from wikidata2pg_spark.registry import all_queries


def test_parse_entity_census_matches_json_walk(spark):
    rows = {(r.id, r.lastrevid): r for r in all_queries()["q_wd_parse_entity"](spark, SF_SMOKE).collect()}
    ents = _entities()
    # parse is PRE-latest: every dump line (incl. the stale Q42) appears
    assert len(rows) == len(ents)
    for e in ents:
        r = rows[(e["id"], e["lastrevid"])]
        assert r.type == e["type"]
        assert r.n_labels == len(e.get("labels", {}))
        assert r.n_claim_props == len(e.get("claims", {}))
        assert r.n_aliases_en == len(e.get("aliases", {}).get("en", []))
        assert r.has_sitelinks == ("sitelinks" in e)


def test_labels_descriptions_aliases_match_json_walk(spark):
    latest = _latest()
    lbl = {(r.id, r.lang): r.label for r in all_queries()["q_wd_labels"](spark, SF_SMOKE).collect()}
    want_lbl = {(i, lg): v["value"] for i, e in latest.items() for lg, v in e.get("labels", {}).items()}
    assert lbl == want_lbl

    dsc = {(r.id, r.lang): r.description for r in all_queries()["q_wd_descriptions"](spark, SF_SMOKE).collect()}
    want_dsc = {(i, lg): v["value"] for i, e in latest.items() for lg, v in e.get("descriptions", {}).items()}
    assert dsc == want_dsc

    al = {(r.id, r.lang, r.alias_idx): r.alias for r in all_queries()["q_wd_aliases"](spark, SF_SMOKE).collect()}
    want_al = {
        (i, lg, idx): a["value"]
        for i, e in latest.items()
        for lg, arr in e.get("aliases", {}).items()
        for idx, a in enumerate(arr)
    }
    assert al == want_al and want_al  # ordering survives normalization


def test_label_lookup_fallback_chain(spark):
    rows = {r.id: r for r in all_queries()["q_wd_label_lookup"](spark, SF_SMOKE).collect()}
    latest = _latest()
    assert set(rows) == set(latest)
    fell_back = 0
    for i, e in latest.items():
        labels = e.get("labels", {})
        want = None
        for lang in ("en", "de", "es", "fr"):
            if lang in labels:
                want = labels[lang]["value"]
                break
        assert rows[i].best_label == want, i
        if want is not None and "en" not in labels:
            fell_back += 1
        assert rows[i].desc_en == e.get("descriptions", {}).get("en", {}).get("value")
    assert fell_back > 0  # Q1136 (es/fr only) exercises the fallback


def test_claims_triples_full_dispatch(spark):
    rows = {(r.subject, r.property, r.stmt_idx): r
            for r in all_queries()["q_wd_claims_triples"](spark, SF_SMOKE).collect()}
    want = {(s, p, i): stmt for s, p, i, stmt in _stmts()}
    assert set(rows) == set(want)
    seen_types = set()
    for key, stmt in want.items():
        r = rows[key]
        assert r.rank == stmt["rank"]
        assert r.snaktype == stmt["mainsnak"]["snaktype"]
        dv = stmt["mainsnak"].get("datavalue")
        assert r.value_type == (dv["type"] if dv else None)
        if dv:
            seen_types.add(dv["type"])
            assert _values_equal(r.value, _dv_str(stmt["mainsnak"])), key
        else:
            assert r.value is None
    # the fixture exercises the full 6-type datavalue union
    assert seen_types == {
        "wikibase-entityid", "string", "time", "quantity",
        "globecoordinate", "monolingualtext",
    }


def test_qualifiers_match_json_walk(spark):
    rows = {(r.subject, r.property, r.stmt_idx, r.qual_property, r.qual_idx): r
            for r in all_queries()["q_wd_qualifiers"](spark, SF_SMOKE).collect()}
    want = {}
    for s, p, i, stmt in _stmts():
        for qp, snaks in stmt.get("qualifiers", {}).items():
            for qi, snak in enumerate(snaks):
                want[(s, p, i, qp, qi)] = snak
    assert set(rows) == set(want) and want
    for key, snak in want.items():
        r = rows[key]
        assert r.qual_snaktype == snak["snaktype"]
        if snak["snaktype"] == "value":
            assert _values_equal(r.qual_value, _dv_str(snak)), key
        else:
            assert r.qual_value is None


def test_references_match_json_walk(spark):
    rows = {(r.subject, r.property, r.stmt_idx, r.ref_idx, r.ref_property, r.snak_idx): r
            for r in all_queries()["q_wd_references"](spark, SF_SMOKE).collect()}
    want = {}
    for s, p, i, stmt in _stmts():
        for ri, ref in enumerate(stmt.get("references", [])):
            for rp, snaks in ref.get("snaks", {}).items():
                for si, snak in enumerate(snaks):
                    want[(s, p, i, ri, rp, si)] = (ref.get("hash"), snak)
    assert set(rows) == set(want) and want
    for key, (ref_hash, snak) in want.items():
        r = rows[key]
        assert r.ref_hash == ref_hash
        assert r.ref_snaktype == snak["snaktype"]
        if snak["snaktype"] == "value":
            assert _values_equal(r.ref_value, _dv_str(snak)), key


def test_property_stats_match_json_walk(spark):
    rows = {r.property: r for r in all_queries()["q_wd_property_stats"](spark, SF_SMOKE).collect()}
    stats = defaultdict(lambda: {"n": 0, "subjects": set(), "types": set()})
    for s, p, i, stmt in _stmts():
        st = stats[p]
        st["n"] += 1
        st["subjects"].add(s)
        dv = stmt["mainsnak"].get("datavalue")
        if dv:
            st["types"].add(dv["type"])
    assert set(rows) == set(stats)
    for p, st in stats.items():
        r = rows[p]
        assert (r.n_statements, r.n_subjects, r.n_value_types) == (
            st["n"], len(st["subjects"]), len(st["types"])
        ), p


def test_multilingual_labels_unicode_parity(spark):
    """Standing multilingual pin (r10, VERDICT r9 stretch 7): the r9
    unicode sweep OBSERVED the wikidata family hash-identical on
    non-ASCII bytes; this locks the property against the SAME machinery
    the registered keys use (clean_dump_lines -> parse_entities ->
    labels_table on the Spark side; the fixture's generated VALUES CTE
    + json walk on the DuckDB side). Hazard classes: CJK, RTL
    Hebrew/Arabic, an astral-plane codepoint (a SURROGATE PAIR in the
    \\u-escaped dump encoding — the class ensure_ascii=True makes both
    JSON parsers reassemble), Turkish U+0130, precomposed (NFC) vs
    GENUINELY-decomposed (NFD) accents, and full-width forms — each in
    BOTH dump encodings (\\u-escaped like fixture.py's ensure_ascii
    lines, and raw UTF-8 like a real latest-all.json). All three
    implementations (Spark, DuckDB, the Python dict) must agree on
    exact codepoint sequences, and the escaped/raw encodings of the
    same entity must decode identically."""
    import json

    import duckdb

    from wikidata2pg_spark.wikidata import flatten
    from wikidata2pg_spark.wikidata.fixture import _sql_quote

    labels = {
        "zh": "中文维基百科",            # CJK
        "he": "עִבְרִית",                # RTL Hebrew with combining points
        "ar": "العربية",                # RTL Arabic
        "tr": "İstanbul",               # U+0130 (the case-fold hazard cp,
                                        # stored here verbatim — no folding
                                        # in the termstore path)
        "fr": "caf\u00e9",            # precomposed NFC (explicit escape)
        "oc": "cafe\u0301",           # genuinely-decomposed NFD (explicit
                                        # escape — a pasted glyph can
                                        # silently round-trip to NFC)
        "ja": "ＦＵＬＬ幅１２３",        # full-width forms
        "en": "Douglas \U0001F600 Adams \U00020021",  # astral emoji + CJK-B
    }
    ents = [
        {"id": "Q9001", "type": "item", "lastrevid": 1,
         "labels": {lg: {"language": lg, "value": v} for lg, v in labels.items()}},
        {"id": "Q9002", "type": "item", "lastrevid": 1,
         "labels": {lg: {"language": lg, "value": v} for lg, v in labels.items()}},
    ]
    # Q9001 ships \u-escaped (fixture.py's ensure_ascii convention —
    # astral codepoints become 😀-style SURROGATE PAIRS);
    # Q9002 ships raw UTF-8 (a real dump's encoding).
    lines = [
        json.dumps(ents[0], separators=(",", ":"), ensure_ascii=True),
        json.dumps(ents[1], separators=(",", ":"), ensure_ascii=False),
    ]
    assert "\\ud83d" in lines[0].lower() and "\U0001F600" in lines[1]
    # full dump shape so clean_dump_lines' bracket/comma path runs too
    dump = ["["] + [lines[0] + ","] + [lines[1]] + ["]"]

    raw = spark.createDataFrame([(l,) for l in dump], "line string")
    parsed = flatten.parse_entities(flatten.clean_dump_lines(raw))
    got_spark = {
        (r.id, r.lang): r.label
        for r in flatten.labels_table(parsed).collect()
    }

    vals = ",\n".join(f"({_sql_quote(l)})" for l in lines)
    got_duck = {
        (i, lg): v
        for i, lg, v in duckdb.sql(
            f"""
            WITH raw(line) AS (VALUES {vals})
            SELECT json_extract_string(line, '$.id'),
                   u.lang,
                   json_extract_string(line, '$.labels.' || u.lang || '.value')
            FROM raw, unnest(json_keys(line, '$.labels')) AS u(lang)
            """
        ).fetchall()
    }

    want = {
        (e["id"], lg): v["value"] for e in ents for lg, v in e["labels"].items()
    }
    assert got_spark == want, "Spark parse diverged from the Python dict"
    assert got_duck == want, "DuckDB json walk diverged from the Python dict"
    # encoding invariance: the \u-escaped and raw-UTF-8 entities decoded
    # to the same label values in both engines
    for lg in labels:
        assert got_spark[("Q9001", lg)] == got_spark[("Q9002", lg)] == labels[lg]
    # the NFC/NFD pair stayed DISTINCT (both engines are
    # normalization-preserving — nothing silently NFC-folds)
    assert got_spark[("Q9001", "fr")] != got_spark[("Q9001", "oc")]
    assert got_duck[("Q9001", "fr")] != got_duck[("Q9001", "oc")]
