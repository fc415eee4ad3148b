"""Pure-Python json-walk pins for the wikidata family (K5/K6/K8-K11 +
graph extras): a third, independent implementation of the Wikibase dump
semantics next to Spark's typed flatten and the DuckDB json_extract
oracles. The mirror proves the two engines agree; these pins prove the
agreed semantics ARE the Wikibase rules — latest-revision keep,
truthy = preferred-if-any-else-normal-never-deprecated, somevalue/
novalue → typed NULL, the 6-type datavalue dispatch, and min-label
connected components (checked against a union-find)."""

from __future__ import annotations

import json
import math
from collections import defaultdict

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.wikidata.fixture import DUMP_LINES


def _entities():
    lines = [l.rstrip().rstrip(",") for l in DUMP_LINES if l.strip() not in ("[", "]")]
    return [json.loads(l) for l in lines]


def _latest():
    best = {}
    for e in _entities():
        cur = best.get(e["id"])
        if cur is None or e["lastrevid"] > cur["lastrevid"]:
            best[e["id"]] = e
    return best


def _dv_str(snak):
    dv = snak.get("datavalue")
    if dv is None:
        return None
    t, v = dv["type"], dv["value"]
    if t == "wikibase-entityid":
        return v["id"]
    if t == "string":
        return v
    if t == "time":
        return v["time"]
    if t == "quantity":
        return v["amount"]
    if t == "monolingualtext":
        return v["text"]
    if t == "globecoordinate":
        return (v["latitude"], v["longitude"])  # compared numerically
    return None


def _stmts():
    for ent in _latest().values():
        for prop, ss in ent.get("claims", {}).items():
            for idx, s in enumerate(ss):
                yield ent["id"], prop, idx, s


def _values_equal(got, want):
    if isinstance(want, tuple):  # globecoordinate rendered "lat,lon"
        lat, lon = (float(x) for x in got.split(","))
        return math.isclose(lat, want[0]) and math.isclose(lon, want[1])
    return got == want


def test_latest_revision_keeps_max_lastrevid(spark):
    rows = {r.id: r for r in all_queries()["q_wd_latest_revision"](spark, SF_SMOKE).collect()}
    want = _latest()
    assert set(rows) == set(want)
    for eid, ent in want.items():
        assert rows[eid].lastrevid == ent["lastrevid"]
        label = ent.get("labels", {}).get("en", {}).get("value")
        assert rows[eid].label_en == label, eid
    # the fixture ships a stale Q42 revision — prove it was dropped
    assert sum(1 for e in _entities() if e["id"] == "Q42") == 2
    assert rows["Q42"].lastrevid == max(e["lastrevid"] for e in _entities() if e["id"] == "Q42")


def test_snaktype_nulls_match_json_walk(spark):
    rows = {(r.subject, r.property, r.stmt_idx): r
            for r in all_queries()["q_wd_snaktype_nulls"](spark, SF_SMOKE).collect()}
    want = {(s, p, i): stmt for s, p, i, stmt in _stmts()}
    assert set(rows) == set(want)
    kinds = set()
    for key, stmt in want.items():
        r = rows[key]
        st = stmt["mainsnak"]["snaktype"]
        kinds.add(st)
        assert r.snaktype == st
        assert r.is_unknown == (st == "somevalue")
        assert r.is_none == (st == "novalue")
        if st == "value":
            assert _values_equal(r.value, _dv_str(stmt["mainsnak"])), key
        else:
            assert r.value is None, key
    assert kinds == {"value", "somevalue", "novalue"}  # all three exercised


def test_truthy_rank_is_preferred_else_normal_never_deprecated(spark):
    rows = {(r.subject, r.property, r.stmt_idx): r
            for r in all_queries()["q_wd_truthy_rank"](spark, SF_SMOKE).collect()}
    by_sp = defaultdict(list)
    for s, p, i, stmt in _stmts():
        by_sp[(s, p)].append((i, stmt))
    want = {}
    for (s, p), items in by_sp.items():
        live = [(i, st) for i, st in items if st.get("rank") != "deprecated"]
        if any(st.get("rank") == "preferred" for _, st in live):
            live = [(i, st) for i, st in live if st.get("rank") == "preferred"]
        for i, st in live:
            want[(s, p, i)] = st
    assert set(rows) == set(want)
    for key, stmt in want.items():
        assert rows[key].rank == stmt["rank"]
        if stmt["mainsnak"]["snaktype"] == "value":
            assert _values_equal(rows[key].value, _dv_str(stmt["mainsnak"])), key
    # fixture discrimination: a preferred statement suppresses its normal
    # sibling, and a deprecated one never appears
    assert ("Q42", "P800", 0) in rows and ("Q42", "P800", 1) not in rows
    assert ("Q1136", "P569", 1) in rows and ("Q1136", "P569", 0) not in rows


def test_sitelinks_match_json_walk(spark):
    rows = {(r.id, r.site): r for r in all_queries()["q_wd_sitelinks"](spark, SF_SMOKE).collect()}
    want = {}
    for eid, ent in _latest().items():
        for site, sl in ent.get("sitelinks", {}).items():
            want[(eid, site)] = (sl["title"], len(sl.get("badges", [])))
    assert set(rows) == set(want)
    for key, (title, nb) in want.items():
        assert (rows[key].title, rows[key].n_badges) == (title, nb)


def test_coordinates_match_json_walk(spark):
    rows = {r.id: (r.lat, r.lon) for r in all_queries()["q_wd_coordinates"](spark, SF_SMOKE).collect()}
    want = {}
    for s, p, i, stmt in _stmts():
        if p == "P625" and stmt["mainsnak"]["snaktype"] == "value":
            v = stmt["mainsnak"]["datavalue"]["value"]
            want[s] = (v["latitude"], v["longitude"])
    assert rows == want and want


def test_edge_degree_and_two_hop_match_json_walk(spark):
    edges = []
    for s, p, i, stmt in _stmts():
        dv = stmt["mainsnak"].get("datavalue")
        if dv and dv["type"] == "wikibase-entityid":
            edges.append((s, p, dv["value"]["id"]))
    deg = {r.src: r for r in all_queries()["q_wd_edge_degree"](spark, SF_SMOKE).collect()}
    by_src = defaultdict(list)
    for s, p, d in edges:
        by_src[s].append((p, d))
    assert set(deg) == set(by_src)
    for src, pairs in by_src.items():
        r = deg[src]
        assert r.out_deg == len(pairs)
        assert r.n_props == len({p for p, _ in pairs})
        assert r.n_targets == len({d for _, d in pairs})

    hops = {(r.src, r.two_hop) for r in all_queries()["q_wd_two_hop"](spark, SF_SMOKE).collect()}
    fwd = defaultdict(set)
    for s, _, d in edges:
        fwd[s].add(d)
    want = {(a, c) for a in fwd for b in fwd[a] for c in fwd.get(b, ()) if c != a}
    assert hops == want


def test_connected_components_match_union_find(spark):
    rows = {r.id: r.component for r in all_queries()["q_wd_connected_components"](spark, SF_SMOKE).collect()}
    sym = defaultdict(set)
    for s, p, i, stmt in _stmts():
        dv = stmt["mainsnak"].get("datavalue")
        if dv and dv["type"] == "wikibase-entityid":
            d = dv["value"]["id"]
            sym[s].add(d)
            sym[d].add(s)
    parent = {n: n for n in sym}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, nbrs in sym.items():
        for b in nbrs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    comps = defaultdict(set)
    for n in sym:
        comps[find(n)].add(n)
    want = {n: min(comps[find(n)]) for n in sym}
    assert rows == want


def test_label_coverage_matches_json_walk(spark):
    rows = {r.lang: r for r in all_queries()["q_wd_label_coverage"](spark, SF_SMOKE).collect()}
    latest = _latest()
    n = len(latest)
    counts = defaultdict(int)
    for ent in latest.values():
        for lang in ent.get("labels", {}):
            counts[lang] += 1
    assert set(rows) == set(counts)
    for lang, c in counts.items():
        assert rows[lang].n_labeled == c
        assert rows[lang].coverage == math.floor(c / n * 10000 + 0.5) / 10000
