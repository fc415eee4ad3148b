"""Closed-form / independent-Python pins for the remaining formula-bearing
llm + relational keys that until now rested on the DuckDB mirror alone
(fingerprint, simhash, langid/quality ratios, token counting, cosine
near-dup, fuzzy levenshtein, mode/argminmax tiebreaks, listagg, the
quarantine census, and the recursive-CTE heap walk).

The r6 lesson drives this file: the mirror proves Spark==DuckDB and a
brute-force pytest proves code==my-understanding, but only an INDEPENDENT
formulation (hashlib, numpy, a hand-rolled DP, or a closed form like
floor(log2 k)+1) catches a formula both engines encode wrongly."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import numpy as np

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load

M_FP = 1_000_000_007


def _docs(spark):
    return load(spark, SF_SMOKE, "documents").select("doc_id", "text", "n_chars").collect()


def _h15(tok: str) -> int:
    """First 15 hex chars of md5 as an integer — the shared Spark/DuckDB
    token hash (conv(substr(md5, 1, 15), 16, 10))."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)


def test_fingerprint_matches_hashlib_and_is_order_sensitive(spark):
    out = {r.doc_id: r.fingerprint for r in all_queries()["q_text_fingerprint"](spark, SF_SMOKE).collect()}
    docs = _docs(spark)
    assert set(out) == {d.doc_id for d in docs}
    order_flips = 0
    for d in docs:
        toks = d.text.split(" ")
        fp = sum((_h15(t) % M_FP) * (pos + 1) % M_FP for pos, t in enumerate(toks)) % M_FP
        assert out[d.doc_id] == fp, d.doc_id
        # the formula is position-weighted: reversing a doc with >=2
        # distinct tokens should (generically) move the fingerprint
        rev = sum((_h15(t) % M_FP) * (pos + 1) % M_FP for pos, t in enumerate(reversed(toks))) % M_FP
        if len(set(toks)) >= 2 and rev != fp:
            order_flips += 1
    assert order_flips > 0  # order sensitivity is observable on the fixture


def test_simhash_matches_hashlib_majority_vote(spark):
    out = {r.doc_id: r.simhash16 for r in all_queries()["q_dedup_simhash"](spark, SF_SMOKE).collect()}
    docs = _docs(spark)
    assert set(out) == {d.doc_id for d in docs}
    by_text: dict = {}
    for d in docs:
        toks = list(dict.fromkeys(d.text.split(" ")))  # array_distinct keeps first occurrence
        hs = [_h15(t) for t in toks]
        sh = 0
        for bit in range(16):
            vote = sum(1 if (h >> bit) & 1 else -1 for h in hs)
            if vote > 0:  # STRICT: a tied bit votes 0
                sh |= 1 << bit
        assert out[d.doc_id] == sh, d.doc_id
        assert 0 <= out[d.doc_id] <= 0xFFFF
        by_text.setdefault(d.text, set()).add(out[d.doc_id])
    # identical text => identical signature (holds trivially; asserts the
    # query is a pure function of the text column)
    for sigs in by_text.values():
        assert len(sigs) == 1


def test_langid_threshold_and_counts_match_python(spark):
    from wikidata2pg_spark.llm.text import _STOPWORDS

    out = {r.doc_id: r for r in all_queries()["q_text_langid"](spark, SF_SMOKE).collect()}
    stop = set(_STOPWORDS)
    seen = Counter()
    for d in _docs(spark):
        toks = d.text.split(" ")
        n_stop = sum(1 for t in toks if t in stop)
        r = out[d.doc_id]
        assert (r.n_stop, r.n_toks) == (n_stop, len(toks))
        guess = "en" if n_stop / len(toks) > 0.05 else "und"  # STRICT >
        assert r.lang_guess == guess, d.doc_id
        seen[guess] += 1
    assert seen["en"] and seen["und"]  # the threshold actually separates


def test_quality_ratios_and_gate_match_python(spark):
    from wikidata2pg_spark.llm.text import _STOPWORDS

    out = {r.doc_id: r for r in all_queries()["q_text_quality"](spark, SF_SMOKE).collect()}
    stop = set(_STOPWORDS)
    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000
    for d in _docs(spark):
        toks = d.text.split(" ")
        n = len(toks)
        ttr = len(set(toks)) / n
        r = out[d.doc_id]
        assert r.n_toks == n
        assert r.avg_tok_len == r4(sum(len(t) for t in toks) / n)
        assert r.type_token_ratio == r4(ttr)
        assert r.stopword_ratio == r4(sum(1 for t in toks if t in stop) / n)
        assert r.passes_quality == (10 <= n <= 1000 and ttr > 0.2), d.doc_id


def test_tokencount_split_semantics_match_python(spark):
    out = {r.doc_id: r for r in all_queries()["q_text_tokencount"](spark, SF_SMOKE).collect()}
    for d in _docs(spark):
        r = out[d.doc_id]
        assert r.ws_tokens == len(d.text.split(" "))
        # Java split(limit=-1) and re.split both keep leading/trailing
        # empty fields — the count must agree on punctuation-edged text
        assert r.bpe_ish_tokens == len(re.split(r"[^a-z0-9]+", d.text))
        assert r.n_chars_actual == len(d.text)
        assert r.approx_llm_tokens == math.ceil(len(d.text) / 4.0)


def test_cosine_neardup_matches_numpy_allpairs(spark):
    rows = all_queries()["q_sim_cosine_neardup"](spark, SF_SMOKE).collect()
    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    V = np.array([r.embedding for r in emb], dtype=np.float64)  # double-cast rule
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    want = {}
    n = len(ids)
    for i in range(n):
        for j in range(n):
            if ids[i] < ids[j] and S[i, j] >= 0.2:
                want[(int(ids[i]), int(ids[j]))] = S[i, j]
    got = {(r.vec_a, r.vec_b): r.sim for r in rows}
    assert set(got) == set(want)
    for k, sim in got.items():
        assert abs(sim - want[k]) < 2e-6, k
    assert want  # threshold yields rows on this fixture


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_levenshtein_matches_python_dp(spark):
    rows = all_queries()["q_join_fuzzy_levenshtein"](spark, SF_SMOKE).collect()
    parts = load(spark, SF_SMOKE, "part").filter("p_partkey < 100").select("p_partkey", "p_name").collect()
    names = {p.p_partkey: p.p_name for p in parts}
    want = {}
    keys = sorted(names)
    for ai, a in enumerate(keys):
        for b in keys[ai + 1:]:
            d = _lev(names[a], names[b])
            if d <= 6:
                want[(a, b)] = d
    got = {(r.pk_a, r.pk_b): r.edit_dist for r in rows}
    assert got == want
    assert want  # the p_name vocabulary produces near-matches


def test_mode_tiebreak_matches_python(spark):
    out = {r.event_type: r for r in all_queries()["q_agg_mode"](spark, SF_SMOKE).collect()}
    ev = load(spark, SF_SMOKE, "events").select("event_type", "user_id").collect()
    counts = Counter((r.event_type, r.user_id) for r in ev)
    by_type: dict = {}
    for (et, uid), n in counts.items():
        by_type.setdefault(et, []).append((uid, n))
    assert set(out) == set(by_type)
    for et, pairs in by_type.items():
        uid, n = min(pairs, key=lambda p: (-p[1], p[0]))  # n DESC, user ASC
        assert (out[et].mode_user, out[et].mode_n) == (uid, n), et


def test_histogram_bins_match_python(spark):
    out = {r.bin: r for r in all_queries()["q_agg_histogram"](spark, SF_SMOKE).collect()}
    prices = [r.l_extendedprice for r in load(spark, SF_SMOKE, "lineitem").select("l_extendedprice").collect()]
    bins: dict = {}
    for p in prices:
        bins.setdefault(int(math.floor(p / 10000.0)), []).append(p)
    assert set(out) == set(bins)
    for b, ps in bins.items():
        assert out[b].n == len(ps)
        assert abs(out[b].lo - min(ps)) < 1e-6 and abs(out[b].hi - max(ps)) < 1e-6
        # fixed-width contract: every member sits inside its bin
        assert all(b * 10000.0 <= p < (b + 1) * 10000.0 for p in ps)


def test_argminmax_composite_key_matches_python(spark):
    out = {r.o_orderpriority: r for r in all_queries()["q_agg_argminmax"](spark, SF_SMOKE).collect()}
    orders = load(spark, SF_SMOKE, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
    groups: dict = {}
    for o in orders:
        # composite = cents * 1e8 + orderkey (exact in int, strictly unique)
        key = int(math.floor(o.o_totalprice * 100 + 0.5)) * 100000000 + o.o_orderkey
        groups.setdefault(o.o_orderpriority, []).append((key, o.o_orderkey, o.o_totalprice))
    assert set(out) == set(groups)
    for pri, rows in groups.items():
        r = out[pri]
        assert r.key_of_max == max(rows)[1]
        assert r.key_of_min == min(rows)[1]
        assert abs(r.max_total - max(x[2] for x in rows)) < 1e-6
        assert abs(r.min_total - min(x[2] for x in rows)) < 1e-6


def test_listagg_is_sorted_distinct_csv(spark):
    out = {r.o_orderpriority: r for r in all_queries()["q_agg_listagg"](spark, SF_SMOKE).collect()}
    orders = load(spark, SF_SMOKE, "orders").select("o_orderpriority", "o_orderstatus").collect()
    groups: dict = {}
    for o in orders:
        groups.setdefault(o.o_orderpriority, set()).add(o.o_orderstatus)
    assert set(out) == set(groups)
    for pri, statuses in groups.items():
        assert out[pri].statuses == ",".join(sorted(statuses)), pri
        assert out[pri].n == sum(1 for o in orders if o.o_orderpriority == pri)


def test_quarantine_census_matches_python(spark):
    rows = all_queries()["q_dq_quarantine"](spark, SF_SMOKE).collect()
    ev = load(spark, SF_SMOKE, "events").select("event_id", "value", "event_type", "user_id").collect()
    cells: dict = {}
    valid_types = {"click", "error", "purchase", "signup", "view"}
    for e in ev:
        value = -e.value if e.event_id % 101 == 0 else e.value
        etype = "bogus" if e.event_id % 103 == 0 else e.event_type
        uid = None if e.event_id % 97 == 0 else e.user_id
        v = [w for w, bad in (
            ("neg_value", value < 0),
            ("bad_type", etype not in valid_types),
            ("null_user", uid is None),
        ) if bad]
        key = ("quarantine" if v else "valid", ",".join(v))
        n, lo, hi = cells.get(key, (0, e.event_id, e.event_id))
        cells[key] = (n + 1, min(lo, e.event_id), max(hi, e.event_id))
    got = {(r.verdict, r.violations): (r.n, r.min_id, r.max_id) for r in rows}
    assert got == cells
    assert ("valid", "") in got and len(got) >= 3  # every rule fires


def test_recursive_cte_heap_walk_closed_form(spark):
    """Walking anc -> floor(anc/2) from k to 1 visits exactly
    floor(log2 k) + 1 nodes: path_len and depth_to_root are CLOSED FORMS
    of the key, and the root is always 1."""
    rows = all_queries()["q_sql_recursive_cte"](spark, SF_SMOKE).collect()
    keys = [r.c_custkey for r in load(spark, SF_SMOKE, "customer").select("c_custkey").collect()
            if 1 <= r.c_custkey <= 255]
    got = {r.custkey: r for r in rows}
    assert set(got) == set(keys)
    for k in keys:
        r = got[k]
        assert r.path_len == int(math.log2(k)) + 1, k
        assert r.depth_to_root == int(math.log2(k)), k
        assert r.root == 1
