"""Independent-Python pins, batch 2: the deterministic samplers (hash
buckets, stratified hash-order, group-pure splits), vector centroid /
normalization vs numpy, the UNBOUNDED ppjoin Jaccard key vs an all-pairs
brute force (prefix-filter completeness), multimodal payload plumbing
recomputed byte-by-byte, corpus word counts, and rank/dense_rank
semantics — the remaining keys whose only prior evidence was the DuckDB
mirror (which cannot catch a formula both engines share)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np

from tests.conftest import SF_SMOKE
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load


def _u32(key) -> int:
    """The repo-wide md5-prefix 32-bit uniform (sampling.hash_u32)."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


def _no_negzero(x: float) -> bool:
    return x != 0.0 or math.copysign(1.0, x) > 0


def test_mix_weighted_matches_md5_thresholds(spark):
    rows = all_queries()["q_mix_weighted"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "lang", "source").collect()
    hi = {"src0", "src1", "src2", "src3", "src4"}
    want = {}
    for d in docs:
        b = _u32(d.doc_id) % 100
        if (d.source in hi and b < 80) or (d.source not in hi and b < 30):
            want[d.doc_id] = (d.lang, d.source, b)
    got = {r.doc_id: (r.lang, r.source, r.bucket) for r in rows}
    assert got == want
    # the mixture knob actually differentiates: hi sources keep ~80%,
    # the rest ~30% (loose bounds — exact membership is already pinned)
    n_hi = sum(1 for d in docs if d.source in hi)
    kept_hi = sum(1 for d in docs if d.source in hi and d.doc_id in got)
    assert n_hi and 0.6 < kept_hi / n_hi < 0.95


def test_stratified_sample_is_md5_order_topk(spark):
    rows = all_queries()["q_sample_stratified"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "lang", "source").collect()
    by_lang: dict = {}
    for d in docs:
        h = hashlib.md5(str(d.doc_id).encode()).hexdigest()
        by_lang.setdefault(d.lang, []).append((h, d.doc_id, d.source))
    want = {}
    for lang, items in by_lang.items():
        items.sort()
        for rn, (_, doc_id, source) in enumerate(items[:20], 1):
            want[doc_id] = (lang, source, rn)
    got = {r.doc_id: (r.lang, r.source, r.rn) for r in rows}
    assert got == want
    for lang, items in by_lang.items():
        assert sum(1 for v in got.values() if v[0] == lang) == min(20, len(items))


def test_split_leakage_safe_is_pure_function_of_source(spark):
    rows = all_queries()["q_split_leakage_safe"](spark, SF_SMOKE).collect()
    splits = {0: "train", 1: "train", 2: "train", 3: "train", 4: "train",
              5: "train", 6: "train", 7: "train", 8: "val", 9: "test"}
    per_source: dict = {}
    for r in rows:
        assert r.split == splits[_u32(r.source) % 10], r.source
        per_source.setdefault(r.source, set()).add(r.split)
    # leakage-safety: one split per source, ever
    assert all(len(s) == 1 for s in per_source.values())
    docs = load(spark, SF_SMOKE, "documents").count()
    assert len(rows) == docs  # a split, unlike a sample, keeps every row


def test_vec_centroid_matches_numpy(spark):
    rows = all_queries()["q_vec_centroid"](spark, SF_SMOKE).collect()
    emb = load(spark, SF_SMOKE, "embeddings").select("label", "embedding").collect()
    groups: dict = {}
    for r in emb:
        groups.setdefault(r.label, []).append(np.asarray(r.embedding, dtype=np.float64))
    got = {(r.label, r.pos): r.c for r in rows}
    dim = len(next(iter(groups.values()))[0])
    assert set(got) == {(lb, p) for lb in groups for p in range(dim)}
    for (lb, pos), c in got.items():
        mean = float(np.mean([v[pos] for v in groups[lb]]))
        assert abs(c - mean) <= 5.0001e-5, (lb, pos)  # c is mean rounded to 4dp
        assert _no_negzero(c)  # the +0.0 sign guard holds


def test_vec_normalize_matches_numpy_and_is_unit(spark):
    rows = all_queries()["q_vec_normalize"](spark, SF_SMOKE).collect()
    emb = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
           for r in load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()}
    assert {r.vec_id for r in rows} == set(emb)
    for r in rows:
        v = emb[r.vec_id]
        nrm = float(np.sqrt(np.sum(v * v)))
        assert abs(r.norm - nrm) < 2e-6
        assert abs(r.u1 - v[0] / nrm) < 2e-6 and abs(r.u2 - v[1] / nrm) < 2e-6
        assert r.unit_len == 1.0  # round(Σ(x/‖v‖)², 6) must be exactly 1
        assert _no_negzero(r.u1) and _no_negzero(r.u2)


def test_ngram_jaccard_scaled_prefix_filter_is_complete(spark):
    """The ppjoin prefix join must produce EXACTLY the pairs an all-pairs
    scan finds — a too-short prefix would silently drop qualifying pairs
    (the classic ppjoin implementation bug)."""
    rows = all_queries()["q_dedup_ngram_jaccard_scaled"](spark, SF_SMOKE).collect()
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    sets = {d.doc_id: set(d.text.split(" ")) for d in docs}
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.5:
                want[(a, b)] = math.floor(j * 10000 + 0.5) / 10000
    got = {(r.doc_a, r.doc_b): r.jaccard for r in rows}
    assert got == want


def test_multimodal_binary_and_decode_match_python(spark):
    out_b = {r.doc_id: r for r in all_queries()["q_multimodal_binary"](spark, SF_SMOKE).collect()}
    out_d = {r.doc_id: r for r in all_queries()["q_multimodal_decode"](spark, SF_SMOKE).collect()}
    for d in load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect():
        blob = d.text.encode("utf-8")
        rb, rd = out_b[d.doc_id], out_d[d.doc_id]
        assert rb.content_md5 == hashlib.md5(blob).hexdigest()
        assert rb.n_bytes == len(blob)
        assert rb.head_hex == blob.hex().upper()[:16]
        assert rd.width == (blob[0] if len(blob) >= 1 else 0)
        assert rd.height == (blob[1] if len(blob) >= 2 else 0)
        assert rd.n_bytes == len(blob)


def test_framesample_decimation_matches_python(spark):
    rows = all_queries()["q_multimodal_framesample"](spark, SF_SMOKE).collect()
    FRAME, EVERY = 16, 4
    want = {}
    for d in load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect():
        blob = d.text.encode("utf-8")
        for i in range(0, len(blob) // FRAME, EVERY):
            frame = blob[i * FRAME:(i + 1) * FRAME]
            want[(d.doc_id, i)] = (frame.hex().upper(), len(frame))
    got = {(r.doc_id, r.frame_idx): (r.frame_hex, r.frame_bytes) for r in rows}
    assert got == want
    assert all(idx % EVERY == 0 for _, idx in got)  # only sampled frames exist


def test_wordcount_and_lang_stats_match_counter(spark):
    wc = {r.word: r.cnt for r in all_queries()["q_text_tokens_wordcount"](spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text", "n_chars", "lang", "source").collect()
    want = Counter(w for d in docs for w in d.text.split(" "))
    assert wc == dict(want)

    ls = {(r.lang, r.source): r for r in all_queries()["q_text_lang_stats"](spark, SF_SMOKE).collect()}
    cells: dict = {}
    for d in docs:
        c = cells.setdefault((d.lang, d.source), {"n": 0, "chars": 0, "texts": set()})
        c["n"] += 1
        c["chars"] += d.n_chars
        c["texts"].add(d.text)
    assert set(ls) == set(cells)
    for key, c in cells.items():
        r = ls[key]
        assert r.n_docs == c["n"]
        assert r.total_chars == c["chars"]
        assert r.avg_chars == math.floor(c["chars"] / c["n"] * 100 + 0.5) / 100
        assert r.n_distinct_texts == len(c["texts"])


def test_rank_dense_semantics_match_python(spark):
    rows = all_queries()["q_win_rank_dense"](spark, SF_SMOKE).collect()
    parts = load(spark, SF_SMOKE, "part").select("p_brand", "p_partkey", "p_size").collect()
    by_brand: dict = {}
    for p in parts:
        by_brand.setdefault(p.p_brand, []).append((p.p_size, p.p_partkey))
    want = {}
    for brand, items in by_brand.items():
        items.sort()
        sizes = sorted({s for s, _ in items})
        dense = {s: i + 1 for i, s in enumerate(sizes)}
        # rank() over (size, key) is gapless here because the composite is
        # unique — position in the sorted order; dense_rank ignores key
        for pos, (size, key) in enumerate(items, 1):
            want[(brand, key)] = (pos, dense[size])
    got = {(r.p_brand, r.p_partkey): (r.rk, r.drk) for r in rows}
    assert got == want
    # the fixture has at least one brand where rank != dense_rank
    assert any(g[0] != g[1] for g in got.values())


def test_canonicalization_contract_engine_parity(spark):
    """Direct pin of the r10 text-canonicalization contract (README
    §Round-10; canon_text/canon_sql in llm/dedup.py): on a crafted set
    of hazard strings, the Spark fold, the DuckDB fold, and a pure-
    Python reference must produce identical canonical forms — and the
    merge/no-merge decisions must match: ASCII case variants MERGE,
    the precomposed-Istanbul vs 'i'+U+0307 pair does NOT (full lower()
    merges it in Java but not in utf8proc — the divergence the
    contract exists to kill; proven live on the sweep fixture:
    lower()-keyed distinct digests 500 Spark vs 510 DuckDB, contract
    510 == 510)."""
    import duckdb

    from pyspark.sql import functions as F

    from wikidata2pg_spark.llm.dedup import canon_sql, canon_text

    hazard = [
        "  Hello World  ",          # trim + ASCII fold
        "hello world",              # must merge with the above
        "İstanbul FOO",             # U+0130 preserved, FOO folds
        "i\u0307stanbul foo",  # must NOT merge (explicit escape -- never
                                    # paste combining marks)
        "STRASSE", "strasse",       # merge (plain ASCII)
        "Straße",                   # ß untouched (no full-map SS)
        "CAFÉ bar",            # É is non-ASCII: preserved
        "café bar",            # therefore does NOT merge with ^
        "cafe\u0301 x", "CAFE\u0301 X",  # NFD pair: ASCII parts fold -> merge
    ]
    # pure-Python reference: strip ASCII-space trim twin + a-z map only
    table = {ord(c): ord(c) + 32 for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}
    want = [s.strip(" ").translate(table) for s in hazard]

    sdf = spark.createDataFrame([(s,) for s in hazard], "t string")
    got_spark = [r.c for r in sdf.select(canon_text(F.col("t")).alias("c")).collect()]
    assert got_spark == want

    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {canon_sql('?')}", [s]).fetchone()[0] for s in hazard
    ]
    assert got_duck == want

    canon = dict(zip(hazard, want))
    assert canon["  Hello World  "] == canon["hello world"]
    assert canon["STRASSE"] == canon["strasse"]
    assert canon["cafe\u0301 x"] == canon["CAFE\u0301 X"]
    assert canon["İstanbul FOO"] != canon["i\u0307stanbul foo"]
    assert canon["CAFÉ bar"] != canon["café bar"]
    assert canon["Straße"] == "straße"
