"""Crafted-fixture boundary probes, batch 4 — the branch-liveness audit
findings: at sf0.01 q_except returns EMPTY (a hash match over zero rows
attests nothing), q_text_decontaminate flags nothing, q_text_repetition
fails nothing, and q_dedup_incremental emits a single status. Each
registered key runs here on a table crafted to light every branch and
its edge: EXCEPT's set-dedup and both-sides exclusion, the 8-gram
contamination hit vs the 7-gram near-miss vs the gramless short doc,
the exact-0.2 repetition share under the strict '<', and the
dup_corpus > dup_batch precedence."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_boundary_probes2 import _docs_dir
from wikidata2pg_spark.registry import all_queries


@pytest.fixture(scope="module")
def part_dir(tmp_path_factory):
    rows = [  # (key, brand, size)
        (1, "BrandA", 30),            # big only            -> survives
        (2, "BrandB", 30), (3, "BrandB", 5),   # both sides -> excluded
        (4, "BrandC", 5),             # small only          -> never in big
        (5, "BrandD", 40), (6, "BrandD", 50),  # twice big   -> ONE row (set)
        (7, "BrandE", 15),            # middle sizes in neither side
    ]
    tbl = pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_name": pa.array([f"part {r[0]}" for r in rows], pa.string()),
        "p_brand": pa.array([r[1] for r in rows], pa.string()),
        "p_type": pa.array(["STANDARD"] * len(rows), pa.string()),
        "p_size": pa.array([r[2] for r in rows], pa.int32()),
        "p_retailprice": pa.array([100.0 + r[0] for r in rows], pa.float64()),
    })
    root = tmp_path_factory.mktemp("except_parts")
    pq.write_table(tbl, str(root / "part.parquet"))
    return str(root)


def test_except_set_semantics_on_crafted_parts(spark, part_dir):
    got = sorted(r.b for r in all_queries()["q_except"](spark, part_dir).collect())
    # BrandB is in both sides (excluded), BrandD deduped to one row
    assert got == ["BrandA", "BrandD"]


@pytest.fixture(scope="module")
def incr_dir(tmp_path_factory):
    texts = {
        1: "corpus document one",
        2: "corpus document two",
        3: "corpus document three",
        5: "corpus document one",      # batch dup of corpus -> dup_corpus
        10: "batch only text alpha",   # batch-internal pair: min id ...
        15: "batch only text alpha",   # ... is new, the other dup_batch
        20: "unique batch text",       # -> new
        25: "corpus document two",     # batch pair ALSO in corpus: BOTH
        30: "corpus document two",     # dup_corpus (precedence over batch)
    }
    ids = sorted(texts)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["src0"] * len(ids), pa.string()),
        "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
    })
    root = tmp_path_factory.mktemp("incr_dedup")
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


def test_dedup_incremental_status_branches(spark, incr_dir):
    got = {r.doc_id: r.status
           for r in all_queries()["q_dedup_incremental"](spark, incr_dir).collect()}
    assert got == {
        5: "dup_corpus",
        10: "new", 15: "dup_batch",
        20: "new",
        25: "dup_corpus", 30: "dup_corpus",  # corpus hit outranks batch dup
    }


@pytest.fixture(scope="module")
def decon_dir(tmp_path_factory):
    bench = " ".join(f"e{i}" for i in range(8)) + " filler tail"   # doc 97
    texts = [
        "prefix " + " ".join(f"e{i}" for i in range(8)) + " suffix",  # 1: full 8-gram hit
        " ".join(f"e{i}" for i in range(1, 8)) + " other words here", # 2: only 7 shared
        "completely unrelated training document text right here now",  # 3: clean, 8 tokens
        "short doc",                                                  # 4: < 8 tokens
    ]
    # doc_ids 1-4 train; 97 is the %97 pseudo-benchmark
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 97], pa.int64()),
        "text": pa.array(texts + [bench], pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["src0"] * 5, pa.string()),
        "n_chars": pa.array([len(t) for t in texts + [bench]], pa.int64()),
    })
    root = tmp_path_factory.mktemp("decon")
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


def test_decontaminate_8gram_hit_and_near_miss(spark, decon_dir):
    got = {r.doc_id: (r.n_shared_grams, r.is_contaminated)
           for r in all_queries()["q_text_decontaminate"](spark, decon_dir).collect()}
    assert got[1] == (1, True)    # the verbatim 8-gram contaminates
    assert got[2] == (0, False)   # a 7-token overlap does NOT
    assert got[3] == (0, False)
    # a doc with < 8 tokens yields no grams and is absent from the output
    # (the pipeline composing this key must not treat absence as clean
    # silently — pinned here so the contract is explicit)
    assert 4 not in got
    assert 97 not in got          # the benchmark itself is excluded


def test_repetition_gate_exact_threshold(spark, tmp_path_factory):
    root = _docs_dir(tmp_path_factory, "repet", [
        "spam spam spam spam spam spam",       # 1: one bigram 5x -> share 1.0
        "w1 w2 w3 w4 w5 w6",                   # 2: 5 distinct bigrams -> share exactly 0.2
        " ".join(f"t{i}" for i in range(12)),  # 3: 11 distinct -> share < 0.2 passes
    ])
    got = {r.doc_id: r for r in all_queries()["q_text_repetition"](spark, root).collect()}
    assert got[1].top_bigram_share == 1.0 and got[1].passes_repetition is False
    # strict '<': a share of exactly 0.2 FAILS the gate
    assert got[2].top_bigram_share == 0.2 and got[2].passes_repetition is False
    assert got[3].passes_repetition is True
