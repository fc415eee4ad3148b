"""Crafted-fixture boundary probes, batch 2: the dedup digest's
lower(trim()) normalization (the fixture has ZERO pairs differing only
in case/whitespace — the normalization is dead weight on real data until
it isn't) and the chunker's stride arithmetic at exact multiples (the
ceil(n/stride) count, the overlap-only trailing chunk, and the
single-token tail)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wikidata2pg_spark.registry import all_queries


def _docs_dir(tmp_path_factory, name, texts):
    tbl = pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["src0"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    root = tmp_path_factory.mktemp(name)
    pq.write_table(tbl, str(root / "documents.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def norm_dir(tmp_path_factory):
    return _docs_dir(tmp_path_factory, "norm_dups", [
        "the quick brown fox",        # doc 1 — canonical (min doc_id)
        "  the quick brown fox  ",    # doc 2 — trim-equal
        "The Quick Brown FOX",        # doc 3 — case-equal
        "the quick brown  fox",       # doc 4 — INNER whitespace differs: distinct
        "something else entirely",    # doc 5 — distinct
    ])


def test_dedup_exact_normalization_groups(spark, norm_dir):
    rows = {r.keeper_doc_id: r.n_copies
            for r in all_queries()["q_dedup_exact"](spark, norm_dir).collect()}
    # trim+lower fold docs 1-3 into one digest with the MIN id as keeper;
    # inner whitespace is NOT normalized (doc 4 stays its own group)
    assert rows == {1: 3, 4: 1, 5: 1}


@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    def words(n):
        return " ".join(f"w{i}" for i in range(n))
    # token counts around the W=32 / stride=24 arithmetic
    return _docs_dir(tmp_path_factory, "chunk_edges", [
        words(23),   # doc 1: < stride  -> 1 chunk of 23
        words(24),   # doc 2: == stride -> 1 chunk of 24
        words(25),   # doc 3: stride+1  -> 2 chunks: 25, 1
        words(32),   # doc 4: == window -> 2 chunks: 32, then the 8-token
                     #        tail that is PURE overlap of chunk 0
        words(48),   # doc 5: 2 full strides -> 2 chunks: 32, 24
    ])


def test_chunk_stride_boundaries(spark, chunk_dir):
    out = {}
    for r in all_queries()["q_text_chunk"](spark, chunk_dir).collect():
        out.setdefault(r.doc_id, {})[r.chunk_idx] = (r.n_chunk_toks, r.chunk_text)
    sizes = {d: {i: v[0] for i, v in m.items()} for d, m in out.items()}
    assert sizes == {
        1: {0: 23},
        2: {0: 24},
        3: {0: 25, 1: 1},
        4: {0: 32, 1: 8},
        5: {0: 32, 1: 24},
    }
    # stride semantics: chunk i starts at token i*24; the doc-4 tail is
    # exactly the last 8 tokens, already present at the end of chunk 0
    assert out[4][1][1] == " ".join(f"w{i}" for i in range(24, 32))
    assert out[4][0][1].endswith(out[4][1][1])
    # doc 3's second chunk is the single straggler token
    assert out[3][1][1] == "w24"
    # reconstruction: stride-24 prefixes of each chunk re-concatenate to
    # the original text (the property a training-sample packer relies on)
    for d, n in ((1, 23), (2, 24), (3, 25), (4, 32), (5, 48)):
        toks = []
        for i in sorted(out[d]):
            toks.extend(out[d][i][1].split(" ")[:24])
        assert toks == [f"w{i}" for i in range(n)], d
