"""Unicode text sweep — STANDING GATE since r10 (pytest twin:
tests/test_degenerate_sweep.py::test_unicode_text_sweep; this CLI is
the convenience runner).

Injects non-ASCII content into the REAL sf0.001 documents.text
(precomposed + GENUINELY-decomposed combining accents, CJK,
astral-plane emoji, Turkish dotted capital I, full-width forms, sharp
s, Greek, RTL Hebrew) and runs the full engine-vs-oracle sweep. The
negative/extreme sweeps' text sibling: the driver fixture's documents
are 100% ASCII, so the text/dedup families' behavior on real
multilingual bytes was never exercised. Probes the classic
cross-engine hazard pair: Spark's Java string tables (FULL case
mappings, 1->2 codepoints) vs DuckDB's utf8proc (SIMPLE 1->1 mappings)
and Java regex vs RE2.

Catalog: EMPTY (steady state 0 crashes / 0 mismatches). History — the
first run (r9 close) found 0 Spark crashes / 2 DuckDB crashes /
1 mismatch, all on r3-attested keys, all fixed tier-A in r10:

  * q_multimodal_binary + q_multimodal_decode (DuckDB crash:
    "Invalid byte encountered in STRING -> BLOB conversion") — the
    oracles built payload blobs with text::BLOB, which DuckDB rejects
    for non-ASCII bytes. Fixed: encode(text) (DuckDB's STRING->BLOB
    UTF-8 encoder); Spark-side F.encode(text, 'UTF-8') was already
    byte-identical. Same family as the r8 pg_copy text::bytea gotcha.
  * q_dedup_exact (100/500 rows hash-mismatch, EXACTLY the rows whose
    injected tokens contain 'İstanbul') — the canonicalization
    lower(trim(text)) diverges on U+0130: Java's FULL mapping gives
    'i' + U+0307 (two codepoints, dot preserved) while utf8proc's
    SIMPLE mapping gives plain 'i', so the sha256 digests differed and
    the dedup clustered differently. Fixed: the engine-portable
    canonicalization contract — ASCII-only case folding via
    translate('A'..'Z' -> 'a'..'z') on BOTH sides (README documents
    it as a product guarantee). Never "fix" by matching DuckDB's
    simple mapping Spark-side — Java has no such primitive and a UDF
    would put a Python hop in the dedup hot path.

The r9 run's NFD token was byte-identical to the NFC one (editor
round-trip — ADVICE r9); since the explicit "cafe\\u0301" escape landed
the decomposed class genuinely runs, and still holds: both engines are
normalization-PRESERVING (neither NFC-folds), so NFC and NFD rows hash
apart consistently in both.

Since r10 the fixture also carries case-variant DUPLICATE pairs (see
build_unicode_dir) so digest-keyed keys where the digest is only a
partition key exercise real merges. Trap proven live: keying the
digest on lower(trim(text)) over this fixture yields 500 distinct
digests in Spark vs 510 in DuckDB (Java's FULL lower() merges the 10
precomposed-İ/'i'+U+0307 pairs, utf8proc's SIMPLE lower() does not);
the contract fold agrees 510 == 510, with the 10 ASCII-case pairs
merging identically in both. Direct pytest pin:
tests/test_llm_pins2.py::test_canonicalization_contract_engine_parity. Everything else — tokenizers (regexp \\w
splits), TF-IDF, n-grams, language stats, line dedup, simhash/minhash,
Zipf/entropy keys, text quality/burstiness, the whole wikidata family —
held hash-identical on multilingual bytes: Java regex and RE2 agree on
the ASCII \\w class, and length() counts codepoints identically in both
engines (emoji included).

Usage:
    python tools/unicode_sweep.py   # exit 0 clean, 1 on any finding
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"

# Deterministic per-row injection tokens — each a distinct hazard class.
TOKENS = [
    "café",            # precomposed accent (NFC, U+00E9)
    # combining accent (NFD) — same glyphs as the NFC token, different
    # bytes. MUST be the explicit e + U+0301 escape: a literal pasted
    # glyph silently round-trips to NFC in most editors (the r9 version
    # of this line was byte-identical to the NFC token above, so the
    # NFD hazard class never actually ran — ADVICE r9 finding).
    "cafe\u0301",
    "naïve",
    "中文分词测试",      # CJK, no word separators
    "😀🚀",            # astral-plane emoji (surrogate pairs in UTF-16)
    "İstanbul",        # U+0130: FULL vs SIMPLE lowercase divergence
    "ＦＵＬＬ１２３",    # full-width forms
    "Straße",          # sharp s
    "Ωμέγα",           # Greek
    "עברית",           # RTL Hebrew
]


# ASCII-only uppercase map (str.translate twin of the engines' fold —
# NEVER str.upper(), whose full Unicode mapping turns ß into SS etc.)
_ASCII_UP = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def build_unicode_dir(root: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{root}/{t}.parquet")
    tb = pq.read_table(f"{SRC}/documents.parquet")
    rows = tb.to_pylist()
    for i, r in enumerate(rows):
        if r["text"] is None:
            continue
        tok = TOKENS[i % len(TOKENS)]
        tok2 = TOKENS[(i * 3 + 1) % len(TOKENS)]
        r["text"] = f"{tok} {r['text']} {tok2}"
    # Case-variant DUPLICATE pairs (r10, /code-review gap): the token
    # injection above makes every text DISTINCT, so in keys where the
    # digest is only a partition key (q_corpus_clean,
    # q_pipeline_pretraining, q_dedup_incremental, the streaming clean)
    # no pair ever merges and a divergent canonicalization is invisible
    # to the sweep — exactly how the lower(trim()) residue survived r9.
    # For each İstanbul-carrying row (i ≡ 5 mod 50) append two variants:
    #   * an ASCII-case variant — must MERGE with its original under the
    #     ASCII-fold contract in BOTH engines (positive merge coverage);
    #   * a precomposed-İ -> 'i'+U+0307 respelling — merges under Java's
    #     FULL lower() but NOT utf8proc's SIMPLE lower(), so any key
    #     still digest-keyed on lower() mismatches here; under the
    #     contract neither engine merges it (non-ASCII bytes verbatim).
    extra = []
    next_id = max(r["doc_id"] for r in rows) + 1
    for i in range(5, len(rows), 50):
        src_row = rows[i]
        if src_row["text"] is None or "İstanbul" not in src_row["text"]:
            continue
        up = dict(src_row)
        up["doc_id"], next_id = next_id, next_id + 1
        up["text"] = src_row["text"].translate(_ASCII_UP)
        dotted = dict(src_row)
        dotted["doc_id"], next_id = next_id, next_id + 1
        dotted["text"] = src_row["text"].replace("İstanbul", "i\u0307stanbul")
        extra.extend((up, dotted))
    assert extra, "sweep fixture lost its İstanbul rows — pair coverage dead"
    pq.write_table(
        pa.Table.from_pylist(rows + extra, schema=tb.schema),
        f"{root}/documents.parquet",
    )
    return root


def main() -> int:
    from wikidata2pg_spark.degenerate_audit import run_sweep
    from wikidata2pg_spark.session import get_session

    root = build_unicode_dir("/tmp/wikidata2pg_spark/uni_fixture")
    spark = get_session("unicode-sweep")
    se, de, mm = run_sweep(spark, root)
    for label, items in (("spark-crash", se), ("duck-crash", de), ("mismatch", mm)):
        for k, msg in items:
            print(f"{label} {k}: {msg[:250]}")
    print(f"-- unicode sweep: {len(se)} spark / {len(de)} duck / {len(mm)} mismatch")
    # standing gate (r10): a hand-run regression must fail the shell too
    return 1 if (se or de or mm) else 0


if __name__ == "__main__":
    sys.exit(main())
