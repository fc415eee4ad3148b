"""EXPLORATORY unicode sweep (round 9) — NOT yet a gate.

Injects non-ASCII content into the REAL sf0.001 documents.text
(precomposed + combining accents, CJK, astral-plane emoji, Turkish
dotted capital I, full-width forms, sharp s, Greek, RTL Hebrew) and
runs the full engine-vs-oracle sweep. The negative/extreme sweeps'
text sibling: the driver fixture's documents are 100% ASCII, so the
text/dedup families' behavior on real multilingual bytes was never
exercised. Probes the classic cross-engine hazard pair: Spark's Java
string tables (FULL case mappings, 1->2 codepoints) vs DuckDB's
utf8proc (SIMPLE 1->1 mappings) and Java regex vs RE2.

First run (r9 close): 0 Spark crashes / 2 DuckDB crashes / 1 mismatch —
ALL three on r3-ATTESTED keys, so per the fix-in-window discipline they
are CATALOGED here for tier-A slots in _ROUND10_PRIORITY (do NOT fix
outside a window):

  * q_multimodal_binary + q_multimodal_decode (DuckDB crash:
    "Invalid byte encountered in STRING -> BLOB conversion") — the
    oracles build payload blobs with text::BLOB, which DuckDB rejects
    for non-ASCII bytes. Fix shape: encode(text) (DuckDB's
    STRING->BLOB UTF-8 encoder) in the oracle; Spark-side
    F.encode(text, 'UTF-8') is already byte-identical. Same family as
    the r8 pg_copy text::bytea gotcha.
  * q_dedup_exact (100/500 rows hash-mismatch, EXACTLY the rows whose
    injected tokens contain 'İstanbul') — the canonicalization
    lower(trim(text)) diverges on U+0130: Java's FULL mapping gives
    'i' + U+0307 (two codepoints, dot preserved) while utf8proc's
    SIMPLE mapping gives plain 'i', so the sha256 digests differ and
    the dedup clusters differently. Verified directly:
    duckdb lower('İstanbul') = 'istanbul';
    Python/Java 'İstanbul'.lower() = 'i\\u0307stanbul'.
    Fix shape: make the canonical key engine-portable — ASCII-only
    case folding (translate('A'..'Z' -> 'a'..'z') on both sides, which
    is also what a 100 TB multilingual dedup wants: full Unicode case
    folding is locale-trapped and version-skewed across engines), and
    re-prove tier-A. Never "fix" by matching DuckDB's simple mapping
    Spark-side — Java has no such primitive and a UDF would put a
    Python hop in the dedup hot path.

Everything else — tokenizers (regexp \\w splits), TF-IDF, n-grams,
language stats, line dedup, simhash/minhash, Zipf/entropy keys, text
quality/burstiness, the whole wikidata family — held hash-identical on
multilingual bytes: Java regex and RE2 agree on the ASCII \\w class,
and length() counts codepoints identically in both engines (emoji
included).

Usage:
    python tools/unicode_sweep.py        # prints the catalog, exit 0
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"

# Deterministic per-row injection tokens — each a distinct hazard class.
TOKENS = [
    "café",            # precomposed accent (NFC)
    "café",      # combining accent (NFD) — same glyphs, different bytes
    "naïve",
    "中文分词测试",      # CJK, no word separators
    "😀🚀",            # astral-plane emoji (surrogate pairs in UTF-16)
    "İstanbul",        # U+0130: FULL vs SIMPLE lowercase divergence
    "ＦＵＬＬ１２３",    # full-width forms
    "Straße",          # sharp s
    "Ωμέγα",           # Greek
    "עברית",           # RTL Hebrew
]


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
    cols = {}
    for name in tb.column_names:
        col = tb[name]
        if name == "text":
            out = []
            for i, v in enumerate(col.to_pylist()):
                if v is None:
                    out.append(v)
                    continue
                tok = TOKENS[i % len(TOKENS)]
                tok2 = TOKENS[(i * 3 + 1) % len(TOKENS)]
                out.append(f"{tok} {v} {tok2}")
            col = pa.array(out, pa.string())
        cols[name] = col
    pq.write_table(pa.table(cols), f"{root}/documents.parquet")
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
    return 0  # exploratory: the catalog above is the output, not a gate


if __name__ == "__main__":
    sys.exit(main())
