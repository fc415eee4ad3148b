"""Duplicate-mass sweep — STANDING GATE since r10 (pytest twin:
tests/test_degenerate_sweep.py::test_duplicate_mass_sweep; this CLI is
the convenience runner).

The driver fixture has ZERO exact-duplicate document texts and no hot
keys (verified r7: "documents has ZERO case/whitespace-only dup
pairs"), so the dedup family's actual MERGE paths — keeper selection,
n_copies > 1, shared minhash/simhash buckets, incremental
corpus-vs-batch hits — and tie-heavy ranking paths run nearly
unexercised by every fixture-driven check. A real 100 TB crawl is the
opposite shape: duplicate mass is the norm (boilerplate pages, mirror
sites, reposts) and a few hot keys own a large share of events.

This sweep injects both shapes into the REAL sf0.001 fixture and runs
the full engine-vs-oracle sweep over all registered keys:

  * documents: every 10th text re-appears as 3 EXACT copies (new
    doc_ids), plus a whitespace-padded variant and an ASCII-case
    variant (both must merge with the original under the
    canonicalization contract — trim + ASCII-only fold), plus a
    one-token-appended near-duplicate (minhash/simhash candidate mass).
  * events: one hot user (the smallest user_id) is amplified 20x with
    cloned rows at new event_ids — same ts/value/type — so groupBy
    skew, per-user windows with heavy ties, and sessionization see a
    genuinely hot key.

Uniqueness invariants (FIXTURES rule 2) are preserved: all new rows
get fresh doc_id/event_id beyond the existing range, so window
tiebreakers stay collision-free.

First run (r10 close): **0 spark / 0 duck / 0 mismatch** — every
registered key holds exact cross-engine parity under duplicate mass
and hot-key skew. That is the direct payoff of three standing repo
conventions: unique-id tiebreakers on every ranking window, the
shared canonicalization contract, and aggregate-ignores-NULL order
statistics. Promoted to a standing gate immediately (the promotion
discipline waits for the catalog to EMPTY; a clean first run is an
empty catalog).

Usage:
    python tools/duplicate_sweep.py   # exit 0 clean, 1 on any finding
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"

# ASCII-only case map — the canonicalization contract's Python twin
# (never str.upper(): full Unicode mapping is exactly what the
# contract forbids).
_ASCII_UP = str.maketrans(
    "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
)

HOT_USER_FACTOR = 20


def build_duplicate_dir(root: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{root}/{t}.parquet")

    # documents: exact copies + contract-mergeable variants + near-dups
    dt = pq.read_table(f"{SRC}/documents.parquet")
    rows = dt.to_pylist()
    next_id = max(r["doc_id"] for r in rows) + 1
    extra = []
    for i in range(0, len(rows), 10):
        src_row = rows[i]
        if src_row["text"] is None:
            continue
        variants = [
            src_row["text"],                       # exact copy x3
            src_row["text"],
            src_row["text"],
            "  " + src_row["text"] + " ",          # trim-mergeable
            src_row["text"].translate(_ASCII_UP),  # fold-mergeable
            src_row["text"] + " neardup",          # near-duplicate
        ]
        for v in variants:
            nr = dict(src_row)
            nr["doc_id"], next_id = next_id, next_id + 1
            nr["text"] = v
            extra.append(nr)
    assert extra
    pq.write_table(
        pa.Table.from_pylist(rows + extra, schema=dt.schema),
        f"{root}/documents.parquet",
    )

    # events: amplify one hot user with cloned rows at fresh event_ids
    et = pq.read_table(f"{SRC}/events.parquet")
    erows = et.to_pylist()
    hot = min(r["user_id"] for r in erows if r["user_id"] is not None)
    next_eid = max(r["event_id"] for r in erows) + 1
    eextra = []
    for r in erows:
        if r["user_id"] != hot:
            continue
        for _ in range(HOT_USER_FACTOR - 1):
            nr = dict(r)
            nr["event_id"], next_eid = next_eid, next_eid + 1
            eextra.append(nr)
    assert eextra
    pq.write_table(
        pa.Table.from_pylist(erows + eextra, schema=et.schema),
        f"{root}/events.parquet",
    )
    return root


def main() -> int:
    from wikidata2pg_spark.degenerate_audit import run_sweep
    from wikidata2pg_spark.session import get_session

    root = build_duplicate_dir("/tmp/wikidata2pg_spark/dup_fixture")
    spark = get_session("duplicate-sweep")
    se, de, mm = run_sweep(spark, root)
    for label, items in (("spark-crash", se), ("duck-crash", de), ("mismatch", mm)):
        for k, msg in items:
            print(f"{label} {k}: {msg[:250]}")
    print(f"-- duplicate sweep: {len(se)} spark / {len(de)} duck / {len(mm)} mismatch")
    return 1 if (se or de or mm) else 0


if __name__ == "__main__":
    sys.exit(main())
