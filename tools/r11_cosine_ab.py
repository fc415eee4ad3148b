"""r11 cosine_topk A/B (VERDICT r10 task 2): pinned same-window comparison
of the committed blocked-cogroup kernel against candidate variants, under
the bench primary-pass confs (AQE off, shuffle.partitions=8) at the bench
SF. Each variant is proven row-identical to the committed query before its
timing counts. Median of --reps per variant, variants interleaved
round-robin so a contention drift hits all of them equally.

Variants:
  v0_base      committed kernel (per-row Python loop: np.partition +
               lexsort per query row)
  v1_argsort   vectorized kernel: corpus sorted by neighbor_id once per
               cell, then ONE stable argsort over the whole sims matrix
               (ties resolve to neighbor_id asc exactly like the loop)
  v2_blocks    v1 + asymmetric grid (fewer corpus blocks: CB=2) — halves
               the window input (n*CB*k rows) and the qside replication
  v3_batch     v1 + arrow maxRecordsPerBatch 65536 (boundary chunking)

Usage: python tools/r11_cosine_ab.py [--sf /root/testdata/sf0.1] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def v1_cell_topk_kernel(k: int, id_col: str = "vec_id"):
    from wikidata2pg_spark.llm.similarity import _norm_mats

    def cell_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "neighbor_id": pd.Series(dtype="int64"),
                                 "sim": pd.Series(dtype="float64")})
        qids, qm, cids, cm = _norm_mats(left, right)
        order = np.argsort(cids, kind="stable")
        cids, cm = cids[order], cm[order]
        sims = qm @ cm.T
        sims[qids[:, None] == cids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(len(qids)), kk)
        cols = idx.ravel()
        simv = sims[rows, cols]
        keep = np.isfinite(simv)
        return pd.DataFrame({
            id_col: qids[rows[keep]],
            "neighbor_id": cids[cols[keep]],
            "sim": simv[keep],
        })

    return cell_topk


def build_variant(spark, sf_dir: str, kernel_factory, qb: int, cb: int):
    from wikidata2pg_spark.llm.similarity import _blocked_cogroup, _global_topk

    local = _blocked_cogroup(spark, sf_dir, qb, cb).applyInPandas(
        kernel_factory(5), "vec_id BIGINT, neighbor_id BIGINT, sim DOUBLE"
    )
    return _global_topk(local, 5)


def rows_equal(a, b) -> bool:
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    return ra == rb


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from wikidata2pg_spark.llm.similarity import (
        _cell_topk_kernel,
        _derived_blocks,
        q_sim_cosine_topk,
    )
    from wikidata2pg_spark.session import get_session

    spark = get_session("r11-cosine-ab")
    # bench primary-pass posture (the row under optimization)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    blocks = _derived_blocks(a.sf)
    base = q_sim_cosine_topk(spark, a.sf)
    variants: dict[str, tuple] = {
        "v0_base": (lambda: build_variant(spark, a.sf, _cell_topk_kernel, blocks, blocks), None),
        "v1_argsort": (lambda: build_variant(spark, a.sf, v1_cell_topk_kernel, blocks, blocks), None),
        "v2_blocks": (lambda: build_variant(spark, a.sf, v1_cell_topk_kernel, blocks, 2), None),
        "v3_batch": (
            lambda: build_variant(spark, a.sf, v1_cell_topk_kernel, blocks, blocks),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "65536"),
        ),
    }

    # correctness first: every variant row-identical to the committed query
    for name, (builder, conf) in variants.items():
        if conf:
            spark.conf.set(*conf)
        ok = rows_equal(base, builder())
        if conf:
            spark.conf.unset(conf[0])
        print(f"{name}\trows_equal={ok}", flush=True)
        if not ok:
            return 1

    # interleaved timing: one warm rep each, then --reps timed rounds
    dfs = {}
    for name, (builder, conf) in variants.items():
        dfs[name] = builder()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for rep in range(a.reps + 1):
        for name, (builder, conf) in variants.items():
            if conf:
                spark.conf.set(*conf)
            spark.sparkContext.setJobDescription(f"cosine-ab {name} rep{rep}")
            t0 = time.perf_counter()
            dfs[name].write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            if conf:
                spark.conf.unset(conf[0])
            if rep > 0:  # rep 0 is warmup
                samples[name].append(dt)
    for name, xs in samples.items():
        print(f"{name}\tmedian={statistics.median(xs):.4f}s\tall={[round(x,4) for x in xs]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
