"""Partition-invariance gate: every fixture parquet is a SINGLE row group /
single file, so the whole correctness suite normally runs with one scan task
per table — which can mask partition-boundary bugs (window frames, as-of
ordering, per-group top-k, dedup keepers, streaming batch splits) that only
appear when the input arrives split across many tasks.

This harness rewrites the sf0.001 fixtures as 7-file directory tables
(pyarrow slicing — byte-identical schemas, just physically split), then runs
the full DuckDB mirror for a partition-sensitive subset of keys against the
multi-file layout. Identical results across layouts is exactly the
"would this survive 100x more partitions" invariant the single-file fixtures
cannot test.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

N_FILES = 7

# Partition-sensitive keys: ordering inside windows, as-of matching, grouped
# top-k, dedup keeper selection, interval building, set ops, and the blocked
# cosine kernel (cells now span many input splits).
KEYS = [
    "q_win_row_number",
    "q_win_lag_lead",
    "q_win_moving_rows",
    "q_win_range_frame",
    "q_win_cumsum",
    "q_win_first_last",
    "q_join_asof",
    "q_topk_global",
    "q_topk_per_group",
    "q_agg_collect_sorted",
    "q_agg_rollup",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_semantic_cluster",
    "q_scd2_intervals",
    "q_time_gapfill",
    "q_time_multirollup",
    "q_sim_cosine_topk",
    "q_vec_quantize",
    "q_text_tfidf",
    "q_union_distinct",
    "q_except",
    "q_sample_hash",
    "q_corpus_clean",
    "q_text_chunk",
    "q_text_decontaminate",
    "q_text_repetition",
    "q_text_pii_scrub",
    "q_pack_sequences",  # two-pass prefix sum must match at any split count
    "q_win_ntile_distributed",  # two-pass global rank, same invariant
    "q_win_percent_rank_distributed",
    "q_time_sessionize_batch",  # lag/cumsum session ids must not depend on splits
    "q_win_count_distinct",  # two-window rewrite must not depend on splits
    "q_graph_copurchase",
    "q_graph_pagerank",  # iterative ranks must converge identically per split
    "q_wd_subclass_closure",  # frontier iteration over an in-memory dump: split-free but cheap to pin
    "q_join_spatial_grid",  # grid replication must cover pairs at any split
    "q_agg_bucketize_equidepth",  # percentile cutpoints must not depend on splits
    "q_dedup_url_canonical",
    "q_pipeline_pretraining",  # composed pipeline: prefix sum + dedup window at any split
    "q_win_moving_median",  # frame contents fixed by (ts, event_id) order at any split
    "q_scan_binaryfile",  # derived blobs built from a sorted collect: split-independent
    "q_stream_corpus_clean",  # digest-projected sink: arrival-order-free at any split
    "q_graph_triangles",
    "q_sim_query_topk",  # query replication must reach every corpus block
    "q_dedup_incremental",  # corpus/batch split + keeper choice at any split
    "q_text_line_dedup",  # global first-occurrence keep at any split
    "q_funnel_conversion",  # chained stage windows must not depend on splits
    "q_agg_mad",  # two exact percentile passes at any split count
    "q_agg_gini",  # per-group rank moments at any split count
    "q_time_ewma",  # frame-ordered fold must not depend on splits
    "q_agg_weighted_median",  # prefix weights at any split count
    "q_except_all",  # bag multiplicities at any split count
    "q_intersect_all",
    "q_agg_bitmap_distinct",  # bitmap_or_agg merge at any split count
    "q_time_ohlc",  # first/last selection at any split count
    "q_sample_balanced",  # hash-rank take-k at any split count
    "q_time_streaks",  # dense-grouping rank trick at any split count
    "q_join_asof_tolerance",  # asof window + tolerance at any split count
    "q_sink_zorder",  # dim min/max + morton layout derived from split scans
    "q_sink_compact",  # footer-derived output count over a split input
    "q_scan_schema_evolution",  # merged footer schema across split files
    # r6 additions: the clustering family's whole point is split-exact
    # integer accumulation — prove it on a split layout, not just
    # .repartition(7) (test_kernels pins that form)
    "q_cluster_kmeans",
    "q_vec_pq_adc",
    "q_pipeline_neardup",  # prefix join + label prop at any split
    "q_text_bm25",  # df/N/avgdl stats from split scans
    "q_sample_token_budget",  # per-lang running sum at any split
    # r6 TPC-H/stats additions
    "q_sql_tpch_q1",  # exact-integer partial sums at any split
    "q_sql_tpch_q13",  # left-join zero groups survive any split
    "q_sql_tpch_q15",  # checkpointed max + integer tie at any split
    "q_sql_tpch_q17",  # per-part window (not self-join) at any split
    "q_time_decompose",  # calendar-RANGE trend over collapsed series
    "q_agg_bootstrap_ci",  # md5 resampling weights are row-local
    "q_retrieval_ndcg",  # rank tie-breaks at any split
    "q_vec_truncation_fidelity",  # two rankings + overlap at any split
    "q_win_cume_dist_nth",  # cume_dist peers + full-frame nth at any split
    "q_time_changepoint",  # global prefix sum + argmax at any split
    "q_join_null_safe",  # NULL-key matching at any split
    "q_stream_windowed_topk",  # stream agg + serve rank at any batching
    "q_time_hampel",  # centered window frames at any split
    "q_agg_trimmed_mean",  # rank-band membership at any split
    "q_win_skyline",  # two-pass dominance frames at any split (r7 rewrite)
    "q_win_concurrency",  # global_cumsum sweep line at any split (r7)
    "q_text_vocab_growth",  # global_cumsum growth curves at any split (r7)
    # r6 final-session additions
    "q_time_mann_kendall",  # pairwise S over the collapsed monthly series
    "q_time_control_chart",  # global lag + 1-row moments at any split
    "q_win_rolling_corr",  # RANGE frame over collapsed daily series
    "q_text_vocab_richness",  # trigram f1/f2 counts at any split
    "q_text_jsd_sources",  # dense grid + ordered folds at any split
    "q_retrieval_mrr",  # two rankings + gold join at any split
    "q_multimodal_image_tiles",  # per-row explode, split-local
    "q_time_strength",  # checkpointed series + ordered folds
    "q_agg_hodges_lehmann",  # Walsh-pair order statistics at any split
    "q_dq_freshness",  # broadcast frontier + conditional counts
    "q_pipeline_multimodal",  # content-keyed patch dedup at any split
    "q_time_ljung_box",  # integer-cleared lag products at any split
    "q_time_extreme_value",  # block maxima + 1-row moments at any split
    "q_text_hill_tail",  # global top-k order statistics at any split
    "q_text_bigram_entropy",  # bigram cells + ordered folds at any split
]


@pytest.fixture(scope="module")
def multi_dir(tmp_path_factory):
    from wikidata2pg_spark.util import split_fixture_tables

    root = tmp_path_factory.mktemp("sf_multifile")
    split_fixture_tables(SF_SMOKE, str(root), N_FILES)
    return str(root)


def test_mirror_passes_on_multifile_layout(spark, multi_dir):
    from wikidata2pg_spark.oracle import run_mirror

    results = run_mirror(spark, multi_dir, KEYS)
    failures = {k: v for k, v in results.items() if v}
    assert not failures, f"partition-variant results: {failures}"
    assert set(results) == set(KEYS)


def test_multifile_scan_is_actually_parallel(spark, multi_dir):
    """Sanity: the rewritten layout really produces multiple input splits
    (otherwise the invariance test proves nothing)."""
    df = spark.read.parquet(f"{multi_dir}/lineitem.parquet")
    assert df.rdd.getNumPartitions() > 1
