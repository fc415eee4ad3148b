"""Physical-plan audits (SURVEY §4): the scale story is only real if the
plans show it. Pushdown reaches the scan, dimension joins broadcast,
partition filters prune directories, global top-k avoids a full sort, and
hot-path kernels stay out of Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, SF_T2
from wikidata2pg_spark.tables import load


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    li = load(spark, SF_T2, "lineitem").filter(F.col("l_quantity") >= 25).select("l_orderkey")
    s = li._jdf.queryExecution().toString()
    assert "PushedFilters" in s and "GreaterThanOrEqual(l_quantity,25" in s


def test_column_pruning_reads_only_needed_columns(spark):
    li = load(spark, SF_T2, "lineitem").select("l_orderkey", "l_quantity")
    s = li._jdf.queryExecution().toString()
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in s


def test_broadcast_join_for_dimensions(spark):
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_join_broadcast"](spark, SF_T2)
    assert "BroadcastHashJoin" in _plan(df)


def test_small_join_auto_broadcasts_under_aqe(spark):
    # no explicit hint: nation is far below the broadcast threshold
    c = load(spark, SF_T2, "customer")
    n = load(spark, SF_T2, "nation")
    df = c.join(n, c.c_nationkey == n.n_nationkey).select("c_custkey", "n_name")
    assert "BroadcastHashJoin" in _plan(df)


def test_join3_preagg_plan_and_equivalence(spark):
    """join3_top10's eager-aggregation rewrite: customer broadcasts, the
    top-10 is TakeOrderedAndProject, and the result is identical to the
    direct 3-way-join formulation it replaced."""
    from wikidata2pg_spark.flagship import join3_top10

    df = join3_top10(spark, SF_T2)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan

    c = load(spark, SF_T2, "customer")
    o = load(spark, SF_T2, "orders")
    li = load(spark, SF_T2, "lineitem")
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in direct.collect()]


def test_topk_global_is_take_ordered(spark):
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_topk_global"](spark, SF_T2)
    assert "TakeOrderedAndProject" in _plan(df)


def test_topk_per_group_uses_window_group_limit(spark):
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_topk_per_group"](spark, SF_T2)
    # rank-pushdown: per-partition top-k before the full window sort
    assert "WindowGroupLimit" in _plan(df)


def test_partition_pruning_on_partitioned_sink(spark):
    import hashlib
    import os
    import tempfile

    li = load(spark, SF_T2, "lineitem").select("l_orderkey", "l_returnflag")
    h = hashlib.md5(SF_T2.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "wikidata2pg_spark", h, "prune_audit")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    s = back._jdf.queryExecution().toString()
    assert "PartitionFilters" in s and "l_returnflag" in s.split("PartitionFilters")[1][:200]


def test_agg_is_two_phase_hash(spark):
    li = load(spark, SF_T2, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(df)
    # partial + final HashAggregate pair = map-side combine before shuffle
    assert plan.count("HashAggregate") >= 2


def test_semi_join_stays_semi(spark):
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_join_semi"](spark, SF_T2)
    assert "LeftSemi" in _plan(df)


def test_cosine_kernel_is_arrow_cogroup_only(spark):
    """The ONLY Python boundary in the cosine plan is the Arrow-batched
    cogrouped kernel (FlatMapCoGroupsInPandas) — never row-at-a-time
    Python, and no driver-side collect feeds the plan (the blocked grid is
    built from the embeddings scan itself)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_sim_cosine_topk"](spark, SF_T2)
    plan = _plan(df)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed by the join key: the SortMergeJoin AND the
    join-key aggregation run without any shuffle — the write-once
    pre-partitioning story for repeated big joins."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_join_bucketed"](spark, SF_T2)
    df.collect()  # AQE finalizes the plan on execution
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_minhash_plan_is_pure_jvm(spark):
    """The banded MinHash pipeline is built entirely from codegen'd
    expressions — no Python evaluation node anywhere in the plan."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_dedup_minhash"](spark, SF_T2)
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapCoGroupsInPandas"):
        assert marker not in plan


def test_r10_flagship_rewrites_shapes_and_equivalence(spark):
    """The three r10 optimization rewrites (OPTIMIZATION_r10.md):

    * q1: total order comes from a 1-task local sort of the aggregated
      frame — no rangepartitioning exchange (and no sampling job) for
      single-digit rows;
    * join3: per_order |><| orders is a ShuffledHashJoin (both sides
      ~|orders| rows; sort-merge paid two sorts for nothing);
    * tumbling: group key is the epoch-hour truncation of ts (pure
      unix_micros arithmetic, timezone-independent like F.window
      itself), not the 2-timestamp window struct — equivalence with
      the F.window form is asserted row-for-row here so the rewrite
      can never drift from the windowed semantics it replaced.
    """
    from wikidata2pg_spark.flagship import (
        batch_tumbling,
        join3_top10,
        pricing_summary,
    )

    q1 = _plan(pricing_summary(spark, SF_T2))
    assert "rangepartitioning" not in q1
    # the exact 1-partition funnel, not any coalesce: a regression to
    # coalesce(n>1) would lose the total order (r10 review catch)
    assert "Coalesce 1" in q1

    j3 = _plan(join3_top10(spark, SF_T2))
    assert "ShuffledHashJoin" in j3
    assert "SortMergeJoin" not in j3

    tb = batch_tumbling(spark, SF_T2)
    plan = _plan(tb)
    assert "named_struct" not in plan  # the window struct is gone
    e = load(spark, SF_T2, "events")
    windowed = (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )
    assert sorted(map(tuple, tb.collect())) == sorted(map(tuple, windowed.collect()))


def test_whole_stage_codegen_covers_flagship(spark):
    from wikidata2pg_spark.flagship import pricing_summary

    df = pricing_summary(spark, SF_T2)
    df.collect()  # AQE finalizes the plan only after execution
    plan = _plan(df)
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in plan and "partial_sum" in plan


def test_pii_scrub_is_pure_jvm(spark):
    """PII redaction is a linear codegen scan: regexp_replace /
    regexp_extract_all only — no Python node, no exchange."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_text_pii_scrub"](spark, SF_T2)
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert marker not in plan


def test_quantize_is_pure_jvm(spark):
    """int8 quantization stays in higher-order built-ins — no Python node,
    no shuffle (per-row transform only)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_vec_quantize"](spark, SF_T2)
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Exchange"):
        assert marker not in plan


def test_scd2_single_exchange(spark):
    """SCD-2 shuffles ONCE on the key; both lead() windows share the same
    (partition, order) spec so Catalyst plans one Window over one
    Exchange."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_scd2_intervals"](spark, SF_T2)
    plan = _plan(df)
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_chunking_has_no_shuffle(spark):
    """Chunk expansion (explode over index sequence + slice) happens inside
    the scan task — no Exchange, no Python node."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_text_chunk"](spark, SF_T2)
    plan = _plan(df)
    for marker in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_ntile_distributed_no_full_input_single_task(spark):
    """The distributed global ntile must not funnel the full input through
    one task: the only Exchange SinglePartition in the plan is the P-row
    per-partition-counts aggregate (a HashAggregate sits between it and
    the scan), and the full-data Window is partitioned by pid."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_win_ntile_distributed"](spark, SF_T2)
    plan = _plan(df)
    # Every SinglePartition exchange must sit above an aggregate (P-row
    # offsets, 1-row min/max range) — never above raw data. Since r5's
    # deterministic ordered_bucket there are three such funnels (offsets +
    # bucket range min/max aggs), each carrying O(P) or 1 row.
    funnels = plan.split("Exchange SinglePartition")[1:]
    assert len(funnels) >= 1
    for seg in funnels:
        scan_at = seg.index("Scan parquet") if "Scan parquet" in seg else len(seg)
        assert "HashAggregate" in seg[:scan_at]  # funnel carries agg rows, not data
    # and the result matches the single-window ntile on a sample
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from wikidata2pg_spark.tables import load

    got = {r.o_orderkey: r.quartile for r in df.collect()}
    w = Window.orderBy("o_totalprice", "o_orderkey")
    want = {
        r.o_orderkey: r.q
        for r in load(spark, SF_T2, "orders")
        .select("o_orderkey", F.ntile(4).over(w).cast("long").alias("q"))
        .collect()
    }
    assert got == want


def test_tfidf_small_corpus_single_aggregation(spark):
    """r5: under the small-corpus guard, df comes from a window over the tf
    rows — the exploded-token aggregation must appear ONCE in the plan
    (two parquet scans total: tf lineage + the broadcast N), where the
    join form re-executed it (three scans, no ReusedExchange)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_text_tfidf"](spark, SF_T2)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 2
    assert "Window" in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The benchmark gram set joins as a broadcast — corpus-side grams are
    checked map-side, never shuffled for the membership test."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_text_decontaminate"](spark, SF_T2)
    assert "BroadcastHashJoin" in _plan(df)


def test_exists_rewrites_to_semi_anti_join(spark):
    """EXISTS/NOT EXISTS must decorrelate into semi/anti hash joins, not a
    per-row probe (r5 subquery family)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_subquery_exists"](spark, SF_T2)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_scalar_subquery_decorrelates_to_aggregate_join(spark):
    """The correlated per-brand average becomes a grouped aggregate joined
    back on p_brand — no nested-loop subplan per input row."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_subquery_scalar"](spark, SF_T2)
    opt = _optimized(df)
    # Decorrelation leaves a plain Aggregate+Join tree; a correlated
    # expression would survive as a ScalarSubquery referencing outer attrs
    # inside the filter/project.
    assert "Join" in opt and "Aggregate" in opt


def test_win_count_distinct_partitions_by_key(spark):
    """Both windows of the count-distinct rewrite hash-partition on
    o_custkey — no global (unpartitioned) window in the plan."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_win_count_distinct"](spark, SF_T2)
    plan = _plan(df)
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_copurchase_is_single_shuffle_join_plus_agg(spark):
    """The basket self-join keys on l_orderkey (the shuffle key) and the
    pair count is a partial+final hash agg."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_graph_copurchase"](spark, SF_T2)
    plan = _plan(df)
    # Equi-join on l_orderkey (broadcasts at fixture scale, shuffle-joins at
    # real scale — either way the key is the order key, never a cartesian).
    assert "Join [l_orderkey" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # Pair count is a partial+final two-phase hash agg (map-side combine).
    assert "partial_count" in plan


def test_spatial_grid_join_is_equi_on_cells(spark):
    """The distance join must run as an equi-join on the grid-cell key —
    never a cartesian/nested-loop over the point pairs."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_join_spatial_grid"](spark, SF_T2)
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Join [cx" in plan or "Join [cy" in plan or "cx#" in plan


def test_bucketize_broadcasts_cutpoints(spark):
    """The quartile cutpoints join the fact table as a broadcast of a 1-row
    aggregate — the data never shuffles for the bucketize step."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_agg_bucketize_equidepth"](spark, SF_T2)
    plan = _plan(df)
    assert "BroadcastExchange" in plan


def test_zorder_layout_prunes_both_dimensions(spark):
    """The Z-order claim, measured on the written files: the 2-D rectangle
    (user_id 40-80, Jan 10-14) must overlap a strict subset of files on
    BOTH dimensions' min/max stats — a linear ts sort would leave user_id
    ranges near-full-width in every file, and an unsorted write would leave
    both full-width."""
    import datetime as dt

    import pyarrow.parquet as pq

    from wikidata2pg_spark.registry import all_queries
    from wikidata2pg_spark.util import tmpdir_for

    all_queries()["q_sink_zorder"](spark, SF_T2).collect()  # ensures written
    import glob

    files = glob.glob(f"{tmpdir_for(SF_T2, 'events_zorder', 'events')}/*.parquet")
    assert len(files) > 4
    lo_t, hi_t = dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 14)
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        u = md.row_group(0).column(cols["user_id"]).statistics
        t = md.row_group(0).column(cols["ts"]).statistics
        u_min, u_max = u.min, u.max
        t_min, t_max = t.min.replace(tzinfo=None), t.max.replace(tzinfo=None)
        for rg in range(1, md.num_row_groups):
            s = md.row_group(rg).column(cols["user_id"]).statistics
            u_min, u_max = min(u_min, s.min), max(u_max, s.max)
            s = md.row_group(rg).column(cols["ts"]).statistics
            t_min = min(t_min, s.min.replace(tzinfo=None))
            t_max = max(t_max, s.max.replace(tzinfo=None))
        if u_max >= 40 and u_min <= 80 and t_max >= lo_t and t_min < hi_t:
            hit += 1
    assert hit < len(files), f"rectangle hit all {len(files)} files - no pruning"


def test_dedup_incremental_broadcasts_small_side(spark):
    """The corpus scan must never shuffle: batch digests reach it as a
    broadcast semi join, and the final status joins broadcast the tiny hit
    and keeper sets."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_dedup_incremental"](spark, SF_T2))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_aqe_splits_skewed_join_partition(spark):
    """The AQE skew-join posture (session.py RUNTIME_CONFS) proven on a
    real plan: a deliberately skewed shuffle join (70% of fact rows on one
    hot key, amplified 50x) must show OptimizeSkewedJoin splitting the hot
    partition — `skew=true` on the FINAL adaptive SortMergeJoin — once the
    skew thresholds are scaled down to fixture bytes. At 100 TB the
    default 256 MB thresholds do this without tuning; the mechanism is
    identical. Calibration notes (measured): the fixture-scale hot
    partition is ~30-50 KB COMPRESSED, so the advisory target must be
    small enough that the splitter can form >= 2 mapper-range chunks —
    with advisory 4 KB+ it forms one chunk and reports ZERO skewed
    partitions; and the input must be pre-split across several mappers
    (repartition(8)) because a single-row-group scan gives the shuffle one
    mapper, and partitions are split on mapper boundaries. Confs are set
    AFTER load(): the first load() of a session re-applies RUNTIME_CONFS
    and would silently overwrite them."""
    o = load(spark, SF_T2, "orders")
    c = load(spark, SF_T2, "customer")
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = (
            o.select(
                F.when(F.col("o_orderkey") % 10 < 7, F.lit(1))
                .otherwise(F.col("o_custkey"))
                .alias("key"),
                "o_totalprice",
            )
            .withColumn(
                "dup",
                F.explode(
                    F.when(F.col("key") == 1, F.sequence(F.lit(1), F.lit(50))).otherwise(
                        F.array(F.lit(1))
                    )
                ),
            )
            .repartition(8)
        )
        dim = c.select(F.col("c_custkey").alias("key"), "c_mktsegment").repartition(4)
        joined = fact.join(dim, "key").groupBy("c_mktsegment").count()
        joined.collect()  # AQE finalizes the plan only on execution
        plan = _plan(joined)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_lateral_decorrelates_to_window_group_limit(spark):
    """The LATERAL correlated top-2 must be rewritten to a per-partition
    WindowGroupLimit + equi-join — never a per-outer-row re-execution —
    and the outer filter must push into the INNER scan (c_custkey < 500
    reaches the orders side as o_custkey < 500)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_join_lateral"](spark, SF_T2)
    opt = _optimized(df)
    assert "WindowGroupLimit" in opt
    assert "o_custkey" in opt and "< 500" in opt
    plan = _plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_parse_spread_guard_is_split_aware(spark, tmp_path):
    """The CPU-heavy-projection spread (json_extract_agg, q_text_tfidf):
    a single-split source gets ONE extra round-robin exchange so the
    parse/tokenize runs across cores; a multi-split source must NOT pay
    that exchange — its scan already parallelizes the work. Guard rails
    for the 100 TB posture: the repartition exists only where the input,
    not the operator, is the bottleneck."""
    from wikidata2pg_spark.flagship import json_extract_agg
    from wikidata2pg_spark.util import split_fixture_tables

    single = _plan(json_extract_agg(spark, SF_T2))
    assert "REPARTITION_BY_NUM" in single or "RoundRobinPartitioning" in single

    multi = str(tmp_path / "multi")
    split_fixture_tables(SF_T2, multi, 8, tables=["events"])
    plan_multi = _plan(json_extract_agg(spark, multi))
    assert "RoundRobinPartitioning" not in plan_multi
    assert "REPARTITION_BY_NUM" not in plan_multi


def test_kmeans_assignment_is_map_only_broadcast(spark):
    """q_cluster_kmeans' scoring pass must never shuffle the point set:
    the K x D centroid pack arrives as a broadcast 1-row array and the
    argmin fold is a single codegen'd projection — the property that
    makes Lloyd a sequence of map-only passes at 100 TB. Only the tiny
    checkpointed centroid frames may aggregate."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_cluster_kmeans"](spark, SF_T2)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("FileScan parquet") == 1  # one scan of the points


def test_token_budget_single_shuffle(spark):
    """q_sample_token_budget: one scan, one exchange (the per-lang
    running-sum window) — the budget cut must add no distributed cost
    beyond the window itself."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_sample_token_budget"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_grouping_id_is_expand_plus_two_phase(spark):
    """q_agg_grouping_id: the cube is ONE Expand over the scan feeding a
    partial+final hash aggregate (single exchange) — not a union of
    per-level scans."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_agg_grouping_id"](spark, SF_T2))
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_bm25_joins_stay_broadcast(spark):
    """q_text_bm25: the df table and 1-row corpus stats must arrive as
    broadcasts (2 BroadcastHashJoin + the stats BroadcastNestedLoopJoin);
    a SortMergeJoin here would mean the postings join shuffled the
    corpus against a table that fits in memory by Heaps' law."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_text_bm25"](spark, SF_T2))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_funnel_single_user_shuffle(spark):
    """q_funnel_conversion: four chained stage windows must share ONE user
    exchange (plus the single-partition final rollup) over one scan — the
    naive formulation is four self-joins / four scans."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_funnel_conversion"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 4


def test_bloom_prefilter_never_sort_merges(spark):
    """q_join_bloom_prefilter: all three join phases (two Bloom-bucket
    semis + the exact semi) are broadcasts; the fact side must never
    shuffle for the filter."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_join_bloom_prefilter"](spark, SF_T2))
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_mad_two_scan_two_shuffle(spark):
    """q_agg_mad is inherently two-pass (median, then deviations from it):
    exactly two scans of lineitem, the per-group median arriving back as
    a broadcast, and two group-key exchanges — no more."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_agg_mad"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 2
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 2


def test_gini_reuses_window_partitioning(spark):
    """q_agg_gini: the rank window hash-partitions on the group key, and
    the moment aggregation must REUSE that partitioning — one scan, one
    exchange, no second shuffle for the groupBy."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_agg_gini"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_ewma_single_window_exchange(spark):
    """q_time_ewma: one scan, one user exchange, one Window — the fold
    runs inside the frame with no extra distribution step."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_time_ewma"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_interval_union_single_user_exchange(spark):
    """q_time_interval_union: the running-max window, the island-number
    window, AND both rollups (user_id+island, then user_id) must all ride
    ONE user_id hash exchange over one scan — HashPartitioning(user_id)
    satisfies the (user_id, island) clustering, so Catalyst adds no
    second shuffle."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_time_interval_union"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 2


def test_twa_single_user_exchange(spark):
    """q_time_twa: lead window + per-user rollup share one user_id
    exchange; the decimal sums stay partial-aggregable."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_time_twa"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_transitions_shrink_before_normalize(spark):
    """q_seq_transitions: the only full-data exchange is the user_id lead
    window; the pair rollup and the row-normalizing window run over the
    <=|types|^2-row matrix (two more exchanges that move nothing)."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_seq_transitions"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 3
    assert "SortMergeJoin" not in plan


def test_referential_dims_broadcast(spark):
    """q_dq_referential: every dimension probe is a broadcast join and no
    audit sort-merges at fixture scale; each branch reduces to one row
    before the union (the four SinglePartition exchanges carry 1 row
    each)."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_dq_referential"](spark, SF_T2))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_pareto_prefix_sum_is_distributed(spark):
    """q_pareto_abc: the global cumulative revenue must be the two-pass
    prefix-sum (pid-bucketed window + broadcast offsets), never a
    total-order window — the only single-partition stage is the P-row
    offsets window, so no full-data Exchange SinglePartition appears
    before the final result."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_pareto_abc"](spark, SF_T2))
    # the localCheckpoint collapses the per-part aggregate to ONE lineitem
    # scan; every downstream branch reads the materialized RDD
    assert plan.count("FileScan parquet") == 0
    assert plan.count("Scan ExistingRDD") >= 1
    assert plan.count("BroadcastHashJoin") >= 1  # offsets stitched broadcast
    assert "SortMergeJoin" not in plan


def test_corr_matrix_single_aggregation(spark):
    """q_agg_corr_matrix: all ten moment sums ride ONE partial-aggregable
    groupBy — one scan, one group-key exchange, no window."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_agg_corr_matrix"](spark, SF_T2))
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 0


def test_dpp_prunes_fact_partitions(spark):
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_join_dpp"](spark, SF_T2)
    plan = _plan(df).lower()
    assert "dynamicpruning" in plan  # runtime partition filter injected
    # the pruning subquery hangs off the fact scan's PartitionFilters and
    # is fed by a broadcast of the filtered dim (AQE spelling or classic)
    # (the PartitionFilters bracket itself is truncated by toString's
    # field limit, so assert on the subquery node instead)
    assert "subqueryadaptivebroadcast" in plan or "subquerybroadcast" in plan


def test_link_predict_degree_joins_broadcast(spark):
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_graph_link_predict"](spark, SF_T2))
    assert plan.count("BroadcastHashJoin") >= 2  # deg_a and deg_b sides


def test_point_in_time_single_user_exchange(spark):
    """All feature windows and the label selection must share ONE
    user_id hash exchange — adding features must not add shuffles."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_feature_point_in_time"](spark, SF_T2))
    n_user_exchanges = sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    )
    assert n_user_exchanges == 1, plan
    assert "SinglePartition" not in plan


def test_quantile_bands_window_stays_partitioned(spark):
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_agg_quantile_bands"](spark, SF_T2))
    assert "Exchange hashpartitioning(event_type" in plan
    assert "SinglePartition" not in plan


def test_ks_test_collapses_before_global_window(spark):
    """The single-partition ECDF window must sit ABOVE the cents
    groupBy (|distinct values| rows), never above the raw scan."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_agg_ks_test"](spark, SF_T2))
    # partial aggregation on v before any SinglePartition exchange
    pre, _, post = plan.partition("SinglePartition")
    assert "HashAggregate" in post  # the keys=[v] combine is below it


def test_tpch_q1_single_exchange_pushed_filter(spark):
    """Q1 is scan-bound: the shipdate filter reaches the parquet scan
    and the 4-group aggregate is one partial/final pair (one Exchange,
    map-side combine)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_sql_tpch_q1"](spark, SF_T2)
    qe = df._jdf.queryExecution().toString()
    plan = _plan(df)
    assert "PushedFilters" in qe and "LessThanOrEqual(l_shipdate" in qe
    assert plan.count("Exchange") == 1
    assert "partial_sum" in plan.lower() or "HashAggregate" in plan


def test_tpch_q15_scans_lineitem_once(spark):
    """The revenue view feeds BOTH the max probe and the winners join;
    localCheckpoint materializes it so lineitem is scanned exactly once
    (the sibling-aggregation re-execution trap)."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_sql_tpch_q15"](spark, SF_T2)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 0  # checkpoint replaced scans
    assert "BroadcastHashJoin" in plan


def test_tpch_q17_window_not_self_join(spark):
    """Q17's correlated per-part average is a WINDOW over the filtered
    lines, not a second lineitem scan + self-join: exactly one lineitem
    scan and a Window node in the plan."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_sql_tpch_q17"](spark, SF_T2)
    plan = _plan(df)
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "BroadcastHashJoin" in plan  # Brand#23 part list broadcasts


def test_tpch_q19_pushes_separable_disjuncts(spark):
    """The part-side brand/size disjunction prefilters the broadcast
    side, and the lineitem quantity envelope [1,30] pushes to the fact
    scan — the OR'd residual applies post-join."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_sql_tpch_q19"](spark, SF_T2)
    qe = df._jdf.queryExecution().toString()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(l_quantity,1" in qe
    assert "LessThanOrEqual(l_quantity,30" in qe


def test_tpch_q22_anti_join_and_scalar_broadcast(spark):
    """Lapsed-rich-customers: the 1-row positive-balance aggregate
    broadcasts (nested-loop or broadcast exchange), recent orders hit a
    broadcast/shuffle ANTI join, nation broadcasts."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_sql_tpch_q22"](spark, SF_T2)
    plan = _plan(df)
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bootstrap_ci_explode_before_single_shuffle(spark):
    """The B-way replicate explode is map-side (Generate under the
    scan, no Exchange between them); the only wide op is the 40-group
    aggregate."""
    from wikidata2pg_spark.registry import all_queries

    df = all_queries()["q_agg_bootstrap_ci"](spark, SF_T2)
    plan = _plan(df)
    assert "Generate explode" in plan
    # orders scanned for replicates and once for the point estimate
    assert plan.count("orders.parquet") == 2


def test_truncation_fidelity_single_corpus_scan(spark):
    """The audit family's shared corpus frame is localCheckpointed:
    neither ranking branch re-scans embeddings (4 FileScans before the
    fix — the sibling-consumer re-execution trap)."""
    from wikidata2pg_spark.registry import all_queries

    for key in ("q_vec_truncation_fidelity", "q_retrieval_ndcg",
                "q_retrieval_recall_eval"):
        df = all_queries()[key](spark, SF_T2)
        plan = _plan(df)
        assert plan.count("embeddings.parquet") == 0, key


def test_rolling_corr_one_window_node_after_daily_collapse(spark):
    """All six frame moments must come out of ONE flag-partitioned
    Window node sitting above the (flag, day) hash aggregate — a plan
    that re-exchanges per moment or windows the raw scan is wrong at
    any scale."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_win_rolling_corr"](spark, SF_T2))
    assert plan.count("Window") == 1
    assert "Exchange hashpartitioning(flag" in plan
    assert "SinglePartition" not in plan
    # the window reads the collapsed daily frame, not lineitem rows
    assert plan.index("Window") < plan.index("Scan parquet")


def test_mann_kendall_pairs_join_on_aggregate_not_rows(spark):
    """The O(k^2) pairwise stage must join the ~80-row monthly
    aggregate with itself — the collapse (partial HashAggregate on
    priority, ym) happens below the join on both inputs."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_time_mann_kendall"](spark, SF_T2))
    join_at = plan.index("Join")
    # both join inputs are checkpointed collapsed frames (no parquet
    # scan feeds the join directly)
    assert "Scan ExistingRDD" in plan[join_at:]
    assert "Scan parquet" not in plan[join_at:]


def test_jsd_grid_broadcasts_vocab_and_collapses_first(spark):
    """The dense source x word grid must come from a BROADCAST of the
    distinct-vocab frame over the per-source totals, and the corpus
    must collapse to (source, w) counts before any join — the 100 TB
    posture is one documents pass + vocabulary-bounded stages."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_text_jsd_sources"](spark, SF_T2))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the explode/count pipeline ran before the checkpoint: the plan
    # consumes the collapsed counts RDD, never re-scanning documents
    assert "Scan parquet" not in plan


def test_strength_series_is_calendar_bounded(spark):
    """The six ordered folds must aggregate the joined ~2.4k-row series
    in one node above the checkpointed daily frame; orders is never
    re-scanned after the daily collapse."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_time_strength"](spark, SF_T2))
    assert "Scan parquet" not in plan  # reads the checkpointed series
    # the 7-day trend window ran inside the checkpoint materialization;
    # what remains is the broadcast seasonal join + ONE fold aggregate
    # with map-side partials before its SinglePartition exchange
    assert "BroadcastHashJoin" in plan
    pre, _, post = plan.partition("Exchange SinglePartition")
    assert "partial_collect_list" in post and "partial_count" in post


def test_hill_tail_rank_limit_is_partial_topk(spark):
    """The Hill top-(k+1) selection must compile to
    TakeOrderedAndProject (per-partition partial top-k feeding one
    limit), never a full global sort — checked on the pre-checkpoint
    subtree the production key builds."""
    from pyspark.sql import Window

    from wikidata2pg_spark.llm.text import _HILL_K

    d = load(spark, SF_T2, "documents")
    r = d.select(
        "n_chars",
        F.row_number()
        .over(Window.orderBy(F.desc("n_chars"), "doc_id"))
        .cast("long")
        .alias("rn"),
    ).filter(F.col("rn") <= _HILL_K + 1)
    plan = _plan(r)
    assert f"TakeOrderedAndProject(limit={_HILL_K + 1}" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_skyline_is_distributed_two_pass(spark):
    """r7 (VERDICT r6 task 3): the skyline's dominance frames must run
    per-bucket, never as one global-ordered window over the raw part
    table — every Exchange SinglePartition in the plan carries O(P)
    aggregate rows (a HashAggregate sits between it and the scan), the
    full-data Window partitions on pid, and the prefix maxima stitch
    back as a broadcast."""
    from wikidata2pg_spark.registry import all_queries

    plan = _plan(all_queries()["q_win_skyline"](spark, SF_T2))
    funnels = plan.split("Exchange SinglePartition")[1:]
    assert len(funnels) >= 1
    for seg in funnels:
        scan_at = seg.index("Scan parquet") if "Scan parquet" in seg else len(seg)
        assert "HashAggregate" in seg[:scan_at]
    assert "Exchange hashpartitioning(pid" in plan
    assert "BroadcastHashJoin" in plan


def test_single_partition_blanket_sweep(spark):
    """VERDICT r6 task 5: for EVERY registered key, no raw scan may feed
    an Exchange SinglePartition without a bounding operator (aggregate /
    top-k / limit / broadcast) on the tree path in between — the skyline
    class as a static gate instead of per-key audits (the class survived
    64 hand-written audits; see wikidata2pg_spark/plan_audit.py for the
    rule and tools/plan_sweep.py for the standalone sweep). The r7 sweep
    caught q_win_skyline's precedent class twice more (q_win_concurrency,
    q_text_vocab_growth) — both now ride the two-pass global_cumsum."""
    from wikidata2pg_spark.plan_audit import (
        PREDICATE_BOUNDED_ALLOWLIST,
        ROW_PYTHON_ALLOWLIST,
        audit_key,
    )
    from wikidata2pg_spark.registry import all_queries

    # Shared allowlists (plan_audit.py documents each entry's reason)
    # keep this test and tools/plan_sweep.py from drifting. r7 extended
    # the sweep to three gates: single-partition funnels, raw cartesian
    # products (no allowlist — none should ever exist), and row-Python
    # evaluation outside the contract-mandated D1 key.
    allow = {
        "single_partition": PREDICATE_BOUNDED_ALLOWLIST,
        "row_python": ROW_PYTHON_ALLOWLIST,
        "cartesian": frozenset(),
    }
    qs = all_queries()
    bad = {}
    for k, fn in qs.items():
        v = audit_key(spark, k, fn, SF_SMOKE)
        for g, lines in v.items():
            if k not in allow.get(g, ()):
                bad[f"{k}[{g}]"] = lines[0][:160]
    assert not bad, bad
