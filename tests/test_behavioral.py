"""Semantics tests for the behavioral family (funnel, cohort retention)
plus the r6 additions q_join_bloom_prefilter and q_agg_mad — each checked
against an INDEPENDENT formulation (pure-Python brute force / numpy /
plain Spark semi-join), not just the DuckDB oracle the driver re-runs."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, SF_T2
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load


def _brute_funnel(rows, step_h=24):
    """Per-user sequential scan — the definitionally-obvious funnel."""
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    stages = ["signup", "view", "click", "purchase"]
    counts = [0, 0, 0, 0]
    step = np.timedelta64(step_h, "h")
    for evs in by_user.values():
        evs.sort()
        prev = None
        for i, st in enumerate(stages):
            cand = [
                t
                for t, e in evs
                if e == st
                and (prev is None or (t >= prev and np.datetime64(t) <= np.datetime64(prev) + step))
            ]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


def test_funnel_matches_bruteforce_and_is_monotone(spark):
    row = all_queries()["q_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    got = [row.signup_users, row.view_users, row.click_users, row.purchase_users]
    rows = load(spark, SF_SMOKE, "events").select("user_id", "ts", "event_type").collect()
    assert got == _brute_funnel(rows)
    assert got[0] >= got[1] >= got[2] >= got[3] >= 0
    assert got[0] > got[3], "fixture should discriminate stages"
    # conversion ratios are consistent with the counts
    assert abs(row.conv_purchase - got[3] / got[0]) < 1e-4


def test_cohort_retention_invariants(spark):
    out = all_queries()["q_cohort_retention"](spark, SF_T2).collect()
    assert out, "non-empty retention table"
    by_cohort: dict = {}
    for r in out:
        assert 0 <= r.active_users <= r.cohort_size
        assert r.week_offset >= 0
        assert 0.0 <= r.retention <= 1.0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r
    for cw, offs in by_cohort.items():
        # offset 0 is full by construction: the qualifying first purchase
        # (value>=120) is itself activity (value>=100) in the cohort week
        assert 0 in offs and offs[0].retention == 1.0, cw
    assert len(by_cohort) >= 3, "cohorts spread over several weeks"


def test_bloom_prefilter_equals_plain_semijoin_and_prunes(spark):
    out = {
        r.l_returnflag: (r.n, r.revenue_cents)
        for r in all_queries()["q_join_bloom_prefilter"](spark, SF_T2).collect()
    }
    orders = load(spark, SF_T2, "orders")
    li = load(spark, SF_T2, "lineitem")
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000)
    ).select("o_orderkey")
    plain = {
        r.l_returnflag: (r.n, r.revenue_cents)
        for r in (
            li.join(F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey"), "leftsemi")
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
                ).alias("revenue_cents"),
            )
            .collect()
        )
    }
    assert out == plain
    # the Bloom phase actually prunes: survivors well under the full fact,
    # and (guaranteed-no-false-negatives) at least the true match count
    m = 1 << 16
    h = lambda c, seed: F.pmod(F.xxhash64(F.col(c), F.lit(seed)), F.lit(m))  # noqa: E731
    bset = dim.select(
        F.explode(F.array(h("o_orderkey", 1), h("o_orderkey", 2))).alias("b")
    ).distinct()
    surv = (
        li.join(F.broadcast(bset), h("l_orderkey", 1) == F.col("b"), "leftsemi")
        .join(F.broadcast(bset), h("l_orderkey", 2) == F.col("b"), "leftsemi")
        .count()
    )
    true_n = sum(n for n, _ in plain.values())
    assert true_n <= surv < 0.4 * li.count()


def test_mad_matches_numpy(spark):
    out = {
        r.l_returnflag: r for r in all_queries()["q_agg_mad"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            np.floor(r.l_extendedprice * 100 + 0.5)
        )
    for flag, cents in groups.items():
        a = np.array(cents, dtype=np.float64)
        med = np.percentile(a, 50)  # linear interpolation == quantile_cont
        mad = np.percentile(np.abs(a - med), 50)
        r = out[flag]
        assert r.n == len(a)
        assert abs(r.median_price - np.floor(med / 100 * 100 + 0.5) / 100) < 1e-9
        assert abs(r.mad_price - np.floor(mad / 100 * 10000 + 0.5) / 10000) < 1e-9


def test_gini_matches_numpy(spark):
    out = {
        r.l_returnflag: r for r in all_queries()["q_agg_gini"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            int(np.floor(r.l_extendedprice * 100 + 0.5))
        )
    for flag, cents in groups.items():
        x = np.sort(np.array(cents, dtype=np.int64))
        n = len(x)
        s1 = int(np.sum(np.arange(1, n + 1, dtype=np.int64) * x))
        t = int(x.sum())
        gini = (2 * s1 - (n + 1) * t) / (n * t)
        r = out[flag]
        assert r.n == n
        assert abs(r.gini - np.floor(gini * 1e6 + 0.5) / 1e6) < 1e-9
        assert 0.0 <= r.gini < 1.0


def test_ewma_matches_sequential_recurrence_exactly(spark):
    """The EWMA key claims BIT-IDENTICAL doubles (alpha=0.5 scaling is
    exact) — so the reference comparison is ==, not approx."""
    out = {
        r.event_id: r.ewma
        for r in all_queries()["q_time_ewma"](spark, SF_SMOKE).collect()
    }
    rows = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") < 200)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    n_checked = 0
    for evs in by_user.values():
        evs.sort()
        vals = [v for _, _, v in evs]
        for i, (_, eid, _) in enumerate(evs):
            frame = vals[max(0, i - 19) : i + 1]
            acc = frame[0]
            for x in frame[1:]:
                acc = acc * 0.5 + 0.5 * x
            assert out[eid] == acc, eid
            n_checked += 1
    assert n_checked == len(out) > 0


def test_dupspans_flags_known_duplicated_text(spark):
    out = {r.doc_id: r for r in all_queries()["q_text_dupspans"](spark, SF_SMOKE).collect()}
    assert out, "non-empty"
    flagged = [r for r in out.values() if r.n_dup_spans > 0]
    assert flagged, "fixture corpus contains cross-doc duplicated spans"
    for r in out.values():
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert abs(r.dup_ratio - np.floor(r.n_dup_spans * 10000 / r.n_spans + 0.5) / 10000) < 1e-12
    # spot-check one flagged pair: its shared shingle really appears in
    # two different documents' text
    docs = {d.doc_id: d.text for d in load(spark, SF_SMOKE, "documents").collect()}

    def shingles(txt):
        t = txt.split(" ")
        return {" ".join(t[i : i + 8]) for i in range(len(t) - 7)}

    some = flagged[0].doc_id
    mine = shingles(docs[some])
    assert any(
        other != some and mine & shingles(txt) for other, txt in docs.items()
    ), "flagged doc shares at least one 8-gram with another doc"


def test_entropy_matches_scipy_style_reference(spark):
    out = {r.event_type: r for r in all_queries()["q_agg_entropy"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "events").select("event_type", F.hour("ts").alias("h")).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.event_type, {}).setdefault(r.h, 0)
        groups[r.event_type][r.h] += 1
    for et, hist in groups.items():
        c = np.array(list(hist.values()), dtype=np.float64)
        n = c.sum()
        h = np.log(n) - float((c * np.log(c)).sum()) / n
        assert out[et].n == int(n)
        assert abs(out[et].entropy - h) < 0.006  # round(,2) + ulp
        assert 0.0 <= out[et].entropy <= np.log(24) + 0.01


def test_mom_growth_recurrence(spark):
    rows = all_queries()["q_time_mom_growth"](spark, SF_SMOKE).collect()
    by_prio: dict = {}
    for r in rows:
        by_prio.setdefault(r.o_orderpriority, []).append(r)
    assert len(by_prio) == 5
    for prio, rs in by_prio.items():
        rs.sort(key=lambda r: r.month)
        assert rs[0].mom_growth is None, "first month has no predecessor"
        for prev, cur in zip(rs, rs[1:]):
            expect = np.floor(
                (cur.revenue_cents - prev.revenue_cents) * 10000 / prev.revenue_cents
                + 0.5
            ) / 10000
            assert cur.mom_growth == expect


def test_weighted_median_matches_reference(spark):
    out = {
        r.l_returnflag: r
        for r in all_queries()["q_agg_weighted_median"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            (int(np.floor(r.l_extendedprice * 100 + 0.5)), int(r.l_quantity))
        )
    for flag, pairs in groups.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        wmed = None
        for cents, w in pairs:
            cum += w
            if 2 * cum >= total:
                wmed = cents
                break
        r = out[flag]
        assert r.total_weight == total
        assert r.wmedian_price == np.floor(wmed / 100 * 100 + 0.5) / 100


def test_funnel_latency_consistent_with_funnel(spark):
    lat = all_queries()["q_funnel_time_to_convert"](spark, SF_SMOKE).collect()[0]
    fun = all_queries()["q_funnel_conversion"](spark, SF_SMOKE).collect()[0]
    assert lat.n_converted == fun.purchase_users > 0
    assert 0 < lat.min_hours <= lat.median_hours <= lat.max_hours
    # the whole funnel is step-bounded at 24h per stage -> total <= 72h
    assert lat.max_hours <= 72.0


def test_bag_setops_multiplicities(spark):
    """EXCEPT ALL keeps max(m-n,0) copies; INTERSECT ALL keeps min(m,n) —
    verified per custkey against plain counts."""
    from collections import Counter

    o = load(spark, SF_SMOKE, "orders").select("o_custkey", "o_orderstatus").collect()
    m = Counter(r.o_custkey for r in o if r.o_orderstatus == "O")
    n = Counter(r.o_custkey for r in o if r.o_orderstatus == "F")
    exc = Counter(
        r.o_custkey for r in all_queries()["q_except_all"](spark, SF_SMOKE).collect()
    )
    inter = Counter(
        r.o_custkey
        for r in all_queries()["q_intersect_all"](spark, SF_SMOKE).collect()
    )
    # include the OUTPUT keys too: a buggy op emitting custkeys outside
    # both input sides must fail, not dodge the loop
    for k in set(m) | set(n) | set(exc) | set(inter):
        assert exc.get(k, 0) == max(m.get(k, 0) - n.get(k, 0), 0), k
        assert inter.get(k, 0) == min(m.get(k, 0), n.get(k, 0)), k
    assert any(v > 1 for v in exc.values()), "multiplicities actually exercised"
    assert any(v > 1 for v in inter.values())


def test_bitmap_distinct_equals_count_distinct_and_merges(spark):
    got = {
        r.event_type: r.distinct_users
        for r in all_queries()["q_agg_bitmap_distinct"](spark, SF_T2).collect()
    }
    want = {
        r.event_type: r.d
        for r in load(spark, SF_T2, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert got == want
    # exercise the bitmap_or_agg merge path with a DIFFERENT sharding —
    # if the associative merge were broken, a 7-way split would disagree
    # with the key's 4-way split (and with count distinct)
    e = load(spark, SF_T2, "events")
    resharded = {
        r.event_type: r.d
        for r in e.groupBy(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("b"),
            (F.col("user_id") % 7).alias("shard"),
        )
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
        .groupBy("event_type", "b")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("d"))
        .collect()
    }
    assert resharded == got


def test_ohlc_bars_match_sequential_reference(spark):
    out = {
        (r.event_type, r.bucket): r
        for r in all_queries()["q_time_ohlc"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    bars: dict = {}
    for r in rows:
        b = r.ts.replace(minute=0, second=0, microsecond=0)
        bars.setdefault((r.event_type, b), []).append((r.ts, r.event_id, r.value))
    assert set(out) == set(bars)
    for key, evs in bars.items():
        evs.sort()
        r = out[key]
        assert r.open == evs[0][2] and r.close == evs[-1][2]
        vals = [v for _, _, v in evs]
        assert r.high == max(vals) and r.low == min(vals) and r.n == len(evs)


def test_balanced_sample_is_balanced_and_deterministic(spark):
    from collections import Counter

    rows = all_queries()["q_sample_balanced"](spark, SF_T2).collect()
    per_class = Counter(r.lang for r in rows)
    truth = Counter(
        r.lang for r in load(spark, SF_T2, "documents").select("lang").collect()
    )
    k = min(truth.values())
    assert set(per_class) == set(truth)
    assert all(v == k for v in per_class.values()), per_class
    # selection is a pure function of the data: rerun == same set
    again = {(r.lang, r.doc_id) for r in all_queries()["q_sample_balanced"](spark, SF_T2).collect()}
    assert again == {(r.lang, r.doc_id) for r in rows}


def test_ratio_to_report_sums_to_one_per_customer(spark):
    rows = all_queries()["q_win_ratio_to_report"](spark, SF_SMOKE).collect()
    per_cust: dict = {}
    for r in rows:
        per_cust.setdefault(r.o_custkey, []).append(r)
    for ck, rs in per_cust.items():
        total = sum(r.price_cents for r in rs)
        s = sum(r.share_of_customer for r in rs)
        # floor rounding at 6dp: each share loses < 1e-6
        assert abs(s - 1.0) <= len(rs) * 1e-6, (ck, s)
        for r in rs:
            assert abs(r.share_of_customer - r.price_cents / total) < 2e-6


def test_iqr_outliers_match_numpy(spark):
    out = {
        r.l_returnflag: r
        for r in all_queries()["q_agg_iqr_outliers"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            np.floor(r.l_extendedprice * 100 + 0.5)
        )
    for flag, cents in groups.items():
        a = np.array(cents, dtype=np.float64)
        q1, q3 = np.percentile(a, [25, 75])
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        r = out[flag]
        assert r.n == len(a)
        assert r.n_outliers == int(((a < lo) | (a > hi)).sum())
        assert abs(r.fence_lo - np.floor(lo / 100 * 100 + 0.5) / 100) < 1e-9
        assert abs(r.fence_hi - np.floor(hi / 100 * 100 + 0.5) / 100) < 1e-9


def test_streaks_match_sequential_reference(spark):
    import datetime as dt

    out = {r.user_id: r for r in all_queries()["q_time_streaks"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    days: dict = {}
    for r in rows:
        days.setdefault(r.user_id, set()).add(r.ts.date())
    for uid, ds in days.items():
        sd = sorted(ds)
        streaks = [1]
        for a, b in zip(sd, sd[1:]):
            if b - a == dt.timedelta(days=1):
                streaks[-1] += 1
            else:
                streaks.append(1)
        r = out[uid]
        assert r.longest_streak == max(streaks)
        assert r.n_streaks == len(streaks)
        assert r.first_day == sd[0]


def test_churn_counts_match_reference(spark):
    import datetime as dt

    out = {r.week: r for r in all_queries()["q_agg_churn"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    act: dict = {}
    for r in rows:
        monday = (r.ts - dt.timedelta(days=r.ts.weekday())).date()
        act.setdefault(monday, set()).add(r.user_id)
    weeks = sorted(act)
    assert set(out) == set(weeks[:-1]), "last week has no successor"
    for w, nxt in zip(weeks, weeks[1:]):
        churned = act[w] - act[nxt]
        r = out[w]
        assert r.active_users == len(act[w])
        assert r.churned_users == len(churned)


def test_exists_flag_keeps_every_row(spark):
    rows = all_queries()["q_subquery_exists_flag"](spark, SF_SMOKE).collect()
    n_cust = load(spark, SF_SMOKE, "customer").filter(F.col("c_custkey") < 300).count()
    assert len(rows) == n_cust, "mark join must not filter"
    assert any(r.has_urgent for r in rows) and any(not r.has_urgent for r in rows)


def test_lm_score_matches_reference_and_ranks_rare_docs_high(spark):
    import math
    from collections import Counter

    out = {r.doc_id: r for r in all_queries()["q_text_lm_score"](spark, SF_SMOKE).collect()}
    docs = {d.doc_id: d.text.split(" ") for d in load(spark, SF_SMOKE, "documents").collect()}
    freq = Counter(t for toks in docs.values() for t in toks)
    total = sum(freq.values())
    scores = {}
    for did, toks in docs.items():
        nll = sum(-math.log(freq[t] / total) for t in toks) / len(toks)
        scores[did] = nll
        r = out[did]
        assert r.n_toks == len(toks)
        assert abs(r.avg_nll - nll) < 0.006, did
    # sanity: the metric separates docs (not constant; the synthetic
    # corpus is near-uniform so the spread is modest)
    vals = sorted(scores.values())
    assert vals[-1] - vals[0] > 0.1


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    tol = {r.event_id: r for r in all_queries()["q_join_asof_tolerance"](spark, SF_SMOKE).collect()}
    plain = {r.event_id: r for r in all_queries()["q_join_asof"](spark, SF_SMOKE).collect()}
    assert set(tol) == set(plain)
    n_nulled = 0
    for eid, p in plain.items():
        t = tol[eid]
        if p.last_purchase_ts is None:
            assert t.recent_purchase_ts is None
        elif p.err_ts - p.last_purchase_ts <= dt.timedelta(hours=2):
            assert t.recent_purchase_ts == p.last_purchase_ts
        else:
            assert t.recent_purchase_ts is None
            n_nulled += 1
    assert n_nulled > 0, "tolerance actually nulls stale matches on the fixture"
