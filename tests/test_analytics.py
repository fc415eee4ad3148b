"""Semantics tests for the analytics/DQ family (interval union, event
transitions, time-weighted average, Benford, referential integrity) —
each checked against an INDEPENDENT pure-Python formulation or a crafted
corruption fixture, not just the DuckDB oracle the driver re-runs."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, SF_T2
from wikidata2pg_spark.registry import all_queries
from wikidata2pg_spark.tables import load

SPAN_US = 30 * 60 * 1_000_000


def _micros(ts):
    import datetime as dt

    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_interval_union_matches_bruteforce(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_time_interval_union"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(_micros(r.ts))
    for uid, starts in by_user.items():
        starts.sort()
        islands = []
        for s in starts:
            e = s + SPAN_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        got = out[uid]
        assert got.n_islands == len(islands), uid
        assert got.covered_micros == sum(e - s for s, e in islands), uid
        assert got.longest_micros == max(e - s for s, e in islands), uid
    assert set(out) == set(by_user)
    # fixture discriminates: somebody merged at least two spans
    assert any(r.longest_micros > SPAN_US for r in out.values())


def test_transitions_rows_normalize_and_count_pairs(spark):
    out = all_queries()["q_seq_transitions"](spark, SF_T2).collect()
    assert out
    by_from: dict = {}
    for r in out:
        assert r.n >= 1
        by_from.setdefault(r.from_type, []).append(r)
    for rows in by_from.values():
        assert abs(sum(r.prob for r in rows) - 1.0) < 1e-4
    n_events = load(spark, SF_T2, "events").count()
    n_users = (
        load(spark, SF_T2, "events").select("user_id").distinct().count()
    )
    assert sum(r.n for r in out) == n_events - n_users  # pairs = sum(len-1)


def test_twa_matches_bruteforce(spark):
    out = {
        r.user_id: r for r in all_queries()["q_time_twa"](spark, SF_SMOKE).collect()
    }
    rows = (
        load(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts), r.event_id, int(math.floor(r.value * 100 + 0.5)))
        )
    for uid, evs in by_user.items():
        evs.sort()
        sw = sd = 0
        for (t, _, v), (t2, _, _) in zip(evs, evs[1:]):
            sw += v * (t2 - t)
            sd += t2 - t
        if sd == 0:
            assert uid not in out
            continue
        exp = math.floor(sw / sd / 100.0 * 10000 + 0.5) / 10000
        assert out[uid].twa == pytest.approx(exp, abs=1e-9), uid
        assert out[uid].n_gaps == len(evs) - 1
        lo = min(v for _, _, v in evs) / 100.0
        hi = max(v for _, _, v in evs) / 100.0
        assert lo - 1e-4 <= out[uid].twa <= hi + 1e-4


def test_benford_shares_and_expectations(spark):
    from wikidata2pg_spark.operators.analytics import _BENFORD

    out = all_queries()["q_dq_benford"](spark, SF_T2).collect()
    assert {r.digit for r in out} <= set(range(1, 10))
    assert sum(r.n for r in out) == load(spark, SF_T2, "orders").count()
    assert abs(sum(r.obs_share for r in out) - 1.0) < 1e-4
    for r in out:
        assert r.exp_share == pytest.approx(_BENFORD[r.digit])
        assert 0.0 <= r.obs_share <= 1.0


def test_referential_clean_fixture_has_zero_orphans(spark):
    out = {r.fk: r for r in all_queries()["q_dq_referential"](spark, SF_T2).collect()}
    assert len(out) == 4
    li = load(spark, SF_T2, "lineitem").count()
    assert out["lineitem.l_orderkey->orders"].n_rows == li
    assert all(r.n_orphans == 0 for r in out.values())


def test_referential_detects_injected_orphans(spark, tmp_path):
    # fixture copy with 7 dangling part keys and 3 dangling custkeys
    for t in ("lineitem", "orders", "part", "supplier", "customer"):
        tb = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        if t == "lineitem":
            df = tb.to_pandas()
            df.loc[df.index[:7], "l_partkey"] = 999_999_999
            import pyarrow as pa

            tb = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        if t == "orders":
            df = tb.to_pandas()
            df.loc[df.index[:3], "o_custkey"] = -5
            import pyarrow as pa

            tb = pa.Table.from_pandas(df, schema=tb.schema, preserve_index=False)
        pq.write_table(tb, str(tmp_path / f"{t}.parquet"))
    out = {
        r.fk: r
        for r in all_queries()["q_dq_referential"](spark, str(tmp_path)).collect()
    }
    assert out["lineitem.l_partkey->part"].n_orphans == 7
    assert out["orders.o_custkey->customer"].n_orphans == 3
    assert out["lineitem.l_suppkey->supplier"].n_orphans == 0


def test_pareto_matches_bruteforce(spark):
    out = {
        r.l_partkey: r for r in all_queries()["q_pareto_abc"](spark, SF_SMOKE).collect()
    }
    rows = (
        load(spark, SF_SMOKE, "lineitem")
        .select("l_partkey", "l_extendedprice")
        .collect()
    )
    rev: dict = {}
    for r in rows:
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + int(
            math.floor(r.l_extendedprice * 100 + 0.5)
        )
    total = sum(rev.values())
    cum = 0
    for pk in sorted(rev, key=lambda k: (-rev[k], k)):
        cum += rev[pk]
        got = out[pk]
        assert got.revenue_cents == rev[pk]
        exp_share = math.floor(cum * 1000000 / total + 0.5) / 1000000
        assert got.cum_share == pytest.approx(exp_share, abs=1e-9)
        exp_cls = "A" if cum * 10 <= total * 7 else ("B" if cum * 10 <= total * 9 else "C")
        assert got.abc_class == exp_cls, pk
    assert {r.abc_class for r in out.values()} == {"A", "B", "C"}


def _py_ntile(keys_in_order, n=5):
    """SQL NTILE semantics: first N%n buckets get ceil, rest floor."""
    N = len(keys_in_order)
    q, r = divmod(N, n)
    scores, i = {}, 0
    for b in range(1, n + 1):
        size = q + (1 if b <= r else 0)
        for k in keys_in_order[i : i + size]:
            scores[k] = b
        i += size
    return scores


def test_rfm_matches_python_ntile(spark):
    out = {r.o_custkey: r for r in all_queries()["q_orders_rfm"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    agg: dict = {}
    for r in rows:
        d = r.o_orderdate.date()
        c = agg.setdefault(r.o_custkey, [None, 0, 0])
        c[0] = d if c[0] is None else max(c[0], d)
        c[1] += 1
        c[2] += int(math.floor(r.o_totalprice * 100 + 0.5))
    dmax = max(v[0] for v in agg.values())
    rd = {k: (dmax - v[0]).days for k, v in agg.items()}
    r_sc = _py_ntile(sorted(agg, key=lambda k: (-rd[k], k)))
    f_sc = _py_ntile(sorted(agg, key=lambda k: (agg[k][1], k)))
    m_sc = _py_ntile(sorted(agg, key=lambda k: (agg[k][2], k)))
    assert set(out) == set(agg)
    for k, row in out.items():
        assert row.r_days == rd[k]
        assert row.f == agg[k][1]
        assert row.m_cents == agg[k][2]
        assert (row.r_score, row.f_score, row.m_score) == (r_sc[k], f_sc[k], m_sc[k]), k


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    out = {r.l_returnflag: r for r in all_queries()["q_agg_corr_matrix"](spark, SF_T2).collect()}
    rows = load(spark, SF_T2, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            (
                int(r.l_quantity),
                int(math.floor(r.l_extendedprice * 100 + 0.5)),
                int(math.floor(r.l_discount * 10000 + 0.5)),
            )
        )
    for flag, triples in by_flag.items():
        a = np.array(triples, dtype=np.float64)
        c = np.corrcoef(a.T)
        got = out[flag]
        assert got.n == len(triples)
        assert got.corr_qty_price == pytest.approx(c[0, 1], abs=2e-4)
        assert got.corr_qty_disc == pytest.approx(c[0, 2], abs=2e-4)
        assert got.corr_price_disc == pytest.approx(c[1, 2], abs=2e-4)
        for v in (got.corr_qty_price, got.corr_qty_disc, got.corr_price_disc):
            assert -1.0 <= v <= 1.0


def test_asof_forward_matches_bruteforce(spark):
    out = {
        r.event_id: r
        for r in all_queries()["q_join_asof_forward"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    purchases: dict = {}
    for r in rows:
        if r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append(r.ts)
    errors = [r for r in rows if r.event_type == "error"]
    assert set(out) == {r.event_id for r in errors}
    n_match = 0
    for r in errors:
        cand = [t for t in purchases.get(r.user_id, []) if t >= r.ts]
        exp = min(cand) if cand else None
        assert out[r.event_id].next_purchase_ts == exp, r.event_id
        n_match += exp is not None
    assert 0 < n_match < len(errors), "fixture should have matches AND nulls"


def test_lexical_diversity_matches_bruteforce(spark):
    from collections import Counter

    out = {
        r.doc_id: r
        for r in all_queries()["q_text_lexical_diversity"](spark, SF_SMOKE).collect()
    }
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    assert set(out) == {d.doc_id for d in docs}
    for d in docs:
        c = Counter(d.text.split(" "))
        got = out[d.doc_id]
        total, types = sum(c.values()), len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        assert (got.n_tokens, got.n_types, got.n_hapax) == (total, types, hapax)
        assert got.ttr == pytest.approx(
            math.floor(types * 1000000 / total + 0.5) / 1000000, abs=1e-9
        )
        assert got.n_hapax <= got.n_types <= got.n_tokens


def test_zipf_matches_numpy_fit(spark):
    import numpy as np
    from collections import Counter

    row = all_queries()["q_text_zipf"](spark, SF_SMOKE).collect()[0]
    docs = load(spark, SF_SMOKE, "documents").select("text").collect()
    c = Counter(w for d in docs for w in d.text.split(" "))
    assert row.n_vocab == len(c)
    freqs = np.array(sorted(c.values(), reverse=True), dtype=np.float64)
    ranks = np.arange(1, len(freqs) + 1, dtype=np.float64)
    slope, intercept = np.polyfit(np.log(ranks), np.log(freqs), 1)
    assert row.zipf_slope == pytest.approx(slope, abs=2e-3)
    assert row.intercept == pytest.approx(intercept, abs=2e-3)
    assert row.zipf_slope < 0  # frequency falls with rank
    assert 0.0 <= row.r2 <= 1.0


def test_log_histogram_matches_bitlength(spark):
    from collections import Counter

    out = all_queries()["q_agg_log_histogram"](spark, SF_SMOKE).collect()
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    exp = Counter(
        (r.l_returnflag, int(math.floor(r.l_extendedprice * 100 + 0.5)).bit_length() - 1)
        for r in rows
    )
    got = {(r.l_returnflag, r.bucket): r for r in out}
    assert set(got) == set(exp)
    for k, r in got.items():
        assert r.n == exp[k]
        assert r.lo_cents == 2 ** r.bucket
        assert r.hi_cents == 2 ** (r.bucket + 1) - 1
    assert sum(r.n for r in out) == len(rows)


def test_anomaly_matches_bruteforce(spark):
    out = {
        (r.user_id, r.event_id): r
        for r in all_queries()["q_time_anomaly"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts), r.event_id, int(math.floor(r.value * 100 + 0.5)))
        )
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        for i, (_, eid, v) in enumerate(evs):
            frame = [x[2] for x in evs[max(0, i - 20) : i]]
            n = len(frame)
            if n < 5:
                continue
            s, s2 = sum(frame), sum(x * x for x in frame)
            if (n * v - s) ** 2 > 9 * (n * s2 - s * s) and n * s2 - s * s > 0:
                z = (n * v - s) / math.sqrt(n * s2 - s * s)
                expected[(uid, eid)] = math.floor(z * 10000 + 0.5) / 10000
    assert set(out) == set(expected)
    assert expected, "fixture should contain anomalies"
    for k, z in expected.items():
        assert out[k].z == pytest.approx(z, abs=1e-9), k
        assert abs(out[k].z) > 3 - 1e-6  # |z| beyond the 3-sigma fence


def test_attribution_shares_and_counts(spark):
    out = all_queries()["q_attribution_last_touch"](spark, SF_T2).collect()
    n_purch = (
        load(spark, SF_T2, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert sum(r.n for r in out) == n_purch
    assert abs(sum(r.share for r in out) - 1.0) < 1e-4
    touches = {r.touch for r in out}
    assert "purchase" not in touches  # a purchase never credits itself
    assert touches <= {"signup", "view", "click", "error", "none"}


def test_attribution_matches_bruteforce(spark):
    from collections import Counter

    out = {r.touch: r.n for r in all_queries()["q_attribution_last_touch"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    cnt: Counter = Counter()
    lim = 24 * 3600 * 1_000_000
    for evs in by_user.values():
        # touches sort before purchases at equal (ts, is-touch) rank
        evs.sort(key=lambda r: (_micros(r.ts), r.event_type == "purchase", r.event_id))
        last = None
        for r in evs:
            if r.event_type != "purchase":
                last = r
            else:
                if last is not None and _micros(r.ts) - _micros(last.ts) <= lim:
                    cnt[last.event_type] += 1
                else:
                    cnt["none"] += 1
    assert out == dict(cnt)


def test_mmr_matches_bruteforce(spark):
    from wikidata2pg_spark.llm.retrieval import K_CAND, K_MMR, NQ, _FP

    out = all_queries()["q_retrieval_mmr"](spark, SF_SMOKE).collect()
    vecs = {
        r.vec_id: [int(math.floor(float(x) * _FP + 0.5)) for x in r.embedding]
        for r in load(spark, SF_SMOKE, "embeddings").collect()
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    expected = []
    for qid in range(NQ):
        rel = {
            c: dot(vecs[qid], vecs[c]) for c in vecs if c != qid
        }
        cand = sorted(rel, key=lambda c: (-rel[c], c))[:K_CAND]
        sel = [max(cand, key=lambda c: (rel[c], -c))]
        scores = {sel[0]: rel[sel[0]]}
        while len(sel) < K_MMR:
            best, best_score = None, None
            for c in cand:
                if c in sel:
                    continue
                pen = max(dot(vecs[c], vecs[s]) for s in sel)
                sc = rel[c] - pen
                if best is None or sc > best_score or (sc == best_score and c < best):
                    best, best_score = c, sc
            sel.append(best)
            scores[best] = best_score
        for rank, c in enumerate(sel, 1):
            expected.append((qid, rank, c, scores[c]))
    got = sorted((r.query_id, r.rank, r.vec_id, r.mmr_score) for r in out)
    assert got == sorted(expected)
    # diversity actually engaged: for some query the 2nd pick is NOT the
    # 2nd-most-relevant candidate
    plain_second = set()
    for qid in range(NQ):
        rel = {c: dot(vecs[qid], vecs[c]) for c in vecs if c != qid}
        order = sorted(rel, key=lambda c: (-rel[c], c))
        plain_second.add((qid, order[1]))
    mmr_second = {(r.query_id, r.vec_id) for r in out if r.rank == 2}
    assert mmr_second != plain_second


def test_cusum_matches_bruteforce(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_time_cusum"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts), r.event_id, int(math.floor(r.value * 100 + 0.5)))
        )
    K, H = 1600, 16000
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        n = len(evs)
        s = sum(v for _, _, v in evs)
        S = 0
        alarms, first, peak = 0, None, 0
        for _, eid, v in evs:
            S = max(0, S + n * v - s - K * n)  # the textbook recursion
            if S > H * n:
                alarms += 1
                if first is None:
                    first = eid
                peak = max(peak, S)
        if alarms:
            expected[uid] = (alarms, first, math.floor(peak / n + 0.5))
    assert {
        u: (r.n_alarms, r.first_alarm_event, r.peak_cents)
        for u, r in out.items()
    } == expected
    assert expected and len(expected) < len(by_user)  # discriminates


def test_chi2_matches_scipy_free_reference(spark):
    out = all_queries()["q_dq_chi2"](spark, SF_T2).collect()
    assert len(out) == 1
    row = out[0]
    rows = load(spark, SF_T2, "events").select("ts", "event_type").collect()
    from collections import Counter

    cells = Counter(
        ((_micros(r.ts) // 86_400_000_000) % 7, r.event_type) for r in rows
    )
    n = sum(cells.values())
    rtot = Counter()
    ctot = Counter()
    for (d, t), o in cells.items():
        rtot[d] += o
        ctot[t] += o
    chi2 = 0.0
    # FULL grid — an absent (day, type) combination still contributes
    # its (0 - e)^2/e term (the cramers_v closed-form catch)
    for d in sorted(rtot):
        for t in sorted(ctot):
            o = cells.get((d, t), 0)
            e = rtot[d] * ctot[t] / n
            chi2 += (o - e) ** 2 / e
    assert row.chi2 == pytest.approx(chi2, abs=1e-4)  # 4dp display floor
    assert row.dof == (len(rtot) - 1) * (len(ctot) - 1)
    assert row.n_cells == len(rtot) * len(ctot)


def test_winsorized_mean_matches_bruteforce(spark):
    out = {
        r.flag: r
        for r in all_queries()["q_agg_winsorized_mean"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            int(math.floor(r.l_extendedprice * 100 + 0.5))
        )
    for flag, cs in by_flag.items():
        cs.sort()
        n = len(cs)
        lo = cs[math.ceil(5 * n / 100) - 1]
        hi = cs[math.ceil(95 * n / 100) - 1]
        wm = math.floor(sum(min(max(c, lo), hi) for c in cs) / n + 0.5)
        m = math.floor(sum(cs) / n + 0.5)
        r = out[flag]
        assert (r.n, r.lo_cents, r.hi_cents) == (n, lo, hi), flag
        assert (r.winsor_mean_cents, r.mean_cents) == (wm, m), flag
        assert r.winsor_mean_cents != r.mean_cents  # clamp engaged
        assert lo < hi


def test_mix_temperature_upsamples_low_resource(spark):
    out = {r.lang: r for r in all_queries()["q_mix_temperature"](spark, SF_T2).collect()}
    docs = load(spark, SF_T2, "documents").groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in docs}
    total = sum(counts.values())
    sumw = sum(math.sqrt(c) for _, c in sorted(counts.items()))
    assert set(out) == set(counts)
    for lang, r in out.items():
        assert r.n_docs == counts[lang]
        assert r.share == pytest.approx(math.sqrt(counts[lang]) / sumw, abs=1e-6)
        raw_share = counts[lang] / total
        if raw_share < 1 / len(counts):  # low-resource => upsampled
            assert r.share > raw_share
        else:
            assert r.share < raw_share
    assert abs(sum(r.share for r in out.values()) - 1.0) < 1e-4
    assert sum(r.target_docs for r in out.values()) <= 10000


def test_basket_rules_matches_bruteforce(spark):
    from collections import Counter
    from itertools import combinations

    out = {
        (r.ant, r.cons): r
        for r in all_queries()["q_orders_basket_rules"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n = len(baskets)
    sup = Counter()
    pair = Counter()
    for items in baskets.values():
        for p in items:
            sup[p] += 1
        for a, b in combinations(sorted(items), 2):
            pair[(a, b)] += 1
    expected = {}
    for (a, b), sab in pair.items():
        if sab < 2:
            continue
        for ant, cons in ((a, b), (b, a)):
            if 10 * sab >= sup[ant]:
                conf = math.floor(sab * 1000000 / sup[ant] + 0.5) / 1000000
                lift = (
                    math.floor(n * sab * 10000 / (sup[ant] * sup[cons]) + 0.5)
                    / 10000
                )
                expected[(ant, cons)] = (sab, conf, lift)
    assert {k: (r.sab, r.conf, r.lift) for k, r in out.items()} == expected
    assert expected
    assert all(r.lift > 1 for r in out.values())  # co-purchase => lift > 1


def test_collocations_matches_bruteforce(spark):
    from collections import Counter

    out = all_queries()["q_text_collocations"](spark, SF_SMOKE).collect()
    texts = [r.text for r in load(spark, SF_SMOKE, "documents").collect()]
    uni = Counter()
    big = Counter()
    for t in texts:
        ws = t.split(" ")
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    U = sum(uni.values())
    N = sum(big.values())
    scored = {
        (w1, w2): (c * U) * U / ((N * uni[w1]) * uni[w2])
        for (w1, w2), c in big.items()
    }
    order = sorted(scored, key=lambda k: (-scored[k], k))[:20]
    got = [(r.w1, r.w2) for r in sorted(out, key=lambda r: r.rank)]
    assert got == order
    for r in out:
        assert r.n_pairs == big[(r.w1, r.w2)]
        assert r.lift == pytest.approx(scored[(r.w1, r.w2)], abs=1e-4)
    assert len(out) == 20
    assert out[0].lift > 1  # top collocation is an actual attractor


def test_holt_matches_bruteforce_and_tracks_trend(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_time_holt"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 200).select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts), r.event_id, r.value)
        )
    assert set(out) == set(by_user)
    for uid, evs in by_user.items():
        evs.sort()
        vs = [v for _, _, v in evs]
        level, trend = vs[0], 0.0
        for v in vs[1:]:
            nl = 0.5 * v + 0.5 * (level + trend)
            trend = 0.5 * (nl - level) + 0.5 * trend
            level = nl
        r = out[uid]
        # bit-exact: Python floats are IEEE doubles folding the same order
        assert (r.level, r.trend) == (level, trend), uid
        assert r.forecast == level + trend
        assert r.n == len(vs)
    # a pure linear ramp is tracked exactly: forecast == next ramp value
    ramp = list(range(0, 40, 2))
    level, trend = float(ramp[0]), 0.0
    for v in ramp[1:]:
        nl = 0.5 * v + 0.5 * (level + trend)
        trend = 0.5 * (nl - level) + 0.5 * trend
        level = nl
    assert abs((level + trend) - 40.0) < 0.4  # converges onto the ramp


def test_downsample_matches_bruteforce(spark):
    from wikidata2pg_spark.operators.analytics import _DS_B as B

    out = {}
    for r in all_queries()["q_time_downsample"](spark, SF_SMOKE).collect():
        out.setdefault(r.user_id, {})[r.bucket] = (r.event_id, r.t_sec, r.v_cents)
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts) // 1_000_000, r.event_id,
             int(math.floor(r.value * 100 + 0.5)))
        )
    for uid, evs in by_user.items():
        evs.sort()
        n = len(evs)
        t0 = min(t for t, _, _ in evs)
        pts = [(t - t0, eid, v, t) for t, eid, v in evs]
        buckets: dict = {}
        for i, p in enumerate(pts):
            buckets.setdefault(min(B - 1, i * B // n), []).append(p)
        maxb = (n - 1) * B // n
        bs = sorted(buckets)
        expected = {}
        for bi, b in enumerate(bs):
            mem = buckets[b]
            if b == 0:
                tr, eid, v, t = mem[0]
            elif b == maxb:
                tr, eid, v, t = mem[-1]
            else:
                pm = buckets[bs[bi - 1]]
                nx = buckets[bs[bi + 1]]
                mp, stp, svp = len(pm), sum(x[0] for x in pm), sum(x[2] for x in pm)
                mn, stn, svn = len(nx), sum(x[0] for x in nx), sum(x[2] for x in nx)
                best = max(
                    mem,
                    key=lambda p: (
                        abs((p[0] * mp - stp) * (svn * mp - svp * mn)
                            - (p[2] * mp - svp) * (stn * mp - stp * mn)),
                        -p[0],
                        -p[1],
                    ),
                )
                tr, eid, v, t = best
            expected[b] = (eid, t, v)
        assert out[uid] == expected, uid
    assert set(out) == set(by_user)
    # reduction really happened: every heavy user downsampled to <= B points
    assert all(len(v) <= B for v in out.values())
    assert any(len(v) == B for v in out.values())


def test_kcore_matches_networkx_free_peeling(spark):
    from collections import Counter
    from itertools import combinations

    from wikidata2pg_spark.operators.graph import _KCORE_K, _KCORE_ROUNDS

    out = {r.part: r.core_degree for r in all_queries()["q_graph_kcore"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    adj: dict = {}
    for (a, b), c in pair.items():
        if c >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    deg = {}
    for _ in range(_KCORE_ROUNDS):
        deg = {u: len(adj[u] & nodes) for u in nodes}
        nodes = {u for u, d in deg.items() if d >= _KCORE_K}
    expected = {u: d for u, d in deg.items() if d >= _KCORE_K}
    assert out == expected
    assert expected
    # true k-core property on the converged fixture: min in-core degree >= k
    assert all(len(adj[u] & set(expected)) >= _KCORE_K for u in expected)
    # sf0.001's graph is dense (every node has degree >= k, nothing peels);
    # discrimination shows at sf0.01, where peeling halves the node set
    core_t2 = all_queries()["q_graph_kcore"](spark, SF_T2).count()
    nodes_t2 = (
        load(spark, SF_T2, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_partkey")
        .count()
        .count()
    )
    assert 0 < core_t2 < nodes_t2  # peeling removed something


def test_acf_matches_bruteforce_and_white_noise_bounds(spark):
    out: dict = {}
    for r in all_queries()["q_time_acf"](spark, SF_SMOKE).collect():
        out[(r.user_id, r.lag)] = r
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts), r.event_id, int(math.floor(r.value * 100 + 0.5)))
        )
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        vs = [v for _, _, v in evs]
        n, s = len(vs), sum(vs)
        d = sum((n * v - s) ** 2 for v in vs)
        if d == 0:
            continue
        for k in (1, 2, 3):
            if n <= k:
                continue
            nk = sum(
                (n * vs[i] - s) * (n * vs[i + k] - s) for i in range(n - k)
            )
            expected[(uid, k)] = (
                n - k,
                math.floor(nk / d * 1000000 + 0.5) / 1000000,
            )
    assert {k: (r.pairs, r.acf) for k, r in out.items()} == expected
    # acf is a normalized correlation: |r_k| <= 1 always
    assert all(-1.0 <= r.acf <= 1.0 for r in out.values())
    assert expected


def test_cohort_ltv_matches_bruteforce(spark):
    out = {
        (r.cohort_week, r.week_offset): r
        for r in all_queries()["q_cohort_ltv"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "value").collect()
    import datetime as dt

    def week(ts):
        d = ts.date()
        return d - dt.timedelta(days=d.weekday())

    first: dict = {}
    for r in rows:
        w = week(r.ts)
        if r.user_id not in first or w < first[r.user_id]:
            first[r.user_id] = w
    size: dict = {}
    for w in first.values():
        size[w] = size.get(w, 0) + 1
    rev: dict = {}
    for r in rows:
        cw = first[r.user_id]
        off = (week(r.ts) - cw).days // 7
        rev[(cw, off)] = rev.get((cw, off), 0) + int(
            math.floor(r.value * 100 + 0.5)
        )
    assert set(out) == set(rev)
    for cw in {k[0] for k in rev}:
        cum = 0
        for off in sorted(k[1] for k in rev if k[0] == cw):
            cum += rev[(cw, off)]
            r = out[(cw, off)]
            assert r.rev_cents == rev[(cw, off)]
            assert r.cum_rev_cents == cum
            assert r.cohort_size == size[cw]
            assert r.ltv_cents == math.floor(cum / size[cw] + 0.5)
    # LTV curves are monotone non-decreasing per cohort
    for cw in size:
        curve = [
            out[k].ltv_cents for k in sorted(k for k in out if k[0] == cw)
        ]
        assert curve == sorted(curve)


def test_spearman_matches_scipy_free_reference(spark):
    out = {r.flag: r for r in all_queries()["q_agg_spearman"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag: dict = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(
            (int(math.floor(r.l_quantity + 0.5)),
             int(math.floor(r.l_extendedprice * 100 + 0.5)))
        )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            r = (i + j + 1) / 2  # average of 1-based positions i+1..j
            for k in order[i:j]:
                ranks[k] = r
            i = j
        return ranks

    for flag, pairs in by_flag.items():
        qs = avg_ranks([p[0] for p in pairs])
        cs = avg_ranks([p[1] for p in pairs])
        n = len(pairs)
        mq, mc = sum(qs) / n, sum(cs) / n
        num = sum((a - mq) * (b - mc) for a, b in zip(qs, cs))
        den = math.sqrt(
            sum((a - mq) ** 2 for a in qs) * sum((b - mc) ** 2 for b in cs)
        )
        r = out[flag]
        assert r.n == n
        assert r.rho == pytest.approx(num / den, abs=2e-6), flag
        assert -1.0 <= r.rho <= 1.0
    # the synthetic fixture draws quantity and price independently, so
    # rho sits strictly inside the open interval (never degenerate +-1)
    assert set(out) == set(by_flag)
    assert all(-1.0 < r.rho < 1.0 for r in out.values())


def test_theilsen_matches_bruteforce(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_agg_theilsen"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 100).select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts) // 1_000_000, int(math.floor(r.value * 100 + 0.5)))
        )
    for uid, evs in by_user.items():
        slopes = sorted(
            (v2 - v1) / (t2 - t1)
            for i, (t1, v1) in enumerate(evs)
            for t2, v2 in evs[i + 1 :]
            if t2 != t1
            for t1, v1, t2, v2 in [(t1, v1, t2, v2) if t1 < t2 else (t2, v2, t1, v1)]
        )
        m = len(slopes)
        slope = slopes[(m + 1) // 2 - 1]
        resid = sorted(v - slope * t for t, v in evs)
        inter = resid[(len(resid) + 1) // 2 - 1]
        r = out[uid]
        assert r.n_pairs == m, uid
        assert r.slope_cps == math.floor(slope * 1000000 + 0.5) / 1000000, uid
        assert r.intercept_cents == math.floor(inter * 100 + 0.5) / 100, uid
    assert set(out) == set(by_user)


def test_theilsen_robust_to_outlier_vs_ols(spark):
    # Theil-Sen on a clean ramp with one wild outlier recovers slope ~2
    import pyarrow as pa

    ts = [1_700_000_000_000_000 + i * 1_000_000 for i in range(21)]
    vals = [2.0 * i for i in range(21)]
    vals[10] = 10_000.0  # outlier
    tb = pa.table(
        {
            "event_id": list(range(21)),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": [7] * 21,
            "event_type": ["view"] * 21,
            "value": vals,
            "props": ["{}"] * 21,
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(tb, os.path.join(td, "events.parquet"))
        out = all_queries()["q_agg_theilsen"](spark, td).collect()
    assert len(out) == 1
    assert abs(out[0].slope_cps - 200.0) < 1.0  # 2 units = 200 cents/sec


def test_cdc_chunks_match_bruteforce(spark):
    from collections import Counter

    from wikidata2pg_spark.llm.dedup import _CDC_M, _CDC_MASK, _CDC_POW, _CDC_W

    out = {r.chunk_md5: r for r in all_queries()["q_dedup_cdc_chunks"](spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    occ: Counter = Counter()
    docset: dict = {}
    lens: dict = {}
    import hashlib

    for d in docs:
        t = d.text
        L = len(t)
        if L < _CDC_W:
            continue
        codes = [ord(c) for c in t]
        ends = [
            i + _CDC_W - 1
            for i in range(1, L - _CDC_W + 2)
            if sum(
                codes[i + j - 1] * _CDC_POW[j] for j in range(_CDC_W)
            ) % _CDC_M % _CDC_MASK == 0
        ]
        ends = [e for e in ends if e < L] + [L]
        s = 1
        for e in ends:
            chunk = t[s - 1 : e]
            hh = hashlib.md5(chunk.encode()).hexdigest()
            occ[hh] += 1
            docset.setdefault(hh, set()).add(d.doc_id)
            lens[hh] = len(chunk)
            s = e + 1
    expected = {
        h: (lens[h], occ[h], len(ds), min(ds))
        for h, ds in docset.items()
        if len(ds) > 1
    }
    assert {
        h: (r.chunk_len, r.n_occurrences, r.n_docs, r.first_doc)
        for h, r in out.items()
    } == expected
    assert expected  # the fixture does contain cross-doc boilerplate


def test_cdc_boundaries_stable_under_prefix_insert(spark):
    # content-defined property: prepending text shifts only the FIRST
    # chunk; later chunk hashes are unchanged (fixed-size blocks break)
    import hashlib

    from wikidata2pg_spark.llm.dedup import _CDC_M, _CDC_MASK, _CDC_POW, _CDC_W

    def chunks(t):
        L = len(t)
        codes = [ord(c) for c in t]
        ends = [
            i + _CDC_W - 1
            for i in range(1, L - _CDC_W + 2)
            if sum(codes[i + j - 1] * _CDC_POW[j] for j in range(_CDC_W))
            % _CDC_M % _CDC_MASK == 0
        ]
        ends = [e for e in ends if e < L] + [L]
        out, s = [], 1
        for e in ends:
            out.append(hashlib.md5(t[s - 1 : e].encode()).hexdigest())
            s = e + 1
        return out

    base = "the quick brown fox jumps over the lazy dog " * 20
    shifted = "INSERTED PREFIX " + base
    c1, c2 = chunks(base), chunks(shifted)
    assert len(c1) > 3
    assert c1[1:] == c2[-(len(c1) - 1):]  # tail chunks identical


def test_delta_method_matches_bruteforce(spark):
    out = {r.arm: r for r in all_queries()["q_ab_delta_method"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    per_user: dict = {}
    for r in rows:
        x, y = per_user.setdefault(r.user_id, [0, 0])
        if r.event_type == "purchase":
            x += int(math.floor(r.value * 100 + 0.5))
        per_user[r.user_id] = [x, y + 1]
    for arm in (0, 1):
        xs = [(x, y) for u, (x, y) in per_user.items() if u % 2 == arm]
        n = len(xs)
        sx, sy = sum(x for x, _ in xs), sum(y for _, y in xs)
        r_hat = sx / sy
        dev = [x - r_hat * y for x, y in xs]
        mean_dev = sum(dev) / n
        var_dev = sum((d - mean_dev) ** 2 for d in dev) / (n - 1)
        se = math.sqrt(var_dev / n) / (sy / n)
        got = out[arm]
        assert got.n == n
        assert got.ratio_cents_per_event == pytest.approx(r_hat, abs=2e-6)
        assert got.se == pytest.approx(se, rel=1e-3)
        assert got.ci_lo == pytest.approx(r_hat - 1.96 * se, rel=1e-3)
        assert got.ci_hi == pytest.approx(r_hat + 1.96 * se, rel=1e-3)
        assert got.ci_lo < got.ratio_cents_per_event < got.ci_hi
    # both arms draw from the same generator: the CIs overlap
    assert out[0].ci_lo < out[1].ci_hi and out[1].ci_lo < out[0].ci_hi


def test_dpp_join_matches_unpartitioned_baseline(spark):
    out = {
        r.o_orderpriority: (r.n, r.sum_cents)
        for r in all_queries()["q_join_dpp"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderdate"
    ).collect()
    expected: dict = {}
    for r in rows:
        if (r.o_orderdate.month - 1) // 3 + 1 != 1:
            continue
        n, s = expected.get(r.o_orderpriority, (0, 0))
        expected[r.o_orderpriority] = (
            n + 1,
            s + int(math.floor(r.o_totalprice * 100 + 0.5)),
        )
    assert out == expected
    assert expected


def test_survival_km_matches_lifelines_free_reference(spark):
    from wikidata2pg_spark.operators.behavioral import _KM_VALUE

    out = {r.t_days: r for r in all_queries()["q_survival_km"](spark, SF_SMOKE).collect()}
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    span: dict = {}
    conv: dict = {}
    for r in rows:
        d = _micros(r.ts) // 86_400_000_000
        lo, hi = span.get(r.user_id, (d, d))
        span[r.user_id] = (min(lo, d), max(hi, d))
        if r.event_type == "purchase" and r.value >= _KM_VALUE:
            conv[r.user_id] = min(conv.get(r.user_id, d), d)
    obs = [
        (conv[u] - lo, 1) if u in conv else (hi - lo, 0)
        for u, (lo, hi) in span.items()
    ]
    n = len(obs)
    times = sorted({t for t, _ in obs})
    s = 1.0
    at_risk = n
    for t in times:
        d = sum(1 for tt, ev in obs if tt == t and ev == 1)
        c = sum(1 for tt, ev in obs if tt == t and ev == 0)
        s *= 1 - d / at_risk
        r = out[t]
        assert (r.n_risk, r.d_events, r.n_censored) == (at_risk, d, c), t
        assert r.survival == pytest.approx(s, abs=2e-6), t
        at_risk -= d + c
    assert set(out) == set(times)
    # survival is monotone non-increasing and the fixture censors someone
    curve = [out[t].survival for t in times]
    assert all(a >= b for a, b in zip(curve, curve[1:]))
    assert any(r.n_censored > 0 for r in out.values())
    assert any(r.d_events > 0 for r in out.values())


def test_link_predict_matches_bruteforce(spark):
    from collections import Counter
    from itertools import combinations

    out = {
        (r.part_a, r.part_b): r
        for r in all_queries()["q_graph_link_predict"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    adj: dict = {}
    edges = set()
    for (a, b), c in pair.items():
        if c >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
            edges.add((a, b))
    expected = {}
    for a in adj:
        for b in adj:
            if a >= b or (a, b) in edges:
                continue
            inter = len(adj[a] & adj[b])
            if inter >= 2:
                jac = math.floor(
                    inter * 10000 / (len(adj[a]) + len(adj[b]) - inter) + 0.5
                ) / 10000
                expected[(a, b)] = (inter, len(adj[a]), len(adj[b]), jac)
    assert {
        k: (r.common_neighbors, r.deg_a, r.deg_b, r.jaccard)
        for k, r in out.items()
    } == expected
    assert expected
    # predictions are strictly non-edges with meaningful overlap
    assert all(k not in edges for k in out)
    assert all(0 < r.jaccard <= 1 for r in out.values())


def test_drawdown_matches_bruteforce(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_time_drawdown"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        if r.event_type not in ("purchase", "error"):
            continue
        cents = int(math.floor(r.value * 100 + 0.5))
        by_user.setdefault(r.user_id, []).append(
            (
                _micros(r.ts),
                r.event_id,
                cents if r.event_type == "purchase" else -cents,
            )
        )
    for uid, evs in by_user.items():
        evs.sort()
        cum = 0
        peak = maxcum = None
        maxdd, trough = 0, None
        for _, eid, v in evs:
            cum += v
            peak = cum if peak is None else max(peak, cum)
            maxcum = cum if maxcum is None else max(maxcum, cum)
            dd = peak - cum
            if dd > maxdd or trough is None:
                maxdd, trough = dd, eid
        r = out[uid]
        assert r.max_drawdown_cents == maxdd, uid
        assert r.trough_event == trough, uid
        assert r.peak_cum_cents == maxcum, uid
    assert set(out) == set(by_user)
    assert any(r.max_drawdown_cents > 0 for r in out.values())


def test_binary_hamming_matches_bruteforce(spark):
    from wikidata2pg_spark.llm.similarity import _BQ_K, _BQ_NQ

    out = {}
    for r in all_queries()["q_vec_binary_hamming"](spark, SF_SMOKE).collect():
        out.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.hamming))
    vecs = {
        r.vec_id: [1 if x > 0 else 0 for x in r.embedding]
        for r in load(spark, SF_SMOKE, "embeddings").collect()
    }
    for qid in range(_BQ_NQ):
        dists = sorted(
            (sum(a != b for a, b in zip(vecs[qid], vecs[c])), c)
            for c in vecs
            if c != qid
        )[:_BQ_K]
        got = sorted(out[qid])
        assert [(i + 1, c, h) for i, (h, c) in enumerate(dists)] == got, qid
    assert set(out) == set(range(_BQ_NQ))


def test_ks_test_matches_bruteforce(spark):
    out = all_queries()["q_agg_ks_test"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    s1 = sorted(
        int(math.floor(x.value * 100 + 0.5))
        for x in rows
        if x.event_type == "purchase"
    )
    s2 = sorted(
        int(math.floor(x.value * 100 + 0.5))
        for x in rows
        if x.event_type == "view"
    )
    n1, n2 = len(s1), len(s2)
    import bisect

    best, best_at = -1, None
    for v in sorted(set(s1) | set(s2)):
        c1 = bisect.bisect_right(s1, v)
        c2 = bisect.bisect_right(s2, v)
        diff = abs(n2 * c1 - n1 * c2)
        if diff > best:
            best, best_at = diff, v
    assert (r.n1, r.n2) == (n1, n2)
    assert r.ks_at_cents == best_at
    assert r.ks_d == math.floor(best * 1e6 / (n1 * n2) + 0.5) / 1e6
    # statistic is a genuine ECDF gap: in (0, 1] and non-trivial here
    assert 0 < r.ks_d <= 1


def test_reorder_interval_matches_bruteforce(spark):
    out = {
        r.o_custkey: r
        for r in all_queries()["q_orders_reorder_interval"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(
            (_micros(r.o_orderdate) // 86_400_000_000, r.o_orderkey)
        )
    expected = {}
    for ck, ds in by_cust.items():
        if len(ds) < 2:
            continue
        ds.sort()
        gaps = sorted(b[0] - a[0] for a, b in zip(ds, ds[1:]))
        n = len(gaps)
        expected[ck] = (
            n + 1,
            gaps[0],
            gaps[(n + 1) // 2 - 1],
            gaps[-1],
            math.floor(sum(gaps) * 100 / n + 0.5) / 100,
        )
    assert {
        k: (
            r.n_orders,
            r.min_gap_days,
            r.median_gap_days,
            r.max_gap_days,
            r.avg_gap_days,
        )
        for k, r in out.items()
    } == expected
    assert expected


def test_topk_paths_matches_bruteforce(spark):
    from collections import Counter

    out = [
        (r.rank, r.path, r.n_users)
        for r in all_queries()["q_seq_topk_paths"](spark, SF_SMOKE)
        .orderBy("rank")
        .collect()
    ]
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (_micros(r.ts), r.event_id, r.event_type)
        )
    cnt = Counter(
        ">".join(et for _, _, et in sorted(evs)[:5])
        for evs in by_user.values()
    )
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert out == [(i + 1, p, n) for i, (p, n) in enumerate(ranked)]
    assert out


def test_ngram_novelty_matches_bruteforce(spark):
    out = {
        r.doc_id: r
        for r in all_queries()["q_text_ngram_novelty"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    grams = {}
    for r in rows:
        tk = r.text.split(" ")
        if len(tk) < 3:
            continue
        grams[r.doc_id] = {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        }
    first: dict = {}
    for did in sorted(grams):
        for g in grams[did]:
            first.setdefault(g, did)
    for did, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == did)
        r = out[did]
        assert (r.n_ngrams, r.n_novel) == (len(gs), novel), did
        assert r.novelty == math.floor(novel * 1e4 / len(gs) + 0.5) / 1e4
    assert set(out) == set(grams)
    # the corpus-order attribution must make SOME later doc non-novel
    assert any(r.n_novel < r.n_ngrams for r in out.values())


def test_mannwhitney_matches_bruteforce(spark):
    out = all_queries()["q_agg_mannwhitney"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    s1 = [
        int(math.floor(x.value * 100 + 0.5))
        for x in rows
        if x.event_type == "purchase"
    ]
    s2 = [
        int(math.floor(x.value * 100 + 0.5))
        for x in rows
        if x.event_type == "view"
    ]
    pooled = sorted(s1 + s2)
    # midrank x2 per value: 2*avg(1-based positions of the tie block)
    first = {}
    for i, v in enumerate(pooled):
        first.setdefault(v, i + 1)
    from collections import Counter

    cnt = Counter(pooled)
    rank2 = {v: 2 * first[v] + cnt[v] - 1 for v in cnt}
    n1, n2 = len(s1), len(s2)
    r1_x2 = sum(rank2[v] for v in s1)
    u1_x2 = r1_x2 - n1 * (n1 + 1)
    assert (r.n1, r.n2) == (n1, n2)
    assert r.u1_x2 == u1_x2
    assert r.u2_x2 == 2 * n1 * n2 + n1 * (n1 + 1) - r1_x2
    assert r.u1_x2 + r.u2_x2 == 2 * n1 * n2  # U1 + U2 identity
    assert r.auc == math.floor(u1_x2 * 1e6 / (2 * n1 * n2) + 0.5) / 1e6
    assert 0 < r.auc < 1


def test_bfs_matches_python_bfs(spark):
    from collections import deque

    out = {
        r.part: r.dist
        for r in all_queries()["q_graph_bfs"](spark, SF_SMOKE).collect()
    }
    from wikidata2pg_spark.operators.graph import _BFS_DEPTH

    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from itertools import combinations
    from collections import Counter

    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    adj: dict = {}
    for (a, b), c in pair.items():
        if c >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    src = min(adj)
    dist = {src: 0}
    dq = deque([src])
    while dq:
        n = dq.popleft()
        if dist[n] >= _BFS_DEPTH:
            continue
        for m in sorted(adj[n]):
            if m not in dist:
                dist[m] = dist[n] + 1
                dq.append(m)
    assert out == dist
    # the horizon is binding OR the component is exhausted — either way
    # multiple levels must exist for the test to discriminate
    assert max(out.values()) >= 2


def test_recall_eval_matches_numpy(spark):
    import numpy as np

    from wikidata2pg_spark.llm.similarity import _BQ_K, _BQ_NQ

    out = {
        r.query_id: r
        for r in all_queries()["q_retrieval_recall_eval"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    ids = sorted(vecs)
    for qid in range(_BQ_NQ):
        qv = vecs[qid]
        cos = sorted(
            (
                -float(
                    np.dot(qv, vecs[c])
                    / (np.linalg.norm(qv) * np.linalg.norm(vecs[c]))
                ),
                c,
            )
            for c in ids
            if c != qid
        )[:_BQ_K]
        exact = {c for _, c in cos}
        sign = {c: tuple(1 if x > 0 else 0 for x in vecs[c]) for c in ids}
        ham = sorted(
            (sum(a != b for a, b in zip(sign[qid], sign[c])), c)
            for c in ids
            if c != qid
        )[:_BQ_K]
        approx = {c for _, c in ham}
        n = len(exact & approx)
        r = out[qid]
        assert r.n_overlap == n, qid
        assert r.recall == math.floor(n * 1e4 / _BQ_K + 0.5) / 1e4
    assert set(out) == set(range(_BQ_NQ))
    # quantization must lose SOMETHING somewhere or the audit is vacuous
    assert any(r.n_overlap < _BQ_K for r in out.values())
    assert sum(r.n_overlap for r in out.values()) > 0


def test_growth_curve_matches_bruteforce(spark):
    out = {
        r.day: r
        for r in all_queries()["q_agg_growth_curve"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    days: dict = {}
    firsts: dict = {}
    for r in rows:
        d = _micros(r.ts) // 86_400_000_000
        days.setdefault(d, set()).add(r.user_id)
        firsts[r.user_id] = min(firsts.get(r.user_id, d), d)
    from collections import Counter

    new = Counter(firsts.values())
    cum = 0
    for d in sorted(days):
        cum += new.get(d, 0)
        r = out[d]
        assert r.n_active == len(days[d]), d
        assert r.n_new == new.get(d, 0), d
        assert r.cum_users == cum, d
        assert r.pct_new == math.floor(
            new.get(d, 0) * 1e4 / len(days[d]) + 0.5
        ) / 1e4
    assert set(out) == set(days)
    assert max(r.cum_users for r in out.values()) == len(firsts)
    # growth must saturate: some later day has returning users only
    assert any(r.n_new == 0 for r in out.values()) or any(
        r.pct_new < 1.0 for r in out.values()
    )


def test_seasonal_naive_matches_bruteforce(spark):
    out = {
        r.event_type: r
        for r in all_queries()["q_time_seasonal_naive"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    daily: dict = {}
    for r in rows:
        d = _micros(r.ts) // 86_400_000_000
        k = (r.event_type, d)
        daily[k] = daily.get(k, 0) + int(math.floor(r.value * 100 + 0.5))
    expected = {}
    for (et, d), actual in daily.items():
        f = daily.get((et, d - 7))
        if f is None:
            continue
        n, e, a = expected.get(et, (0, 0, 0))
        expected[et] = (n + 1, e + abs(actual - f), a + actual)
    for et, (n, e, a) in expected.items():
        r = out[et]
        assert (r.n_days, r.abs_err_cents) == (n, e), et
        assert r.wape == math.floor(e * 1e6 / a + 0.5) / 1e6
        assert r.mae_cents == math.floor(e * 100 / n + 0.5) / 100
    assert set(out) == set(expected)
    assert all(r.n_days >= 2 for r in out.values())


def test_random_walk_matches_python_walker(spark):
    from wikidata2pg_spark.operators.graph import (
        _WALK_A,
        _WALK_B,
        _WALK_C,
        _WALK_M,
        _WALK_STEPS,
    )

    out = {
        r.start: r
        for r in all_queries()["q_graph_random_walk"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter
    from itertools import combinations

    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    adj: dict = {}
    for (a, b), c in pair.items():
        if c >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    for start in adj:
        node, path = start, [start]
        for s in range(1, _WALK_STEPS + 1):
            node = min(
                adj[node],
                key=lambda nb: (
                    (node * _WALK_A + nb * _WALK_B + s * _WALK_C) % _WALK_M,
                    nb,
                ),
            )
            path.append(node)
        r = out[start]
        assert r.end_node == node, start
        assert r.path == ">".join(str(x) for x in path), start
    assert set(out) == set(adj)
    # walks actually move and are not all identical suffixes
    assert any(r.end_node != r.start for r in out.values())
    assert len({r.path for r in out.values()}) > 1


def test_duplicate_keys_clean_fixture_and_injected_dup(spark, tmp_path):
    out = {
        r.tbl: r
        for r in all_queries()["q_dq_duplicate_keys"](spark, SF_SMOKE).collect()
    }
    assert len(out) == 8
    from collections import Counter

    for t, r in out.items():
        assert r.n_rows == load(spark, SF_SMOKE, t).count(), t
        if t == "lineitem":
            # the synthetic generator does NOT make (orderkey, linenumber)
            # unique — the audit must surface that, brute-force-checked
            cnt = Counter(
                (x.l_orderkey, x.l_linenumber)
                for x in load(spark, SF_SMOKE, "lineitem")
                .select("l_orderkey", "l_linenumber")
                .collect()
            )
            assert r.n_keys == len(cnt)
            assert r.n_dup_keys == sum(1 for c in cnt.values() if c > 1)
            assert r.n_excess_rows == sum(c - 1 for c in cnt.values())
            assert r.n_dup_keys > 0
        else:
            assert (r.n_dup_keys, r.n_excess_rows) == (0, 0), t
            assert r.n_keys == r.n_rows, t
    # corrupted copy: duplicate 3 order keys -> 3 dup keys, 3 excess rows
    import pyarrow as pa

    for t in (
        "orders",
        "customer",
        "part",
        "supplier",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        tb = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        if t == "orders":
            tb = pa.concat_tables([tb, tb.slice(0, 3)])
        pq.write_table(tb, str(tmp_path / f"{t}.parquet"))
    out2 = {
        r.tbl: r
        for r in all_queries()["q_dq_duplicate_keys"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out2["orders"].n_dup_keys == 3
    assert out2["orders"].n_excess_rows == 3
    assert out2["orders"].n_rows == out["orders"].n_rows + 3
    assert out2["customer"].n_dup_keys == 0


def test_stickiness_matches_bruteforce(spark):
    out = {
        r.ym: r
        for r in all_queries()["q_cohort_stickiness"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    days: dict = {}
    months: dict = {}
    for r in rows:
        ym = r.ts.year * 100 + r.ts.month
        d = _micros(r.ts) // 86_400_000_000
        days.setdefault((ym, d), set()).add(r.user_id)
        months.setdefault(ym, set()).add(r.user_id)
    for ym, users in months.items():
        ds = [v for (m, _), v in days.items() if m == ym]
        dau_sum = sum(len(v) for v in ds)
        r = out[ym]
        assert (r.n_days, r.dau_sum, r.mau) == (len(ds), dau_sum, len(users))
        assert r.stickiness == math.floor(
            dau_sum * 1e4 / (len(ds) * len(users)) + 0.5
        ) / 1e4
        assert 0 < r.stickiness <= 1
    assert set(out) == set(months)


def test_modularity_matches_bruteforce(spark):
    out = {
        r.brand: r
        for r in all_queries()["q_graph_modularity"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    brands = {
        r.p_partkey: r.p_brand
        for r in load(spark, SF_SMOKE, "part").collect()
    }
    from collections import Counter
    from itertools import combinations

    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    edges = [(a, b) for (a, b), c in pair.items() if c >= 2]
    m = len(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    e_in = Counter()
    for a, b in edges:
        if brands[a] == brands[b]:
            e_in[brands[a]] += 1
    nodes_by_brand: dict = {}
    for n in deg:
        nodes_by_brand.setdefault(brands[n], []).append(n)
    total_q = 0.0
    for brand, nodes in nodes_by_brand.items():
        dc = sum(deg[n] for n in nodes)
        r = out[brand]
        assert (r.n_nodes, r.e_in, r.deg_sum) == (
            len(nodes),
            e_in.get(brand, 0),
            dc,
        ), brand
        num = 4 * m * e_in.get(brand, 0) - dc * dc
        assert r.q_contrib == math.floor(
            float(num) * 1e6 / (4 * m * m) + 0.5
        ) / 1e6, brand
        total_q += e_in.get(brand, 0) / m - (dc / (2 * m)) ** 2
    assert set(out) == set(nodes_by_brand)
    # modularity of a real labeling is a proper score in [-1, 1]
    assert -1.0 <= total_q <= 1.0
    assert sum(r.deg_sum for r in out.values()) == 2 * m


def test_clustering_coeff_matches_bruteforce(spark):
    out = {
        r.part: r
        for r in all_queries()["q_graph_clustering_coeff"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    from collections import Counter
    from itertools import combinations

    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    adj: dict = {}
    for (a, b), c in pair.items():
        if c >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    expected = {}
    for n, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        tri = sum(
            1 for a, b in combinations(sorted(nbrs), 2) if b in adj[a]
        )
        cl = math.floor(
            2 * tri * 1e6 / (len(nbrs) * (len(nbrs) - 1)) + 0.5
        ) / 1e6
        expected[n] = (len(nbrs), tri, cl)
    assert {
        k: (r.degree, r.n_triangles, r.clustering) for k, r in out.items()
    } == expected
    assert expected
    assert any(v[1] > 0 for v in expected.values())
    assert all(0 <= r.clustering <= 1 for r in out.values())


def test_time_split_matches_bruteforce_and_purges(spark):
    from wikidata2pg_spark.llm.sampling import (
        _SPLIT_PURGE_US,
        _SPLIT_TRAIN_PCT,
    )

    out = {
        (r.split, r.event_type): r
        for r in all_queries()["q_sample_time_split"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    ts = [( _micros(r.ts), r.event_type) for r in rows]
    lo, hi = min(t for t, _ in ts), max(t for t, _ in ts)
    cutoff = lo + (hi - lo) * _SPLIT_TRAIN_PCT // 100
    expected: dict = {}
    for t, et in ts:
        s = (
            "train"
            if t < cutoff
            else ("purged" if t < cutoff + _SPLIT_PURGE_US else "validation")
        )
        n, mn, mx = expected.get((s, et), (0, t, t))
        expected[(s, et)] = (n + 1, min(mn, t), max(mx, t))
    assert {
        k: (r.n, r.min_ts_us, r.max_ts_us) for k, r in out.items()
    } == expected
    # all three splits exist and the purge gap really separates them
    splits = {s for s, _ in out}
    assert splits == {"train", "purged", "validation"}
    max_train = max(r.max_ts_us for (s, _), r in out.items() if s == "train")
    min_val = min(
        r.min_ts_us for (s, _), r in out.items() if s == "validation"
    )
    assert min_val - max_train >= _SPLIT_PURGE_US


def test_quantile_bands_match_python_order_stats(spark):
    out = {
        r.event_type: r
        for r in all_queries()["q_agg_quantile_bands"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            int(math.floor(r.value * 100 + 0.5))
        )
    for et, vs in by_type.items():
        vs.sort()
        n = len(vs)
        r = out[et]
        assert r.n == n
        for p in (10, 25, 50, 75, 90):
            rank = (p * n + 99) // 100
            assert getattr(r, f"p{p}_cents") == vs[rank - 1], (et, p)
        assert r.p10_cents <= r.p25_cents <= r.p50_cents
        assert r.p50_cents <= r.p75_cents <= r.p90_cents
    assert set(out) == set(by_type)


def test_mutual_info_matches_bruteforce(spark):
    out = all_queries()["q_agg_mutual_info"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    from collections import Counter

    cells = Counter()
    for x in rows:
        cents = int(math.floor(x.value * 100 + 0.5))
        y = min(cents // 5000, 6)
        cells[(x.event_type, y)] += 1
    n = sum(cells.values())
    nx = Counter()
    ny = Counter()
    for (x, y), c in cells.items():
        nx[x] += c
        ny[y] += c
    mi = 0.0
    for x, y in sorted(cells):
        c = cells[(x, y)]
        mi += c / n * math.log(n * c / (nx[x] * ny[y]))
    assert (r.n, r.n_cells) == (n, len(cells))
    assert r.mi_nats == pytest.approx(mi, abs=2e-6)
    # MI of a non-degenerate table is strictly positive and bounded by
    # the smaller marginal entropy
    hx = -sum(v / n * math.log(v / n) for v in nx.values())
    hy = -sum(v / n * math.log(v / n) for v in ny.values())
    assert 0 <= r.mi_nats <= min(hx, hy) + 1e-9


def test_fanout_audit_matches_bruteforce(spark):
    out = {
        r.fanout: r
        for r in all_queries()["q_join_fanout_audit"](spark, SF_SMOKE).collect()
    }
    from collections import Counter

    li = Counter(
        r.l_orderkey
        for r in load(spark, SF_SMOKE, "lineitem").select("l_orderkey").collect()
    )
    orders = [
        r.o_orderkey
        for r in load(spark, SF_SMOKE, "orders").select("o_orderkey").collect()
    ]
    hist = Counter(li.get(ok, 0) for ok in orders)
    total = len(orders)
    assert {k: r.n_orders for k, r in out.items()} == dict(hist)
    for k, r in out.items():
        assert r.share == math.floor(hist[k] * 1e4 / total + 0.5) / 1e4
    assert sum(r.n_orders for r in out.values()) == total
    assert len(out) > 1  # fanout actually varies


def test_point_in_time_features_are_leakage_free(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_feature_point_in_time"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (
                _micros(r.ts),
                r.event_id,
                r.event_type,
                int(math.floor(r.value * 100 + 0.5)),
            )
        )
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        purch = [i for i, e in enumerate(evs) if e[2] == "purchase"]
        if not purch:
            continue
        i = purch[-1]
        prior = evs[:i]
        expected[uid] = (
            evs[i][1],
            len(prior),
            sum(e[3] for e in prior),
            prior[-1][2] if prior else None,
            (evs[i][0] - prior[-1][0]) // 60_000_000 if prior else None,
        )
    assert {
        k: (
            r.pred_event,
            r.n_prior,
            r.sum_prior_cents,
            r.last_prior_type,
            r.mins_since_prior,
        )
        for k, r in out.items()
    } == expected
    assert expected
    # at least one user purchases on their very first event (null branch)
    # and at least one has real history
    assert any(v[1] > 0 for v in expected.values())


def test_minhash_fidelity_matches_bruteforce(spark):
    import hashlib

    out = {
        (r.doc_a, r.doc_b): r
        for r in all_queries()["q_dedup_minhash_fidelity"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: set(r.text.split(" ")) for r in rows}

    def h(i, tok):
        return int(hashlib.md5(f"{i}:{tok}".encode()).hexdigest()[:15], 16)

    sig = {
        d: [min(h(i, t) for t in ts) for i in range(16)]
        for d, ts in toks.items()
        if ts
    }
    # LSH candidates: same (slot, value) bucket of size in [2, 64]
    from collections import defaultdict

    buckets = defaultdict(list)
    for d, s in sig.items():
        for i, v in enumerate(s):
            buckets[(i, v)].append(d)
    cand = set()
    for ds in buckets.values():
        if 2 <= len(ds) <= 64:
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    cand.add((ds[i], ds[j]))
    expected = {}
    for a, b in cand:
        inter = len(toks[a] & toks[b])
        if inter == 0:
            continue  # the intersection join drops empty-overlap pairs
        union = len(toks[a] | toks[b])
        n_eq = sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
        jac14 = math.floor(inter * 1e4 / union + 0.5)
        expected[(a, b)] = (
            n_eq,
            inter,
            union,
            jac14 / 1e4,
            abs(625 * n_eq - jac14),
        )
    assert {
        k: (r.n_eq, r.n_inter, r.n_union, r.jaccard, r.err_1e4)
        for k, r in out.items()
    } == expected
    assert expected
    # the audit must show the estimator is informative but imperfect
    assert any(r.err_1e4 > 0 for r in out.values())
    assert any(r.n_eq > 0 for r in out.values())


def test_degree_powerlaw_matches_bruteforce(spark):
    out = all_queries()["q_graph_degree_powerlaw"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    from collections import Counter
    from itertools import combinations

    baskets: dict = {}
    for x in rows:
        baskets.setdefault(x.l_orderkey, set()).add(x.l_partkey)
    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    deg = Counter()
    for (a, b), c in pair.items():
        if c >= 2:
            deg[a] += 1
            deg[b] += 1
    tail = sorted((d, n) for n, d in deg.items() if d >= 2)
    lsum = 0.0
    for d, _ in tail:
        lsum += math.log(d / 1.5)
    assert r.n_tail == len(tail)
    assert r.max_degree == max(d for d, _ in tail)
    assert r.alpha == pytest.approx(1.0 + len(tail) / lsum, abs=2e-4)
    assert r.alpha > 1.0


def test_abc_migration_matches_bruteforce(spark):
    out = {
        (r.class_h1, r.class_h2): r.n_parts
        for r in all_queries()["q_orders_abc_migration"](
            spark, SF_SMOKE
        ).collect()
    }
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice"
    ).collect()
    ts = [_micros(r.l_shipdate) for r in rows]
    mid = min(ts) + (max(ts) - min(ts)) // 2

    def classify(half_rows):
        rev: dict = {}
        for pk, c in half_rows:
            rev[pk] = rev.get(pk, 0) + c
        total = sum(rev.values())
        cum, cls = 0, {}
        for pk in sorted(rev, key=lambda k: (-rev[k], k)):
            cum += rev[pk]
            cls[pk] = (
                "A"
                if cum * 10 <= total * 7
                else ("B" if cum * 10 <= total * 9 else "C")
            )
        return cls

    h0, h1 = [], []
    for r in rows:
        c = int(math.floor(r.l_extendedprice * 100 + 0.5))
        (h0 if _micros(r.l_shipdate) < mid else h1).append((r.l_partkey, c))
    c0, c1 = classify(h0), classify(h1)
    from collections import Counter

    expected = Counter(
        (c0.get(pk, "N"), c1.get(pk, "N")) for pk in set(c0) | set(c1)
    )
    assert out == dict(expected)
    assert sum(out.values()) == len(set(c0) | set(c1))
    # real migration: some part changed class between halves
    assert any(a != b for a, b in out)


def test_assortativity_matches_bruteforce(spark):
    out = all_queries()["q_graph_assortativity"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    from collections import Counter
    from itertools import combinations

    baskets: dict = {}
    for x in rows:
        baskets.setdefault(x.l_orderkey, set()).add(x.l_partkey)
    pair = Counter()
    for items in baskets.values():
        pair.update(combinations(sorted(items), 2))
    edges = [(a, b) for (a, b), c in pair.items() if c >= 2]
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    exp = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    assert r.n_edges == len(edges)
    assert r.assortativity == pytest.approx(exp, abs=2e-6)
    assert -1.0 <= r.assortativity <= 1.0


def test_hhi_matches_bruteforce(spark):
    out = all_queries()["q_agg_hhi"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    rev: dict = {}
    for x in rows:
        rev[x.o_custkey] = rev.get(x.o_custkey, 0) + int(
            math.floor(x.o_totalprice * 100 + 0.5)
        )
    total = sum(rev.values())
    sq = sum(c * c for c in rev.values())
    top10 = sum(
        c for c, _ in sorted(((c, k) for k, c in rev.items()), key=lambda t: (-t[0], t[1]))[:10]
    )
    assert r.n_cust == len(rev)
    assert r.hhi == math.floor(float(sq) * 1e6 / (float(total) * total) + 0.5) / 1e6
    assert r.top10_share == math.floor(float(top10) * 1e4 / total + 0.5) / 1e4
    # sanity: HHI of n equal customers is 1/n; real data sits above that
    assert r.hhi >= math.floor(1e6 / len(rev)) / 1e6
    assert r.hhi < 1


def test_kl_drift_matches_bruteforce(spark):
    out = {
        r.source: r
        for r in all_queries()["q_dq_kl_drift"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "documents").select("source", "lang").collect()
    from collections import Counter

    cells = Counter((r.source, r.lang) for r in rows)
    ns = Counter(r.source for r in rows)
    nl = Counter(r.lang for r in rows)
    n = len(rows)
    for src in ns:
        langs = sorted(lg for (s, lg) in cells if s == src)
        kl = 0.0
        for lg in langs:
            c = cells[(src, lg)]
            kl += c / ns[src] * math.log(c * n / (ns[src] * nl[lg]))
        r = out[src]
        assert (r.n_docs, r.n_langs) == (ns[src], len(langs))
        assert r.kl_nats == pytest.approx(kl, abs=2e-6)
        assert r.kl_nats >= 0  # KL is non-negative (Gibbs)
    assert set(out) == set(ns)


def test_fulfillment_latency_matches_bruteforce(spark):
    out = {
        r.o_orderpriority: r
        for r in all_queries()["q_orders_fulfillment_latency"](
            spark, SF_SMOKE
        ).collect()
    }
    orders = {
        r.o_orderkey: (r.o_orderpriority, _micros(r.o_orderdate) // 86_400_000_000)
        for r in load(spark, SF_SMOKE, "orders").collect()
    }
    lats: dict = {}
    for r in load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        pr, od = orders[r.l_orderkey]
        lats.setdefault(pr, []).append(
            _micros(r.l_shipdate) // 86_400_000_000 - od
        )
    for pr, vs in lats.items():
        vs.sort()
        n = len(vs)
        r = out[pr]
        assert (r.n, r.min_days, r.max_days) == (n, vs[0], vs[-1])
        assert r.p50_days == vs[(50 * n + 99) // 100 - 1]
        assert r.p90_days == vs[(90 * n + 99) // 100 - 1]
        assert r.avg_days == math.floor(sum(vs) * 100 / n + 0.5) / 100
        assert r.min_days <= r.p50_days <= r.p90_days <= r.max_days
    assert set(out) == set(lats)


def test_vocab_growth_matches_bruteforce(spark):
    out = {
        r.doc_id: r
        for r in all_queries()["q_text_vocab_growth"](spark, SF_SMOKE).collect()
    }
    rows = sorted(
        load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    seen: set = set()
    tok_cum = 0
    for r in rows:
        tk = r.text.split(" ")
        tok_cum += len(tk)
        seen |= set(tk)
        g = out[r.doc_id]
        assert g.tokens_cum == tok_cum, r.doc_id
        assert g.vocab_cum == len(seen), r.doc_id
    assert set(out) == {r.doc_id for r in rows}
    # Heaps: vocabulary saturates while tokens keep growing
    last = rows[-1].doc_id
    assert out[last].vocab_cum < out[last].tokens_cum


def test_sample_negatives_are_valid_and_deterministic(spark):
    import hashlib

    out: dict = {}
    for r in all_queries()["q_sample_negatives"](spark, SF_SMOKE).collect():
        out.setdefault(r.o_custkey, []).append((r.rank, r.neg_partkey))
    orders = {
        r.o_orderkey: r.o_custkey
        for r in load(spark, SF_SMOKE, "orders").collect()
    }
    pos: dict = {}
    for r in load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect():
        pos.setdefault(orders[r.l_orderkey], set()).add(r.l_partkey)
    parts = [
        r.p_partkey for r in load(spark, SF_SMOKE, "part").collect()
    ]

    def h(c, p):
        return int(hashlib.md5(f"{c}:{p}".encode()).hexdigest()[:8], 16) % 1000

    expected = {}
    for c in pos:
        cand = sorted(
            (h(c, p), p)
            for p in parts
            if h(c, p) < 100 and p not in pos[c]
        )[:3]
        if cand:
            expected[c] = [(i + 1, p) for i, (_, p) in enumerate(cand)]
    assert {k: sorted(v) for k, v in out.items()} == expected
    # negatives are genuinely negative
    for c, negs in out.items():
        for _, p in negs:
            assert p not in pos[c]
    assert expected


def test_runs_test_matches_bruteforce(spark):
    out = all_queries()["q_agg_runs_test"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "events").select("ts", "value").collect()
    daily: dict = {}
    for x in rows:
        d = _micros(x.ts) // 86_400_000_000
        daily[d] = daily.get(d, 0) + int(math.floor(x.value * 100 + 0.5))
    vs = sorted(daily.values())
    med = vs[(len(vs) + 1) // 2 - 1]
    seq = [1 if daily[d] > med else 0 for d in sorted(daily)]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    sig = math.sqrt(
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert (r.n1, r.n2, r.runs) == (n1, n2, runs)
    assert r.z == pytest.approx((runs - mu) / sig, abs=2e-4)
    # runs count is structurally bounded
    assert 1 <= r.runs <= len(seq)


def test_concurrency_matches_sweepline(spark):
    out = all_queries()["q_win_concurrency"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    ts = sorted(
        _micros(x.ts)
        for x in load(spark, SF_SMOKE, "events").select("ts").collect()
    )
    pts = sorted(
        [(t, 1) for t in ts] + [(t + 30 * 60 * 1_000_000, -1) for t in ts],
        key=lambda p: (p[0], p[1]),
    )
    conc = peak = 0
    peak_at = None
    for t, d in pts:
        conc += d
        if conc > peak:
            peak, peak_at = conc, t
    assert r.peak_concurrency == peak
    assert r.peak_at_us == peak_at
    assert r.n_points == 2 * len(ts)
    assert 1 <= peak <= len(ts)


def test_ols2_matches_numpy_lstsq(spark):
    import numpy as np

    out = all_queries()["q_agg_ols2"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).collect()
    per: dict = {}
    for x in rows:
        a = per.setdefault(x.l_orderkey, [0, 0, 0])
        a[0] += 1
        a[1] += int(math.floor(x.l_quantity + 0.5))
        a[2] += int(math.floor(x.l_extendedprice * 100 + 0.5))
    X = np.array([[1.0, a[0], a[1]] for a in per.values()])
    y = np.array([float(a[2]) for a in per.values()])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert r.n == len(per)
    assert r.beta0_cents == pytest.approx(beta[0], abs=0.5)
    assert r.beta1 == pytest.approx(beta[1], rel=1e-4)
    assert r.beta2 == pytest.approx(beta[2], rel=1e-4)
    assert r.r2 == pytest.approx(1 - ss_res / ss_tot, abs=1e-4)
    assert 0 <= r.r2 <= 1
    # basket size and quantity genuinely explain order value here
    assert r.r2 > 0.5


def test_burstiness_matches_bruteforce(spark):
    out = {
        r.tok: r
        for r in all_queries()["q_text_burstiness"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    from collections import Counter

    percnt: dict = {}
    for r in rows:
        for t, c in Counter(r.text.split(" ")).items():
            percnt.setdefault(t, []).append(c)
    n = len(rows)
    totals = {t: sum(cs) for t, cs in percnt.items()}
    top = sorted(totals, key=lambda t: (-totals[t], t))[:10]
    assert set(out) == set(top)
    for t in top:
        cs = percnt[t]
        total = totals[t]
        sq = sum(c * c for c in cs)
        var = (n * sq - total * total) / (n * (n - 1))
        vmr = var / (total / n)
        r = out[t]
        assert (r.total, r.df) == (total, len(cs))
        assert r.vmr == pytest.approx(vmr, abs=2e-6)
        assert r.vmr > 0


def test_vec_drift_matches_numpy(spark):
    import numpy as np

    out = {
        r.label: r
        for r in all_queries()["q_vec_drift"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "embeddings").collect()
    halves: dict = {}
    for r in rows:
        q = [math.floor(x * 1e6 + 0.5) for x in r.embedding]
        halves.setdefault((r.label, r.vec_id % 2), []).append(q)
    labels = {lb for lb, _ in halves}
    for lb in labels:
        a = np.array(halves[(lb, 0)], dtype=float)
        b = np.array(halves[(lb, 1)], dtype=float)
        shift = float(
            np.sqrt(((a.mean(axis=0) - b.mean(axis=0)) ** 2).sum())
        ) / 1e6
        r = out[lb]
        assert (r.n_half0, r.n_half1) == (len(a), len(b))
        assert r.centroid_shift == pytest.approx(shift, abs=2e-6)
        # halves sample the same distribution: shift is small but nonzero
        assert 0 < r.centroid_shift < 1
    assert set(out) == labels


def test_asof_nearest_matches_bruteforce(spark):
    out = {
        r.event_id: r
        for r in all_queries()["q_join_asof_nearest"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "ts"
    ).collect()
    purch: dict = {}
    errs = []
    for r in rows:
        if r.event_type == "purchase":
            purch.setdefault(r.user_id, []).append(_micros(r.ts))
        elif r.event_type == "error":
            errs.append((r.event_id, r.user_id, _micros(r.ts)))
    for eid, uid, t in errs:
        cand = purch.get(uid)
        r = out[eid]
        if not cand:
            assert r.nearest_p_us is None and r.gap_us is None
            continue
        best = min(cand, key=lambda p: (abs(p - t), p))
        assert r.nearest_p_us == best, eid
        assert r.gap_us == best - t, eid
    assert set(out) == {e[0] for e in errs}
    # both directions occur in the fixture
    assert any(r.gap_us is not None and r.gap_us < 0 for r in out.values())
    assert any(r.gap_us is not None and r.gap_us > 0 for r in out.values())


def test_volatility_matches_bruteforce(spark):
    out = {
        r.day: r
        for r in all_queries()["q_time_volatility"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("ts", "value").collect()
    daily: dict = {}
    for x in rows:
        d = _micros(x.ts) // 86_400_000_000
        daily[d] = daily.get(d, 0) + int(math.floor(x.value * 100 + 0.5))
    days = sorted(daily)
    checked = set()
    for i in range(6, len(days)):
        # calendar RANGE frame: the band exists only when all 7
        # consecutive calendar days are present
        if days[i] - days[i - 6] != 6:
            continue
        checked.add(days[i])
        win = [daily[d] for d in days[i - 6 : i + 1]]
        n, s, sq = 7, sum(win), sum(v * v for v in win)
        mean = math.floor(s * 100 / n + 0.5) / 100
        std = math.sqrt((n * sq - s * s) / (n * (n - 1)))
        r = out[days[i]]
        assert r.cents == daily[days[i]]
        assert r.mean_cents == mean
        assert r.std_cents == pytest.approx(std, abs=0.01)
        assert r.std_cents >= 0
    assert set(out) == checked
    assert checked


def test_smoothed_rate_matches_bruteforce_and_shrinks(spark):
    out = {
        r.user_id: r
        for r in all_queries()["q_agg_smoothed_rate"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("user_id", "event_type").collect()
    stats: dict = {}
    for r in rows:
        n, c = stats.get(r.user_id, (0, 0))
        stats[r.user_id] = (n + 1, c + (r.event_type == "purchase"))
    gn = sum(n for n, _ in stats.values())
    gc = sum(c for _, c in stats.values())
    grate = gc / gn
    for uid, (n, c) in stats.items():
        r = out[uid]
        assert (r.n_events, r.n_conv) == (n, c)
        assert r.raw_rate == math.floor(c * 1e4 / n + 0.5) / 1e4
        assert r.smoothed_rate == math.floor(
            float(c * gn + 5 * gc) * 1e6 / (gn * (n + 5)) + 0.5
        ) / 1e6
        # shrinkage: smoothed sits between raw and the global rate
        lo, hi = sorted((c / n, grate))
        assert lo - 1e-6 <= r.smoothed_rate <= hi + 1e-6
    assert set(out) == set(stats)


def _rev_u_py(extprice, discount):
    return int(math.floor(extprice * 100 + 0.5)) * (
        100 - int(math.floor(discount * 100 + 0.5))
    )


def test_tpch_q3_matches_bruteforce(spark):
    out = [
        (r.l_orderkey, r.o_orderdate, r.revenue)
        for r in all_queries()["q_sql_tpch_q3"](spark, SF_SMOKE).collect()
    ]
    import datetime as dt

    cut = dt.datetime(1998, 1, 1)
    seg = {
        r.c_custkey
        for r in load(spark, SF_SMOKE, "customer").collect()
        if r.c_mktsegment == "BUILDING"
    }
    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate)
        for r in load(spark, SF_SMOKE, "orders").collect()
        if r.o_orderdate < cut
    }
    rev: dict = {}
    for r in load(spark, SF_SMOKE, "lineitem").collect():
        ok = r.l_orderkey
        if ok in orders and orders[ok][0] in seg and r.l_shipdate > cut:
            rev[ok] = rev.get(ok, 0) + _rev_u_py(
                r.l_extendedprice, r.l_discount
            )
    top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    expected = [
        (ok, orders[ok][1], math.floor(u / 100 + 0.5) / 100)
        for ok, u in top
    ]
    assert out == expected
    assert out


def test_tpch_q5_matches_bruteforce(spark):
    import datetime as dt

    out = {
        r.n_name: r.revenue
        for r in all_queries()["q_sql_tpch_q5"](spark, SF_SMOKE).collect()
    }
    region = {
        r.r_regionkey
        for r in load(spark, SF_SMOKE, "region").collect()
        if r.r_name == "ASIA"
    }
    nation = {
        r.n_nationkey: r.n_name
        for r in load(spark, SF_SMOKE, "nation").collect()
        if r.n_regionkey in region
    }
    supp = {
        r.s_suppkey: r.s_nationkey
        for r in load(spark, SF_SMOKE, "supplier").collect()
        if r.s_nationkey in nation
    }
    cust = {
        r.c_custkey: r.c_nationkey
        for r in load(spark, SF_SMOKE, "customer").collect()
    }
    orders = {
        r.o_orderkey: r.o_custkey
        for r in load(spark, SF_SMOKE, "orders").collect()
        if dt.datetime(1997, 1, 1) <= r.o_orderdate < dt.datetime(1998, 1, 1)
    }
    rev: dict = {}
    for r in load(spark, SF_SMOKE, "lineitem").collect():
        ck = orders.get(r.l_orderkey)
        if ck is None or r.l_suppkey not in supp:
            continue
        if cust[ck] != supp[r.l_suppkey]:
            continue
        nm = nation[supp[r.l_suppkey]]
        rev[nm] = rev.get(nm, 0) + _rev_u_py(r.l_extendedprice, r.l_discount)
    expected = {
        nm: math.floor(u / 100 + 0.5) / 100 for nm, u in rev.items()
    }
    assert out == expected
    assert out


def test_tpch_q10_matches_bruteforce(spark):
    import datetime as dt

    out = [
        (r.c_custkey, r.revenue)
        for r in all_queries()["q_sql_tpch_q10"](spark, SF_SMOKE).collect()
    ]
    orders = {
        r.o_orderkey: r.o_custkey
        for r in load(spark, SF_SMOKE, "orders").collect()
        if dt.datetime(1997, 1, 1) <= r.o_orderdate < dt.datetime(1997, 4, 1)
    }
    rev: dict = {}
    for r in load(spark, SF_SMOKE, "lineitem").collect():
        if r.l_returnflag != "R" or r.l_orderkey not in orders:
            continue
        ck = orders[r.l_orderkey]
        rev[ck] = rev.get(ck, 0) + _rev_u_py(r.l_extendedprice, r.l_discount)
    top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert out == [
        (ck, math.floor(u / 100 + 0.5) / 100) for ck, u in top
    ]
    assert out


def test_peak_hours_matches_bruteforce(spark):
    out = {
        r.event_type: r
        for r in all_queries()["q_time_peak_hours"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    from collections import Counter

    cells: dict = {}
    for r in rows:
        m = (_micros(r.ts) % 86_400_000_000) // 60_000_000
        cells.setdefault(r.event_type, Counter())[m] += 1
    for et, cnt in cells.items():
        s = sum(c * math.sin(2 * math.pi * m / 1440) for m, c in sorted(cnt.items()))
        c_ = sum(c * math.cos(2 * math.pi * m / 1440) for m, c in sorted(cnt.items()))
        n = sum(cnt.values())
        r = out[et]
        assert r.n == n
        assert r.peak_minute == pytest.approx(
            (math.atan2(s, c_) / (2 * math.pi) * 1440 + 1440) % 1440,
            abs=0.011,
        )
        assert r.concentration == pytest.approx(
            math.sqrt(s * s + c_ * c_) / n, abs=2e-6
        )
        assert 0 <= r.peak_minute < 1440
        assert 0 <= r.concentration <= 1
    assert set(out) == set(cells)


def test_tpch_q18_matches_bruteforce(spark):
    out = {
        r.o_orderkey: r
        for r in all_queries()["q_sql_tpch_q18"](spark, SF_SMOKE).collect()
    }
    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate, r.o_totalprice)
        for r in load(spark, SF_SMOKE, "orders").collect()
    }
    cust = {
        r.c_custkey: r.c_name
        for r in load(spark, SF_SMOKE, "customer").collect()
    }
    qty: dict = {}
    for r in load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).collect():
        qty[r.l_orderkey] = qty.get(r.l_orderkey, 0) + int(
            math.floor(r.l_quantity + 0.5)
        )
    big = {ok for ok, q in qty.items() if q > 150}
    assert set(out) == big
    for ok in big:
        ck, od, tp = orders[ok]
        r = out[ok]
        assert (r.c_custkey, r.c_name) == (ck, cust[ck])
        assert r.o_orderdate == od
        assert r.totalprice_cents == int(math.floor(tp * 100 + 0.5))
        assert r.total_qty == qty[ok]
    assert big  # threshold actually selects something


def test_pca_power_matches_numpy(spark):
    import numpy as np

    out = {
        r.pos: r.loading_x1e6
        for r in all_queries()["q_vec_pca_power"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "embeddings").collect()
    X = np.array(
        [[math.floor(x * 1000 + 0.5) for x in r.embedding] for r in rows],
        dtype=object,
    )
    n, d = len(rows), 64
    S = X.sum(axis=0)
    C = n * (X.T @ X) - np.outer(S, S)  # exact ints via object dtype
    v = np.ones(d, dtype=object)
    for _ in range(3):
        w = C @ v
        m = max(abs(int(t)) for t in w)
        v = np.array(
            [int(math.floor(float(int(t)) * 1e6 / float(m) + 0.5)) for t in w],
            dtype=object,
        )
    assert out == {i: int(v[i]) for i in range(d)}
    # the iterate is a unit-scaled direction: max |loading| == 1e6
    assert max(abs(x) for x in out.values()) == 1_000_000
    # power iteration on a PSD scatter matrix monotonically improves the
    # Rayleigh quotient and never exceeds the true top eigenvalue (random
    # embeddings have a near-flat spectrum, so full directional
    # convergence in 3 steps is NOT an invariant — the quotient is)
    Cf = np.array([[float(int(c)) for c in row] for row in C])
    lam_max = float(np.linalg.eigvalsh(Cf)[-1])

    def rayleigh(vec):
        vf = np.array([float(x) for x in vec])
        return float(vf @ Cf @ vf) / float(vf @ vf)

    got = [out[i] for i in range(d)]
    assert rayleigh(got) >= rayleigh([1.0] * d) - 1e-6
    assert rayleigh(got) <= lam_max * (1 + 1e-9)
    assert set(out) == set(range(d))


def test_pca_project_matches_python_and_component(spark):
    out = {
        r.vec_id: r.score_x1e9
        for r in all_queries()["q_vec_pca_project"](spark, SF_SMOKE).collect()
    }
    comp = {
        r.pos: r.loading_x1e6
        for r in all_queries()["q_vec_pca_power"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "embeddings").collect()
    for r in rows:
        q = [math.floor(x * 1000 + 0.5) for x in r.embedding]
        assert out[r.vec_id] == sum(q[i] * comp[i] for i in range(64)), r.vec_id
    assert set(out) == {r.vec_id for r in rows}
    # scores separate the cloud: both signs occur
    assert any(v > 0 for v in out.values()) and any(v < 0 for v in out.values())


def test_anova_eta_matches_bruteforce(spark):
    out = all_queries()["q_agg_anova_eta"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    groups: dict = {}
    for x in rows:
        groups.setdefault(x.event_type, []).append(
            int(math.floor(x.value * 100 + 0.5))
        )
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    q = sum(c * c for v in groups.values() for c in v)
    sb_raw = 0.0
    for et in sorted(groups):
        sg = sum(groups[et])
        sb_raw += float(sg) * sg / len(groups[et])
    ssb = sb_raw - float(s) * s / n
    sst = float(q) - float(s) * s / n
    ssw = float(q) - sb_raw
    assert (r.k, r.n) == (k, n)
    assert r.eta2 == pytest.approx(ssb / sst, abs=2e-6)
    assert r.f_stat == pytest.approx((ssb / (k - 1)) / (ssw / (n - k)), abs=2e-4)
    assert 0 <= r.eta2 < 1
    assert r.f_stat >= 0


def test_lag_corr_matches_numpy(spark):
    import numpy as np

    out = {
        r.lag: r
        for r in all_queries()["q_time_lag_corr"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "events").select(
        "event_type", "ts", "value"
    ).collect()
    daily: dict = {}
    for x in rows:
        d = _micros(x.ts) // 86_400_000_000
        v, b = daily.get(d, (0, 0))
        c = int(math.floor(x.value * 100 + 0.5))
        if x.event_type == "view":
            v += c
        elif x.event_type == "purchase":
            b += c
        daily[d] = (v, b)
    for lag in range(-3, 4):
        xs, ys = [], []
        for d, (v, _) in daily.items():
            if d + lag in daily:
                xs.append(v)
                ys.append(daily[d + lag][1])
        r = out[lag]
        assert r.n == len(xs)
        exp = float(np.corrcoef(xs, ys)[0, 1])
        assert r.xcorr == pytest.approx(exp, abs=2e-6), lag
        assert -1 <= r.xcorr <= 1
    assert set(out) == set(range(-3, 4))


def test_psi_matches_bruteforce(spark):
    out = all_queries()["q_dq_psi"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "events").select("ts", "value").collect()
    pts = [
        (_micros(x.ts), min(int(math.floor(x.value * 100 + 0.5)) // 3300, 9))
        for x in rows
    ]
    lo = min(t for t, _ in pts)
    hi = max(t for t, _ in pts)
    mid = lo + (hi - lo) // 2
    from collections import Counter

    h0 = Counter(b for t, b in pts if t < mid)
    h1 = Counter(b for t, b in pts if t >= mid)
    t0, t1 = sum(h0.values()), sum(h1.values())
    buckets = sorted(set(h0) | set(h1))
    nb = len(buckets)
    psi = 0.0
    for b in buckets:
        p0 = (h0[b] + 1.0) / (t0 + nb)
        p1 = (h1[b] + 1.0) / (t1 + nb)
        psi += (p0 - p1) * math.log(p0 / p1)
    assert (r.n_first_half, r.n_second_half) == (t0, t1)
    assert r.psi == pytest.approx(psi, abs=2e-6)
    # halves drawn from one distribution: PSI must read "stable"
    assert 0 <= r.psi < 0.25


def test_rbo_matches_bruteforce(spark):
    out = all_queries()["q_win_rbo"](spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    rows = load(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    ).collect()
    rev: dict = {}
    qty: dict = {}
    for x in rows:
        rev[x.l_partkey] = rev.get(x.l_partkey, 0) + int(
            math.floor(x.l_extendedprice * 100 + 0.5)
        )
        qty[x.l_partkey] = qty.get(x.l_partkey, 0) + int(
            math.floor(x.l_quantity + 0.5)
        )
    r1 = sorted(rev, key=lambda k: (-rev[k], k))[:10]
    r2 = sorted(qty, key=lambda k: (-qty[k], k))[:10]
    rbo = 0.0
    for d in range(1, 11):
        ov = len(set(r1[:d]) & set(r2[:d]))
        rbo += (1 - 0.9) * 0.9 ** (d - 1) * ov / d
    assert r.overlap_at_10 == len(set(r1) & set(r2))
    assert r.rbo == pytest.approx(rbo, abs=2e-6)
    assert 0 <= r.rbo <= 1


def test_gains_table_matches_python_ntile(spark):
    out = {
        r.decile: r
        for r in all_queries()["q_agg_gains_table"](spark, SF_SMOKE).collect()
    }
    rows = load(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    rev: dict = {}
    for x in rows:
        rev[x.o_custkey] = rev.get(x.o_custkey, 0) + int(
            math.floor(x.o_totalprice * 100 + 0.5)
        )
    order = sorted(rev, key=lambda k: (-rev[k], k))
    tiles = _py_ntile(order, 10)
    per: dict = {}
    for ck, d in tiles.items():
        n, s = per.get(d, (0, 0))
        per[d] = (n + 1, s + rev[ck])
    nt = len(order)
    rt = sum(rev.values())
    cum = 0.0
    for d in sorted(per):
        n, s = per[d]
        r = out[d]
        assert (r.n_cust, r.revenue_cents) == (n, s), d
        share = math.floor(s * 1e6 / rt + 0.5) / 1e6
        assert r.rev_share == share
        cum += share
        assert r.cum_share == pytest.approx(cum, abs=1e-9)
        assert r.lift == math.floor(float(s * nt) * 1e4 / (rt * n) + 0.5) / 1e4
    assert set(out) == set(per)
    # gains monotone: decile 1 outlifts decile 10
    assert out[1].lift > 1 > out[10].lift


def test_vocab_richness_bruteforce_and_bounds(spark):
    t = pq.read_table(f"{SF_T2}/documents.parquet", columns=["text"])
    counts: dict = {}
    for txt in t.column("text").to_pylist():
        ws = txt.split(" ")
        for i in range(len(ws) - 2):
            g = " ".join(ws[i : i + 3])
            counts[g] = counts.get(g, 0) + 1
    s_obs = len(counts)
    f1 = sum(1 for c in counts.values() if c == 1)
    f2 = sum(1 for c in counts.values() if c == 2)
    n = sum(counts.values())
    [r] = all_queries()["q_text_vocab_richness"](spark, SF_T2).collect()
    assert (r.s_obs, r.f1, r.f2, r.n_grams) == (s_obs, f1, f2, n)
    chao1 = s_obs + float(f1 * (f1 - 1)) / (2 * (f2 + 1))
    assert r.chao1 == math.floor(chao1 * 10000 + 0.5) / 10000
    assert r.gt_coverage == math.floor((1 - float(f1) / n) * 1e6 + 0.5) / 1e6
    # estimator sanity: Chao1 can never fall below the observed richness,
    # and a Zipf-tailed fixture must leave real unseen mass (f1 > 0)
    assert f1 > 0 and r.chao1 > s_obs
    assert 0.0 < r.gt_coverage < 1.0


def test_jsd_worked_examples_and_bruteforce(spark):
    from wikidata2pg_spark.llm.text import jsd_pairs_frame

    # disjoint vocabularies -> JSD = ln 2 exactly; identical -> 0
    c = spark.createDataFrame(
        [("a", "x", 3), ("a", "y", 1), ("b", "u", 2), ("b", "v", 2),
         ("d", "x", 6), ("d", "y", 2)],
        "source string, w string, c long",
    )
    got = {(r.s1, r.s2): r.jsd for r in jsd_pairs_frame(c).collect()}
    assert got[("a", "b")] == round(math.log(2), 6)
    # a and d have identical distributions (3:1 == 6:2) -> JSD 0
    assert got[("a", "d")] == 0.0
    assert got[("b", "d")] == got[("a", "b")]  # d disjoint from b too
    # brute force over the fixture corpus
    t = pq.read_table(f"{SF_T2}/documents.parquet", columns=["source", "text"])
    cnt: dict = {}
    tot: dict = {}
    vocab = set()
    for src, txt in zip(t.column("source").to_pylist(), t.column("text").to_pylist()):
        for w in txt.split(" "):
            cnt[(src, w)] = cnt.get((src, w), 0) + 1
            tot[src] = tot.get(src, 0) + 1
            vocab.add(w)
    srcs = sorted(tot)
    want = {}
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            n1, n2 = tot[s1], tot[s2]
            acc = 0.0
            for w in sorted(vocab):  # word-ordered fold, engine order
                c1, c2 = cnt.get((s1, w), 0), cnt.get((s2, w), 0)
                den = c1 * n2 + c2 * n1
                term = 0.0
                if c1 > 0:
                    term += c1 / n1 * math.log(float(2 * c1 * n2) / den)
                if c2 > 0:
                    term += c2 / n2 * math.log(float(2 * c2 * n1) / den)
                acc += term
            want[(s1, s2)] = round(0.5 * acc, 6)
    out = {
        (r.s1, r.s2): r.jsd
        for r in all_queries()["q_text_jsd_sources"](spark, SF_T2).collect()
    }
    assert len(out) == len(want) == 190
    # transcendental folds: engine-vs-python agree to an ulp-scale band
    assert all(abs(out[k] - want[k]) < 1e-9 for k in want)
    # bounded metric with real spread on the fixture
    assert all(0.0 <= v <= math.log(2) + 1e-12 for v in out.values())
    assert len(set(out.values())) > 50
