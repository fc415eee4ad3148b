"""Worked-example and brute-force references for the r6-late stats keys
(Welch t-test, Cramer's V, additive decomposition, nDCG). Per the r6
lesson (Mann-Whitney/VMR), every statistic here is ALSO pinned against
a hand-derived textbook case or closed-form edge case — the DuckDB
mirror proves Spark==DuckDB, the brute force proves code==my-reading,
only the worked example proves the formula is the textbook one."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow.parquet as pq

from tests.conftest import SF_T2
from wikidata2pg_spark.operators.analytics import (
    cramers_v_frame,
    welch_from_moments,
)
from wikidata2pg_spark.registry import all_queries

SF = SF_T2


def _floor4(x):
    return math.floor(x * 10000 + 0.5) / 10000


def _floor6(x):
    return math.floor(x * 1000000 + 0.5) / 1000000


def _cents(x):
    return int(math.floor(x * 100 + 0.5))


# ---------------------------------------------------------------- Welch


def test_welch_hand_worked_example(spark):
    """[1,2,3] vs [5,7,9], derived by hand: m1=2 v1=1, m2=7 v2=4,
    se2=1/3+4/3=5/3, t=-5/sqrt(5/3)=-3.87298..., df=(5/3)^2 /
    ((1/9)/2 + (16/9)/2) = (25/9)/(17/18) = 450/153 = 2.94117..."""
    m = spark.createDataFrame(
        [(3, 6, 14, 3, 21, 155)], "n1 long, s1 long, ss1 long, n2 long, s2 long, ss2 long"
    )
    [r] = welch_from_moments(m).collect()
    assert r.t_stat == _floor4(-5 / math.sqrt(5 / 3))
    assert abs(r.t_stat - (-3.8730)) < 1e-9
    assert r.df == _floor4(450 / 153)
    assert abs(r.df - 2.9412) < 1e-9
    # identical groups -> t = 0, df = 2n-2 (equal-variance equal-n case)
    m0 = spark.createDataFrame(
        [(3, 6, 14, 3, 6, 14)], "n1 long, s1 long, ss1 long, n2 long, s2 long, ss2 long"
    )
    [r0] = welch_from_moments(m0).collect()
    assert r0.t_stat == 0.0 and r0.df == 4.0
    # antisymmetry: swapping the groups flips t, keeps df
    ms = spark.createDataFrame(
        [(3, 21, 155, 3, 6, 14)], "n1 long, s1 long, ss1 long, n2 long, s2 long, ss2 long"
    )
    [rs] = welch_from_moments(ms).collect()
    assert rs.t_stat == -r.t_stat or (rs.t_stat == _floor4(-(-5) / math.sqrt(5 / 3)))
    assert rs.df == r.df


def test_welch_bruteforce_fixture(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    mom = {"R": [0, 0, 0], "A": [0, 0, 0]}
    for g, p in zip(
        t.column("l_returnflag").to_pylist(),
        t.column("l_extendedprice").to_pylist(),
    ):
        if g in mom:
            c = _cents(p)
            mom[g][0] += 1
            mom[g][1] += c
            mom[g][2] += c * c
    (n1, s1, ss1), (n2, s2, ss2) = mom["R"], mom["A"]
    m1, m2 = float(s1) / n1, float(s2) / n2
    # mirror the engines' cast-then-divide (ss sums exceed 2^53; an
    # exact-int division would round once where the engines round twice)
    v1 = float(n1 * ss1 - s1 * s1) / float(n1 * (n1 - 1))
    v2 = float(n2 * ss2 - s2 * s2) / float(n2 * (n2 - 1))
    se2 = v1 / n1 + v2 / n2
    t_stat = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )
    [r] = all_queries()["q_agg_welch_ttest"](spark, SF).collect()
    assert (r.n1, r.n2) == (n1, n2)
    assert r.t_stat == _floor4(t_stat)
    assert r.df == _floor4(df)
    # df must sit in the Welch bracket [min(n1,n2)-1, n1+n2-2]
    assert min(n1, n2) - 1 <= r.df <= n1 + n2 - 2


# ------------------------------------------------------------- Cramer V


def test_cramers_v_closed_form_edges(spark):
    # independence: every (row, col) cell equally filled -> chi2=0, V=0
    rows = [(a, b) for a in "AB" for b in "XY" for _ in range(3)]
    ind = spark.createDataFrame(rows, "seg string, pri string")
    [r] = cramers_v_frame(ind).collect()
    assert r.chi2 == 0.0 and r.cramers_v == 0.0 and r.n == 12
    # perfect association (diagonal 2x2) -> V = 1 exactly
    diag = spark.createDataFrame(
        [("A", "X")] * 5 + [("B", "Y")] * 7, "seg string, pri string"
    )
    [rp] = cramers_v_frame(diag).collect()
    assert rp.cramers_v == 1.0
    assert rp.chi2 == _floor4(rp.n)  # chi2 = n*(k-1) with k=2


def test_cramers_v_bruteforce_fixture(spark):
    o = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"])
    c = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg = dict(zip(c.column("c_custkey").to_pylist(), c.column("c_mktsegment").to_pylist()))
    cells: dict = {}
    for ck, pri in zip(o.column("o_custkey").to_pylist(), o.column("o_orderpriority").to_pylist()):
        k = (seg[ck], pri)
        cells[k] = cells.get(k, 0) + 1
    n = sum(cells.values())
    rmar: dict = {}
    cmar: dict = {}
    for (s, p), v in cells.items():
        rmar[s] = rmar.get(s, 0) + v
        cmar[p] = cmar.get(p, 0) + v
    chi2 = 0.0
    for s in sorted(rmar):  # FULL grid, zero-filled
        for p in sorted(cmar):
            o_ = cells.get((s, p), 0)
            d = n * o_ - rmar[s] * cmar[p]
            chi2 += (float(d) * float(d)) / float(n * rmar[s] * cmar[p])
    k = min(len(rmar), len(cmar))
    v = math.sqrt(chi2 / (n * (k - 1)))
    [r] = all_queries()["q_dq_cramers_v"](spark, SF).collect()
    assert r.n == n
    assert r.chi2 == _floor4(chi2)
    assert r.cramers_v == _floor6(v)
    assert 0.0 <= r.cramers_v <= 1.0


# ----------------------------------------------------------- decompose


def test_decompose_bruteforce_and_additivity(spark):
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for od, tp in zip(t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()):
        d = (od - epoch).days
        daily[d] = daily.get(d, 0) + _cents(tp)
    full = {}
    for d, vc in daily.items():
        win = [daily[x] for x in range(d - 3, d + 4) if x in daily]
        if len(win) == 7:
            full[d] = (vc, sum(win))
    ssum: dict = {}
    scnt: dict = {}
    for d, (vc, tu) in full.items():
        w = d % 7
        ssum[w] = ssum.get(w, 0) + (7 * vc - tu)
        scnt[w] = scnt.get(w, 0) + 1
    out = {r.day: r for r in all_queries()["q_time_decompose"](spark, SF).collect()}
    assert set(out) == set(full) and len(full) > 100
    for d, (vc, tu) in full.items():
        w = d % 7
        r = out[d]
        detr = 7 * vc - tu
        assert r.wd == w
        assert r.revenue == vc / 100
        assert r.trend == math.floor(tu / 7 + 0.5) / 100
        assert r.seasonal == math.floor(ssum[w] / (7 * scnt[w]) + 0.5) / 100
        assert r.residual == math.floor(
            (detr * scnt[w] - ssum[w]) / (7 * scnt[w]) + 0.5
        ) / 100
        # additive identity holds to display rounding
        assert abs(r.revenue - (r.trend + r.seasonal + r.residual)) <= 0.03


# ----------------------------------------------------------------- nDCG


def test_ndcg_bruteforce_fixture(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = {i: v for i, v in zip(ids, t.column("embedding").to_pylist())}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):  # fixed left-to-right order == engine folds
            s += x * y
        return s

    def ham(a, b):
        return sum(1 for x, y in zip(a, b) if (x > 0) != (y > 0))

    queries = [i for i in ids if i < 8]
    ndcg_want = {}
    hits_want = {}
    idcg = sum((11 - i) / math.log(i + 1) for i in range(1, 11))
    for q in queries:
        others = [i for i in ids if i != q]
        qn = math.sqrt(dot(embs[q], embs[q]))
        cos = sorted(
            others,
            key=lambda i: (
                -(dot(embs[q], embs[i]) / (qn * math.sqrt(dot(embs[i], embs[i])))),
                i,
            ),
        )[:10]
        rel = {v: 10 - i for i, v in enumerate(cos)}  # grades 10..1
        sysr = sorted(others, key=lambda i: (ham(embs[q], embs[i]), i))[:10]
        dcg = sum(
            rel.get(v, 0) / math.log(i + 2) for i, v in enumerate(sysr)
        )
        ndcg_want[q] = _floor6(dcg / idcg)
        hits_want[q] = sum(1 for v in sysr if v in rel)
        # scale invariance: log2-based nDCG is the same ratio
        idcg2 = sum((11 - i) / math.log2(i + 1) for i in range(1, 11))
        dcg2 = sum(rel.get(v, 0) / math.log2(i + 2) for i, v in enumerate(sysr))
        assert abs(dcg2 / idcg2 - dcg / idcg) < 1e-9
    got = {r.query_id: r for r in all_queries()["q_retrieval_ndcg"](spark, SF).collect()}
    assert set(got) == set(ndcg_want)
    for q in queries:
        assert got[q].n_rel_hits == hits_want[q], q
        assert got[q].ndcg == ndcg_want[q], q
        assert 0.0 <= got[q].ndcg <= 1.0
    # the index is useful but imperfect: some query beats 0, none need be 1
    assert any(v > 0 for v in ndcg_want.values())


# ------------------------------------------------------------ bootstrap


def test_bootstrap_ci_bruteforce_and_thresholds(spark):
    import hashlib

    from wikidata2pg_spark.operators.analytics import _BOOT_B, _POIS_T

    # threshold provenance: T[k] == floor(P(Poisson(1) <= k) * 2^32)
    c = 0.0
    term = math.exp(-1)
    for k, t in enumerate(_POIS_T):
        c += term
        assert t == math.floor(c * 2**32), k
        term /= k + 1

    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    rows = [
        (k, _cents(p))
        for k, p in zip(
            t.column("o_orderkey").to_pylist(), t.column("o_totalprice").to_pylist()
        )
    ]

    def w_of(u32: int) -> int:
        for k, thr in enumerate(_POIS_T):
            if u32 < thr:
                return k
        return 6

    means = []
    for b in range(_BOOT_B):
        swx = swn = 0
        for k, cents in rows:
            u32 = int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:8], 16)
            w = w_of(u32)
            swx += w * cents
            swn += w
        means.append((float(swx) / swn, b))
    means.sort()
    lo = math.floor(means[1][0] + 0.5) / 100  # rank 2
    hi = math.floor(means[_BOOT_B - 3][0] + 0.5) / 100  # rank B-2
    pm = math.floor(float(sum(c for _k, c in rows)) / len(rows) + 0.5) / 100
    [r] = all_queries()["q_agg_bootstrap_ci"](spark, SF).collect()
    assert r.n_orders == len(rows)
    assert r.point_mean == pm
    assert r.ci_lo == lo and r.ci_hi == hi
    # a CI worth the name: brackets the point estimate, nonzero width
    assert r.ci_lo < r.point_mean < r.ci_hi
    # Poisson(1) sanity: replicate 0's total resampled mass is within
    # 2% of n (mean weight ~ 1)
    mass0 = sum(
        w_of(int(hashlib.md5(f"{k}:0".encode()).hexdigest()[:8], 16))
        for k, _ in rows
    )
    assert abs(mass0 - len(rows)) < 0.02 * len(rows)


# ------------------------------------------------- small coverage keys


def test_cume_dist_nth_semantics(spark):
    rows = all_queries()["q_win_cume_dist_nth"](spark, SF).collect()
    assert rows
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r.o_custkey, []).append(r)
    for ck, rs in by_c.items():
        n = len(rs)
        cds = sorted(r.cd for r in rs)
        # unique tiebreak -> cume_dist values are exactly k/n, k=1..n
        assert cds == [k / n for k in range(1, n + 1)], ck
        thirds = {r.third_order for r in rs}
        assert len(thirds) == 1  # full-frame nth_value is per-partition
        if n < 3:
            assert thirds == {None}
        else:
            assert None not in thirds


def test_struct_pack_semantics(spark):
    rows = all_queries()["q_fn_struct"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.lt_flag == 1  # (a,b) < (a,b+1) always
        assert r.pri_out in {
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
        }
        assert r.cents_out > 0


def test_srm_worked_example_and_bruteforce(spark):
    import hashlib

    from wikidata2pg_spark.operators.analytics import srm_from_counts

    # hand-derived: 510 vs 490 -> chi2 = (20)^2/1000 = 0.4, not flagged
    m = spark.createDataFrame([(510, 490, 1000)], "n_a long, n_b long, n long")
    [r] = srm_from_counts(m).collect()
    assert r.chi2 == 0.4 and r.srm_flag == 0
    # and a blatant mismatch flags: 600 vs 400 -> chi2 = 40000/1000 = 40
    m2 = spark.createDataFrame([(600, 400, 1000)], "n_a long, n_b long, n long")
    [r2] = srm_from_counts(m2).collect()
    assert r2.chi2 == 40.0 and r2.srm_flag == 1
    # fixture brute force via hashlib (same md5-prefix assignment)
    t = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"])
    keys = t.column("c_custkey").to_pylist()
    n_a = sum(
        1
        for k in keys
        if int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 2 == 0
    )
    n = len(keys)
    chi2 = float((n_a - (n - n_a)) * (n_a - (n - n_a))) / n
    [rf] = all_queries()["q_dq_srm"](spark, SF).collect()
    assert (rf.n_a, rf.n_b) == (n_a, n - n_a)
    assert rf.chi2 == math.floor(chi2 * 1000000 + 0.5) / 1000000
    # a fair deterministic hash must not trip SRM on the fixture
    assert rf.srm_flag == (1 if chi2 > 3.841 else 0)


def test_truncation_fidelity_bruteforce(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = {i: v for i, v in zip(ids, t.column("embedding").to_pylist())}
    D = 16

    def dot(a, b, d=None):
        s = 0.0
        for x, y in list(zip(a, b))[: (d or len(a))]:
            s += x * y
        return s

    want = {}
    for q in [i for i in ids if i < 8]:
        others = [i for i in ids if i != q]
        qn = math.sqrt(dot(embs[q], embs[q]))
        qtn = math.sqrt(dot(embs[q], embs[q], D))
        full = sorted(
            others,
            key=lambda i: (
                -(dot(embs[q], embs[i]) / (qn * math.sqrt(dot(embs[i], embs[i])))),
                i,
            ),
        )[:10]
        trunc = sorted(
            others,
            key=lambda i: (
                -(
                    dot(embs[q], embs[i], D)
                    / (qtn * math.sqrt(dot(embs[i], embs[i], D)))
                ),
                i,
            ),
        )[:10]
        ov = len(set(full) & set(trunc))
        want[q] = (
            ov,
            math.floor(ov * 10000 / 10 + 0.5) / 10000,
            1 if full[0] == trunc[0] else 0,
        )
    got = {
        r.query_id: (r.n_overlap, r.recall, r.top1_match)
        for r in all_queries()["q_vec_truncation_fidelity"](spark, SF).collect()
    }
    assert got == want
    # truncation loses SOMETHING on random vectors (else the audit is vacuous)
    assert any(ov < 10 for ov, _r, _t in want.values())
    assert all(ov >= 1 for ov, _r, _t in want.values())


def test_changepoint_step_series_and_bruteforce(spark):
    from wikidata2pg_spark.operators.analytics import changepoint_frame

    # worked example: a clean level shift 1000 -> 2000 cents at day 20
    rows = [(d, 1000) for d in range(20)] + [(d, 2000) for d in range(20, 40)]
    step = spark.createDataFrame(rows, "day long, v long")
    [r] = changepoint_frame(step).collect()
    assert r.split_day == 19  # last day of the left segment
    assert r.before_mean == 10.0 and r.after_mean == 20.0
    # g at the true split: k(n-k)/n * delta^2 = 20*20/40 * 1000^2 = 1e7
    assert r.objective == 1e7
    # fixture brute force
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for od, tp in zip(t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()):
        d = (od - epoch).days
        daily[d] = daily.get(d, 0) + _cents(tp)
    days = sorted(daily)
    n = len(days)
    tot = sum(daily.values())
    best = None
    s = 0
    for i, d in enumerate(days[:-1], start=1):
        s += daily[d]
        diff = float(s) / i - float(tot - s) / (n - i)
        g = diff * diff * (float(i * (n - i)) / n)
        key = (-g, d)
        if best is None or key < best[0]:
            best = (key, d, s, i)
    _k, bd, bs, bi = best
    [rf] = all_queries()["q_time_changepoint"](spark, SF).collect()
    assert rf.split_day == bd
    assert rf.before_mean == math.floor(float(bs) / bi + 0.5) / 100
    assert rf.after_mean == math.floor(float(tot - bs) / (n - bi) + 0.5) / 100


def test_null_safe_join_keeps_null_bucket(spark):
    out = all_queries()["q_join_null_safe"](spark, SF).collect()
    assert out
    nulls = [r for r in out if r.status_n is None]
    # the 'P'-mapped-to-NULL facts survive AND joined the NULL dim row
    assert nulls and all(r.rep_key is not None and r.grp_n > 0 for r in nulls)
    # a plain equi join would have dropped exactly those rows
    from pyspark.sql import functions as F

    from wikidata2pg_spark.tables import load

    o = load(spark, SF, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    f = o.filter(F.col("o_orderkey") < 3000).select("o_orderkey", st.alias("k"))
    d = o.select(st.alias("dk")).distinct()
    plain = f.join(d, f["k"] == d["dk"]).count()
    assert plain == len(out) - len(nulls)
    # every fact row of the filtered range is present exactly once
    assert len({r.o_orderkey for r in out}) == len(out)


def test_agg_bool_bruteforce(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount", "l_tax"],
    )
    want: dict = {}
    for g, q, d, x in zip(
        t.column("l_returnflag").to_pylist(),
        t.column("l_quantity").to_pylist(),
        t.column("l_discount").to_pylist(),
        t.column("l_tax").to_pylist(),
    ):
        a = want.setdefault(g, [True, False, 0, 0])
        a[0] = a[0] and q >= 1
        a[1] = a[1] or d >= 0.10
        a[2] += 1 if x == 0.0 else 0
        a[3] += 1 if q >= 25 else 0
    got = {
        r.l_returnflag: [r.all_qty_pos, r.any_deep_disc, r.n_tax_free, r.n_bulk]
        for r in all_queries()["q_agg_bool"](spark, SF).collect()
    }
    assert got == want
    # discriminating fixture: both boolean outcomes occur somewhere
    assert any(v[1] for v in want.values()) and all(v[0] for v in want.values())
    assert any(v[2] > 0 for v in want.values())


def test_hampel_bruteforce_and_detects_planted_spike(spark):
    from wikidata2pg_spark.operators.analytics import (  # noqa: F401
        contingency_fold,
    )

    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    rows = [
        (u, e, ts, _cents(v))
        for u, e, ts, v in zip(
            t.column("user_id").to_pylist(),
            t.column("event_id").to_pylist(),
            t.column("ts").to_pylist(),
            t.column("value").to_pylist(),
        )
        if u < 50
    ]
    by_u: dict = {}
    for u, e, ts, vc in rows:
        by_u.setdefault(u, []).append((ts, e, vc))
    want = {}
    for u, seq in by_u.items():
        seq.sort()
        vals = [vc for _ts, _e, vc in seq]
        for i, (_ts, e, vc) in enumerate(seq):
            win = vals[max(0, i - 3): i + 4]
            s = sorted(win)
            med = s[(len(s) + 1) // 2 - 1]
            devs = sorted(abs(x - med) for x in win)
            mad = devs[(len(devs) + 1) // 2 - 1]
            out = abs(vc - med) * 10000 > 44478 * mad
            want[(u, e)] = (vc, med, mad, 1 if out else 0, med if out else vc)
    got = {
        (r.user_id, r.event_id): (
            r.value_c, r.med_c, r.mad_c, r.is_outlier, r.filtered_c,
        )
        for r in all_queries()["q_time_hampel"](spark, SF).collect()
    }
    assert got == want
    # the filter actually fires somewhere, and never rewrites inliers
    assert any(v[3] == 1 for v in want.values())
    assert all(v[4] == v[0] for v in want.values() if v[3] == 0)


def test_trimmed_mean_bruteforce_and_ordering(spark):
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"],
    )
    by_f: dict = {}
    for f_, p in zip(
        t.column("l_returnflag").to_pylist(), t.column("l_extendedprice").to_pylist()
    ):
        by_f.setdefault(f_, []).append(_cents(p))
    got = {
        r.flag: r for r in all_queries()["q_agg_trimmed_mean"](spark, SF).collect()
    }
    for f_, cs in by_f.items():
        cs.sort()
        n = len(cs)
        tr = n // 10
        kept = cs[tr: n - tr]
        r = got[f_]
        assert r.n == n and r.n_kept == len(kept)
        assert r.trimmed_mean == math.floor(
            float(sum(kept)) / len(kept) + 0.5
        ) / 100
        # robust-mean sandwich: min < trimmed < max, and trimming moved it
        assert cs[0] / 100 < r.trimmed_mean < cs[-1] / 100


def test_forecast_accuracy_bruteforce(spark):
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for od, tp in zip(t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()):
        d = (od - epoch).days
        daily[d] = daily.get(d, 0) + _cents(tp)
    sae = se = sa = nd = 0
    for d, v in daily.items():
        if d - 7 in daily:
            f_ = daily[d - 7]
            sae += abs(v - f_)
            se += v - f_
            sa += v
            nd += 1
    [r] = all_queries()["q_time_forecast_accuracy"](spark, SF).collect()
    assert r.n_days == nd and nd > 100
    assert r.wape == math.floor(float(sae * 1000000) / float(sa) + 0.5) / 1000000
    assert r.bias == math.floor(float(se * 1000000) / float(sa) + 0.5) / 1000000
    assert 0 < r.wape < 1  # seasonal-naive is informative but imperfect
    assert abs(r.bias) < r.wape  # bias magnitude bounded by WAPE by construction


def test_skyline_matches_quadratic_dominance(spark):
    t = pq.read_table(
        f"{SF}/part.parquet", columns=["p_partkey", "p_retailprice", "p_size"]
    )
    pts = [
        (k, _cents(p), s)
        for k, p, s in zip(
            t.column("p_partkey").to_pylist(),
            t.column("p_retailprice").to_pylist(),
            t.column("p_size").to_pylist(),
        )
    ]
    frontier = set()
    for k, pc, sz in pts:
        dominated = any(
            (pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz))
            for _k2, pc2, sz2 in pts
        )
        if not dominated:
            frontier.add((k, pc, sz))
    got = {
        (r.p_partkey, r.price_c, r.size)
        for r in all_queries()["q_win_skyline"](spark, SF).collect()
    }
    assert got == frontier
    # staircase: paying more must buy MORE size on a min-price/max-size
    # frontier (equal only for duplicate points)
    stair = sorted(got, key=lambda x: (x[1], -x[2]))
    sizes = [sz for _k, _pc, sz in stair]
    assert 1 <= len(got) < len(pts)
    assert all(a <= b for a, b in zip(sizes, sizes[1:]))


# ------------------------------------------------- Mann-Kendall / XmR


def test_mann_kendall_worked_examples(spark):
    from wikidata2pg_spark.operators.analytics import mann_kendall_frame

    # strictly increasing n=5: S = 10, var18 = 5*4*15 = 300,
    # z = (10-1)/sqrt(300/18) = 2.2045 -> significant increasing
    m = spark.createDataFrame(
        [("a", i, 100 + i) for i in range(5)], "priority string, ym int, v long"
    )
    [r] = mann_kendall_frame(m).collect()
    assert (r.n_periods, r.s_stat, r.var18) == (5, 10, 300)
    assert r.z == math.floor(9 / math.sqrt(300 / 18) * 10000 + 0.5) / 10000
    assert r.trend == "increasing"
    # ties: [1, 1, 2] -> S = 2, tie term 2*1*9 = 18, var18 = 66-18 = 48
    m2 = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 2)], "priority string, ym int, v long"
    )
    [r2] = mann_kendall_frame(m2).collect()
    assert (r2.s_stat, r2.var18) == (2, 48)
    assert r2.trend == "no trend"
    # exact-zero S: symmetric up-down -> z must be literal 0.0, no -0.0
    m3 = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("a", 3, 2), ("a", 4, 1)],
        "priority string, ym int, v long",
    )
    [r3] = mann_kendall_frame(m3).collect()
    assert r3.s_stat == 0 and r3.z == 0.0 and math.copysign(1, r3.z) == 1.0
    # single-period series must NOT vanish (silent-row-drop review
    # catch): zero pairs -> S=0, var18=0, 'no trend'
    m4 = spark.createDataFrame(
        [("a", 1, 42)], "priority string, ym int, v long"
    )
    [r4] = mann_kendall_frame(m4).collect()
    assert (r4.n_periods, r4.s_stat, r4.var18) == (1, 0, 0)
    assert r4.z == 0.0 and r4.trend == "no trend"


def test_mann_kendall_bruteforce(spark):
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )
    series: dict = {}
    for p, d, v in zip(
        t.column("o_orderpriority").to_pylist(),
        t.column("o_orderdate").to_pylist(),
        t.column("o_totalprice").to_pylist(),
    ):
        ym = d.year * 100 + d.month
        series.setdefault(p, {})
        series[p][ym] = series[p].get(ym, 0) + _cents(v)
    got = {
        r.priority: r
        for r in all_queries()["q_time_mann_kendall"](spark, SF).collect()
    }
    for p, by_ym in series.items():
        vals = [v for _ym, v in sorted(by_ym.items())]
        n = len(vals)
        s = sum(
            (0 < vals[j] - vals[i]) - (vals[j] - vals[i] < 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(vals).values() if c > 1
        )
        var18 = n * (n - 1) * (2 * n + 5) - ties
        r = got[p]
        assert (r.n_periods, r.s_stat, r.var18) == (n, s, var18)
        if s != 0:
            zc = (s - 1 if s > 0 else s + 1) / math.sqrt(var18 / 18)
            assert r.z == _floor4(zc)
    # discriminating: at least one significant trend at sf0.01
    assert any(r.trend != "no trend" for r in got.values())
    assert any(r.trend == "no trend" for r in got.values())


def test_xmr_worked_example_and_bruteforce(spark):
    from wikidata2pg_spark.operators.analytics import xmr_frame

    # constant 100-cent series with one 200-cent spike at day 5
    d = spark.createDataFrame(
        [(i, 200 if i == 5 else 100) for i in range(11)], "day long, v long"
    )
    [r] = xmr_frame(d).collect()
    assert (r.day, r.v_cents, r.side) == (5, 200, "above")
    mean_c, band = 1200 / 11, 2.66 * (200 / 10)
    assert r.center == math.floor(mean_c + 0.5) / 100
    assert r.ucl == math.floor(mean_c + band + 0.5) / 100
    assert r.lcl == math.floor(mean_c - band + 0.5) / 100
    # the mirrored LOW spike must label "below" — the sf0.01 fixture's
    # violations are one-sided (liveness audit), so without this the
    # below branch is never exercised anywhere
    d_low = spark.createDataFrame(
        [(i, 0 if i == 5 else 100) for i in range(11)], "day long, v long"
    )
    [rl] = xmr_frame(d_low).collect()
    assert (rl.day, rl.v_cents, rl.side) == (5, 0, "below")
    # brute force on the fixture's daily series
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for od, tp in zip(
        t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        day = (od - epoch).days
        daily[day] = daily.get(day, 0) + _cents(tp)
    days = sorted(daily)
    vs = [daily[d_] for d_ in days]
    n, sv = len(vs), sum(vs)
    mrs = [abs(b - a) for a, b in zip(vs, vs[1:])]
    m, smr = len(mrs), sum(mrs)
    want = {
        d_: ("above" if v * n > sv else "below")
        for d_, v in daily.items()
        if abs(v * n - sv) * m * 1000 > 2660 * smr * n
    }
    got = {
        r.day: r.side
        for r in all_queries()["q_time_control_chart"](spark, SF).collect()
    }
    assert got == want and len(want) > 0


def test_rolling_corr_worked_example_and_bruteforce(spark):
    from wikidata2pg_spark.operators.windows import rolling_corr_frame

    # perfect linear co-movement y = 2x + 5 -> corr exactly 1.0;
    # anti-movement y = -x -> corr exactly -1.0
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [("a", i, i + 1, 2 * (i + 1) + 5) for i in range(12)]
        + [("b", i, i + 1, 100 - (i + 1)) for i in range(12)],
        "flag string, day long, x long, y long",
    ).select(
        "flag",
        "day",
        F.col("x").cast("decimal(38,0)").alias("x"),
        F.col("y").cast("decimal(38,0)").alias("y"),
    )
    rows = rolling_corr_frame(d).collect()
    assert rows and all(r.n_obs >= 10 for r in rows)
    assert all(r.corr == 1.0 for r in rows if r.flag == "a")
    assert all(r.corr == -1.0 for r in rows if r.flag == "b")
    # brute force on the fixture
    t = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_shipdate", "l_quantity", "l_extendedprice"],
    )
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for f_, sd, q, p in zip(
        t.column("l_returnflag").to_pylist(),
        t.column("l_shipdate").to_pylist(),
        t.column("l_quantity").to_pylist(),
        t.column("l_extendedprice").to_pylist(),
    ):
        day = (sd - epoch).days
        xy = daily.setdefault((f_, day), [0, 0])
        xy[0] += int(math.floor(q + 0.5))
        xy[1] += _cents(p)
    want = {}
    by_flag: dict = {}
    for (f_, day), (x, y) in daily.items():
        by_flag.setdefault(f_, []).append((day, x, y))
    for f_, pts in by_flag.items():
        pts.sort()
        for i, (day, _x, _y) in enumerate(pts):
            fr = [(x, y) for dd, x, y in pts if day - 29 <= dd <= day]
            n = len(fr)
            if n < 10:
                continue
            sx = sum(x for x, _ in fr)
            sy = sum(y for _, y in fr)
            sxy = sum(x * y for x, y in fr)
            sxx = sum(x * x for x, _ in fr)
            syy = sum(y * y for _, y in fr)
            vx, vy = n * sxx - sx * sx, n * syy - sy * sy
            if vx <= 0 or vy <= 0:
                continue
            c = float(n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
            want[(f_, day)] = (n, _floor6(c))
    got = {
        (r.flag, r.day): (r.n_obs, r.corr)
        for r in all_queries()["q_win_rolling_corr"](spark, SF).collect()
    }
    assert got == want and len(want) > 1000
    # discriminating: correlation actually varies across the series
    assert len({v[1] for v in want.values()}) > 100


def test_mrr_bruteforce_fixture(spark):
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    embs = {i: v for i, v in zip(ids, t.column("embedding").to_pylist())}

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def ham(a, b):
        return sum(1 for x, y in zip(a, b) if (x > 0) != (y > 0))

    queries = sorted(i for i in ids if i < 8)
    rrs = []
    h1 = h3 = h10 = 0
    for qid in queries:
        qe = [float(x) for x in embs[qid]]
        qn = math.sqrt(dot(qe, qe))
        cands = [i for i in ids if i != qid]
        gold = min(
            cands,
            key=lambda i: (
                -dot(qe, [float(x) for x in embs[i]])
                / (qn * math.sqrt(dot([float(x) for x in embs[i]],
                                      [float(x) for x in embs[i]]))),
                i,
            ),
        )
        ranked = sorted(cands, key=lambda i: (ham(qe, embs[i]), i))
        rk = ranked.index(gold) + 1
        rrs.append(1.0 / rk)
        h1 += rk <= 1
        h3 += rk <= 3
        h10 += rk <= 10
    mrr = sum(rrs) / len(queries)  # query-ordered left fold
    [r] = all_queries()["q_retrieval_mrr"](spark, SF).collect()
    assert r.n_queries == len(queries) == 8
    assert r.mrr == _floor6(mrr)
    assert (r.hits_at_1, r.hits_at_3, r.hits_at_10) == (h1, h3, h10)
    # metric sanity: monotone hit bands bracket the MRR
    assert r.hits_at_1 <= r.hits_at_3 <= r.hits_at_10 <= r.n_queries
    assert r.hits_at_1 / r.n_queries <= r.mrr + 1e-9 <= 1.0
    # discriminating fixture: the index is good but not perfect
    assert 0 < r.hits_at_10 and r.hits_at_1 < r.n_queries


def test_strength_closed_form_and_bruteforce(spark):
    from wikidata2pg_spark.operators.analytics import strength_from_daily

    # pure linear trend + pure weekly seasonality, zero noise ->
    # residual is exactly 0 and BOTH strengths are exactly 1.0
    seas = [0, 70, 140, 210, 280, 350, 420]
    d = spark.createDataFrame(
        [(i, 7 * i + seas[i % 7]) for i in range(28)], "day long, value_c long"
    )
    [r] = strength_from_daily(d).collect()
    assert r.n_days == 22  # 28 minus 3 edge days each side
    assert r.f_trend == 1.0 and r.f_seasonal == 1.0
    # brute force on the fixture, mirroring the engines' exact shapes
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for od, tp in zip(
        t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        day = (od - epoch).days
        daily[day] = daily.get(day, 0) + _cents(tp)
    full = {
        d_: (v, sum(daily[x] for x in range(d_ - 3, d_ + 4) if x in daily))
        for d_, v in daily.items()
        if sum(1 for x in range(d_ - 3, d_ + 4) if x in daily) == 7
    }
    ssum: dict = {}
    scnt: dict = {}
    for d_, (v, tu) in full.items():
        w = d_ % 7
        ssum[w] = ssum.get(w, 0) + (7 * v - tu)
        scnt[w] = scnt.get(w, 0) + 1
    s_r = ss_r = s_sr = ss_sr = s_tr = ss_tr = 0.0
    for d_ in sorted(full):  # day-ordered folds, engine order
        v, tu = full[d_]
        w = d_ % 7
        detr = 7 * v - tu
        c = scnt[w]
        r_ = float(detr * c - ssum[w]) / (7 * c)
        sr_ = float(detr) / 7
        tr_ = float(7 * c * v - ssum[w]) / (7 * c)
        s_r += r_
        ss_r += r_ * r_
        s_sr += sr_
        ss_sr += sr_ * sr_
        s_tr += tr_
        ss_tr += tr_ * tr_
    n = len(full)
    var_r = n * ss_r - s_r * s_r
    var_tr = n * ss_tr - s_tr * s_tr
    var_sr = n * ss_sr - s_sr * s_sr
    [g] = all_queries()["q_time_strength"](spark, SF).collect()
    assert g.n_days == n
    assert g.f_trend == _floor6(max(0.0, 1 - var_r / var_tr))
    assert g.f_seasonal == _floor6(max(0.0, 1 - var_r / var_sr))
    # real data: strengths strictly inside (0, 1)
    assert 0.0 < g.f_trend < 1.0 and 0.0 < g.f_seasonal < 1.0


def test_hodges_lehmann_worked_example_and_bruteforce(spark):
    # hand case: series [1, 3, 5] -> Walsh sums d (i<=j): 2,4,6,6,8,10
    # sorted -> m=6, lo=3rd=6, hi=4th=6 -> HL = 12/4 = 3.0
    # (the pseudo-median equals the symmetric-series center)
    t = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )
    series: dict = {}
    for p, d_, v in zip(
        t.column("o_orderpriority").to_pylist(),
        t.column("o_orderdate").to_pylist(),
        t.column("o_totalprice").to_pylist(),
    ):
        ym = d_.year * 100 + d_.month
        series.setdefault(p, {})
        series[p][ym] = series[p].get(ym, 0) + _cents(v)
    got = {
        r.priority: r
        for r in all_queries()["q_agg_hodges_lehmann"](spark, SF).collect()
    }
    for p, by_ym in series.items():
        vals = sorted(by_ym.values())
        k = len(vals)
        walsh = sorted(
            vals[i] + vals[j] for i in range(k) for j in range(i, k)
        )
        m = len(walsh)
        hl = (walsh[(m + 1) // 2 - 1] + walsh[(m + 2) // 2 - 1]) / 4
        r = got[p]
        assert r.n_pairs == m == k * (k + 1) // 2
        assert r.hl_cents == hl  # /4 is exact in binary FP: == holds
        # robustness sandwich: HL sits strictly inside the value range
        assert vals[0] < hl < vals[-1]
    # the worked 3-point case, through the same brute-force path
    vals = [1, 3, 5]
    walsh = sorted(a + b for i, a in enumerate(vals) for b in vals[i:])
    assert (walsh[2] + walsh[3]) / 4 == 3.0


def test_freshness_bruteforce(spark):
    t = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_orderdate"]
    )
    epoch = dt.datetime(1970, 1, 1)
    days: dict = {}
    for p, d_ in zip(
        t.column("o_orderpriority").to_pylist(),
        t.column("o_orderdate").to_pylist(),
    ):
        days.setdefault(p, []).append((d_ - epoch).days)
    gmax = max(max(v) for v in days.values())
    got = {
        r.priority: r for r in all_queries()["q_dq_freshness"](spark, SF).collect()
    }
    assert set(got) == set(days)
    for p, ds in days.items():
        r = got[p]
        assert r.last_day == max(ds)
        assert r.lag_days == gmax - max(ds)
        assert r.n_last_30d == sum(1 for d_ in ds if d_ > gmax - 30)
        assert r.n_last_90d == sum(1 for d_ in ds if d_ > gmax - 90)
        assert r.stale == (1 if gmax - max(ds) > 7 else 0)
    # active fixture: every priority arrives continuously -> none stale
    assert all(r.stale == 0 for r in got.values())
    assert all(r.n_last_30d > 0 for r in got.values())


def test_ljung_box_bruteforce_and_white_noise_bound(spark):
    t = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    by_u: dict = {}
    for u, e, ts, v in zip(
        t.column("user_id").to_pylist(),
        t.column("event_id").to_pylist(),
        t.column("ts").to_pylist(),
        t.column("value").to_pylist(),
    ):
        by_u.setdefault(u, []).append((ts, e, _cents(v)))
    want = {}
    for u, seq in by_u.items():
        seq.sort()
        vs = [v for _t, _e, v in seq]
        n, s = len(vs), sum(vs)
        if n <= 3:
            continue
        dev = [n * v - s for v in vs]
        d = sum(x * x for x in dev)
        if d == 0:
            continue
        q = 0.0
        for k in (1, 2, 3):
            nk = sum(dev[i] * dev[i + k] for i in range(n - k))
            rk = float(nk) / d
            q += rk * rk / (n - k)
        q *= n * (n + 2)
        want[u] = (n, _floor4(q))
    got = {
        r.user_id: (r.n, r.lb_q)
        for r in all_queries()["q_time_ljung_box"](spark, SF).collect()
    }
    assert got == want and len(want) > 100
    # Q is a sum of squares scaled by positive factors: never negative
    assert all(v[1] >= 0.0 for v in want.values())
    # random-walk-free fixture: most users look like white noise
    assert sum(1 for v in want.values() if v[1] < 7.8147) > len(want) // 2


def test_extreme_value_bruteforce_and_invariants(spark):
    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    epoch = dt.datetime(1970, 1, 1)
    daily: dict = {}
    for od, tp in zip(
        t.column("o_orderdate").to_pylist(), t.column("o_totalprice").to_pylist()
    ):
        key = ((od - epoch).days, od.year * 100 + od.month)
        daily[key] = daily.get(key, 0) + _cents(tp)
    bm: dict = {}
    for (_d, ym), v in daily.items():
        bm[ym] = max(bm.get(ym, 0), v)
    vals = list(bm.values())
    n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
    mean = float(s) / n
    # sample sd (n-1): the conventional method-of-moments EVT denominator
    sd = math.sqrt(float(n * ss - s * s) / (float(n) * (n - 1)))
    scale = sd * math.sqrt(6.0) / 3.141592653589793
    loc = mean - 0.5772156649015329 * scale
    rl = loc - scale * math.log(-math.log(1.0 - 1.0 / 12.0))
    [r] = all_queries()["q_time_extreme_value"](spark, SF).collect()
    assert r.n_blocks == n
    fc = lambda x: math.floor(x + 0.5) / 100  # noqa: E731
    assert r.block_mean == fc(mean)
    assert r.gumbel_scale == fc(scale)
    assert r.gumbel_loc == fc(loc)
    assert r.return_level_12 == fc(rl)
    # Gumbel invariants: mode below mean, 12-block return level above it
    assert r.gumbel_loc < r.block_mean < r.return_level_12
    assert r.gumbel_scale > 0


def test_hill_tail_bruteforce(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    rows = sorted(
        zip(t.column("n_chars").to_pylist(), t.column("doc_id").to_pylist()),
        key=lambda p: (-p[0], p[1]),
    )
    k = 50
    x_ref = rows[k][0]
    acc = 0.0
    for i in range(k):  # rank-ordered fold
        acc += math.log(float(rows[i][0]) / x_ref)
    [r] = all_queries()["q_text_hill_tail"](spark, SF).collect()
    assert (r.k, r.x_ref) == (k, x_ref)
    assert r.hill == _floor6(acc / k)
    assert r.alpha == _floor4(k / acc)
    assert r.hill > 0 and r.alpha > 0


def test_bigram_entropy_bruteforce_and_information_inequalities(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    c12: dict = {}
    for txt in t.column("text").to_pylist():
        ws = txt.split(" ")
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
    c1: dict = {}
    c2: dict = {}
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        c2[b] = c2.get(b, 0) + c
    nn = sum(c12.values())
    h_cond = 0.0
    for a, b in sorted(c12):  # (w1, w2)-ordered fold
        c = c12[(a, b)]
        h_cond += c / nn * math.log(float(c1[a]) / c)
    h_w2 = 0.0
    for b in sorted(c2):
        h_w2 += c2[b] / nn * math.log(float(nn) / c2[b])
    [r] = all_queries()["q_text_bigram_entropy"](spark, SF).collect()
    assert (r.n_bigram_types, r.n_bigrams) == (len(c12), nn)
    assert r.h_cond == round(h_cond, 6)
    assert r.h_w2 == round(h_w2, 6)
    assert r.mutual_info == round(max(0.0, h_w2 - h_cond), 6)
    # information inequalities: 0 <= H(w2|w1) <= H(w2) <= ln |vocab|
    assert 0.0 <= r.h_cond <= r.h_w2 <= math.log(len(c2)) + 1e-9
    assert r.mutual_info >= 0.0


# ------------------- r7: closed-form pins for the ordered-fold family
# (these five keys predate the worked-example discipline; their existing
# brute-force tests re-derive the same formula, so a shared misconception
# would pass both. Each closed form below is hand-computable and exact in
# float arithmetic — the production KEY runs on a crafted fixture dir.)


def _write_events(tmp_path, rows):
    """rows: (ts_us, event_type, value) — full events schema so any key
    can load it."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq_.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_mutual_info_closed_forms(spark, tmp_path):
    """Independence -> MI exactly 0 (every cell has n*c == nx*ny, so each
    term is ln(1) = 0); perfect 2x2 association with equal counts ->
    MI = ln 2 exactly (0.5*ln2 + 0.5*ln2)."""
    indep = tmp_path / "indep"
    indep.mkdir()
    # 2 types x 2 value buckets ($50 bucket width), equal cell counts
    rows = []
    for et in ("A", "B"):
        rows += [(0, et, 1.00), (0, et, 60.00)] * 2
    [r] = all_queries()["q_agg_mutual_info"](
        spark, _write_events(indep, rows)
    ).collect()
    assert (r.n, r.n_cells) == (8, 4)
    assert r.mi_nats == 0.0
    dep = tmp_path / "dep"
    dep.mkdir()
    rows = [(0, "A", 1.00)] * 3 + [(0, "B", 60.00)] * 3
    [r] = all_queries()["q_agg_mutual_info"](
        spark, _write_events(dep, rows)
    ).collect()
    assert (r.n, r.n_cells) == (6, 2)
    assert r.mi_nats == _floor6(math.log(2.0)) or r.mi_nats == round(
        math.log(2.0), 6
    )
    assert r.mi_nats == 0.693147


def test_anova_eta_closed_forms(spark, tmp_path):
    """Equal group means -> SSB = 0 exactly -> eta2 = 0, F = 0; zero
    within-group variance -> SSW = 0 -> eta2 = 1 exactly and F is NULL
    (the F ratio's denominator is 0 — DuckDB's double division yields
    NULL there, and the production key's try_divide matches it; this
    pin CAUGHT the divergence: ANSI Spark used to throw
    DIVIDE_BY_ZERO on that input)."""
    eq = tmp_path / "eq"
    eq.mkdir()
    rows = [(0, "A", 1.00), (0, "A", 3.00), (0, "B", 2.00), (0, "B", 2.00)]
    [r] = all_queries()["q_agg_anova_eta"](
        spark, _write_events(eq, rows)
    ).collect()
    assert (r.k, r.n) == (2, 4)
    assert r.eta2 == 0.0 and r.f_stat == 0.0
    sep = tmp_path / "sep"
    sep.mkdir()
    rows = [(0, "A", 1.00)] * 2 + [(0, "B", 3.00)] * 2
    [r] = all_queries()["q_agg_anova_eta"](
        spark, _write_events(sep, rows)
    ).collect()
    assert r.eta2 == 1.0
    assert r.f_stat is None


def test_psi_closed_forms(spark, tmp_path):
    """Identical half-histograms -> every term (p0-p1)*ln(p0/p1) is
    exactly 0 -> PSI = 0; total bucket swap with m=2 per half ->
    PSI = 2 * (m/(m+2)) * ln(m+1) = ln 3 exactly in float."""
    H = 3_600_000_000  # one hour in us
    same = tmp_path / "same"
    same.mkdir()
    rows = [
        (0, "x", 1.00),
        (1_000_000, "x", 40.00),  # first half: bucket 0 + bucket 1
        (9 * H, "x", 1.00),
        (10 * H, "x", 40.00),  # second half: identical histogram
    ]
    [r] = all_queries()["q_dq_psi"](spark, _write_events(same, rows)).collect()
    assert (r.n_first_half, r.n_second_half, r.n_buckets) == (2, 2, 2)
    assert r.psi == 0.0
    swap = tmp_path / "swap"
    swap.mkdir()
    rows = [
        (0, "x", 1.00),
        (1_000_000, "x", 1.00),  # first half: all bucket 0
        (9 * H, "x", 40.00),
        (10 * H, "x", 40.00),  # second half: all bucket 1
    ]
    [r] = all_queries()["q_dq_psi"](spark, _write_events(swap, rows)).collect()
    t0 = (0.75 - 0.25) * math.log(0.75 / 0.25)  # smoothed (2+1)/(2+2) etc.
    t1 = (0.25 - 0.75) * math.log(0.25 / 0.75)
    assert r.psi == round(t0 + t1, 6) == 1.098612


def test_peak_hours_closed_forms(spark, tmp_path):
    """All events of a type at one minute -> circular mean IS that
    minute with resultant length exactly 1; four equally-spaced
    minutes -> resultant length 0 (no preferred time of day)."""
    d = tmp_path / "peak"
    d.mkdir()
    M = 60_000_000  # one minute in us
    rows = [(90 * M, "solo", 1.0)] * 3 + [
        (m * M, "square", 1.0) for m in (0, 360, 720, 1080)
    ]
    out = {
        r.event_type: r
        for r in all_queries()["q_time_peak_hours"](
            spark, _write_events(d, rows)
        ).collect()
    }
    assert out["solo"].n == 3
    assert out["solo"].peak_minute == 90.0
    assert out["solo"].concentration == 1.0
    assert out["square"].n == 4
    assert out["square"].concentration == 0.0


def test_kl_drift_closed_forms(spark, tmp_path):
    """A source whose language mix equals the corpus mix -> KL exactly 0
    (every cell has nsl/ns == nl/n); two fully-disjoint single-language
    sources -> KL = ln 2 for each."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    def write_docs(d, rows):  # rows: (source, lang)
        t = pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(["w"] * len(rows), pa.string()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[0] for r in rows], pa.string()),
                "n_chars": pa.array([1] * len(rows), pa.int64()),
            }
        )
        pq_.write_table(t, f"{d}/documents.parquet")
        return str(d)

    mix = tmp_path / "mix"
    mix.mkdir()
    rows = [(s, lang) for s in ("A", "B") for lang in ("en", "de") for _ in range(2)]
    out = {
        r.source: r
        for r in all_queries()["q_dq_kl_drift"](
            spark, write_docs(mix, rows)
        ).collect()
    }
    assert out["A"].kl_nats == 0.0 and out["B"].kl_nats == 0.0
    assert out["A"].n_langs == 2
    disj = tmp_path / "disj"
    disj.mkdir()
    rows = [("A", "en")] * 3 + [("B", "de")] * 3
    out = {
        r.source: r
        for r in all_queries()["q_dq_kl_drift"](
            spark, write_docs(disj, rows)
        ).collect()
    }
    assert out["A"].kl_nats == out["B"].kl_nats == round(math.log(2.0), 6)
    assert out["A"].n_langs == 1


def _write_lineitem(d, rows):
    """rows: (orderkey, linenumber, returnflag, quantity, extendedprice) —
    full lineitem schema so load() and any key can use it."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    n = len(rows)
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array([1] * n, pa.int64()),
            "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
            "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array(
                [float(r[4]) for r in rows], pa.float64()
            ),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
        }
    )
    pq_.write_table(t, f"{d}/lineitem.parquet")
    return str(d)


def test_spearman_closed_forms(spark, tmp_path):
    """Strictly co-monotone -> rho exactly 1; strictly anti-monotone ->
    exactly -1; and a hand-ranked tie case (avg ranks q [1.5,1.5,3,4],
    price [1,2.5,2.5,4]) -> rho = 60/72 = 0.833333."""
    d = tmp_path / "sp"
    d.mkdir()
    rows = []
    for i in range(1, 5):
        rows.append((i, 1, "R", i, float(i)))  # q up, price up
        rows.append((i, 2, "A", i, float(5 - i)))  # q up, price down
    for ln, (q, p) in enumerate([(1, 10.0), (1, 20.0), (2, 20.0), (3, 30.0)]):
        rows.append((100 + ln, 1, "N", q, p))
    out = {
        r.flag: r
        for r in all_queries()["q_agg_spearman"](
            spark, _write_lineitem(d, rows)
        ).collect()
    }
    assert out["R"].rho == 1.0
    assert out["A"].rho == -1.0
    assert out["N"].rho == _floor6(60 / 72)  # = 0.833333


def test_theilsen_closed_forms(spark, tmp_path):
    """An exact line recovers slope and intercept exactly; adding ONE
    wild outlier to five on-line points leaves the median slope on the
    true line (10 of 15 pairwise slopes are exact) — the 29% breakdown
    robustness OLS lacks, pinned numerically."""
    d = tmp_path / "ts"
    d.mkdir()
    rows = []
    # user 1: v = 100 + 5t cents on t = 0..40s, plus an outlier at t=50
    for i, t in enumerate((0, 10, 20, 30, 40)):
        rows.append((t * 1_000_000, "x", (100 + 5 * t) / 100))
    rows.append((50 * 1_000_000, "x", 1000.00))
    ev = [(ts, et, v) for ts, et, v in rows]
    p = _write_events(d, ev)
    # rewrite with distinct users: user 1 = the outlier series; user 2 =
    # a pure negative-slope line v = 1000 - 3t
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rows2 = [(ts, 1, et, v) for ts, et, v in ev] + [
        (t * 1_000_000, 2, "x", (1000 - 3 * t) / 100) for t in (0, 10, 20)
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows2)), pa.int64()),
            "ts": pa.array([r[0] for r in rows2], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows2], pa.int64()),
            "event_type": pa.array([r[2] for r in rows2], pa.string()),
            "value": pa.array([float(r[3]) for r in rows2], pa.float64()),
            "props": pa.array(["{}"] * len(rows2), pa.string()),
        }
    )
    pq_.write_table(t, f"{p}/events.parquet")
    out = {
        r.user_id: r
        for r in all_queries()["q_agg_theilsen"](spark, p).collect()
    }
    assert out[1].n_pairs == 15
    assert out[1].slope_cps == 5.0  # outlier-robust: still the line
    assert out[1].intercept_cents == 100.0
    assert out[2].slope_cps == -3.0
    assert out[2].intercept_cents == 1000.0


def test_ks_test_closed_forms(spark, tmp_path):
    """Identical samples -> D exactly 0; disjoint supports -> D exactly
    1 at the lower sample's value."""
    same = tmp_path / "same"
    same.mkdir()
    rows = []
    for et in ("purchase", "view"):
        rows += [(0, et, 1.00), (0, et, 40.00)]
    [r] = all_queries()["q_agg_ks_test"](
        spark, _write_events(same, rows)
    ).collect()
    assert (r.n1, r.n2) == (2, 2)
    assert r.ks_d == 0.0
    assert r.ks_at_cents == 100  # argmax of an all-zero gap -> smallest v
    disj = tmp_path / "disj"
    disj.mkdir()
    rows = [(0, "purchase", 1.00)] * 3 + [(0, "view", 40.00)] * 2
    [r] = all_queries()["q_agg_ks_test"](
        spark, _write_events(disj, rows)
    ).collect()
    assert (r.n1, r.n2) == (3, 2)
    assert r.ks_d == 1.0 and r.ks_at_cents == 100


def test_gini_closed_forms(spark, tmp_path):
    """All-equal values -> G exactly 0; all mass on one row of n ->
    G = (n-1)/n exactly (0.75 for n=4)."""
    d = tmp_path / "gini"
    d.mkdir()
    rows = [(i, 1, "R", 1, 1.00) for i in range(1, 5)]
    rows += [(i, 1, "A", 1, 0.00) for i in range(1, 4)] + [(4, 1, "A", 1, 10.00)]
    out = {
        r.l_returnflag: r
        for r in all_queries()["q_agg_gini"](
            spark, _write_lineitem(d, rows)
        ).collect()
    }
    assert out["R"].gini == 0.0
    assert out["A"].gini == 0.75


def test_entropy_closed_forms(spark, tmp_path):
    """Uniform over 4 hours -> ln 4 (1.39 at 2dp); all in one hour ->
    exactly 0."""
    d = tmp_path / "ent"
    d.mkdir()
    H = 3_600_000_000
    rows = [(h * H, "u", 1.0) for h in (0, 1, 2, 3)]
    rows += [(5 * H, "one", 1.0)] * 4
    out = {
        r.event_type: r
        for r in all_queries()["q_agg_entropy"](
            spark, _write_events(d, rows)
        ).collect()
    }
    assert out["u"].n == 4 and out["u"].entropy == round(math.log(4.0), 2)
    assert out["one"].entropy == 0.0


def test_regression_closed_forms(spark, tmp_path):
    """An exact line y = 2x + 3 recovers slope/intercept exactly with
    R^2 exactly 1; a constant-y group has slope 0 and UNDEFINED R^2
    (dy = 0 -> NULL on both engines); a constant-x group has every
    statistic undefined (dx = 0 -> NULL) — the ANSI-throw class the
    try_divide alignment closes."""
    d = tmp_path / "reg"
    d.mkdir()
    rows = []
    for i in range(1, 5):
        rows.append((i, 1, "R", i, float(2 * i + 3)))  # exact line
        rows.append((i, 2, "A", i, 5.00))  # constant y
        rows.append((i, 3, "N", 2, float(i)))  # constant x
    out = {
        r.l_returnflag: r
        for r in all_queries()["q_agg_regression"](
            spark, _write_lineitem(d, rows)
        ).collect()
    }
    assert (out["R"].slope, out["R"].intercept, out["R"].r2) == (2.0, 3.0, 1.0)
    assert (out["A"].slope, out["A"].intercept) == (0.0, 5.0)
    assert out["A"].r2 is None
    assert out["N"].slope is None and out["N"].r2 is None


def test_skewkurt_closed_forms(spark, tmp_path):
    """Symmetric two-point distribution -> skewness exactly 0, excess
    kurtosis exactly -2 (m4 = m2^2); Bernoulli(1/4) -> the textbook
    (1-2p)/sqrt(pq) and (1-6pq)/(pq) values; a constant group is
    undefined (m2 = 0 -> NULL on both engines)."""
    d = tmp_path / "sk"
    d.mkdir()
    rows = []
    for i in range(1, 3):
        rows.append((i, 1, "R", 1, 1.00))
        rows.append((i, 2, "R", 1, 3.00))
        rows.append((i, 1, "A", 1, 2.00))  # constant
    rows += [(9, ln, "N", 1, 0.00) for ln in (1, 2, 3)] + [(9, 4, "N", 1, 1.00)]
    out = {
        r.l_returnflag: r
        for r in all_queries()["q_agg_skewkurt"](
            spark, _write_lineitem(d, rows)
        ).collect()
    }
    assert out["R"].skewness == 0.0 and out["R"].kurtosis == -2.0
    assert out["A"].skewness is None and out["A"].kurtosis is None
    # Bernoulli(1/4) in cents {0,0,0,100}: same float shape as engines
    m1, r2_, r3_, r4_ = 25.0, 2500.0, 250000.0, 25000000.0
    m2 = r2_ - m1 * m1
    m3 = r3_ - 3.0 * m1 * r2_ + 2.0 * m1 * m1 * m1
    m4 = r4_ - 4.0 * m1 * r3_ + 6.0 * m1 * m1 * r2_ - 3.0 * m1 ** 4
    assert out["N"].skewness == _floor4(m3 / (m2 * math.sqrt(m2)))
    assert out["N"].kurtosis == _floor4(m4 / (m2 * m2) - 3.0)
    # textbook cross-check: (1-2p)/sqrt(pq), (1-6pq)/(pq) at p=1/4
    p, q = 0.25, 0.75
    assert abs(out["N"].skewness - (1 - 2 * p) / math.sqrt(p * q)) < 2e-4
    assert abs(out["N"].kurtosis - (1 - 6 * p * q) / (p * q)) < 2e-4


def _write_orders(d, rows):
    """rows: (orderkey, custkey, totalprice, orderdate_us, priority)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    n = len(rows)
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * n, pa.string()),
            "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq_.write_table(t, f"{d}/orders.parquet")
    return str(d)


def test_corr_matrix_closed_forms(spark, tmp_path):
    """Exact linear relations: price = 2*qty and discount falling
    linearly in qty -> the three correlations are exactly +1, -1, -1."""
    d = tmp_path / "corr"
    d.mkdir()
    rows = [(i, 1, "R", i, float(2 * i)) for i in range(1, 5)]
    p = _write_lineitem(d, rows)
    # rewrite with the linear discount column (writer pins discount 0)
    import pyarrow.parquet as pq_
    import pyarrow as pa

    t = pq_.read_table(f"{p}/lineitem.parquet")
    disc = pa.array([(400 - 100 * i) / 10000 for i in range(1, 5)], pa.float64())
    t = t.set_column(
        t.schema.get_field_index("l_discount"),
        t.schema.field("l_discount"),
        disc,
    )
    pq_.write_table(t, f"{p}/lineitem.parquet")
    [r] = all_queries()["q_agg_corr_matrix"](spark, p).collect()
    assert r.corr_qty_price == 1.0
    assert r.corr_qty_disc == -1.0
    assert r.corr_price_disc == -1.0


def test_benford_closed_form(spark, tmp_path):
    """Crafted leading digits: three digit-1 totals and one digit-9
    total -> observed shares exactly 0.75/0.25 against the pinned
    Benford expectations."""
    d = tmp_path / "ben"
    d.mkdir()
    rows = [
        (1, 1, 1.00, 0, "1-URGENT"),
        (2, 1, 10.00, 0, "1-URGENT"),
        (3, 1, 150.00, 0, "1-URGENT"),
        (4, 1, 9.00, 0, "1-URGENT"),
    ]
    out = {
        r.digit: r
        for r in all_queries()["q_dq_benford"](
            spark, _write_orders(d, rows)
        ).collect()
    }
    assert set(out) == {1, 9}
    assert (out[1].n, out[1].obs_share, out[1].exp_share) == (3, 0.75, 0.3010)
    assert (out[9].n, out[9].obs_share, out[9].exp_share) == (1, 0.25, 0.0458)


def test_hhi_closed_forms(spark, tmp_path):
    """20 equal customers -> HHI exactly 1/20 with top-10 share exactly
    0.5; a single customer -> both exactly 1."""
    d = tmp_path / "hhi20"
    d.mkdir()
    rows = [(k, k, 1.00, 0, "1-URGENT") for k in range(1, 21)]
    [r] = all_queries()["q_agg_hhi"](spark, _write_orders(d, rows)).collect()
    assert r.n_cust == 20
    assert r.hhi == 0.05 and r.top10_share == 0.5
    d1 = tmp_path / "hhi1"
    d1.mkdir()
    [r] = all_queries()["q_agg_hhi"](
        spark, _write_orders(d1, [(1, 1, 7.00, 0, "1-URGENT")])
    ).collect()
    assert r.hhi == 1.0 and r.top10_share == 1.0


def test_runs_test_closed_forms(spark, tmp_path):
    """Perfectly alternating above/below-median days -> the maximum 2n
    runs; fully clustered -> the minimum 2 runs; z from the closed-form
    normal approximation, hand-computed with the same float shape."""
    DAY = 86_400_000_000

    def daily(d, cents_seq):
        return _write_events(
            d, [(i * DAY, "x", c / 100) for i, c in enumerate(cents_seq)]
        )

    alt = tmp_path / "alt"
    alt.mkdir()
    [r] = all_queries()["q_agg_runs_test"](
        spark, daily(alt, [100, 10000] * 4)
    ).collect()
    assert (r.n1, r.n2, r.runs) == (4, 4, 8)
    mu = 2.0 * 4 * 4 / 8 + 1
    sig = math.sqrt(2.0 * 4 * 4 * (2.0 * 4 * 4 - 8) / ((8.0 * 8) * 7))
    assert r.z == round((8 - mu) / sig, 4)
    clus = tmp_path / "clus"
    clus.mkdir()
    [r] = all_queries()["q_agg_runs_test"](
        spark, daily(clus, [100] * 4 + [10000] * 4)
    ).collect()
    assert (r.n1, r.n2, r.runs) == (4, 4, 2)
    assert r.z == round((2 - mu) / sig, 4)


def test_volatility_closed_forms(spark, tmp_path):
    """A constant week -> rolling std exactly 0; the 1..7-dollar ramp ->
    sample std sqrt(28e5/6) hand-computed from the same moment shape."""
    DAY = 86_400_000_000
    d = tmp_path / "vol"
    d.mkdir()
    rows = [(i * DAY, "x", (i + 1) * 1.00) for i in range(7)]
    rows += [(i * DAY, "x", 0.00) for i in range(7, 14)]  # flat tail
    out = {
        r.day: r
        for r in all_queries()["q_time_volatility"](
            spark, _write_events(d, rows)
        ).collect()
    }
    # day 6 window = the full ramp 100..700 cents
    n, s, sq = 7, 2800, sum((c * 100) ** 2 for c in range(1, 8))
    assert out[6].mean_cents == 400.0
    assert out[6].std_cents == round(
        math.sqrt((n * float(sq) - float(s) * s) / (n * (n - 1))), 2
    )
    # day 13 window = seven zero days -> std exactly 0
    assert out[13].std_cents == 0.0 and out[13].mean_cents == 0.0


def test_acf_closed_forms(spark, tmp_path):
    """The +/-100-cent alternator has lag-k autocorrelation
    (-1)^k * (n-k)/n exactly: -5/6, 2/3, -1/2 at n = 6; a constant
    series (zero variance) is excluded by the den > 0 guard rather
    than erroring."""
    d = tmp_path / "acf"
    d.mkdir()
    rows = [(i * 1_000_000, 1, "x", 1.00 if i % 2 == 0 else 3.00) for i in range(6)]
    rows += [(i * 1_000_000, 2, "x", 5.00) for i in range(4)]  # constant user
    import pyarrow as pa
    import pyarrow.parquet as pq_

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq_.write_table(t, f"{d}/events.parquet")
    out = {
        (r.user_id, r.lag): r
        for r in all_queries()["q_time_acf"](spark, str(d)).collect()
    }
    assert set(u for u, _ in out) == {1}  # constant user excluded, not an error
    assert out[(1, 1)].acf == _floor6(-5 / 6)
    assert out[(1, 2)].acf == _floor6(2 / 3)
    assert out[(1, 3)].acf == -0.5
    assert (out[(1, 1)].pairs, out[(1, 2)].pairs, out[(1, 3)].pairs) == (5, 4, 3)


def _write_events_u(d, rows):
    """rows: (ts_us, user_id, event_type, value) with sequential
    event_ids — for closed forms that need multi-user series."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([float(r[3]) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq_.write_table(t, f"{d}/events.parquet")
    return str(d)


def test_survival_km_textbook_worked_example(spark, tmp_path):
    """The classic 5-subject KM table with interleaved censoring:
    death t=1 (n=5) -> S=4/5; censor t=2 leaves the curve flat but
    shrinks the risk set; death t=3 (n=3) -> S = 4/5 * 2/3; censors at
    t=4,5 leave it flat. Pins the two KM conventions that are easy to
    get wrong: censored subjects DO count in the risk set at their own
    time, and censoring does NOT step the curve."""
    DAY = 86_400_000_000
    d = tmp_path / "km"
    d.mkdir()
    rows = [
        (0, 1, "view", 1.0), (1 * DAY, 1, "purchase", 200.0),  # death t=1
        (0, 2, "view", 1.0), (2 * DAY, 2, "view", 1.0),        # censor t=2
        (0, 3, "view", 1.0), (3 * DAY, 3, "purchase", 151.0),  # death t=3
        (0, 4, "view", 1.0), (4 * DAY, 4, "view", 1.0),        # censor t=4
        (0, 5, "view", 1.0), (5 * DAY, 5, "view", 1.0),        # censor t=5
    ]
    out = {
        r.t_days: r
        for r in all_queries()["q_survival_km"](
            spark, _write_events_u(d, rows)
        ).collect()
    }
    expect_nrisk = {1: 5, 2: 4, 3: 3, 4: 2, 5: 1}
    expect_d = {1: 1, 2: 0, 3: 1, 4: 0, 5: 0}
    for t, r in out.items():
        assert r.n_risk == expect_nrisk[t] and r.d_events == expect_d[t]
    assert out[1].survival == 0.8
    assert out[2].survival == 0.8  # censoring does not step the curve
    s3 = math.floor(0.8 * 1.0 * (1 - 1.0 / 3) * 1000000 + 0.5) / 1000000
    assert out[3].survival == s3 == 0.533333
    assert out[4].survival == s3 and out[5].survival == s3


def test_delta_method_closed_form(spark, tmp_path):
    """Two users per arm with hand-computable moments: the ratio metric
    is sum(x)/sum(y) (NOT the mean of per-user ratios) and the
    delta-method SE comes out exactly 50 and 100 cents for the two
    crafted arms, with the 1.96 CI exactly ratio +/- 98/196."""
    d = tmp_path / "dm"
    d.mkdir()
    rows = [
        (0, 1, "purchase", 2.00), (1, 1, "view", 1.0),
        (0, 2, "purchase", 1.00), (1, 2, "view", 1.0),
        (0, 3, "purchase", 6.00), (1, 3, "view", 1.0),
        (0, 4, "purchase", 3.00), (1, 4, "view", 1.0),
    ]
    out = {
        r.arm: r
        for r in all_queries()["q_ab_delta_method"](
            spark, _write_events_u(d, rows)
        ).collect()
    }
    assert out[0].n == 2 and out[1].n == 2
    assert (out[0].ratio_cents_per_event, out[0].se) == (100.0, 50.0)
    assert (out[0].ci_lo, out[0].ci_hi) == (2.0, 198.0)
    assert (out[1].ratio_cents_per_event, out[1].se) == (200.0, 100.0)
    assert (out[1].ci_lo, out[1].ci_hi) == (4.0, 396.0)


def test_twa_closed_forms(spark, tmp_path):
    """LOCF time-weighting: a constant series averages to itself, and a
    value held 3x longer gets 3x the weight — (100*10 + 400*30)/40 =
    325 cents = 3.25, where the plain mean of the observations would
    say 2.50 (the over-weighting TWA exists to fix)."""
    S = 1_000_000
    d = tmp_path / "twa"
    d.mkdir()
    rows = [
        (0, 1, "x", 2.00), (10 * S, 1, "x", 2.00), (30 * S, 1, "x", 2.00),
        (0, 2, "x", 1.00), (10 * S, 2, "x", 4.00), (40 * S, 2, "x", 9.99),
    ]
    out = {
        r.user_id: r
        for r in all_queries()["q_time_twa"](
            spark, _write_events_u(d, rows)
        ).collect()
    }
    assert out[1].n_gaps == 2 and out[1].twa == 2.0
    assert out[2].n_gaps == 2 and out[2].twa == 3.25


def test_cusum_closed_form(spark, tmp_path):
    """Page's CUSUM on a hand-computed step change: a stable user never
    alarms (every deviation sits below the slack), and the 1.00->200.00
    step alarms exactly on rows 6-8 with peak excursion 33400 cents —
    the n-scaled prefix-minus-running-min recursion traced by hand."""
    S = 1_000_000
    d = tmp_path / "cs"
    d.mkdir()
    rows = [(i * S, 1, "x", 5.00) for i in range(8)]  # stable: no alarm
    rows += [(i * S, 2, "x", 1.00) for i in range(4)]
    rows += [((4 + i) * S, 2, "x", 200.00) for i in range(4)]
    p = _write_events_u(d, rows)
    out = {r.user_id: r for r in all_queries()["q_time_cusum"](spark, p).collect()}
    assert 1 not in out  # stable series never alarms
    r = out[2]
    # hand trace: a_t = 8v - 80400 - 12800; pre after the 4 low rows is
    # -369600 (the running min); sn on the high rows = 66800, 133600,
    # 200400, 267200 vs threshold h*n = 128000 -> alarms on rows 6,7,8
    assert r.n_alarms == 3
    assert r.first_alarm_event == 13  # 6th event of user 2 (ids 8..15)
    assert r.peak_cents == 33400


def _write_graph_fixture(d, order_parts, brands=None):
    """order_parts: {orderkey: [partkeys]} -> lineitem.parquet;
    brands: {partkey: brand} -> part.parquet (when a key needs it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    rows = [
        (ok, pk, ln + 1)
        for ok, parts in order_parts.items()
        for ln, pk in enumerate(parts)
    ]
    n = len(rows)
    pq_.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array([r[2] for r in rows], pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["R"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
            }
        ),
        f"{d}/lineitem.parquet",
    )
    if brands is not None:
        ks = sorted(brands)
        pq_.write_table(
            pa.table(
                {
                    "p_partkey": pa.array(ks, pa.int64()),
                    "p_name": pa.array([f"p{k}" for k in ks], pa.string()),
                    "p_brand": pa.array([brands[k] for k in ks], pa.string()),
                    "p_type": pa.array(["t"] * len(ks), pa.string()),
                    "p_size": pa.array([1] * len(ks), pa.int32()),
                    "p_retailprice": pa.array([1.0] * len(ks), pa.float64()),
                }
            ),
            f"{d}/part.parquet",
        )
    return str(d)


def test_clustering_coeff_closed_forms(spark, tmp_path):
    """A triangle gives every corner coefficient exactly 1; a star's
    center has coefficient exactly 0 and its degree-1 leaves are
    excluded (undefined), matching the textbook local transitivity.
    Co-purchase edges need >= 2 shared orders, so each clique order is
    duplicated; a single shared order must NOT create an edge."""
    d = tmp_path / "cc"
    d.mkdir()
    op = {
        1: [1, 2, 3], 2: [1, 2, 3],       # triangle, twice (edges real)
        10: [11, 12], 11: [11, 12],        # star spokes, twice each
        12: [11, 13], 13: [11, 13],
        14: [11, 14], 15: [11, 14],
        20: [1, 99],                       # one shared order: below threshold
    }
    out = {
        r.part: r
        for r in all_queries()["q_graph_clustering_coeff"](
            spark, _write_graph_fixture(d, op)
        ).collect()
    }
    assert set(out) == {1, 2, 3, 11}  # leaves and the sub-threshold pair drop
    for pk in (1, 2, 3):
        assert (out[pk].degree, out[pk].n_triangles, out[pk].clustering) == (2, 1, 1.0)
    assert (out[11].degree, out[11].n_triangles, out[11].clustering) == (3, 0, 0.0)


def test_modularity_closed_form(spark, tmp_path):
    """Two disconnected triangles with communities = the components:
    each contributes Q_c = 3/6 - (6/12)^2 = 0.25 exactly — the textbook
    maximum-modularity two-clique configuration (total Q = 0.5)."""
    d = tmp_path / "mod"
    d.mkdir()
    op = {
        1: [1, 2, 3], 2: [1, 2, 3],
        3: [4, 5, 6], 4: [4, 5, 6],
    }
    brands = {k: ("BA" if k <= 3 else "BB") for k in range(1, 7)}
    out = {
        r.brand: r
        for r in all_queries()["q_graph_modularity"](
            spark, _write_graph_fixture(d, op, brands)
        ).collect()
    }
    for b in ("BA", "BB"):
        assert (out[b].n_nodes, out[b].e_in, out[b].deg_sum) == (3, 3, 6)
        assert out[b].q_contrib == 0.25


def test_assortativity_closed_forms(spark, tmp_path):
    """A star is maximally disassortative: r exactly -1 (every edge
    joins the hub to a leaf); the 4-path P4 gives r = -0.5 exactly from
    the hand-computed endpoint-degree moments."""
    star = tmp_path / "star"
    star.mkdir()
    op = {}
    for i, leaf in enumerate((12, 13, 14)):
        op[10 + 2 * i] = [11, leaf]
        op[11 + 2 * i] = [11, leaf]
    [r] = all_queries()["q_graph_assortativity"](
        spark, _write_graph_fixture(star, op)
    ).collect()
    assert r.n_edges == 3 and r.assortativity == -1.0
    p4 = tmp_path / "p4"
    p4.mkdir()
    op = {}
    for i, (a, b) in enumerate(((1, 2), (2, 3), (3, 4))):
        op[20 + 2 * i] = [a, b]
        op[21 + 2 * i] = [a, b]
    [r] = all_queries()["q_graph_assortativity"](
        spark, _write_graph_fixture(p4, op)
    ).collect()
    assert r.n_edges == 3 and r.assortativity == -0.5


def _write_docs(d, texts, source="s", lang="en"):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    pq_.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array([lang] * len(texts), pa.string()),
                "source": pa.array([source] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    return str(d)


def test_collocations_closed_form(spark, tmp_path):
    """Hand-computed pointwise lift on a 3-doc corpus: unigram total
    U = 6, bigram total N = 3 -> lift(c,d) = (1*36)/(3*1*1) = 12 and
    lift(a,b) = (2*36)/(3*2*2) = 6, ranked in that order."""
    d = tmp_path / "coll"
    d.mkdir()
    out = all_queries()["q_text_collocations"](
        spark, _write_docs(d, ["a b", "a b", "c d"])
    ).collect()
    got = [(r.w1, r.w2, r.n_pairs, r.rank, r.lift) for r in out]
    assert got == [("c", "d", 1, 1, 12.0), ("a", "b", 2, 2, 6.0)]


def test_basket_rules_closed_form(spark, tmp_path):
    """Hand-computed Apriori output: a perfectly-associated pair gets
    lift n/sup = 14.5 in both directions; a pair whose antecedent
    appears in 25 baskets fails the 10% confidence threshold in that
    direction only (integer cross-multiplied compare), while the
    reverse direction survives with lift 1.16."""
    d = tmp_path / "br"
    d.mkdir()
    op = {1: [1, 2], 2: [1, 2], 3: [3], 4: [3]}
    for k in range(23):
        op[10 + k] = [5]
    op[40] = [5, 6]
    op[41] = [5, 6]
    out = {
        (r.ant, r.cons): r
        for r in all_queries()["q_orders_basket_rules"](
            spark, _write_graph_fixture(d, op)
        ).collect()
    }
    assert set(out) == {(1, 2), (2, 1), (6, 5)}  # 5 -> 6 fails confidence
    assert (out[(1, 2)].sab, out[(1, 2)].conf, out[(1, 2)].lift) == (2, 1.0, 14.5)
    assert (out[(2, 1)].conf, out[(2, 1)].lift) == (1.0, 14.5)
    assert (out[(6, 5)].conf, out[(6, 5)].lift) == (1.0, 1.16)


def test_winsorized_mean_closed_form(spark, tmp_path):
    """1..19 cents plus a 1000-cent outlier: the 5/95 cut points are
    exactly 1 and 19, the outlier clamps to 19, and the winsorized
    mean is 10 cents where the raw mean is 60 — the robustness the
    estimator exists for, hand-computed."""
    d = tmp_path / "wm"
    d.mkdir()
    rows = [(i, 1, "R", 1, i / 100) for i in range(1, 20)]
    rows.append((20, 1, "R", 1, 10.00))
    [r] = all_queries()["q_agg_winsorized_mean"](
        spark, _write_lineitem(d, rows)
    ).collect()
    assert (r.n, r.lo_cents, r.hi_cents) == (20, 1, 19)
    assert r.winsor_mean_cents == 10
    assert r.mean_cents == 60


def test_trimmed_mean_closed_form(spark, tmp_path):
    """1..9 cents plus a 1000-cent outlier at 10% trim: one row drops
    from each tail, kept mass is 2..9 -> mean exactly 0.06 dollars
    (the raw mean would be ~1.02)."""
    d = tmp_path / "tm"
    d.mkdir()
    rows = [(i, 1, "R", 1, i / 100) for i in range(1, 10)]
    rows.append((10, 1, "R", 1, 10.00))
    [r] = all_queries()["q_agg_trimmed_mean"](
        spark, _write_lineitem(d, rows)
    ).collect()
    assert (r.n, r.n_kept) == (10, 8)
    assert r.trimmed_mean == 0.06


def test_hampel_closed_form(spark, tmp_path):
    """A single spike in a constant series: the rolling median is the
    constant, MAD is 0, and only the spike trips |dev|*1e4 > 44478*MAD
    (strict inequality keeps the constant rows inliers when MAD = 0);
    the 1..7 ramp's center row has median 400 / MAD 200 and is an
    inlier."""
    S = 1_000_000
    d = tmp_path / "hp"
    d.mkdir()
    rows = [(i * S, 1, "x", 2.00 if i != 3 else 50.00) for i in range(7)]
    rows += [(i * S, 2, "x", float(i + 1)) for i in range(7)]
    p = _write_events_u(d, rows)
    out = {
        (r.user_id, r.event_id): r
        for r in all_queries()["q_time_hampel"](spark, p).collect()
    }
    for eid in range(7):
        r = out[(1, eid)]
        if eid == 3:
            assert (r.is_outlier, r.med_c, r.mad_c, r.filtered_c) == (1, 200, 0, 200)
        else:
            assert r.is_outlier == 0 and r.filtered_c == r.value_c
    mid = out[(2, 10)]  # center of the ramp (event ids 7..13)
    assert (mid.med_c, mid.mad_c, mid.is_outlier) == (400, 200, 0)


def test_rbo_closed_forms(spark, tmp_path):
    """Identical top-10 rankings -> truncated RBO = sum of the ten
    geometric weights = 1 - 0.9^10 exactly (same fold); fully reversed
    rankings over the same 10 parts -> overlap(d) = max(0, 2d-10) and
    the hand-computed weighted sum."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    def write_parts(d, rows):  # rows: (partkey, quantity, price)
        n = len(rows)
        pq_.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
                    "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_suppkey": pa.array([1] * n, pa.int64()),
                    "l_linenumber": pa.array([1] * n, pa.int32()),
                    "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
                    "l_extendedprice": pa.array([float(r[2]) for r in rows], pa.float64()),
                    "l_discount": pa.array([0.0] * n, pa.float64()),
                    "l_tax": pa.array([0.0] * n, pa.float64()),
                    "l_returnflag": pa.array(["R"] * n, pa.string()),
                    "l_linestatus": pa.array(["O"] * n, pa.string()),
                    "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
                }
            ),
            f"{d}/lineitem.parquet",
        )
        return str(d)

    ident = tmp_path / "rbo1"
    ident.mkdir()
    # one row per part: revenue AND quantity both rank parts 1..10
    rows = [(i, 11 - i, float(11 - i)) for i in range(1, 11)]
    [r] = all_queries()["q_win_rbo"](
        spark, write_parts(ident, rows)
    ).collect()
    ws = [(1 - 0.9) * 0.9 ** k for k in range(10)]
    acc = 0.0
    for d in range(1, 11):
        acc += ws[d - 1] * d / d
    assert r.overlap_at_10 == 10
    assert r.rbo == round(acc, 6)  # = 1 - 0.9**10
    rev = tmp_path / "rbo2"
    rev.mkdir()
    # revenue ranks parts 1..10; quantity ranks them reversed
    rows = [(i, i, float(11 - i)) for i in range(1, 11)]
    [r] = all_queries()["q_win_rbo"](
        spark, write_parts(rev, rows)
    ).collect()
    acc = 0.0
    for d in range(1, 11):
        acc += ws[d - 1] * max(0, 2 * d - 10) / d
    assert r.overlap_at_10 == 10  # both lists hold the same 10 parts
    assert r.rbo == round(acc, 6)


def test_iqr_outliers_closed_forms(spark, tmp_path):
    """Interpolated quartiles on 1..4 cents-dollars give fences exactly
    [-0.5, 5.5] with zero outliers; adding a 100-dollar point moves the
    quartiles onto exact ranks (2.00/4.00), fences to [-1.0, 7.0], and
    flags exactly that one point."""
    clean = tmp_path / "iqr0"
    clean.mkdir()
    rows = [(i, 1, "R", 1, float(i)) for i in range(1, 5)]
    [r] = all_queries()["q_agg_iqr_outliers"](
        spark, _write_lineitem(clean, rows)
    ).collect()
    assert (r.n, r.n_outliers) == (4, 0)
    assert (r.fence_lo, r.fence_hi) == (-0.5, 5.5)
    dirty = tmp_path / "iqr1"
    dirty.mkdir()
    rows = [(i, 1, "R", 1, float(i)) for i in range(1, 5)]
    rows.append((5, 1, "R", 1, 100.00))
    [r] = all_queries()["q_agg_iqr_outliers"](
        spark, _write_lineitem(dirty, rows)
    ).collect()
    assert (r.n, r.n_outliers) == (5, 1)
    assert (r.fence_lo, r.fence_hi) == (-1.0, 7.0)


def test_smoothed_rate_closed_form(spark, tmp_path):
    """Empirical-Bayes shrinkage with a 5-event prior toward the corpus
    rate 1/4: the 1-for-1 user shrinks to exactly 9/24 = 0.375 and the
    0-for-3 user rises to exactly 5/32 = 0.15625 — both sides of the
    prior, hand-computed as (conv + 5p)/(n + 5)."""
    d = tmp_path / "eb"
    d.mkdir()
    rows = [(0, 1, "purchase", 1.0)]
    rows += [(i, 2, "view", 1.0) for i in range(3)]
    out = {
        r.user_id: r
        for r in all_queries()["q_agg_smoothed_rate"](
            spark, _write_events_u(d, rows)
        ).collect()
    }
    assert (out[1].n_events, out[1].n_conv, out[1].raw_rate) == (1, 1, 1.0)
    assert out[1].smoothed_rate == 0.375
    assert (out[2].n_events, out[2].n_conv, out[2].raw_rate) == (3, 0, 0.0)
    assert out[2].smoothed_rate == 0.15625


def test_kcore_closed_form(spark, tmp_path):
    """K4 survives the 3-core exactly (every node degree 3), a pendant
    node peels off without hurting it, and a triangle (degree 2) peels
    to nothing — the textbook peeling fixture."""
    d = tmp_path / "kc"
    d.mkdir()
    op = {
        1: [1, 2, 3, 4], 2: [1, 2, 3, 4],  # K4 (all pairs twice)
        3: [1, 5], 4: [1, 5],              # pendant on node 1
        5: [11, 12, 13], 6: [11, 12, 13],  # triangle: fully peeled
    }
    out = {
        r.part: r.core_degree
        for r in all_queries()["q_graph_kcore"](
            spark, _write_graph_fixture(d, op)
        ).collect()
    }
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_bfs_closed_form(spark, tmp_path):
    """A 7-node path from the minimum id: hop distances 0..4 exactly,
    with the two nodes beyond the 4-hop horizon absent."""
    d = tmp_path / "bfs"
    d.mkdir()
    op = {}
    for i in range(6):  # chain 1-2-...-7, each edge in two orders
        op[10 + 2 * i] = [i + 1, i + 2]
        op[11 + 2 * i] = [i + 1, i + 2]
    out = {
        r.part: r.dist
        for r in all_queries()["q_graph_bfs"](
            spark, _write_graph_fixture(d, op)
        ).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_link_predict_closed_form(spark, tmp_path):
    """The 4-cycle's two diagonals are the only >= 2-common-neighbor
    non-edges, each with Jaccard exactly 1 (shared neighborhood IS the
    union); a path's single-wedge pair stays below the threshold."""
    d = tmp_path / "lp"
    d.mkdir()
    op = {}
    for i, (a, b) in enumerate(((1, 2), (2, 4), (3, 4), (1, 3))):  # C4
        op[10 + 2 * i] = [a, b]
        op[11 + 2 * i] = [a, b]
    op[30] = [21, 22]; op[31] = [21, 22]  # P3: single wedge -> filtered
    op[32] = [22, 23]; op[33] = [22, 23]
    out = {
        (r.part_a, r.part_b): r
        for r in all_queries()["q_graph_link_predict"](
            spark, _write_graph_fixture(d, op)
        ).collect()
    }
    assert set(out) == {(1, 4), (2, 3)}
    for k, r in out.items():
        assert (r.common_neighbors, r.deg_a, r.deg_b, r.jaccard) == (2, 2, 2, 1.0)
