"""Round-10: pure-Python/numpy references for the new operators. Each
test re-derives the statistic from the raw sf0.001 parquet with an
INDEPENDENT formulation (numpy float64, no floor-scaling, no shared SQL
fragments) so a formula bug shared between the Spark build and the
DuckDB oracle cannot hide."""

import duckdb
import numpy as np
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_mcnemar_matches_reference(spark):
    row = plans.get("stat_mcnemar").build(spark, SF).collect()[0]
    orders = _fetch(
        "SELECT o_custkey, EXTRACT(year FROM o_orderdate)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    )
    n_cust = _fetch(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/customer.parquet')"
    )[0][0]
    per = {}
    for ck, yr in orders:
        f1, f2 = per.get(ck, (0, 0))
        per[ck] = (f1 or yr == 1995, f2 or yr == 1996)
    n11 = sum(1 for a, b in per.values() if a and b)
    b = sum(1 for a, c in per.values() if a and not c)
    c = sum(1 for a, d in per.values() if not a and d)
    assert (row["n11"], row["b"], row["c"]) == (n11, b, c)
    assert row["n00"] == n_cust - n11 - b - c
    assert row["chi2"] == pytest.approx((b - c) ** 2 / (b + c), rel=1e-12)
    assert row["chi2_cc"] == pytest.approx(
        max(abs(b - c) - 1, 0) ** 2 / (b + c), rel=1e-12
    )


def test_cochran_armitage_matches_numpy(spark):
    row = plans.get("stat_cochran_armitage").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT CAST(1 + FLOOR((l_quantity - 1) / 10) AS BIGINT),"
        " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    s = np.array([r[0] for r in rows], dtype=np.float64)
    y = np.array([r[1] for r in rows], dtype=np.float64)
    n, r = len(s), y.sum()
    p = r / n
    num = (s * y).sum() - p * s.sum()
    var = p * (1 - p) * ((s * s).sum() - s.sum() ** 2 / n)
    assert row["n"] == n and row["r"] == int(r)
    assert row["z_trend"] == pytest.approx(num / np.sqrt(var), rel=1e-9)


def test_grubbs_matches_numpy(spark):
    got = {
        r["segment"]: r
        for r in plans.get("stat_grubbs_outlier").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT c_mktsegment, CAST(c_acctbal AS DOUBLE)"
        f" FROM read_parquet('{SF}/customer.parquet')"
    )
    per = {}
    for seg, x in rows:
        per.setdefault(seg, []).append(x)
    for seg, xs in per.items():
        x = np.array(xs)
        g = max(x.mean() - x.min(), x.max() - x.mean()) / x.std(ddof=1)
        assert got[seg]["n"] == len(x)
        assert got[seg]["mean_bal"] == pytest.approx(x.mean(), rel=1e-9)
        assert got[seg]["g_stat"] == pytest.approx(g, rel=1e-9)
        assert got[seg]["flagged"] == bool(g > 3.0)


@pytest.fixture(scope="module")
def daily_resid():
    """Per-type (t, v, e): numpy OLS residuals of the daily totals —
    float64 end-to-end, no quantization (the engines quantize; the
    reference checks they land within quantization tolerance)."""
    rows = _fetch(
        "SELECT event_type, CAST(ts AS DATE), SUM(FLOOR(value * 1e6))"
        f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    )
    import datetime

    epoch = datetime.date(2024, 1, 1)
    per = {}
    for et, d, v in rows:
        per.setdefault(et, []).append(((d - epoch).days, float(v)))
    out = {}
    for et, tv in per.items():
        tv.sort()
        t = np.array([a for a, _ in tv])
        v = np.array([b for _, b in tv])
        beta, alpha = np.polyfit(t, v, 1)
        out[et] = (t, v, v - alpha - beta * t)
    return out


def test_durbin_watson_matches_numpy(spark, daily_resid):
    got = {
        r["event_type"]: r
        for r in plans.get("stat_durbin_watson").build(spark, SF).collect()
    }
    for et, (t, v, e) in daily_resid.items():
        dw = (np.diff(e) ** 2).sum() / (e ** 2).sum()
        # engines compute DW on floor-quantized residuals: tolerance
        # covers the <=1-unit-per-residual quantization on ~1e8 values
        assert got[et]["dw"] == pytest.approx(dw, rel=1e-5)
        assert got[et]["n"] == len(t)


def test_breusch_pagan_matches_numpy(spark, daily_resid):
    got = {
        r["event_type"]: r
        for r in plans.get("stat_breusch_pagan").build(spark, SF).collect()
    }
    for et, (t, v, e) in daily_resid.items():
        u = np.floor(e * 1e-3) ** 2  # the engines' q-3 contract
        n = len(t)
        num = n * (t * u).sum() - t.sum() * u.sum()
        den = (n * (t * t).sum() - t.sum() ** 2) * (
            n * (u * u).sum() - u.sum() ** 2
        )
        r2 = num * num / den
        assert got[et]["r2_aux"] == pytest.approx(r2, rel=1e-9)
        assert got[et]["lm_stat"] == pytest.approx(n * r2, rel=1e-9)


@pytest.fixture(scope="module")
def seg_daily():
    rows = _fetch(
        "SELECT c.c_mktsegment, CAST(o.o_orderdate AS DATE),"
        " SUM(CAST(o_totalprice AS DOUBLE))"
        f" FROM read_parquet('{SF}/orders.parquet') o"
        f" JOIN read_parquet('{SF}/customer.parquet') c"
        " ON o.o_custkey = c.c_custkey GROUP BY 1, 2"
    )
    per = {}
    for seg, d, x in rows:
        per.setdefault(seg, []).append((d, x))
    return {s: sorted(v) for s, v in per.items()}


def test_capm_beta_matches_numpy(spark, seg_daily):
    got = {
        r["segment"]: r
        for r in plans.get("fin_capm_beta").build(spark, SF).collect()
    }
    mkt = {}
    for seg, dv in seg_daily.items():
        for d, x in dv:
            mkt[d] = mkt.get(d, 0.0) + x
    mdays = sorted(mkt)
    mret = {
        mdays[i]: mkt[mdays[i]] / mkt[mdays[i - 1]] - 1
        for i in range(1, len(mdays))
    }
    for seg, dv in seg_daily.items():
        r, m = [], []
        for i in range(1, len(dv)):
            d, x = dv[i]
            if d in mret:
                r.append(x / dv[i - 1][1] - 1)
                m.append(mret[d])
        r, m = np.array(r), np.array(m)
        beta = np.cov(r, m, ddof=0)[0, 1] / np.var(m)
        alpha = r.mean() - beta * m.mean()
        # engines quantize returns at q9: ~1e-9 absolute on the inputs
        assert got[seg]["n"] == len(r)
        assert got[seg]["beta"] == pytest.approx(beta, rel=1e-5)
        assert got[seg]["alpha_daily"] == pytest.approx(alpha, abs=1e-7)


def test_kelly_matches_reference(spark):
    got = {
        r["priority"]: r
        for r in plans.get("fin_kelly_fraction").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT o.o_orderpriority, l.l_returnflag <> 'R',"
        " CAST(l.l_extendedprice AS DOUBLE)"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
        f" JOIN read_parquet('{SF}/orders.parquet') o"
        " ON l.l_orderkey = o.o_orderkey"
    )
    per = {}
    for pri, win, v in rows:
        per.setdefault(pri, []).append((win, v))
    for pri, bets in per.items():
        n = len(bets)
        wins = sum(1 for w, _ in bets if w)
        wv = sum(v for w, v in bets if w)
        lv = sum(v for w, v in bets if not w)
        p = wins / n
        b = (wv / wins) / (lv / (n - wins))
        assert got[pri]["n"] == n and got[pri]["wins"] == wins
        assert got[pri]["p_win"] == pytest.approx(p, rel=1e-12)
        assert got[pri]["odds_b"] == pytest.approx(b, rel=1e-9)
        assert got[pri]["kelly_f"] == pytest.approx(p - (1 - p) / b, rel=1e-6)


def test_calmar_matches_reference(spark):
    got = {
        r["segment"]: r
        for r in plans.get("fin_calmar_ratio").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT c.c_mktsegment, CAST(o.o_orderdate AS DATE),"
        " SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE -1 END"
        "     * CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
        f" FROM read_parquet('{SF}/orders.parquet') o"
        f" JOIN read_parquet('{SF}/customer.parquet') c"
        " ON o.o_custkey = c.c_custkey GROUP BY 1, 2"
    )
    per = {}
    for seg, d, pnl in rows:
        per.setdefault(seg, []).append((d, int(pnl)))
    for seg, dv in per.items():
        dv.sort()
        eq = np.cumsum([p for _, p in dv])
        peak = np.maximum.accumulate(eq)
        mdd = int((peak - eq).max())
        ann = eq[-1] * 252 / len(dv)
        assert got[seg]["n_days"] == len(dv)
        assert got[seg]["max_dd_cents"] == mdd
        assert got[seg]["ann_pnl"] == pytest.approx(ann / 100, rel=1e-12)
        if mdd > 0:
            assert got[seg]["calmar"] == pytest.approx(ann / mdd, rel=1e-12)
        else:
            assert got[seg]["calmar"] is None


def test_katz_matches_reference(spark):
    got = {
        r["nationkey"]: r
        for r in plans.get("graph_katz_centrality").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT s.s_nationkey, c.c_nationkey, COUNT(*)"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
        f" JOIN read_parquet('{SF}/orders.parquet') o ON l.l_orderkey = o.o_orderkey"
        f" JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey"
        f" JOIN read_parquet('{SF}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey"
        " WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2"
    )
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s_, d_, w in rows:
        A[idx[s_], idx[d_]] = w
    c = np.ones(len(nodes))
    walks = []
    for _ in range(3):
        c = A.T @ c
        walks.append(c.copy())
    for v in nodes:
        i = idx[v]
        assert got[v]["walks1"] == walks[0][i]
        assert got[v]["walks2"] == walks[1][i]
        assert got[v]["walks3"] == pytest.approx(walks[2][i], rel=1e-12)
        katz = (
            walks[0][i] * 1e-2 + walks[1][i] * 1e-4 + walks[2][i] * 1e-6
        )
        assert got[v]["katz"] == pytest.approx(katz, rel=1e-9)


def test_rolling_slope_matches_numpy(spark):
    got = {
        (r["event_type"], r["day"]): r["slope_per_day"]
        for r in plans.get("ts_rolling_slope").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT event_type, CAST(ts AS DATE), SUM(FLOOR(value * 1e6))"
        f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    )
    per = {}
    for et, d, v in rows:
        per.setdefault(et, []).append((d, float(v)))
    n_checked = 0
    for et, dv in per.items():
        dv.sort()
        for i in range(13, len(dv)):
            win = dv[i - 13 : i + 1]
            t = np.array([(d - dv[0][0]).days for d, _ in win], dtype=float)
            v = np.array([x for _, x in win])
            beta = np.polyfit(t, v, 1)[0]
            assert got[(et, win[-1][0])] == pytest.approx(
                beta / 1e6, rel=1e-9
            )
            n_checked += 1
    assert n_checked == len(got)


def test_ams_f2_matches_md5_replay(spark):
    import hashlib

    row = plans.get("agg_ams_f2_portable").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT l_partkey, COUNT(*)"
        f" FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
    )
    exact = float(sum(n * n for _, n in rows))
    assert row["exact_f2"] == exact
    xs = []
    for j in range(16):
        x = 0
        for k, n in rows:
            h = hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:15]
            x += (int(h, 16) % 2 * 2 - 1) * n
        xs.append(x)
    gsums = sorted(
        float(sum(x * x for x in xs[g * 4 : g * 4 + 4])) for g in range(4)
    )
    est = (gsums[1] + gsums[2]) / 8
    assert row["ams_estimate"] == pytest.approx(est, rel=1e-12)
    assert row["rel_error"] == pytest.approx(abs(est - exact) / exact, rel=1e-9)
    # the estimator should land within the theoretical few-x band
    assert row["rel_error"] < 1.0


def test_distinct_on_matches_reference(spark):
    got = {
        r["o_custkey"]: (r["latest_orderkey"], r["latest_orderdate"])
        for r in plans.get("sql_distinct_on").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    )
    best = {}
    for ck, ok, d in rows:
        cur = best.get(ck)
        if cur is None or (d, -ok) > (cur[1], -cur[0]):
            best[ck] = (ok, d)
    assert got == best


def test_elastic_net_matches_sklearn_formulation(spark):
    row = plans.get("ml_elastic_net_cd").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE),"
        f" CAST(l_extendedprice AS DOUBLE) FROM read_parquet('{SF}/lineitem.parquet')"
    )
    a = np.array(rows)
    z = (a - a.mean(0)) / a.std(0)
    n = len(a)
    r1y = (z[:, 0] * z[:, 2]).mean()
    r2y = (z[:, 1] * z[:, 2]).mean()
    r12 = (z[:, 0] * z[:, 1]).mean()
    t, shrink = 0.05, 1.05
    soft = lambda v: np.sign(v) * max(abs(v) - t, 0)  # noqa: E731
    w1 = soft(r1y) / shrink
    w2 = soft(r2y - w1 * r12) / shrink
    assert row["r1y"] == pytest.approx(r1y, rel=1e-9)
    assert row["r12"] == pytest.approx(r12, rel=1e-9)
    assert row["w1"] == pytest.approx(w1, rel=1e-9)
    assert row["w2"] == pytest.approx(w2, rel=1e-9)


def test_vif_matches_numpy_inverse(spark):
    row = plans.get("ml_vif_collinearity").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE),"
        f" CAST(l_extendedprice AS DOUBLE) FROM read_parquet('{SF}/lineitem.parquet')"
    )
    a = np.array(rows)
    R = np.corrcoef(a.T)
    vifs = np.diag(np.linalg.inv(R))
    assert row["vif_quantity"] == pytest.approx(vifs[0], rel=1e-9)
    assert row["vif_discount"] == pytest.approx(vifs[1], rel=1e-9)
    assert row["vif_price"] == pytest.approx(vifs[2], rel=1e-9)


def test_geohash_matches_reference_library_semantics(spark):
    rows = plans.get("geo_geohash_encode").build(spark, SF).collect()
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    for r in rows:
        lat15 = (r["lat_u"] + 9000000) * 32768 // 18000000
        lon15 = (r["lon_u"] + 18000000) * 32768 // 36000000
        gh = 0
        for i in range(15):
            b = 14 - i
            gh |= ((lon15 >> b) & 1) << (29 - 2 * i)
            gh |= ((lat15 >> b) & 1) << (28 - 2 * i)
        assert r["gh30"] == gh
        s = "".join(alpha[(gh >> (5 * (5 - g))) % 32] for g in range(6))
        assert r["geohash6"] == s
    # prefix-sharing property: nearby points share prefixes
    assert len(rows) > 0


def test_charclass_profile_counts(spark):
    got = {
        r["lang"]: r
        for r in plans.get("text_charclass_profile").build(spark, SF).collect()
    }
    rows = _fetch(
        f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')"
    )
    per = {}
    for lang, text in rows:
        c = per.setdefault(lang, [0, 0, 0, 0, 0, 0])
        c[0] += 1
        c[1] += len(text)
        c[2] += text.count(" ")
        c[3] += sum(ch.isdigit() for ch in text)
        c[4] += sum(("a" <= ch <= "z") or ("A" <= ch <= "Z") for ch in text)
        c[5] += sum(not (" " <= ch <= "~") for ch in text)
    for lang, (nd, nc, ns, ndig, na, nna) in per.items():
        g = got[lang]
        assert (
            g["n_docs"], g["n_chars"], g["n_spaces"], g["n_digits"],
            g["n_alpha"], g["n_nonascii"],
        ) == (nd, nc, ns, ndig, na, nna)
        assert g["alpha_ratio"] == pytest.approx(na / nc, rel=1e-12)


def test_hodges_lehmann_matches_numpy(spark):
    row = plans.get("stat_hodges_lehmann").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT l_returnflag = 'R', CAST(l_quantity AS DOUBLE)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    x = np.array([q for r, q in rows if r])
    y = np.array([q for r, q in rows if not r])
    diffs = np.sort((x[:, None] - y[None, :]).ravel())
    t = len(diffs)
    lower_median = diffs[(t + 1) // 2 - 1]  # rank ceil(T/2), 1-based
    assert row["n_pairs"] == float(t)
    assert row["hl_shift"] == lower_median


def test_turning_points_matches_reference(spark):
    got = {
        r["event_type"]: r
        for r in plans.get("ts_turning_points").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT event_type, CAST(ts AS DATE), SUM(FLOOR(value * 1e6))"
        f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    )
    per = {}
    for et, d, v in rows:
        per.setdefault(et, []).append((d, int(v)))
    for et, dv in per.items():
        dv.sort()
        v = [x for _, x in dv]
        n = len(v)
        t = sum(
            1
            for i in range(1, n - 1)
            if (v[i - 1] < v[i] > v[i + 1]) or (v[i - 1] > v[i] < v[i + 1])
        )
        z = (t - 2 * (n - 2) / 3) / np.sqrt((16 * n - 29) / 90)
        assert got[et]["n"] == n and got[et]["t"] == t
        assert got[et]["z_stat"] == pytest.approx(z, rel=1e-12)


def test_type_token_ratio_matches_reference(spark):
    got = {
        r["lang"]: r
        for r in plans.get("text_type_token_ratio").build(spark, SF).collect()
    }
    rows = _fetch(
        f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')"
    )
    per = {}
    for lang, text in rows:
        c = per.setdefault(lang, {})
        for tok in text.split(" "):
            if tok:
                c[tok] = c.get(tok, 0) + 1
    for lang, c in per.items():
        toks = sum(c.values())
        types = len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        g = got[lang]
        assert (g["n_tokens"], g["n_types"], g["n_hapax"]) == (
            toks, types, hapax,
        )
        assert g["ttr"] == pytest.approx(types / toks, rel=1e-12)
        assert g["guiraud_r"] == pytest.approx(
            types / np.sqrt(toks), rel=1e-12
        )
        assert g["hapax_ratio"] == pytest.approx(hapax / types, rel=1e-12)


def test_npv_rate_grid_matches_reference(spark):
    got = {
        r["priority"]: r
        for r in plans.get("fin_npv_rate_grid").build(spark, SF).collect()
    }
    rows = _fetch(
        "SELECT o_orderpriority, EXTRACT(year FROM o_orderdate) - 1995,"
        f" CAST(o_totalprice AS DOUBLE) FROM read_parquet('{SF}/orders.parquet')"
    )
    per = {}
    for pri, t, cf in rows:
        per.setdefault(pri, []).append((int(t), cf))
    for pri, flows in per.items():
        for lbl, r in [("npv_3pct", 0.03), ("npv_5pct", 0.05), ("npv_8pct", 0.08)]:
            npv = sum(cf * (1 + r) ** -t for t, cf in flows)
            # engines floor-quantize each flow to cents: tolerance is
            # one cent per row
            assert got[pri][lbl] == pytest.approx(
                npv, abs=len(flows) * 0.011
            )


def test_ulcer_index_matches_reference(spark, seg_daily):
    got = {
        r["segment"]: r
        for r in plans.get("fin_ulcer_index").build(spark, SF).collect()
    }
    for seg, dv in seg_daily.items():
        x = np.array([v for _, v in dv])
        peak = np.maximum.accumulate(x)
        ddpct = (peak - x) / peak * 100
        ui = np.sqrt((ddpct ** 2).mean())
        assert got[seg]["n_days"] == len(x)
        assert got[seg]["ulcer_index"] == pytest.approx(ui, rel=1e-5)
        assert got[seg]["max_dd_pct"] == pytest.approx(
            ddpct.max(), rel=1e-5
        )


def test_tracking_error_matches_numpy(spark, seg_daily):
    got = {
        r["segment"]: r
        for r in plans.get("fin_tracking_error").build(spark, SF).collect()
    }
    mkt = {}
    for seg, dv in seg_daily.items():
        for d, x in dv:
            mkt[d] = mkt.get(d, 0.0) + x
    mdays = sorted(mkt)
    mret = {
        mdays[i]: mkt[mdays[i]] / mkt[mdays[i - 1]] - 1
        for i in range(1, len(mdays))
    }
    for seg, dv in seg_daily.items():
        a = []
        for i in range(1, len(dv)):
            d, x = dv[i]
            if d in mret:
                a.append(x / dv[i - 1][1] - 1 - mret[d])
        a = np.array(a)
        te = a.std(ddof=1) * np.sqrt(252)
        ir = a.mean() / (a.std(ddof=1) / np.sqrt(252))
        assert got[seg]["n"] == len(a)
        assert got[seg]["mean_active_ret"] == pytest.approx(
            a.mean(), abs=2e-9
        )
        assert got[seg]["tracking_error_ann"] == pytest.approx(te, rel=1e-5)
        assert got[seg]["information_ratio_ann"] == pytest.approx(
            ir, rel=1e-4
        )


def test_wilcoxon_matches_scipy_formulation(spark):
    row = plans.get("stat_wilcoxon_signed_rank").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'"
        " THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " ELSE 0 END) - SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'"
        " THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        " ELSE 0 END)"
        f" FROM read_parquet('{SF}/orders.parquet') GROUP BY o_custkey"
    )
    d = np.array([int(r[0]) for r in rows if r[0] != 0], dtype=np.int64)
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(d), dtype=np.float64)
    sorted_ad = ad[order]
    i = 0
    r = 1
    while i < len(d):
        j = i
        while j < len(d) and sorted_ad[j] == sorted_ad[i]:
            j += 1
        mid = (r + (r + (j - i) - 1)) / 2
        ranks[order[i:j]] = mid
        r += j - i
        i = j
    wplus = ranks[d > 0].sum()
    n = len(d)
    mu = n * (n + 1) / 4
    _, counts = np.unique(ad, return_counts=True)
    var = n * (n + 1) * (2 * n + 1) / 24 - (
        (counts.astype(float) ** 3 - counts).sum() / 48
    )
    z = (wplus - mu) / np.sqrt(var)
    assert row["n"] == n
    assert row["w_plus"] == wplus
    assert row["z_stat"] == pytest.approx(z, rel=1e-9)


def test_friedman_matches_scipy_formulation(spark, daily_resid):
    row = plans.get("stat_friedman_test").build(spark, SF).collect()[0]
    # rebuild per-day cross-treatment ranks from the daily fixture
    rows = _fetch(
        "SELECT event_type, CAST(ts AS DATE), SUM(FLOOR(value * 1e6))"
        f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"
    )
    byday = {}
    for et, d, v in rows:
        byday.setdefault(d, []).append((et, float(v)))
    rsums = {}
    for d, tv in byday.items():
        vals = np.array([v for _, v in tv])
        order = np.argsort(vals)
        ranks = np.empty(len(vals))
        i = 0
        while i < len(vals):
            j = i
            sv = vals[order]
            while j < len(vals) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2
            i = j
        for (et, _), rk in zip([tv[o] for o in order], ranks[order]):
            rsums[et] = rsums.get(et, 0.0) + rk
    k = len(rsums)
    n = len(byday)
    q = 12 / (n * k * (k + 1)) * sum(v * v for v in rsums.values()) - 3 * n * (
        k + 1
    )
    assert (row["k"], row["n"]) == (k, n)
    assert row["q_stat"] == pytest.approx(q, rel=1e-9)


def test_harmonic_closeness_matches_bfs(spark):
    got = {
        r["nationkey"]: r
        for r in plans.get("graph_harmonic_closeness").build(spark, SF).collect()
    }
    rows = _fetch(
        "WITH e AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,"
        " COUNT(*) AS w"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
        f" JOIN read_parquet('{SF}/orders.parquet') o ON l.l_orderkey = o.o_orderkey"
        f" JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey"
        f" JOIN read_parquet('{SF}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey"
        " GROUP BY 1, 2),"
        " u AS (SELECT LEAST(src,dst) a, GREATEST(src,dst) b, SUM(w) w"
        " FROM e WHERE src <> dst GROUP BY 1, 2),"
        " thr AS (SELECT quantile_cont(w, 0.6) t FROM u)"
        " SELECT a, b FROM u, thr WHERE w >= t"
    )
    adj = {}
    for a, b in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    from collections import deque

    for s in adj:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= 5:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        cnts = [0] * 6
        for v, d in dist.items():
            if v != s:
                cnts[d] += 1
        h = sum(cnts[d] / d for d in range(1, 6))
        g = got[s]
        assert [g["d1"], g["d2"], g["d3"], g["d4"], g["d5"]] == cnts[1:]
        assert g["harmonic_5hop"] == pytest.approx(h, rel=1e-12)


def test_cvm_matches_reference(spark):
    row = plans.get("stat_cvm_two_sample").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT CAST(o_totalprice AS DECIMAL(12,2)),"
        " o_orderpriority = '1-URGENT'"
        f" FROM read_parquet('{SF}/orders.parquet')"
        " WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    )
    x = np.array(sorted(float(v) for v, g in rows if g))
    y = np.array(sorted(float(v) for v, g in rows if not g))
    n, m = len(x), len(y)
    pooled = np.concatenate([x, y])
    t = 0.0
    for z in np.unique(pooled):
        f1 = (x <= z).sum() / n
        f2 = (y <= z).sum() / m
        mult = (pooled == z).sum()
        t += mult * (f1 - f2) ** 2
    t *= n * m / (n + m) ** 2
    assert (row["n"], row["m"]) == (n, m)
    assert row["cvm_t"] == pytest.approx(t, rel=1e-9)


def test_omega_matches_reference(spark, seg_daily):
    got = {
        r["segment"]: r
        for r in plans.get("fin_omega_ratio").build(spark, SF).collect()
    }
    for seg, dv in seg_daily.items():
        r = np.array(
            [dv[i][1] / dv[i - 1][1] - 1 for i in range(1, len(dv))]
        )
        gains = r[r > 0].sum()
        losses = -r[r < 0].sum()
        g = got[seg]
        assert g["n"] == len(r)
        assert g["gain_sum"] == pytest.approx(gains, abs=len(r) * 2e-9)
        assert g["loss_sum"] == pytest.approx(losses, abs=len(r) * 2e-9)
        assert g["omega"] == pytest.approx(gains / losses, rel=1e-5)
        assert g["win_rate"] == pytest.approx((r > 0).mean(), abs=0.05)


def test_delong_matches_numpy(spark):
    row = plans.get("ml_delong_auc_se").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT CAST(l_quantity AS DOUBLE), l_returnflag = 'R'"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    pos = np.array([s for s, y in rows if y])
    neg = np.array([s for s, y in rows if not y])
    m, n = len(pos), len(neg)
    v10 = np.array(
        [((neg < s).sum() + 0.5 * (neg == s).sum()) / n for s in pos]
    )
    v01 = np.array(
        [((pos > s).sum() + 0.5 * (pos == s).sum()) / m for s in neg]
    )
    auc = v10.mean()
    se = np.sqrt(v10.var(ddof=1) / m + v01.var(ddof=1) / n)
    assert (row["n_pos"], row["n_neg"]) == (m, n)
    assert row["auc"] == pytest.approx(auc, rel=1e-12)
    assert row["auc"] == pytest.approx(v01.mean(), rel=1e-12)  # identity
    assert row["delong_se"] == pytest.approx(se, rel=1e-9)
    # cross-check against the registered midrank AUC
    other = plans.get("ml_roc_auc").build(spark, SF).collect()[0]
    assert row["auc"] == pytest.approx(other["auc"], rel=1e-12)


def test_brier_decomposition_matches_numpy(spark):
    row = plans.get("ml_brier_decomposition").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT LEAST(9, CAST(FLOOR(l_quantity / 50.0 * 10.0) AS INT)),"
        " l_quantity / 50.0, CAST(l_returnflag = 'R' AS INT)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    bins = {}
    for b, f, y in rows:
        c = bins.setdefault(b, [0, 0.0, 0])
        c[0] += 1
        c[1] += f
        c[2] += y
    n = sum(c[0] for c in bins.values())
    ybar = sum(c[2] for c in bins.values()) / n
    rel = sum(c[0] * (c[1] / c[0] - c[2] / c[0]) ** 2 for c in bins.values()) / n
    res = sum(c[0] * (c[2] / c[0] - ybar) ** 2 for c in bins.values()) / n
    unc = ybar * (1 - ybar)
    assert row["n"] == n
    assert row["reliability"] == pytest.approx(rel, rel=1e-9)
    assert row["resolution"] == pytest.approx(res, rel=1e-9)
    assert row["uncertainty"] == pytest.approx(unc, rel=1e-12)
    assert row["brier_binned"] == pytest.approx(rel - res + unc, rel=1e-9)


def test_power_two_prop_matches_reference(spark):
    row = plans.get("stat_power_two_prop").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT o_orderpriority, o_orderstatus"
        f" FROM read_parquet('{SF}/orders.parquet')"
        " WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    )
    import math

    n1 = sum(1 for p, _ in rows if p == "1-URGENT")
    x1 = sum(1 for p, s in rows if p == "1-URGENT" and s == "F")
    n2 = sum(1 for p, _ in rows if p == "5-LOW")
    x2 = sum(1 for p, s in rows if p == "5-LOW" and s == "F")
    p1, p2 = x1 / n1, x2 / n2
    pbar = (x1 + x2) / (n1 + n2)
    za, zb = 1.959963984540054, 0.8416212335729143
    root = za * math.sqrt(2 * pbar * (1 - pbar)) + zb * math.sqrt(
        p1 * (1 - p1) + p2 * (1 - p2)
    )
    want = math.ceil(root * root / (p1 - p2) ** 2)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["p1"] == pytest.approx(p1, rel=1e-12)
    assert row["n_per_arm_80pct"] == want


def test_quantile_regression_grid_matches_numpy(spark):
    got = {
        r["tau"]: r
        for r in plans.get("ml_quantile_regression_grid")
        .build(spark, SF)
        .collect()
    }
    rows = _fetch(
        "SELECT CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    x = np.array([a for a, _ in rows])
    y = np.array([b for _, b in rows])
    bs = np.array([3000 + 50 * j for j in range(41)])
    for tau in (0.25, 0.50, 0.75):
        losses = []
        for b in bs:
            r = y - b * x
            losses.append(np.where(r >= 0, tau * r, (tau - 1) * r).sum())
        j = int(np.argmin(losses))
        assert got[tau]["best_b"] == bs[j]
        assert got[tau]["check_loss"] == pytest.approx(losses[j], rel=1e-9)
    # quantile monotonicity: higher tau => slope no smaller
    assert got[0.25]["best_b"] <= got[0.50]["best_b"] <= got[0.75]["best_b"]


def test_markov_attribution_matches_reference(spark):
    got = {
        r["channel"]: r
        for r in plans.get("ts_attribution_markov_removal")
        .build(spark, SF)
        .collect()
    }
    rows = _fetch(
        "SELECT user_id, ts, event_id, event_type"
        f" FROM read_parquet('{SF}/events.parquet')"
        " ORDER BY user_id, ts, event_id"
    )
    # journeys cut at first purchase
    from collections import defaultdict

    journeys = defaultdict(list)
    done = set()
    for u, _, _, et in rows:
        if u in done:
            continue
        journeys[u].append(et)
        if et == "purchase":
            done.add(u)
    # transition counts
    cnt = defaultdict(int)
    for seq in journeys.values():
        prev = "START"
        for et in seq:
            dst = "CONV" if et == "purchase" else et
            cnt[(prev, dst)] += 1
            prev = dst
        if prev != "CONV":
            cnt[(prev, "NULL")] += 1
    outs = defaultdict(int)
    for (s, d), c in cnt.items():
        outs[s] += c
    p6 = {(s, d): c * 1000000 // outs[s] for (s, d), c in cnt.items()}

    def conv_mass(removed):
        trans = defaultdict(int)
        for (s, d), p in p6.items():
            if s == removed:
                continue
            dd = "NULL" if d == removed else d
            trans[(s, dd)] += p
        trans[("CONV", "CONV")] = 1000000
        trans[("NULL", "NULL")] = 1000000
        v = {"START": 1000000}
        for _ in range(12):
            nv = defaultdict(int)
            for (s, d), p in trans.items():
                if s in v:
                    nv[d] += v[s] * p
            v = {d: m // 1000000 for d, m in nv.items()}
        return v.get("CONV", 0)

    full = conv_mass(None)
    effs = {}
    for ch in ("click", "view", "signup", "error"):
        rm = conv_mass(ch)
        effs[ch] = full - rm
        assert got[ch]["conv_full_prob"] == full / 1e6
        assert got[ch]["conv_removed_prob"] == rm / 1e6
        assert effs[ch] >= 0  # removal can only reduce conversion
        assert got[ch]["removal_effect"] == pytest.approx(
            effs[ch] / full, rel=1e-12
        )
    te = sum(effs.values())
    for ch, e in effs.items():
        assert got[ch]["attribution_share"] == pytest.approx(
            e / te, rel=1e-12
        )


def test_rich_club_matches_reference(spark):
    got = {
        r["k"]: r for r in plans.get("graph_rich_club").build(spark, SF).collect()
    }
    rows = _fetch(
        "WITH e AS (SELECT s.s_nationkey AS src, c.c_nationkey AS dst,"
        " COUNT(*) AS w"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
        f" JOIN read_parquet('{SF}/orders.parquet') o ON l.l_orderkey = o.o_orderkey"
        f" JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey"
        f" JOIN read_parquet('{SF}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey"
        " GROUP BY 1, 2),"
        " u AS (SELECT LEAST(src,dst) a, GREATEST(src,dst) b, SUM(w) w"
        " FROM e WHERE src <> dst GROUP BY 1, 2),"
        " thr AS (SELECT quantile_cont(w, 0.6) t FROM u)"
        " SELECT a, b FROM u, thr WHERE w >= t"
    )
    deg = {}
    for a, b in rows:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in range(1, 9):
        rich = {v for v, d in deg.items() if d > k}
        e_k = sum(1 for a, b in rows if a in rich and b in rich)
        n_k = len(rich)
        g = got[k]
        assert (g["n_k"], g["e_k"]) == (n_k, e_k)
        if n_k >= 2:
            assert g["rich_club_phi"] == pytest.approx(
                2 * e_k / (n_k * (n_k - 1)), rel=1e-12
            )
        else:
            assert g["rich_club_phi"] is None


def test_tost_matches_reference(spark):
    row = plans.get("stat_tost_equivalence").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE)"
        f" FROM read_parquet('{SF}/orders.parquet')"
        " WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"
    )
    a = np.array([v for p, v in rows if p == "1-URGENT"])
    b = np.array([v for p, v in rows if p == "5-LOW"])
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    diff = a.mean() - b.mean()
    tl = (diff + 2000.0) / se
    tu = (2000.0 - diff) / se
    zc = 1.6448536269514722
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    assert row["diff"] == pytest.approx(diff, rel=1e-9)
    assert row["se"] == pytest.approx(se, rel=1e-9)
    assert row["t_lower"] == pytest.approx(tl, rel=1e-9)
    assert row["t_upper"] == pytest.approx(tu, rel=1e-9)
    assert row["equivalent"] == bool(tl > zc and tu > zc)


def test_var_backtest_matches_reference(spark, seg_daily):
    import datetime
    import math

    got = {
        r["segment"]: r
        for r in plans.get("fin_var_exception_backtest")
        .build(spark, SF)
        .collect()
    }
    cut = datetime.date(1998, 1, 1)
    for seg, dv in seg_daily.items():
        rets = [
            (dv[i][0], math.floor((dv[i][1] / dv[i - 1][1] - 1) * 1e9))
            for i in range(1, len(dv))
        ]
        est = sorted(
            [(r, d) for d, r in rets if d < cut]
        )  # (r, d) tiebreak order
        n1 = len(est)
        var_q9 = est[math.ceil(0.05 * n1) - 1][0]
        test = [(d, r) for d, r in rets if d >= cut]
        x = sum(1 for _, r in test if r < var_q9)
        n2 = len(test)
        g = got[seg]
        assert g["var_95"] == pytest.approx(var_q9 / 1e9, rel=1e-12)
        assert (g["n_test"], g["exceptions"]) == (n2, x)
        z = (x - n2 * 0.05) / math.sqrt(n2 * 0.05 * 0.95)
        assert g["binom_z"] == pytest.approx(z, rel=1e-9)


def test_nelson_aalen_matches_reference(spark):
    na = {
        (r["c_mktsegment"], r["tenure_years"]): r
        for r in plans.get("ml_nelson_aalen").build(spark, SF).collect()
    }
    km = {
        (r["c_mktsegment"], r["tenure_years"]): r
        for r in plans.get("ml_kaplan_meier").build(spark, SF).collect()
    }
    assert set(na) == set(km)
    import math

    for key in na:
        seg = key[0]
        # rebuild H from the shared (n_risk, d) relation KM exposes
        rows = sorted(
            (k[1], v["n_at_risk"], v["d_events"])
            for k, v in km.items()
            if k[0] == seg and k[1] <= key[1]
        )
        h = sum(d / n for _, n, d in rows)
        v = sum(d / (n * n) for _, n, d in rows)
        assert na[key]["n_at_risk"] == km[key]["n_at_risk"]
        assert na[key]["cum_hazard"] == pytest.approx(h, rel=1e-12)
        assert na[key]["hazard_se"] == pytest.approx(math.sqrt(v), rel=1e-12)
        # classic cross-check: -ln(KM) ~= NA (equal as d/n -> 0)
        s = km[key]["survival"]
        if s > 0 and all(d < n for _, n, d in rows):
            assert abs(-math.log(s) - h) <= h * 0.25 + 0.05


def test_hartley_fmax_matches_numpy(spark):
    row = plans.get("stat_hartley_fmax").build(spark, SF).collect()[0]
    rows = _fetch(
        "SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE)"
        f" FROM read_parquet('{SF}/orders.parquet')"
    )
    per = {}
    for g, x in rows:
        per.setdefault(g, []).append(x)
    vs = {g: np.var(xs, ddof=1) for g, xs in per.items() if len(xs) > 1}
    gmax = min(g for g, v in vs.items() if v == max(vs.values()))
    gmin = min(g for g, v in vs.items() if v == min(vs.values()))
    assert row["k"] == len(vs)
    assert (row["g_max"], row["g_min"]) == (gmax, gmin)
    assert row["vmax"] == pytest.approx(max(vs.values()), rel=1e-9)
    assert row["f_max"] == pytest.approx(
        max(vs.values()) / min(vs.values()), rel=1e-9
    )


@pytest.fixture(scope="module")
def sweep_base():
    rows = _fetch(
        "SELECT CAST(l_quantity AS DOUBLE), l_returnflag = 'R'"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    s = np.array([a for a, _ in rows])
    y = np.array([1 if b else 0 for _, b in rows])
    return s, y


def test_youden_j_matches_numpy(spark, sweep_base):
    s, y = sweep_base
    row = plans.get("ml_youden_j").build(spark, SF).collect()[0]
    ap, an = y.sum(), (1 - y).sum()
    best = None
    for t in sorted(set(s)):
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        j = tp / ap - fp / an
        if best is None or j > best[0] + 1e-15 or (
            abs(j - best[0]) < 1e-15 and t < best[1]
        ):
            best = (j, t, tp, fp)
    assert row["best_threshold"] == best[1]
    assert (row["tp"], row["fp"]) == (best[2], best[3])
    assert row["youden_j"] == pytest.approx(best[0], rel=1e-9)


def test_precision_at_recall_matches_numpy(spark, sweep_base):
    s, y = sweep_base
    row = plans.get("ml_precision_at_recall").build(spark, SF).collect()[0]
    ap = y.sum()
    best = None
    for t in sorted(set(s)):
        pred = s >= t
        tp = int((pred & (y == 1)).sum())
        fp = int((pred & (y == 0)).sum())
        if tp * 10 < ap * 8:
            continue
        prec = tp / (tp + fp)
        if best is None or prec > best[0] + 1e-15 or (
            abs(prec - best[0]) < 1e-15 and t > best[1]
        ):
            best = (prec, t, tp, fp)
    assert row["best_threshold"] == best[1]
    assert row["precision_"] == pytest.approx(best[0], rel=1e-12)
    assert row["recall_"] >= 0.8
