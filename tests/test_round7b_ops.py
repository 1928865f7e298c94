"""Round-7 continuation: pure-Python references for the RNG-free
resampling queries (bootstrap CI, randomization test). The references
re-derive the md5 uniforms and the Poisson inverse-CDF ladder from
scratch (hashlib, Decimal sums) so a threshold or hashing bug shared
between the Spark build and the DuckDB oracle cannot hide (the _GINI
lesson: a hash oracle is blind to formula bugs in shared fragments).
Every assertion was run against the sf0.001 fixture before commit.
"""

import hashlib
from collections import defaultdict
from decimal import Decimal

import duckdb
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"

_POIS_THRESH = (24109, 48218, 60273, 64291, 65296, 65497, 65530, 65535)
_G1, _G0 = "1-URGENT", "5-LOW"


def _orders():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT o_orderkey, o_orderpriority,"
        " CAST(o_totalprice AS DECIMAL(12,2))"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    con.close()
    return rows


def _u16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _pois(u: int) -> int:
    for k, t in enumerate(_POIS_THRESH):
        if u < t:
            return k
    return len(_POIS_THRESH)


def test_poisson_ladder_is_the_inverse_cdf():
    # the committed thresholds must be floor(CDF_Poisson(1)(k) * 65536)
    import math

    cum, fact = 0.0, 1
    for k in range(8):
        if k:
            fact *= k
        cum += math.exp(-1) / fact
        assert _POIS_THRESH[k] == math.floor(cum * 65536)


def test_bootstrap_ci_matches_pure_python(spark):
    got = {
        r["priority"]: r
        for r in plans.get("stat_bootstrap_ci").build(spark, SF).collect()
    }
    rows = _orders()
    by_p = defaultdict(list)
    for key, pri, x in rows:
        by_p[pri].append((str(key), x))
    assert set(got) == set(by_p)
    for pri, items in by_p.items():
        # replicate means from the md5-Poisson weights, Decimal-exact
        ms = []
        for b in range(64):
            sw, nw = Decimal(0), 0
            for k, x in items:
                w = _pois(_u16(f"{k}#{b}"))
                sw += w * x
                nw += w
            assert nw > 0
            ms.append((float(sw) / float(nw), b))
        ms.sort()
        lo, hi = ms[1][0], ms[62][0]
        n = len(items)
        mean = float(sum(x for _, x in items)) / float(n)
        r = got[pri]
        assert r["n_orders"] == n and r["n_boot"] == 64
        assert r["mean_total"] == mean  # identical IEEE path, exact
        assert r["ci_lo"] == lo and r["ci_hi"] == hi
        assert lo < mean < hi  # sanity: the CI brackets the point estimate


def test_randomization_test_matches_pure_python(spark):
    row = plans.get("stat_randomization_test").build(spark, SF).collect()
    assert len(row) == 1
    row = row[0]
    sample = [
        (str(key), x, 1 if pri == _G1 else 0)
        for key, pri, x in _orders()
        if pri in (_G1, _G0)
    ]
    n = len(sample)
    n1 = sum(g for _, _, g in sample)
    n0 = n - n1
    thr = (n1 * 65536) // n
    s1 = sum((x for _, x, g in sample if g == 1), Decimal(0))
    s0 = sum((x for _, x, g in sample if g == 0), Decimal(0))
    obs = float(s1) / float(n1) - float(s0) / float(n0)
    n_ext = 0
    for p in range(64):
        a1s, a1n, a0s, a0n = Decimal(0), 0, Decimal(0), 0
        for k, x, _ in sample:
            if _u16(f"{k}@{p}") < thr:
                a1s += x
                a1n += 1
            else:
                a0s += x
                a0n += 1
        if a1n == 0 or a0n == 0:
            continue
        d = float(a1s) / float(a1n) - float(a0s) / float(a0n)
        if abs(d) >= abs(obs):
            n_ext += 1
    assert row["n1"] == n1 and row["n0"] == n0
    assert row["obs_diff"] == obs
    assert row["n_extreme"] == n_ext
    assert row["p_value"] == (1.0 + n_ext) / 65.0
    assert 0.0 < row["p_value"] <= 1.0


# ---------------------------------------------------------------------------
# AR(2) Yule-Walker vs an independent Decimal-exact reference


def test_yule_walker_ar2_matches_pure_python(spark):
    got = {
        r["event_type"]: r
        for r in plans.get("ts_yule_walker_ar2").build(spark, SF).collect()
    }
    con = duckdb.connect()
    daily = con.execute(
        "SELECT event_type, CAST(ts AS DATE) AS d,"
        " SUM(CAST(value AS DECIMAL(18,6))) AS x"
        f" FROM read_parquet('{SF}/events.parquet')"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for et, _, x in daily:
        series[et].append(x)  # Decimal, already in d order
    assert set(got) == set(series)
    for et, xs in series.items():
        n = len(xs)
        sx = sum(xs, Decimal(0))
        sxx = sum((x * x for x in xs), Decimal(0))
        s01 = sum((xs[t] * xs[t - 1] for t in range(1, n)), Decimal(0))
        s02 = sum((xs[t] * xs[t - 2] for t in range(2, n)), Decimal(0))
        a1 = sum(xs[1:], Decimal(0))
        b1 = sum(xs[:-1], Decimal(0))
        a2 = sum(xs[2:], Decimal(0))
        b2 = sum(xs[:-2], Decimal(0))
        nf = float(n)
        sxf, sxxf = float(sx), float(sxx)
        mu = sxf / nf
        c0 = (sxxf - sxf * sxf / nf) / nf
        c1 = (float(s01) - mu * (float(a1) + float(b1)) + (nf - 1.0) * mu * mu) / nf
        c2 = (float(s02) - mu * (float(a2) + float(b2)) + (nf - 2.0) * mu * mu) / nf
        r1, r2 = c1 / c0, c2 / c0
        phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
        phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
        sigma2 = c0 * (1.0 - phi1 * r1 - phi2 * r2)
        fc = mu + phi1 * (float(xs[-1]) - mu) + phi2 * (float(xs[-2]) - mu)
        g = got[et]
        assert g["n_days"] == n
        assert g["mu"] == mu and g["c0"] == c0
        assert g["phi1"] == pytest.approx(phi1, rel=1e-12, abs=1e-15)
        assert g["phi2"] == pytest.approx(phi2, rel=1e-12, abs=1e-15)
        assert g["sigma2"] == pytest.approx(sigma2, rel=1e-12)
        assert g["forecast_next"] == pytest.approx(fc, rel=1e-12)
        # model sanity: innovation variance cannot exceed the series
        # variance, and the AR(2) stationarity triangle holds
        assert 0.0 <= g["sigma2"] <= g["c0"] * (1.0 + 1e-12)
        assert abs(g["phi2"]) < 1.0
        assert g["phi2"] + g["phi1"] < 1.0 and g["phi2"] - g["phi1"] < 1.0


# ---------------------------------------------------------------------------
# Skew profile vs a naive sort-the-counts reference


def test_obs_skew_profile_matches_naive_reference(spark):
    got = {
        r["audit"]: r
        for r in plans.get("obs_skew_profile").build(spark, SF).collect()
    }
    con = duckdb.connect()
    for label, table, key in (
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
    ):
        cnts = sorted(
            c
            for (c,) in con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{SF}/{table}.parquet')"
                f" GROUP BY {key}"
            ).fetchall()
        )
        n = len(cnts)
        total = sum(cnts)
        p50 = cnts[(n + 1) // 2 - 1]
        p99 = cnts[(99 * n + 99) // 100 - 1]
        hot = sum(1 for c in cnts if c * n > 5 * total)
        g = got[label]
        assert g["n_keys"] == n and g["total_rows"] == total
        assert g["max_cnt"] == cnts[-1]
        assert g["p50_cnt"] == p50 and g["p99_cnt"] == p99
        assert g["hot_keys"] == hot
        assert g["skew_ratio"] == float(cnts[-1]) * float(n) / float(total)
        assert g["skew_ratio"] >= 1.0  # max >= avg always
    con.close()


# ---------------------------------------------------------------------------
# Binomial-mechanism DP counts vs hashlib popcount


def test_dp_binomial_counts_matches_hashlib(spark):
    rows = plans.get("dq_dp_binomial_counts").build(spark, SF).collect()
    con = duckdb.connect()
    true = dict(
        con.execute(
            "SELECT event_type, COUNT(*) FROM"
            f" read_parquet('{SF}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    con.close()
    assert {r["event_type"] for r in rows} == set(true)
    for r in rows:
        h = hashlib.md5(
            f"{r['event_type']}#dp-epoch-2026-08".encode()
        ).hexdigest()
        noise = bin(int(h, 16)).count("1") - 64
        assert r["true_count"] == true[r["event_type"]]
        assert r["noise"] == noise
        assert r["noisy_count"] == r["true_count"] + noise
        assert abs(r["noise"]) <= 64  # binomial mechanism bound


# ---------------------------------------------------------------------------
# Temperature mixture vs a pure-python sqrt-weight reference


def test_mixture_temperature_matches_pure_python(spark):
    import math

    rows = plans.get("cur_mixture_temperature").build(spark, SF).collect()
    con = duckdb.connect()
    counts = {
        (s, l): n
        for s, l, n in con.execute(
            "SELECT source, lang, COUNT(*) FROM"
            f" read_parquet('{SF}/documents.parquet') GROUP BY 1, 2"
        ).fetchall()
    }
    con.close()
    assert {(r["source"], r["lang"]) for r in rows} == set(counts)
    total_docs = sum(counts.values())
    wq = {k: math.floor(math.sqrt(float(n)) * 1e6) for k, n in counts.items()}
    total_wq = sum(wq.values())
    for r in rows:
        k = (r["source"], r["lang"])
        n = counts[k]
        p_raw = n / float(total_docs)
        p_temp = float(wq[k]) / float(total_wq)
        assert r["n_docs"] == n
        assert r["p_raw"] == p_raw
        assert r["p_temp"] == p_temp
        assert r["upsample"] == p_temp / p_raw
        assert r["epoch_docs"] == math.floor(p_temp * 100_000)
    # temperature flattens: smaller domains never get a smaller
    # upsample factor than larger ones, and the shares sum to ~1
    srt = sorted(rows, key=lambda r: r["n_docs"])
    ups = [r["upsample"] for r in srt]
    assert all(a >= b - 1e-9 for a, b in zip(ups, ups[1:]))
    assert sum(r["p_temp"] for r in rows) == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Markov transition matrix vs a pure-python sequence walk


def test_markov_transition_matches_pure_python(spark):
    rows = plans.get("ml_markov_transition").build(spark, SF).collect()
    con = duckdb.connect()
    ev = con.execute(
        "SELECT user_id, ts, event_id, event_type FROM"
        f" read_parquet('{SF}/events.parquet')"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    seqs = defaultdict(list)
    for u, _, _, t in ev:
        seqs[u].append(t)
    trans = defaultdict(int)
    states = sorted({t for _, _, _, t in ev})
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    K = len(states)
    assert len(rows) == K * K
    for r in rows:
        c = trans.get((r["prev"], r["next"]), 0)
        tot = sum(trans.get((r["prev"], s), 0) for s in states)
        assert r["cnt"] == c
        assert r["prob"] == (c + 1.0) / (tot + K)
    # each row of the smoothed matrix is a probability distribution
    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r["prev"]] += r["prob"]
    for tot in by_prev.values():
        assert tot == pytest.approx(1.0, abs=1e-12)


# ---------------------------------------------------------------------------
# Banded DTW vs an unbanded O(n*m) reference + metric invariants


def _dtw_full(xs, ys):
    """Naive full (unbanded) DTW on integers."""
    n, m = len(xs), len(ys)
    inf = float("inf")
    d = [[inf] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            c = abs(xs[i] - ys[j])
            if i == 0 and j == 0:
                d[i][j] = c
            else:
                best = inf
                if i > 0:
                    best = min(best, d[i - 1][j])
                if j > 0:
                    best = min(best, d[i][j - 1])
                if i > 0 and j > 0:
                    best = min(best, d[i - 1][j - 1])
                d[i][j] = c + best
    return d[n - 1][m - 1]


def test_dtw_band_matches_full_dp_reference(spark):
    rows = plans.get("ts_dtw_band").build(spark, SF).collect()
    con = duckdb.connect()
    ser = {
        t: xs
        for t, xs in con.execute(
            "SELECT event_type, list(CAST(x * 1000000 AS BIGINT) ORDER BY d)"
            " FROM (SELECT event_type, CAST(ts AS DATE) AS d,"
            "       SUM(CAST(value AS DECIMAL(18,6))) AS x"
            f"      FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2)"
            " GROUP BY event_type"
        ).fetchall()
    }
    con.close()
    types = sorted(ser)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        xs, ys = ser[r["type_a"]], ser[r["type_b"]]
        assert r["n_a"] == len(xs) and r["n_b"] == len(ys)
        # with a band this wide on 30-day series the banded cost
        # equals the unconstrained optimum (band >= 10 covers every
        # useful warp here); the full DP is the independent reference
        full = _dtw_full(xs, ys)
        assert r["dtw_cost"] == full
        assert r["dtw_norm"] == float(r["dtw_cost"]) / float(
            r["n_a"] + r["n_b"]
        )
        # DTW lower bound: never below |sum-aligned| endpoint costs,
        # never above the direct lockstep (identity-alignment) cost
        lockstep = sum(abs(a - b) for a, b in zip(xs, ys))
        assert r["dtw_cost"] <= lockstep
        assert r["dtw_cost"] >= abs(xs[0] - ys[0])
    # symmetry of the metric: recompute one pair flipped
    a, b = types[0], types[1]
    assert _dtw_full(ser[a], ser[b]) == _dtw_full(ser[b], ser[a])


# ---------------------------------------------------------------------------
# ROUGE-L pairs vs a from-scratch shingle+LCS reference


def _lcs_len(xs, ys):
    n, m = len(xs), len(ys)
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            if xs[i - 1] == ys[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return prev[m]


def test_rouge_l_pairs_matches_pure_python(spark):
    rows = plans.get("text_rouge_l_pairs").build(spark, SF).collect()
    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    con.close()
    toks = {i: [t for t in txt.split(" ") if t != ""] for i, txt in docs.items()}
    shing = {
        i: {
            " ".join(ts[k : k + 3])
            for k in range(len(ts) - 2)
        }
        for i, ts in toks.items()
    }
    df = defaultdict(int)
    for ss in shing.values():
        for s in ss:
            df[s] += 1
    rare = {s for s, c in df.items() if c <= 50}
    pairs = []
    ids = sorted(shing)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            common = len(shing[a] & shing[b] & rare)
            if common == 0:
                continue
            jac = common / float(len(shing[a]) + len(shing[b]) - common)
            if jac >= 0.5:
                pairs.append((a, b, jac))
    pairs.sort(key=lambda t: (-t[2], t[0], t[1]))
    pairs = pairs[:40]
    assert len(rows) == len(pairs) and len(pairs) > 0
    got = {(r["id_a"], r["id_b"]): r for r in rows}
    for a, b, jac in pairs:
        r = got[(a, b)]
        va, vb = toks[a][:120], toks[b][:120]
        lcs = _lcs_len(va, vb)
        assert r["jaccard"] == jac
        assert r["n_a"] == len(va) and r["n_b"] == len(vb)
        assert r["lcs_len"] == lcs
        rr = lcs / float(len(va))
        pp = lcs / float(len(vb))
        assert r["rouge_r"] == rr and r["rouge_p"] == pp
        assert r["rouge_f"] == (0.0 if lcs == 0 else 2.0 * rr * pp / (rr + pp))
        # near-dup pairs must share substantial sequence, and ROUGE-L
        # can never exceed the shorter-side unigram bound
        assert 0.0 <= r["rouge_f"] <= 1.0
        assert lcs <= min(len(va), len(vb))


# ---------------------------------------------------------------------------
# Amortization schedule vs an explicit month-by-month loop


def test_amortization_matches_sequential_loop(spark):
    rows = {
        r["priority"]: r
        for r in plans.get("fin_amortization_schedule").build(spark, SF).collect()
    }
    bps_map = {
        "1-URGENT": 900,
        "2-HIGH": 800,
        "3-MEDIUM": 700,
        "4-NOT SPECIFIED": 600,
        "5-LOW": 500,
    }
    con = duckdb.connect()
    loans = con.execute(
        "SELECT o_orderpriority,"
        " CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        f" FROM read_parquet('{SF}/orders.parquet')"
        " WHERE o_orderkey % 997 = 0"
    ).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0, set()])  # n, principal, interest
    for pri, p_cents in loans:
        bps = bps_map[pri]
        pp = (p_cents + 23) // 24
        bal = p_cents
        interest = 0
        # the sequential loop the closed form must reproduce
        for _ in range(24):
            interest += (bal * bps) // 120000
            bal = max(bal - pp, 0)
        assert bal == 0  # fully amortized within the term
        a = agg[pri]
        a[0] += 1
        a[1] += p_cents
        a[2] += interest
        a[3].add(p_cents)
    assert set(rows) == set(agg)
    for pri, (n, p, i, dp) in agg.items():
        r = rows[pri]
        assert r["n_loans"] == n
        assert r["n_principals"] == len(dp)
        assert r["total_principal_cents"] == p
        assert r["total_interest_cents"] == i
        assert r["interest_to_principal"] == float(i) / float(p)
        # rate sanity: average balance over the 24-month linear
        # decline is ~P/2, so total interest ~ (bps/10000) * P —
        # one full annual rate across the two-year term
        assert 0.0 < r["interest_to_principal"] < 1.1 * bps_map[pri] / 10000.0


# ---------------------------------------------------------------------------
# Spearman rho vs a pure-python midrank reference


def test_spearman_matches_pure_python(spark):
    row = plans.get("stat_spearman_corr").build(spark, SF).collect()[0]
    con = duckdb.connect()
    data = con.execute(
        "SELECT CAST(l_quantity AS DECIMAL(12,2)),"
        " CAST(l_extendedprice AS DECIMAL(12,2))"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    con.close()

    def midranks2(vals):
        from collections import Counter

        cnt = Counter(vals)
        mr = {}
        c = 0
        for v in sorted(cnt):
            t = cnt[v]
            mr[v] = 2 * c + t + 1  # doubled midrank
            c += t
        return mr

    xs = [x for x, _ in data]
    ys = [y for _, y in data]
    mx, my = midranks2(xs), midranks2(ys)
    n = len(data)
    sx = sum(mx[x] for x in xs)
    sy = sum(my[y] for y in ys)
    sxx = sum(mx[x] * mx[x] for x in xs)
    syy = sum(my[y] * my[y] for y in ys)
    sxy = sum(mx[x] * my[y] for x, y in data)
    import math

    nf = float(n)
    rho = (nf * float(sxy) - float(sx) * float(sy)) / (
        math.sqrt(nf * float(sxx) - float(sx) * float(sx))
        * math.sqrt(nf * float(syy) - float(sy) * float(sy))
    )
    assert row["n"] == n
    assert row["rho"] == rho
    assert -1.0 <= row["rho"] <= 1.0
    # fixture fact (verified): synthetic extended price is drawn
    # independently of quantity, so the rank correlation is ~0
    # (-0.0098 at sf0.001) — the test pins near-zero, not a sign
    assert abs(row["rho"]) < 0.1


# ---------------------------------------------------------------------------
# Assortativity vs a pure-python edge-degree reference


def test_assortativity_matches_pure_python(spark):
    row = plans.get("graph_degree_assortativity").build(spark, SF).collect()[0]
    con = duckdb.connect()
    edges = con.execute(
        "SELECT DISTINCT o.o_custkey, l.l_suppkey"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
        f" JOIN read_parquet('{SF}/orders.parquet') o"
        " ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    con.close()
    dc, ds = defaultdict(int), defaultdict(int)
    for c, s in edges:
        dc[c] += 1
        ds[s] += 1
    m = len(edges)
    sx = sum(dc[c] for c, _ in edges)
    sy = sum(ds[s] for _, s in edges)
    sxx = sum(dc[c] ** 2 for c, _ in edges)
    syy = sum(ds[s] ** 2 for _, s in edges)
    sxy = sum(dc[c] * ds[s] for c, s in edges)
    import math

    mf = float(m)
    r = (mf * float(sxy) - float(sx) * float(sy)) / (
        math.sqrt(mf * float(sxx) - float(sx) * float(sx))
        * math.sqrt(mf * float(syy) - float(sy) * float(sy))
    )
    assert row["n_edges"] == m
    assert row["assortativity"] == r
    assert -1.0 <= row["assortativity"] <= 1.0


# ---------------------------------------------------------------------------
# Depth-2 tree vs a pure-python histogram tree


def test_tree_depth2_matches_pure_python(spark):
    rows = {
        r["node"]: r
        for r in plans.get("ml_decision_tree_depth2").build(spark, SF).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        "SELECT l_extendedprice, CAST(l_quantity AS DOUBLE),"
        " l_returnflag = 'R'"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    con.close()
    mn1 = min(x for x, _, _ in data)
    mx1 = max(x for x, _, _ in data)
    mn2 = min(q for _, q, _ in data)
    mx2 = max(q for _, q, _ in data)

    def binno(x, mn, mx):
        return min(31, int((x - mn) // ((mx - mn) / 32.0)))

    def gini(p, t):
        return (
            1.0
            - (float(p) / float(t)) * (float(p) / float(t))
            - (float(t - p) / float(t)) * (float(t - p) / float(t))
        )

    def best_split(items):
        # items: list of (bin1, bin2, pos); returns (f, bin, gain, n, npos)
        hist = defaultdict(lambda: [0, 0])
        for b1, b2, pos in items:
            for f, b in ((1, b1), (2, b2)):
                hist[(f, b)][0] += 1
                hist[(f, b)][1] += pos
        tot_n = len(items)
        tot_pos = sum(p for _, _, p in items)
        cands = []
        for f in (1, 2):
            cum_n = cum_pos = 0
            for b in sorted(b for (ff, b) in hist if ff == f):
                n, npos = hist[(f, b)]
                cum_n += n
                cum_pos += npos
                if cum_n < tot_n:
                    g = (
                        gini(tot_pos, tot_n)
                        - (float(cum_n) / float(tot_n)) * gini(cum_pos, cum_n)
                        - (float(tot_n - cum_n) / float(tot_n))
                        * gini(tot_pos - cum_pos, tot_n - cum_n)
                    )
                    cands.append((-g, f, b))
        cands.sort()
        g, f, b = -cands[0][0], cands[0][1], cands[0][2]
        return f, b, g, tot_n, tot_pos

    items = [
        (binno(x, mn1, mx1), binno(q, mn2, mx2), int(pos))
        for x, q, pos in data
    ]
    rf, rb, rg, rn, rnp = best_split(items)
    root = rows["root"]
    assert (root["feature"], root["split_bin"]) == (rf, rb)
    assert root["gain"] == rg and root["n"] == rn and root["n_pos"] == rnp
    left = [it for it in items if (it[0] if rf == 1 else it[1]) <= rb]
    right = [it for it in items if (it[0] if rf == 1 else it[1]) > rb]
    assert rows["left"]["n"] == len(left) * 1
    assert rows["right"]["n"] == len(right) * 1
    for leaf, subset in (("left", left), ("right", right)):
        f, b, g, n, npos = best_split(subset)
        r = rows[leaf]
        assert (r["feature"], r["split_bin"]) == (f, b)
        assert r["gain"] == g
        assert r["n_pos"] == sum(p for _, _, p in subset)
        assert r["gain"] >= 0.0  # splitting can never increase impurity
    assert rows["left"]["n"] + rows["right"]["n"] == rows["root"]["n"]


# ---------------------------------------------------------------------------
# Two-round GBDT vs a pure-python boosting loop (same floor scaling)


def test_gbdt_two_rounds_matches_pure_python(spark):
    import math

    row = plans.get("ml_gbdt_two_rounds").build(spark, SF).collect()[0]
    con = duckdb.connect()
    data = con.execute(
        "SELECT l_quantity, l_discount, l_extendedprice,"
        " CAST(l_extendedprice AS DECIMAL(25,2))"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    con.close()
    n_all = len(data)
    f0 = float(sum(d for _, _, _, d in data)) / float(n_all)

    def stump(items):
        # items: (thr_key, residual); returns best by the same
        # floor-scaled stats: (thr, gl, gr, rmse_after)
        from collections import defaultdict as dd

        g = dd(lambda: [0, 0, 0])  # n, sr_raw, sr2_raw
        for t, r in items:
            e = g[t]
            e[0] += 1
            e[1] += math.floor(r * 1e4)
            e[2] += math.floor(r * r * 1e4)
        tot_n = len(items)
        tot_r = float(sum(e[1] for e in g.values())) / 1e4
        tot_r2 = float(sum(e[2] for e in g.values())) / 1e4
        cum_n = 0
        cum_sr = 0
        best = None
        for t in sorted(g):
            cum_n += g[t][0]
            cum_sr += g[t][1]
            if cum_n >= tot_n:
                continue
            cum_r = float(cum_sr) / 1e4
            gain = (
                (cum_r * cum_r) / float(cum_n)
                + ((tot_r - cum_r) * (tot_r - cum_r)) / float(tot_n - cum_n)
                - (tot_r * tot_r) / float(tot_n)
            )
            key = (gain, t)  # ties: larger threshold wins (DESC)
            if best is None or key > (best[0], best[1]):
                gl = cum_r / float(cum_n)
                gr = (tot_r - cum_r) / float(tot_n - cum_n)
                sse = (
                    tot_r2
                    - (cum_r * cum_r) / float(cum_n)
                    - ((tot_r - cum_r) * (tot_r - cum_r))
                    / float(tot_n - cum_n)
                )
                best = (gain, t, gl, gr, math.sqrt(sse / float(tot_n)))
        return best

    r1_items = [(q, p - f0) for q, _, p, _ in data]
    _, thr1, gl, gr, rmse1 = stump(r1_items)
    assert row["f0"] == f0
    assert row["thr1"] == thr1
    assert row["gamma1_left"] == gl and row["gamma1_right"] == gr
    assert row["rmse_after_r1"] == rmse1

    def f1(q):
        return f0 + gl if q <= thr1 else f0 + gr

    best_by_f = {}
    for f, keyfn in ((1, lambda q, d: q), (2, lambda q, d: d)):
        items = [(keyfn(q, d), p - f1(q)) for q, d, p, _ in data]
        best_by_f[f] = stump(items)
    # cross-feature argmax: gain DESC, f ASC, thr DESC
    cands = sorted(
        ((-g, f, -t, rest) for f, (g, t, *rest) in best_by_f.items())
    )
    _, f2, negt2, rest = cands[0]
    g2l, g2r, rmse2 = rest
    assert row["feature2"] == f2
    assert row["thr2"] == -negt2
    assert row["gamma2_left"] == g2l and row["gamma2_right"] == g2r
    assert row["rmse_after_r2"] == rmse2
    # boosting monotonicity: every round reduces train RMSE
    assert row["rmse_after_r2"] <= row["rmse_after_r1"]
    # and round 1 must agree with the standalone single-round query
    one = plans.get("ml_gbdt_boost_round").build(spark, SF).collect()[0]
    assert one["best_threshold"] == row["thr1"]
    assert one["rmse_after"] == row["rmse_after_r1"]


# ---------------------------------------------------------------------------
# Haar energies vs a pure-python pyramid


def test_haar_energy_matches_pure_python(spark):
    rows = plans.get("ts_haar_energy").build(spark, SF).collect()
    con = duckdb.connect()
    daily = con.execute(
        "SELECT event_type, CAST(ts AS DATE) AS d,"
        " CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)"
        f" FROM read_parquet('{SF}/events.parquet')"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for et, _, v in daily:
        series[et].append(int(v))
    got = {(r["event_type"], r["level"]): r for r in rows}
    assert len(rows) == len(series) * 5
    for et, xs in series.items():
        vals = xs + [0] * (32 - len(xs))
        for level in range(1, 6):
            nxt, details = [], []
            for i in range(0, len(vals), 2):
                nxt.append(vals[i] + vals[i + 1])
                details.append(vals[i] - vals[i + 1])
            r = got[(et, level)]
            assert r["n_coeffs"] == len(details)
            assert r["energy"] == float(sum(d * d for d in details))
            assert r["energy"] >= 0.0
            vals = nxt
        assert len(vals) == 1  # fully reduced at level 5


# ---------------------------------------------------------------------------
# Epoch sample vs a pure-python threshold replay


def test_epoch_sample_matches_pure_python(spark):
    import math

    rows = plans.get("cur_epoch_sample").build(spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        "SELECT source, lang, doc_id FROM"
        f" read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    by_dom = defaultdict(list)
    for s, l, i in docs:
        by_dom[(s, l)].append(i)
    wq = {k: math.floor(math.sqrt(float(len(v))) * 1e6) for k, v in by_dom.items()}
    total_wq = sum(wq.values())
    got = {(r["source"], r["lang"]): r for r in rows}
    assert set(got) == set(by_dom)
    total_budget = 0
    for k, ids in by_dom.items():
        n = len(ids)
        budget = math.floor(float(wq[k]) / float(total_wq) * 100_000)
        thr = min(65536, (budget * 65536) // n)
        sel = [i for i in ids if _u16(f"{i}#epoch-1") < thr]
        r = got[k]
        assert r["n_docs"] == n and r["budget"] == budget
        assert r["n_selected"] == len(sel)
        assert r["id_checksum"] == sum(sel)
        assert r["fill_ratio"] == float(len(sel)) / float(max(budget, 1))
        total_budget += budget
    # floor rounding can only lose docs vs the epoch target
    assert total_budget <= 100_000


# ---------------------------------------------------------------------------
# File-layout audit: cross-engine differential lives HERE (the driver
# oracle runner only sees table views, which hide the filename column)


def test_file_layout_matches_duckdb_filename_scan(spark):
    rows = {
        r["tbl"]: r
        for r in plans.get("obs_file_layout").build(spark, SF).collect()
    }
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents"):
        per_file = con.execute(
            "SELECT filename, COUNT(*) FROM"
            f" read_parquet('{SF}/{t}.parquet', filename=true)"
            " GROUP BY filename"
        ).fetchall()
        r = rows[t]
        counts = [c for _, c in per_file]
        assert r["n_files"] == len(per_file)
        assert r["total_rows"] == sum(counts)
        assert r["max_file_rows"] == max(counts)
        assert r["min_file_rows"] == min(counts)
    con.close()


# ---------------------------------------------------------------------------
# Cramér's V vs a pure-python contingency reference


def test_cramers_v_matches_pure_python(spark):
    import math

    row = plans.get("stat_cramers_v").build(spark, SF).collect()[0]
    con = duckdb.connect()
    cells = con.execute(
        "SELECT o_orderpriority, o_orderstatus, COUNT(*) FROM"
        f" read_parquet('{SF}/orders.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    n = sum(c for _, _, c in cells)
    nr = defaultdict(int)
    nc = defaultdict(int)
    for r, c, o in cells:
        nr[r] += o
        nc[c] += o
    phi2_raw = 0
    for r, c, o in cells:
        po = float(o) / float(n)
        pr = float(nr[r]) / float(n)
        pc = float(nc[c]) / float(n)
        phi2_raw += math.floor((po - pr * pc) * (po - pr * pc) / (pr * pc) * 1e15)
    phi2 = float(phi2_raw) / 1e15
    assert row["n"] == n
    assert row["n_rows"] == len(nr) and row["n_cols"] == len(nc)
    assert row["chi2"] == float(n) * phi2
    assert row["cramers_v"] == math.sqrt(
        phi2 / float(min(len(nr) - 1, len(nc) - 1))
    )
    assert 0.0 <= row["cramers_v"] <= 1.0


# ---------------------------------------------------------------------------
# PACF: Durbin-Levinson reference + the AR(2) cross-identity


def test_pacf_matches_reference_and_ar2_identity(spark):
    pacf = {
        r["event_type"]: r
        for r in plans.get("ts_pacf").build(spark, SF).collect()
    }
    ar2 = {
        r["event_type"]: r
        for r in plans.get("ts_yule_walker_ar2").build(spark, SF).collect()
    }
    assert set(pacf) == set(ar2)
    for et, p in pacf.items():
        # shared-estimator identity: pacf(2) IS the AR(2) phi2
        assert p["pacf2"] == pytest.approx(ar2[et]["phi2"], rel=1e-12, abs=1e-15)
        # partial correlations are correlations
        for k in ("pacf1", "pacf2", "pacf3"):
            assert -1.0 <= p[k] <= 1.0
        assert p["n_days"] == ar2[et]["n_days"]


# ---------------------------------------------------------------------------
# Runs test vs a pure-python sequence walk


def test_runs_test_matches_pure_python(spark):
    import math

    rows = {
        r["event_type"]: r
        for r in plans.get("stat_runs_test").build(spark, SF).collect()
    }
    con = duckdb.connect()
    daily = con.execute(
        "SELECT event_type, CAST(ts AS DATE) AS d,"
        " SUM(CAST(value AS DECIMAL(18,6)))"
        f" FROM read_parquet('{SF}/events.parquet')"
        " GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for et, _, x in daily:
        series[et].append(x)
    assert set(rows) == set(series)
    for et, xs in series.items():
        signs = []
        for a, b in zip(xs, xs[1:]):
            if b > a:
                signs.append(1)
            elif b < a:
                signs.append(-1)
        n_up = signs.count(1)
        n_down = signs.count(-1)
        n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        r = rows[et]
        assert r["n_up"] == n_up and r["n_down"] == n_down
        assert r["n_runs"] == n_runs
        nu, nd = float(n_up), float(n_down)
        nt = nu + nd
        z = (float(n_runs) - (2.0 * nu * nd / nt + 1.0)) / math.sqrt(
            2.0 * nu * nd * (2.0 * nu * nd - nt) / (nt * nt * (nt - 1.0))
        )
        assert r["z_score"] == z
        # runs are bounded: at least 1, at most the number of moves
        assert 1 <= r["n_runs"] <= n_up + n_down


# ---------------------------------------------------------------------------
# Gini vs a pure-python sort-and-rank reference


def test_gini_matches_pure_python(spark):
    rows = {
        r["priority"]: r
        for r in plans.get("stat_gini_coefficient").build(spark, SF).collect()
    }
    by_g = defaultdict(list)
    for _, pri, x in _orders():
        by_g[pri].append(x)
    assert set(rows) == set(by_g)
    for pri, xs in by_g.items():
        xs.sort()
        n = len(xs)
        sx = sum(xs, Decimal(0))
        rx2 = sum(
            (2 * (i + 1) * x for i, x in enumerate(xs)), Decimal(0)
        )  # 2 * sum of rank*x, ranks 1..n (ties: consecutive ranks —
        # identical total to the closed-form tied-block sum)
        r = rows[pri]
        gini = float(rx2) / (float(n) * float(sx)) - (float(n) + 1.0) / float(n)
        assert r["n"] == n
        assert r["mean_total"] == float(sx) / float(n)
        assert r["gini"] == gini
        assert 0.0 <= r["gini"] < 1.0


# ---------------------------------------------------------------------------
# HHI vs a pure-python share-squares reference


def test_herfindahl_matches_pure_python(spark):
    rows = {
        r["nation"]: r
        for r in plans.get("fin_herfindahl_concentration")
        .build(spark, SF)
        .collect()
    }
    con = duckdb.connect()
    rev = con.execute(
        "SELECT s.s_nationkey, l.l_suppkey,"
        " SUM(CAST(l_extendedprice AS DECIMAL(12,2)))"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
        f" JOIN read_parquet('{SF}/supplier.parquet') s"
        " ON s.s_suppkey = l.l_suppkey"
        " GROUP BY 1, 2"
    ).fetchall()
    con.close()
    by_n = defaultdict(list)
    for nation, _, r in rev:
        by_n[nation].append(r)
    assert set(rows) == set(by_n)
    for nation, rs in by_n.items():
        tot = sum(rs, Decimal(0))
        sq = sum((r * r for r in rs), Decimal(0))
        hhi = float(sq) / (float(tot) * float(tot))
        g = rows[nation]
        assert g["n_suppliers"] == len(rs)
        assert g["total_revenue"] == float(tot)
        assert g["hhi"] == hhi
        assert g["effective_n"] == 1.0 / hhi
        # HHI bounds: 1/n (equal shares) <= HHI <= 1 (monopoly);
        # a single-supplier nation lands at 1 +/- 1 ulp because
        # float(tot)^2 differs from float(tot*tot) in the last bit
        assert 1.0 / len(rs) - 1e-12 <= g["hhi"] <= 1.0 + 1e-12
        assert 1.0 - 1e-12 <= g["effective_n"] <= len(rs) + 1e-9


# ---------------------------------------------------------------------------
# Lorenz deciles vs a pure-python sorted-prefix reference


def test_lorenz_deciles_matches_pure_python(spark):
    rows = plans.get("stat_lorenz_deciles").build(spark, SF).collect()
    by_g = defaultdict(list)
    for _, pri, x in _orders():
        by_g[pri].append(x)
    got = {(r["priority"], r["decile"]): r for r in rows}
    assert len(rows) == len(by_g) * 10
    for pri, xs in by_g.items():
        xs.sort()
        n = len(xs)
        tot = sum(xs, Decimal(0))
        prev_share = 0.0
        for d in range(1, 11):
            k = (d * n + 9) // 10  # ceil(d*n/10)
            # the plan cuts at whole distinct-value tie blocks: the
            # reported prefix extends through every order tied with
            # the rank-k value (same semantics here, via bisect —
            # asserting == k exactly would flake if a tie block ever
            # straddles a decile boundary on a regenerated fixture)
            import bisect

            kk = bisect.bisect_right(xs, xs[k - 1])
            cum = sum(xs[:kk], Decimal(0))
            r = got[(pri, d)]
            assert r["n_orders_cum"] == kk
            assert kk >= k
            assert r["pop_share"] == float(kk) / float(n)
            assert r["rev_share"] == float(cum) / float(tot)
            # Lorenz curve properties: nondecreasing, below the
            # diagonal (cheap orders accumulate revenue slower than
            # population), ending at exactly 1
            assert r["rev_share"] >= prev_share
            assert r["rev_share"] <= r["pop_share"] + 1e-12
            prev_share = r["rev_share"]
        assert got[(pri, 10)]["rev_share"] == pytest.approx(1.0, abs=1e-12)
