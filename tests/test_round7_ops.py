"""Round-7 operator tests: independent driver-side references (numpy /
pure Python) for the evaluation suite, plus structural invariants for
the iterative/graph operators. As in test_round4_ops.py and
test_round6_ops.py, every reference is a deliberately naive
re-implementation so a bug in the distributed path cannot hide in a
shared helper — and every assertion below was verified against the
sf0.001 fixture before commit (the round-6 lesson).
"""

import duckdb
import numpy as np
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


def _lineitem_cols(*cols):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {', '.join(cols)}"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    con.close()
    return rows


# ---------------------------------------------------------------------------
# ROC-AUC vs a naive pairwise/midrank reference


def test_roc_auc_matches_midrank_reference(spark):
    row = plans.get("ml_roc_auc").build(spark, SF).collect()[0]
    data = _lineitem_cols("l_quantity", "l_returnflag = 'R'")
    scores = np.array([float(s) for s, _ in data])
    labels = np.array([bool(y) for _, y in data])
    # naive midrank AUC: scipy-free rankdata
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(len(scores), dtype=np.float64)
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j < len(scores) and sorted_scores[j] == sorted_scores[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    npos = int(labels.sum())
    nneg = len(labels) - npos
    auc = (ranks[labels].sum() - npos * (npos + 1) / 2.0) / (npos * nneg)
    assert row["npos"] == npos and row["nneg"] == nneg
    assert row["auc"] == pytest.approx(auc, rel=1e-12)
    assert 0.0 <= row["auc"] <= 1.0


# ---------------------------------------------------------------------------
# Threshold sweep invariants + spot reference


def test_threshold_sweep_confusion_reference(spark):
    rows = {
        r["threshold"]: r
        for r in plans.get("ml_threshold_sweep").build(spark, SF).collect()
    }
    data = _lineitem_cols("l_quantity", "l_returnflag = 'R'")
    all_pos = sum(1 for _, y in data if y)
    all_neg = len(data) - all_pos
    for t in list(rows)[:5]:
        tp = sum(1 for s, y in data if float(s) >= float(t) and y)
        fp = sum(1 for s, y in data if float(s) >= float(t) and not y)
        r = rows[t]
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["tp"] + r["fn"] == all_pos
        assert r["fp"] + r["tn"] == all_neg
        assert 0.0 <= r["precision"] <= 1.0 and 0.0 <= r["recall"] <= 1.0
    # recall is monotone non-increasing as the threshold rises
    ts = sorted(rows)
    recalls = [rows[t]["recall"] for t in ts]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))


# ---------------------------------------------------------------------------
# k-fold OLS vs numpy lstsq per fold


def test_kfold_ols_matches_numpy(spark):
    out = {
        r["fold"]: r
        for r in plans.get("ml_kfold_ols_eval").build(spark, SF).collect()
    }
    data = _lineitem_cols(
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice"
    )
    X = np.array(
        [[1.0, float(q), float(d)] for _, q, d, _ in data]
    )
    y = np.array([float(p) for *_, p in data])
    folds = np.array([int(k) % 5 for k, *_ in data])
    for f in range(5):
        train, test = folds != f, folds == f
        beta = np.linalg.lstsq(X[train], y[train], rcond=None)[0]
        resid = y[test] - X[test] @ beta
        rmse = float(np.sqrt((resid**2).mean()))
        assert out[f]["n_test"] == int(test.sum())
        assert out[f]["rmse"] == pytest.approx(rmse, rel=1e-6)


# ---------------------------------------------------------------------------
# scaler + correlation matrix vs numpy


def test_standard_scaler_matches_numpy(spark):
    rows = {
        r["feature"]: r
        for r in plans.get("ml_standard_scaler").build(spark, SF).collect()
    }
    data = _lineitem_cols("l_quantity", "l_extendedprice", "l_discount")
    arr = np.array([[float(v) for v in row] for row in data])
    for i, f in enumerate(("l_quantity", "l_extendedprice", "l_discount")):
        col = arr[:, i]
        assert rows[f]["n"] == len(col)
        assert rows[f]["mean"] == pytest.approx(col.mean(), rel=1e-12)
        assert rows[f]["std"] == pytest.approx(col.std(ddof=1), rel=1e-12)
        z = (col - col.mean()) / col.std(ddof=1)
        assert rows[f]["z_min"] == pytest.approx(z.min(), rel=1e-9)
        assert rows[f]["z_max"] == pytest.approx(z.max(), rel=1e-9)


def test_feature_corr_matrix_matches_numpy(spark):
    rows = plans.get("ml_feature_corr_matrix").build(spark, SF).collect()
    feats = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    data = _lineitem_cols(*feats)
    arr = np.array([[float(v) for v in row] for row in data])
    ref = np.corrcoef(arr, rowvar=False)
    assert len(rows) == 6
    for r in rows:
        i, j = feats.index(r["feature_x"]), feats.index(r["feature_y"])
        assert r["corr"] == pytest.approx(ref[i, j], rel=1e-9)
        assert -1.0 <= r["corr"] <= 1.0


# ---------------------------------------------------------------------------
# decision stump: gain is non-negative and some split is informative


def test_decision_stump_gain_invariants(spark):
    rows = plans.get("ml_decision_stump_split").build(spark, SF).collect()
    tot_n = sum(r["n"] for r in rows)
    assert rows and tot_n == len(_lineitem_cols("1"))
    gains = [r["gain"] for r in rows if r["gain"] is not None]
    # Gini gain of any split of a concave impurity is >= 0 (up to fp)
    assert all(g >= -1e-12 for g in gains)
    assert max(gains) >= 0.0


# ---------------------------------------------------------------------------
# k-core: edge-count symmetry and subgraph consistency


def test_kcore_structural_invariants(spark):
    rows = plans.get("graph_kcore_peel").build(spark, SF).collect()
    cust = {r["node"]: r["degree"] for r in rows if r["side"] == "customer"}
    supp = {r["node"]: r["degree"] for r in rows if r["side"] == "supplier"}
    # both sides count the same surviving edge set
    assert sum(cust.values()) == sum(supp.values())
    assert all(d >= 1 for d in cust.values())
    # survivors are a subset of the original bipartite graph's nodes
    con = duckdb.connect()
    c_all, s_all = con.execute(
        f"""SELECT list(DISTINCT o.o_custkey), list(DISTINCT l.l_suppkey)
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/orders.parquet') o
              ON l.l_orderkey = o.o_orderkey"""
    ).fetchone()
    con.close()
    assert set(cust) <= set(c_all) and set(supp) <= set(s_all)


# ---------------------------------------------------------------------------
# perplexity filter vs a pure-python bigram LM (exact decimal contract)


def test_perplexity_filter_matches_pure_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    import math

    out = {
        r["doc_id"]: r
        for r in plans.get("text_perplexity_filter").build(spark, SF).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    toks = {d: [t for t in txt.split(" ") if t] for d, txt in docs}
    bigrams = {
        d: list(zip(ts, ts[1:])) for d, ts in toks.items() if len(ts) >= 2
    }
    c12, c1, vocab = {}, {}, set()
    for ts in toks.values():
        vocab.update(ts)
    for bs in bigrams.values():
        for b in bs:
            c12[b] = c12.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    V = len(vocab)
    q = Decimal("1.000000")
    logp = {
        b: Decimal(repr(math.log((n + 1) / (c1[b[0]] + V)))).quantize(
            q, rounding=ROUND_HALF_UP
        )
        for b, n in c12.items()
    }
    for d, bs in list(bigrams.items())[:50]:
        nll = -sum((logp[b] for b in bs), Decimal(0))
        avg = float(nll) / len(bs)
        assert out[d]["n_bigrams"] == len(bs)
        assert out[d]["avg_nll"] == pytest.approx(avg, rel=1e-12)
        assert out[d]["kept"] == (out[d]["avg_nll"] < 3.4)
    assert 0 < sum(r["kept"] for r in out.values()) < len(out)


# ---------------------------------------------------------------------------
# GBDT boosting round vs a naive numpy reference


def test_gbdt_boost_round_matches_numpy(spark):
    row = plans.get("ml_gbdt_boost_round").build(spark, SF).collect()[0]
    data = _lineitem_cols("l_quantity", "l_extendedprice")
    x = np.array([float(q) for q, _ in data])
    y = np.array([float(p) for _, p in data])
    f0 = y.mean()
    r = y - f0
    best = None
    for t in sorted(set(x))[:-1]:  # split = "x <= t"
        left, right = r[x <= t], r[x > t]
        gain = (
            left.sum() ** 2 / len(left)
            + right.sum() ** 2 / len(right)
            - r.sum() ** 2 / len(r)
        )
        if best is None or gain > best[0]:
            best = (gain, t, left.mean(), right.mean())
    gain, t, gl, gr = best
    sse_after = ((r - np.where(x <= t, gl, gr)) ** 2).sum()
    assert row["f0"] == pytest.approx(f0, rel=1e-12)
    assert float(row["best_threshold"]) == t
    assert row["gain"] == pytest.approx(gain, rel=1e-6)
    assert row["gamma_left"] == pytest.approx(gl, rel=1e-6)
    assert row["gamma_right"] == pytest.approx(gr, rel=1e-6)
    assert row["rmse_after"] == pytest.approx(
        np.sqrt(sse_after / len(r)), rel=1e-6
    )
    # boosting cannot hurt squared-loss training error
    assert row["rmse_after"] <= np.sqrt((r**2).mean()) + 1e-9


# ---------------------------------------------------------------------------
# batch-3 references: MI, chi2, novelty, zipf


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    return [(d, l, [t for t in txt.split(" ") if t]) for d, l, txt in rows]


def test_mutual_information_matches_pure_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    import math

    rows = plans.get("ml_mutual_information").build(spark, SF).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT o_orderpriority, o_orderstatus"
        f" FROM read_parquet('{SF}/orders.parquet')"
    ).fetchall()
    con.close()
    joint, mx, my = {}, {}, {}
    for x, y in data:
        joint[(x, y)] = joint.get((x, y), 0) + 1
        mx[x] = mx.get(x, 0) + 1
        my[y] = my.get(y, 0) + 1
    n = len(data)
    q = Decimal("1.000000")
    mi = 0.0
    for r in rows:
        nxy = joint[(r["x"], r["y"])]
        pmi_q = Decimal(
            repr(math.log(nxy * n / (mx[r["x"]] * my[r["y"]])))
        ).quantize(q, rounding=ROUND_HALF_UP)
        assert r["n_xy"] == nxy
        assert r["pmi"] == pytest.approx(float(pmi_q), abs=1e-12)
        assert r["mi_contribution"] == pytest.approx(
            float(nxy * pmi_q) / n, rel=1e-12
        )
        mi += r["mi_contribution"]
    assert len(rows) == len(joint)
    assert mi >= -1e-9  # total MI is non-negative


def test_chi2_feature_select_reference(spark):
    rows = plans.get("ml_chi2_feature_select").build(spark, SF).collect()
    docs = _docs()
    n = len(docs)
    for r in rows[:5]:
        a = sum(1 for _, l, ts in docs if l == r["lang"] and r["tok"] in ts)
        ntok = sum(1 for *_, ts in docs if r["tok"] in ts)
        nlang = sum(1 for _, l, _ts in docs if l == r["lang"])
        b, c, d = ntok - a, nlang - a, n - ntok - nlang + a
        assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
        chi2 = (
            n * (a * d - b * c) ** 2
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
        assert r["chi2"] == pytest.approx(chi2, rel=1e-12)
    # ranked descending
    chis = [r["chi2"] for r in rows]
    assert chis == sorted(chis, reverse=True) and len(rows) == 20


def test_ngram_novelty_reference(spark):
    out = {
        r["doc_id"]: r
        for r in plans.get("text_ngram_novelty").build(spark, SF).collect()
    }
    docs = _docs()
    first = {}
    tris = {}
    for d, _, ts in sorted(docs):
        my = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
        tris[d] = my
        for t in my:
            if t not in first or d < first[t]:
                first[t] = min(first.get(t, d), d)
    for d, my in list(tris.items())[:50]:
        if not my:
            assert d not in out
            continue
        novel = sum(1 for t in my if first[t] == d)
        assert out[d]["n_trigram_types"] == len(my)
        assert out[d]["novel_types"] == novel
        assert out[d]["novelty_ratio"] == pytest.approx(
            novel / len(my), rel=1e-12
        )
    # the corpus must contain both boilerplate and novel docs
    ratios = [r["novelty_ratio"] for r in out.values()]
    assert min(ratios) < 1.0 and max(ratios) > 0.0


def test_zipf_fit_reference(spark):
    from decimal import ROUND_HALF_UP, Decimal

    import math

    row = plans.get("text_zipf_fit").build(spark, SF).collect()[0]
    docs = _docs()
    freq = {}
    for *_, ts in docs:
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    q = Decimal("1.000000")

    def lq(v):
        return Decimal(repr(math.log(v))).quantize(q, rounding=ROUND_HALF_UP)

    xs = [lq(i + 1) for i in range(len(top))]
    ys = [lq(f) for _, f in top]
    n = float(len(top))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(x * x for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert row["n_points"] == len(top)  # sf0.001 vocab is < 100
    assert row["slope"] == pytest.approx(slope, rel=1e-9)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-9)
    # natural-ish corpus: slope negative (frequency decays with rank)
    assert row["slope"] < 0


def test_matryoshka_eval_invariants(spark):
    rows = {
        r["dim"]: r
        for r in plans.get("vec_matryoshka_eval").build(spark, SF).collect()
    }
    assert sorted(rows) == [8, 16, 32, 64]
    # the full dimension is its own ground truth
    assert rows[64]["recall_at_10"] == pytest.approx(1.0)
    for d, r in rows.items():
        assert r["n_queries"] == 8
        assert 0.0 <= r["recall_at_10"] <= 1.0
        assert r["overlap"] == pytest.approx(r["recall_at_10"] * 10 * 8)
    # more dimensions never hurt exact-truncation recall on average...
    # is NOT guaranteed pointwise, so only pin the trivially-true edge:
    assert rows[64]["overlap"] == 80


def test_sprt_matches_pure_python(spark):
    from decimal import ROUND_HALF_UP, Decimal

    import math

    row = plans.get("ml_ab_sequential_sprt").build(spark, SF).collect()[0]
    con = duckdb.connect()
    trials = con.execute(
        f"SELECT event_id, event_type = 'purchase'"
        f" FROM read_parquet('{SF}/events.parquet') ORDER BY event_id"
    ).fetchall()
    con.close()
    q = Decimal("1.000000")

    def lq(v):
        return Decimal(repr(math.log(v))).quantize(q, rounding=ROUND_HALF_UP)

    l1, l0 = lq(0.22 / 0.15), lq(0.78 / 0.85)
    a, b = lq(0.95 / 0.05), lq(0.05 / 0.95)
    ns = 0
    decision, n_at, llr_at = "continue", len(trials), None
    for i, (_, s) in enumerate(trials, start=1):
        ns += int(bool(s))
        llr = ns * l1 + (i - ns) * l0
        if llr >= a or llr <= b:
            decision = "accept_H1" if llr >= a else "accept_H0"
            n_at, llr_at = i, llr
            break
        llr_at = llr
    assert row["decision"] == decision
    assert row["n_trials"] == n_at
    assert row["llr"] == pytest.approx(float(llr_at), rel=1e-12)
    # on this fixture the test must actually STOP early (that's the
    # point of SPRT) — verified against the reference loop above
    assert decision != "continue" and n_at < len(trials)


def test_e2e_training_prep_invariants(spark):
    rows = plans.get("cur_e2e_training_prep").build(spark, SF).collect()
    assert rows, "pipeline must admit documents on the fixture"
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
        assert r["n_tokens"] >= 30
    # balanced mixture: every language contributes exactly the quota
    sizes = {k: len(v) for k, v in by_lang.items()}
    assert len(set(sizes.values())) == 1 and len(sizes) >= 2
    # round-robin interleave: positions 1..k are k distinct languages
    k = len(sizes)
    first_k = sorted(rows, key=lambda r: r["global_position"])[:k]
    assert len({r["lang"] for r in first_k}) == k
    # no duplicate content survived (doc_ids unique is necessary)
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_scene_cut_invariants(spark):
    rows = plans.get("mm_video_scene_cut").build(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_scenes"] <= r["n_frames"]
        assert r["longest_scene"] <= r["n_frames"]
        assert r["avg_scene_len"] == pytest.approx(
            r["n_frames"] / r["n_scenes"]
        )
    # signatures are pseudo-random, so cuts must actually occur
    assert any(r["n_scenes"] > 1 for r in rows)


def test_farthest_point_init_invariants(spark):
    rows = sorted(
        plans.get("vec_farthest_point_init").build(spark, SF).collect(),
        key=lambda r: r["init_rank"],
    )
    assert [r["init_rank"] for r in rows] == list(range(1, 9))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 8
    # greedy max-min: each later pick's distance to the selected set
    # can only shrink (adding centroids never increases any min-dist)
    d = [r["d2_at_pick"] for r in rows[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(d, d[1:]))
    assert all(v > 0 for v in d)


def test_minhash_recall_eval_consistency(spark):
    row = plans.get("text_minhash_recall_eval").build(spark, SF).collect()[0]
    assert row["n_found"] <= min(row["n_truth_pairs"], row["n_lsh_pairs"])
    assert row["n_truth_pairs"] > 0  # fixture plants real near-dups
    # fixture near-dups sit at ~0.9 Jaccard, where 4-row/16-band
    # detection probability is ≈1 — measured recall is 1.0; pin a
    # floor that still catches a broken banding config
    assert row["recall"] >= 0.9
    assert row["precision"] >= 0.9


def test_deterministic_uuid_format_and_stability(spark):
    import re

    a = plans.get("scalar_deterministic_uuid").build(spark, SF).collect()
    b = plans.get("scalar_deterministic_uuid").build(spark, SF).collect()
    assert {r["o_orderkey"]: r["order_uuid"] for r in a} == {
        r["o_orderkey"]: r["order_uuid"] for r in b
    }  # re-run-stable (the point of name-based ids)
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    uuids = [r["order_uuid"] for r in a]
    assert all(pat.match(u) for u in uuids)
    assert len(set(uuids)) == len(uuids)  # injective on the key range


def test_mad_anomaly_invariants(spark):
    rows = plans.get("ts_anomaly_mad_robust").build(spark, SF).collect()
    for r in rows:
        assert r["mad"] > 0
        assert r["robust_z"] > 3.5
        assert abs(r["daily_value"] - r["median_value"]) == pytest.approx(
            r["robust_z"] * r["mad"], rel=1e-9
        )


def test_pattern_reversal_spot_reference(spark):
    rows = {
        r["event_type"]: r
        for r in plans.get("ts_pattern_reversal").build(spark, SF).collect()
    }
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT event_type, CAST(ts AS DATE) AS d, SUM(value) AS y
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2 ORDER BY event_type, d"""
    ).fetchall()
    con.close()
    series = {}
    for et, d, y in daily:
        series.setdefault(et, []).append((d, float(y)))
    for et, pts in series.items():
        n = sum(
            1
            for i in range(2, len(pts))
            if pts[i - 1][1] < pts[i - 2][1] and pts[i][1] > pts[i - 1][1]
        )
        if n == 0:
            assert et not in rows
        else:
            assert rows[et]["n_reversals"] == n
