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
