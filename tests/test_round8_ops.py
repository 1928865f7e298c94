"""Round-8 operators: pure-Python / numpy references for the new eval
metrics (kappa, MCC, average precision, NDCG@10, lift/gains, PSI).
Each reference re-derives the metric from scratch over the sf0.001
fixture — a formula bug shared between the Spark build and the DuckDB
oracle cannot hide behind the hash gate (the _GINI lesson)."""

import hashlib
import math
from collections import defaultdict

import duckdb
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def _orders():
    return _fetch(
        "SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice"
        f" FROM read_parquet('{SF}/orders.parquet')"
    )


def _lineitem():
    return _fetch(
        "SELECT l_returnflag, l_linestatus, l_quantity, l_discount"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )


def test_cohen_kappa_matches_pure_python(spark):
    rows = plans.get("ml_cohen_kappa").build(spark, SF).collect()
    got = {r["o_orderstatus"]: r for r in rows}
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n11, n00, a1, b1
    ns = defaultdict(int)
    for _, status, pri, price in _orders():
        ra = 1 if pri in ("1-URGENT", "2-HIGH") else 0
        rb = 1 if price >= 250000 else 0
        c = cells[status]
        ns[status] += 1
        c[0] += ra & rb
        c[1] += (1 - ra) & (1 - rb)
        c[2] += ra
        c[3] += rb
    assert set(got) == set(ns)
    for status, (n11, n00, a1, b1) in cells.items():
        n = ns[status]
        po = (n11 + n00) / n
        pe = (a1 * b1 + (n - a1) * (n - b1)) / (n * n)
        kappa = (po - pe) / (1.0 - pe)
        r = got[status]
        assert r["n"] == n and r["n11"] == n11 and r["n00"] == n00
        assert r["po"] == pytest.approx(po, abs=1e-15)
        assert r["kappa"] == pytest.approx(kappa, abs=1e-12)
        assert -1.0 - 1e-12 <= r["kappa"] <= 1.0 + 1e-12


def test_mcc_matches_pure_python(spark):
    rows = plans.get("ml_mcc_binary").build(spark, SF).collect()
    got = {r["l_linestatus"]: r for r in rows}
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for rf, ls, _q, disc in _lineitem():
        pos, pred = rf == "R", disc >= 0.05
        c = cells[ls]
        if pos and pred:
            c[0] += 1
        elif pred:
            c[1] += 1
        elif pos:
            c[2] += 1
        else:
            c[3] += 1
    for ls, (tp, fp, fn, tn) in cells.items():
        r = got[ls]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        denom = math.sqrt((tp + fp) * (tp + fn)) * math.sqrt(
            (tn + fp) * (tn + fn)
        )
        if denom:
            assert r["mcc"] == pytest.approx(
                (tp * tn - fp * fn) / denom, abs=1e-12
            )
        else:
            assert r["mcc"] is None


def test_pr_auc_matches_pure_python(spark):
    r = plans.get("ml_pr_auc").build(spark, SF).collect()[0]
    by_score = defaultdict(lambda: [0, 0])
    for rf, _ls, q, _d in _lineitem():
        c = by_score[q]
        c[0] += 1
        c[1] += rf == "R"
    npos = sum(p for _, p in by_score.values())
    ntot = sum(c for c, _ in by_score.values())
    tp = nt = 0
    ap = 0.0
    for score in sorted(by_score, reverse=True):
        cnt, pos = by_score[score]
        tp += pos
        nt += cnt
        ap += (pos / npos) * (tp / nt)
    assert r["npos"] == npos and r["n_total"] == ntot
    # the operator's AP is floor-quantized per block at 1e-12
    assert r["average_precision"] == pytest.approx(
        ap, abs=len(by_score) * 1e-12 + 1e-12
    )
    # AP of any score >= prevalence for a better-than-random ranking,
    # and always within [0, 1]
    assert 0.0 <= r["average_precision"] <= 1.0


def test_ndcg_matches_pure_python(spark):
    rows = plans.get("ml_ndcg_at_k").build(spark, SF).collect()
    got = {r["o_orderpriority"]: r for r in rows}
    by_g = defaultdict(list)
    for key, _status, pri, price in _orders():
        by_g[pri].append((price, key, key % 4))
    disc = [1.0 / math.log2(i + 1) for i in range(1, 11)]
    for g, items in by_g.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        top = [rel for _, _, rel in items[:10]]
        dcg = sum(
            math.floor(rel * d * 1e12) for rel, d in zip(top, disc)
        ) / 1e12
        ideal = sorted((rel for _, _, rel in items), reverse=True)[:10]
        idcg = sum(
            math.floor(rel * d * 1e12) for rel, d in zip(ideal, disc)
        ) / 1e12
        r = got[g]
        assert r["n_items"] == len(items)
        assert r["dcg_at_10"] == pytest.approx(dcg, abs=1e-11)
        assert r["idcg_at_10"] == pytest.approx(idcg, abs=1e-11)
        assert r["ndcg_at_10"] == pytest.approx(dcg / idcg, abs=1e-11)
        assert r["ndcg_at_10"] <= 1.0 + 1e-12


def test_lift_gains_matches_pure_python(spark):
    rows = plans.get("ml_lift_gains_table").build(spark, SF).collect()
    got = {r["decile"]: r for r in rows}
    data = sorted(
        ((price, status == "F") for _, status, _, price in _orders()),
        key=lambda t: -t[0],
    )
    n = len(data)
    tpos = sum(1 for _, p in data if p)
    # whole-tie-block cuts, descending
    import bisect

    xs_desc = [-x for x, _ in data]  # ascending for bisect
    for d in range(1, 11):
        k = (d * n + 9) // 10
        kk = bisect.bisect_right(xs_desc, xs_desc[k - 1])
        cum_pos = sum(1 for _, p in data[:kk] if p)
        r = got[d]
        assert r["cum_n"] == kk
        assert r["cum_pos"] == cum_pos
        assert r["gain"] == pytest.approx(cum_pos / tpos, abs=1e-15)
        assert r["lift"] == pytest.approx(
            (cum_pos * n) / (kk * tpos), abs=1e-12
        )
    assert got[10]["gain"] == pytest.approx(1.0, abs=1e-15)


def test_psi_matches_pure_python(spark):
    rows = plans.get("ml_psi_drift").build(spark, SF).collect()
    got = {r["bin"]: r for r in rows}
    nref = [0] * 10
    ncur = [0] * 10
    for key, _status, _pri, price in _orders():
        b = min(int(price // 60000), 9)
        is_ref = hashlib.md5(str(key).encode()).hexdigest()[0] < "8"
        (nref if is_ref else ncur)[b] += 1
    tr, tc = sum(nref), sum(ncur)
    total = 0
    for b in range(10):
        num = (ncur[b] + 1) * (tr + 10)
        den = (nref[b] + 1) * (tc + 10)
        lnq6 = math.floor(1e6 * math.log(num / den))
        diffnum = num - den
        term = (diffnum * lnq6) / ((tr + 10) * (tc + 10)) / 1e6
        total += diffnum * lnq6
        r = got[b]
        assert (r["n_ref"], r["n_cur"]) == (nref[b], ncur[b])
        assert r["psi_term"] == pytest.approx(term, abs=1e-12)
    psi = total / ((tr + 10) * (tc + 10)) / 1e6
    assert got[0]["psi_total"] == pytest.approx(psi, abs=1e-12)
    # identical-distribution split should show no material drift
    assert abs(got[0]["psi_total"]) < 0.25
