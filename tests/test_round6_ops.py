"""Round-6 rows-only operators pinned against independent driver-side
references: Lloyd's k-means (numpy, identical deterministic init) and
multinomial naive-Bayes classification (pure-Python counts + the same
DECIMAL(20,12) log-prob quantization).

As in test_round4_ops.py, each reference is a deliberately naive
re-implementation so a bug in the distributed path cannot hide in a
shared helper.
"""

import math
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# k-means (Lloyd)


def _load_embeddings():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [r[0] for r in rows]
    X = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, X


def _ref_lloyd(X, k, iters):
    """Naive numpy Lloyd with the operator's init (first k rows by
    vec_id) and empty-cluster rule (keep previous centroid)."""
    cents = X[:k].copy()
    prev = None
    history = []
    for it in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        inertia = d2[np.arange(len(X)), assign].sum()
        n_moved = -1 if prev is None else int((assign != prev).sum())
        history.append((it, float(inertia), n_moved))
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = X[mask].mean(axis=0)
        prev = assign
        if n_moved == 0:
            break
    return cents, history


def test_kmeans_matches_numpy_lloyd(spark):
    from finance_etl_spark.plans.ml import _ITERS, _K, kmeans_fit

    cents, history = kmeans_fit(spark, SF)
    _, X = _load_embeddings()
    ref_cents, ref_history = _ref_lloyd(X, _K, _ITERS)

    # same number of iterations, same movement counts
    assert len(history) == len(ref_history)
    assert [h[2] for h in history] == [h[2] for h in ref_history]
    # inertia non-increasing and matching the reference per iteration
    for (it, inertia, _), (rit, rinertia, _) in zip(history, ref_history):
        assert it == rit
        assert inertia == pytest.approx(rinertia, rel=1e-9)
    prev = None
    for _, inertia, _ in history:
        if prev is not None:
            assert inertia <= prev + 1e-9
        prev = inertia
    # converged on this fixture (n_moved hits 0 at iteration 12 < _ITERS)
    assert history[-1][2] == 0
    assert len(history) < _ITERS
    # final centroids agree dimension-wise
    assert np.allclose(np.array(cents), ref_cents, rtol=1e-9, atol=1e-12)


def test_kmeans_registered_history_schema(spark):
    df = plans.get("ml_kmeans_lloyd").build(spark, SF)
    rows = df.collect()
    assert df.columns == ["iteration", "inertia", "n_moved"]
    assert rows[0]["n_moved"] == -1
    assert len(rows) >= 2


# ---------------------------------------------------------------------------
# naive Bayes classify (confusion matrix)


def _ref_nb_confusion():
    """Pure-Python multinomial NB with Laplace smoothing and the
    operator's DECIMAL(20,12) quantization of log-probs, scored by
    exact Decimal sums (mirrors the relayout-stability contract)."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    docs = [(d, l, [t for t in txt.split(" ") if t != ""]) for d, l, txt in rows]

    tok_counts = {}  # (lang, tok) -> n
    cls_tokens = {}  # lang -> total tokens
    cls_docs = {}  # lang -> n docs
    vocab = set()
    for _, lang, toks in docs:
        cls_docs[lang] = cls_docs.get(lang, 0) + 1
        for t in toks:
            vocab.add(t)
            tok_counts[(lang, t)] = tok_counts.get((lang, t), 0) + 1
            cls_tokens[lang] = cls_tokens.get(lang, 0) + 1
    V = len(vocab)
    n_all = len(docs)
    q = Decimal("1." + "0" * 12)

    def quant(x):
        # Spark's double->decimal cast goes through Double.toString
        # (shortest repr, same as Python repr) then HALF_UP rounding
        return Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)

    logp = {
        (lang, t): quant(
            math.log(
                (tok_counts.get((lang, t), 0) + 1) / (cls_tokens[lang] + V)
            )
        )
        for lang in cls_docs
        for t in vocab
    }
    prior = {
        lang: quant(math.log(cls_docs[lang] / n_all)) for lang in cls_docs
    }

    confusion = {}
    for _, true_lang, toks in docs:
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        best = None
        for lang in cls_docs:
            score = sum(
                (logp[(lang, t)] * n for t, n in counts.items()),
                Decimal(0),
            ) + prior[lang]
            # argmax by (score, lang) struct — ties break to max lang,
            # matching F.max(F.struct(score, model_lang))
            key = (score, lang)
            if best is None or key > best:
                best = key
        pred = best[1]
        confusion[(true_lang, pred)] = confusion.get((true_lang, pred), 0) + 1
    return confusion


def test_naive_bayes_confusion_matches_reference(spark):
    df = plans.get("ml_naive_bayes_classify").build(spark, SF)
    got = {
        (r["lang"], r["pred_lang"]): r["n_docs"] for r in df.collect()
    }
    ref = _ref_nb_confusion()
    assert got == ref
    # sanity: the classifier beats the uniform-prior baseline (1/5
    # classes = 0.2); the sf0.001 fixture achieves diag/total = 0.438
    diag = sum(n for (a, b), n in got.items() if a == b)
    total = sum(got.values())
    assert diag / total > 0.4
