"""Classical-ML training loops as distributed queries: Lloyd's
k-means, multinomial naive Bayes (train + classify), and closed-form
OLS via the normal equations — the supervised/unsupervised modeling
layer a training-data pipeline runs AFTER curation (cluster-balanced
sampling, heuristic labeling, drift regressions).

Scale contracts shared by the module:
- Every iteration / pass is ONE linear scan of the fact table reducing
  to O(k·d) (k-means), O(|vocab|·|classes|) (NB), or O(d²) (OLS)
  sufficient statistics via ordinary mergeable column aggregates —
  map-side partials, no collect of row-level data, no quadratic join.
- Model state (centroids, log-prob table, coefficient vector) moves
  executor-ward by broadcast, never the reverse.
- Determinism: initializations are fixed functions of the data (no
  RNG), float reductions route through DECIMAL where a comparison
  (argmin/argmax) depends on them, so results are partition-layout
  independent (the repo-wide relayout-stability contract).

Reference scope: the reference ETL (ibqp/finance-etl transform.py)
has no modeling surface; these are capability-expansion operators
(SURVEY.md §2 round-6 table).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.registry import register

_DIM = 64  # embeddings.embedding is ArrayType(float), 64-dim
_K = 8
_ITERS = 16  # sf0.001 fixture converges (n_moved==0) at iteration 12


_KM_STATS_SCHEMA = (
    "cluster int, n long, inertia double, n_moved long, "
    + ", ".join(f"s{i} double" for i in range(_DIM))
)


def _km_partial_stats(cents, prev_cents):
    """Arrow-batched per-partition sufficient statistics for one Lloyd
    iteration: each batch reduces to ≤k rows of (cluster, n, Σd², moved
    count, Σ per-dimension) via vectorized numpy — a hand-rolled
    map-side combine, so the shuffle is k·partitions rows regardless of
    corpus size. n_moved rides in the SAME pass by re-deriving the
    previous argmin from the previous centroids (argmin is a
    deterministic function of (vector, centroids), so this equals the
    stored assignment — no per-iteration persist or vec_id self-join).
    A fully unrolled JVM expression was tried first and measured ~12 s
    PER ITERATION at sf0.01: Catalyst re-optimizes the ~3000-node
    distance tree every iteration because the centroid literals change;
    the numpy kernel runs the same math in milliseconds."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)
    P = np.asarray(prev_cents, dtype=np.float64) if prev_cents else None

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            best = d2[np.arange(len(X)), a]
            if P is None:
                moved = np.zeros(len(X), dtype=bool)
            else:
                pa = ((X[:, None, :] - P[None, :, :]) ** 2).sum(
                    axis=2
                ).argmin(axis=1)
                moved = pa != a
            rows = []
            for c in np.unique(a):
                m = a == c
                rows.append(
                    [int(c), int(m.sum()), float(best[m].sum()),
                     int(moved[m].sum())]
                    + [float(v) for v in X[m].sum(axis=0)]
                )
            yield pd.DataFrame(
                rows,
                columns=["cluster", "n", "inertia", "n_moved"]
                + [f"s{i}" for i in range(C.shape[1])],
            )

    return gen


def kmeans_fit(
    spark: SparkSession, sf_dir: str, k: int = _K, iters: int = _ITERS
) -> tuple[list[list[float]], list[tuple[int, float, int]]]:
    """Lloyd's algorithm, data-parallel: per iteration ONE linear scan
    (mapInPandas partial stats, see _km_partial_stats) reduces the
    corpus to ≤ k·partitions rows, a k-row final agg sums them, and the
    driver sees O(k·d) scalars — nothing row-sized, no RNG (init = the
    first k vectors by vec_id). Returns (centroids,
    [(iteration, inertia, n_moved)])."""
    raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    # size the cached layout to the data: ~20k vectors per task keeps
    # per-iteration task overhead flat on small fixtures while scaling
    # to defaultParallelism (and beyond via more executors) on big ones
    n_vecs = raw.count()
    n_parts = max(
        1, min(spark.sparkContext.defaultParallelism, n_vecs // 20000 + 1)
    )
    e = raw.repartition(n_parts).persist()
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.orderBy("vec_id").limit(k).collect()
    ]
    emb = e.select("embedding")
    prev_cents: list[list[float]] | None = None
    history: list[tuple[int, float, int]] = []
    for it in range(iters):
        # the partials are already model-sized (≤ k·partitions rows of
        # 68 scalars), so the final merge runs driver-side — one
        # single-stage job per iteration, no shuffle. At extreme
        # partition counts (>~10k) a groupBy("cluster") tree-merge in
        # front of the collect bounds driver traffic at k rows.
        partials = emb.mapInPandas(
            _km_partial_stats(cents, prev_cents), _KM_STATS_SCHEMA
        ).collect()
        merged: dict[int, list[float]] = {}
        for r in partials:
            acc = merged.setdefault(
                r["cluster"], [0.0] * (3 + _DIM)
            )
            acc[0] += r["n"]
            acc[1] += r["inertia"]
            acc[2] += r["n_moved"]
            for i in range(_DIM):
                acc[3 + i] += r[f"s{i}"]
        inertia = float(sum(a[1] for a in merged.values()))
        n_moved = (
            int(sum(a[2] for a in merged.values()))
            if prev_cents is not None
            else -1
        )
        history.append((it, inertia, n_moved))
        prev_cents = cents
        cents = [
            [merged[c][3 + i] / merged[c][0] for i in range(_DIM)]
            if c in merged
            else cents[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
        if n_moved == 0:
            break
    e.unpersist()
    return cents, history


@register("ml_kmeans_lloyd", tags=("ml", "vector", "iterative"))
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd): returns the iteration history
    (iteration, inertia, n_moved). Rows-only for the driver (float
    means ride through averages whose exact values are compared by a
    pure-python reference pytest instead): tests/test_round6_ops.py
    pins non-increasing inertia, convergence (n_moved hits 0 at
    iteration 12 on the sf0.001 fixture, within _ITERS=16), and
    centroid agreement with an identical-init numpy Lloyd run. At
    100 TB: iters linear scans, k·d scalars back per scan — the
    textbook data-parallel shape; n_moved rides in the SAME scan by
    re-deriving the previous argmin from the previous centroids."""
    _, history = kmeans_fit(spark, sf_dir)
    return spark.createDataFrame(
        history, "iteration int, inertia double, n_moved int"
    )


# ---------------------------------------------------------------------------
# Multinomial naive Bayes over documents (class = lang)

_NB_PROBES = ("table", "row", "value", "spark", "query")
_SPACE = " "


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), _SPACE), lambda t: t != "")
        ).alias("tok"),
    )


_NB_TOKENS_SQL = """
        SELECT doc_id, lang, unnest(list_filter(
                   string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
"""


@register(
    "ml_naive_bayes_train",
    tags=("ml", "text", "agg"),
    oracle=f"""
        WITH toks AS ({_NB_TOKENS_SQL}),
        cls AS (
            SELECT lang,
                   COUNT(DISTINCT doc_id) AS n_docs,
                   COUNT(*) AS n_tokens
            FROM toks GROUP BY lang
        ),
        vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
        probe AS (
            SELECT lang, tok, COUNT(*) AS tok_count
            FROM toks
            WHERE tok IN {tuple(_NB_PROBES)}
            GROUP BY lang, tok
        )
        SELECT c.lang,
               CAST(c.n_docs AS BIGINT) AS n_docs,
               CAST(c.n_tokens AS BIGINT) AS n_tokens,
               p.tok,
               CAST(COALESCE(pr.tok_count, 0) AS BIGINT) AS tok_count,
               CAST(COALESCE(pr.tok_count, 0) + 1 AS DOUBLE)
                   / CAST(c.n_tokens + v AS DOUBLE) AS p_smoothed
        FROM cls c
        CROSS JOIN (SELECT UNNEST({list(_NB_PROBES)}) AS tok) p
        CROSS JOIN vocab
        LEFT JOIN probe pr ON pr.lang = c.lang AND pr.tok = p.tok
    """,
)
def ml_naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes training as pure aggregation: per-class
    doc/token totals, the corpus vocabulary size, and Laplace-smoothed
    conditionals p(tok|class) = (count+1)/(class_tokens+V) for a fixed
    probe-token set — every input an exact integer count, one double
    division at the edge (oracle-checkable, engine-exact). The full
    conditional table this classifier uses at inference time is the
    same aggregate without the probe filter: vocab x classes rows,
    i.e. model size ∝ vocabulary, never corpus. One token-key shuffle
    + one class-key shuffle at any scale."""
    toks = _doc_tokens(spark, sf_dir).persist()
    cls = toks.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    vocab = toks.agg(F.countDistinct("tok").alias("v"))
    probe_counts = (
        toks.filter(F.col("tok").isin(*_NB_PROBES))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("tok_count"))
    )
    probes = spark.createDataFrame([(t,) for t in _NB_PROBES], "tok string")
    return (
        cls.crossJoin(F.broadcast(probes))
        .crossJoin(F.broadcast(vocab))
        .join(probe_counts, ["lang", "tok"], "left")
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "tok",
            F.coalesce(F.col("tok_count"), F.lit(0))
            .cast("bigint")
            .alias("tok_count"),
            (
                (F.coalesce(F.col("tok_count"), F.lit(0)) + F.lit(1)).cast(
                    "double"
                )
                / (F.col("n_tokens") + F.col("v")).cast("double")
            ).alias("p_smoothed"),
        )
    )


@register(
    "ml_naive_bayes_classify",
    tags=("ml", "text", "join"),
    oracle=f"""
        WITH toks AS MATERIALIZED ({_NB_TOKENS_SQL}),
        cls AS MATERIALIZED (
            SELECT lang,
                   COUNT(DISTINCT doc_id) AS n_docs,
                   COUNT(*) AS n_tokens
            FROM toks GROUP BY lang
        ),
        tot AS (
            SELECT COUNT(DISTINCT tok) AS v,
                   COUNT(DISTINCT doc_id) AS n_all_docs
            FROM toks
        ),
        counts AS (
            SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok
        ),
        model AS MATERIALIZED (
            SELECT v.tok, c.lang AS model_lang,
                   CAST(ln(CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                           / CAST(c.n_tokens + t.v AS DOUBLE))
                        AS DECIMAL(20,12)) AS logp
            FROM (SELECT DISTINCT tok FROM toks) v
            CROSS JOIN cls c CROSS JOIN tot t
            LEFT JOIN counts ct ON ct.lang = c.lang AND ct.tok = v.tok
        ),
        prior AS (
            SELECT lang AS model_lang,
                   CAST(ln(CAST(n_docs AS DOUBLE)
                           / CAST(t.n_all_docs AS DOUBLE))
                        AS DECIMAL(20,12)) AS log_prior
            FROM cls CROSS JOIN tot t
        ),
        doc_tok AS (
            SELECT doc_id, lang, tok, COUNT(*) AS n
            FROM toks GROUP BY doc_id, lang, tok
        ),
        scored AS (
            SELECT dt.doc_id, dt.lang, m.model_lang,
                   SUM(dt.n * m.logp) + ANY_VALUE(p.log_prior) AS score
            FROM doc_tok dt
            JOIN model m ON m.tok = dt.tok
            JOIN prior p ON p.model_lang = m.model_lang
            GROUP BY dt.doc_id, dt.lang, m.model_lang
        ),
        best AS (
            SELECT doc_id, lang, model_lang,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, model_lang DESC) AS rn
            FROM scored
        )
        SELECT lang, model_lang AS pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM best WHERE rn = 1
        GROUP BY lang, model_lang
        ORDER BY lang, pred_lang
    """,
)
def ml_naive_bayes_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes inference at corpus scale, relayout-stable: the
    class-conditional log-probability table (vocab x classes — model-
    sized) is QUANTIZED to DECIMAL(20,12) once, so per-doc scores are
    exact decimal sums — bit-identical under any partitioning (a raw
    double Σ count·logp would be addition-order dependent and could
    flip argmax on near-ties). Scoring = doc-token counts ⋈ the
    (auto-broadcast at the fixture scale; token-key shuffle at web
    scale) model table, then a doc-key agg and a 5-way argmax via
    array_max over (score, lang) structs. Output is the confusion
    matrix (true lang vs predicted) — class-count sized. Hash-oracled
    (promoted from rows-only in r7): libm ln differs cross-engine at
    1 ulp (~1e-15), which perturbs scores by ≤ n_tok·1e-12 after the
    DECIMAL(20,12) quantization, while the smallest top-2 winning
    margin is 3.4e-4 at sf0.01 (measured) — six orders of magnitude
    of headroom, so the integer matrix is engine- and build-stable.
    tests/test_round6_ops.py additionally pins the full matrix
    against an independent pure-python NB on the same quantization."""
    toks = _doc_tokens(spark, sf_dir).persist()
    cls = toks.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    tot = toks.agg(
        F.countDistinct("tok").alias("v"),
        F.countDistinct("doc_id").alias("n_all_docs"),
    )
    # model: vocab x classes smoothed log-conditionals, decimal-quantized
    counts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    langs = cls.select("lang", "n_tokens", "n_docs")
    vocab = toks.select("tok").distinct()
    model = (
        vocab.crossJoin(F.broadcast(langs))
        .join(counts, ["lang", "tok"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.col("lang").alias("model_lang"),
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("n_tokens") + F.col("v")).cast("double")
            )
            .cast("decimal(20,12)")
            .alias("logp"),
        )
    )
    prior = (
        cls.crossJoin(F.broadcast(tot))
        .select(
            F.col("lang").alias("model_lang"),
            F.log(
                F.col("n_docs").cast("double")
                / F.col("n_all_docs").cast("double")
            )
            .cast("decimal(20,12)")
            .alias("log_prior"),
        )
    )
    doc_tok = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        doc_tok.join(model, "tok")
        .groupBy("doc_id", "lang", "model_lang")
        .agg(F.sum(F.col("n") * F.col("logp")).alias("tok_score"))
        .join(F.broadcast(prior), "model_lang")
        .select(
            "doc_id",
            "lang",
            "model_lang",
            (F.col("tok_score") + F.col("log_prior")).alias("score"),
        )
    )
    best = scored.groupBy("doc_id", "lang").agg(
        F.max(F.struct(F.col("score"), F.col("model_lang"))).alias("b")
    )
    return (
        best.select("lang", F.col("b.model_lang").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Closed-form OLS (normal equations, Cramer's rule)

_OLS_SUMS_SQL = """
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s1,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s2,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))
                           * CAST(l_quantity AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s11,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))
                           * CAST(l_discount AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s12,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(20,2))
                           * CAST(l_discount AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s22,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))
                           * CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s1y,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(20,2))
                           * CAST(l_extendedprice AS DECIMAL(20,2))) AS VARCHAR) AS DOUBLE) AS s2y
        FROM lineitem
"""


@register(
    "ml_ols_normal_equations",
    tags=("ml", "agg"),
    headline=True,  # tracks the ml family's cost in BENCH_r{N}
    oracle=f"""
        WITH s AS ({_OLS_SUMS_SQL})
        SELECT CAST(n AS BIGINT) AS n,
               ((s11*s22 - s12*s12)*sy + (s2*s12 - s1*s22)*s1y
                  + (s1*s12 - s2*s11)*s2y)
               / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s2*s12)
                  + s2*(s1*s12 - s2*s11)) AS beta0,
               ((s2*s12 - s1*s22)*sy + (n*s22 - s2*s2)*s1y
                  + (s1*s2 - n*s12)*s2y)
               / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s2*s12)
                  + s2*(s1*s12 - s2*s11)) AS beta1,
               ((s1*s12 - s2*s11)*sy + (s1*s2 - n*s12)*s1y
                  + (n*s11 - s1*s1)*s2y)
               / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s2*s12)
                  + s2*(s1*s12 - s2*s11)) AS beta2
        FROM s
    """,
)
def ml_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS (price ~ quantity + discount) solved in closed
    form: ONE scan reduces lineitem to the 9 sufficient statistics
    (n, Σx, Σxxᵀ, Σxy — all exact DECIMAL sums, so the fit is
    partition-order independent), then the 3x3 normal equations solve
    by Cramer's rule as a single scalar expression over the adjugate —
    identical IEEE arithmetic on both engines from identical sums,
    hence oracle-checkable, unlike an iterative solver. d features
    → d² sums: the driver never sees row data at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("decimal(20,2)")
    x2 = F.col("l_discount").cast("decimal(20,2)")
    y = F.col("l_extendedprice").cast("decimal(20,2)")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        F.sum(x1 * x2).cast("double").alias("s12"),
        F.sum(x2 * x2).cast("double").alias("s22"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * y).cast("double").alias("s1y"),
        F.sum(x2 * y).cast("double").alias("s2y"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s2 * s12)
        + s2 * (s1 * s12 - s2 * s11)
    )
    beta0 = (
        (s11 * s22 - s12 * s12) * sy
        + (s2 * s12 - s1 * s22) * s1y
        + (s1 * s12 - s2 * s11) * s2y
    ) / det
    beta1 = (
        (s2 * s12 - s1 * s22) * sy
        + (n * s22 - s2 * s2) * s1y
        + (s1 * s2 - n * s12) * s2y
    ) / det
    beta2 = (
        (s1 * s12 - s2 * s11) * sy
        + (s1 * s2 - n * s12) * s1y
        + (n * s11 - s1 * s1) * s2y
    ) / det
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        beta0.alias("beta0"),
        beta1.alias("beta1"),
        beta2.alias("beta2"),
    )
