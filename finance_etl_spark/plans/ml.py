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
_ITERS = 8


def _sq_dist(vec_col, centroid: list[float]):
    """JVM-side squared L2 distance to a literal centroid: unrolled
    per-dimension subtract-square-add so the whole expression stays in
    whole-stage codegen (F.aggregate over zip_with would run the
    lambda interpreted per element)."""
    terms = [
        (vec_col[i].cast("double") - F.lit(float(centroid[i]))) ** 2
        for i in range(len(centroid))
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def kmeans_fit(
    spark: SparkSession, sf_dir: str, k: int = _K, iters: int = _ITERS
) -> tuple[list[list[float]], list[tuple[int, float, int]]]:
    """Lloyd's algorithm, data-parallel: per iteration the k centroids
    broadcast into a codegen'd argmin expression, and the update is one
    groupBy(cluster) producing k·d dimension means + the inertia sum —
    O(k·d) scalars to the driver, nothing row-sized. Init is the first
    k vectors by vec_id (deterministic, no RNG). Returns (centroids,
    [(iteration, inertia, n_moved)])."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = e.persist()
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.orderBy("vec_id").limit(k).collect()
    ]
    prev_assign: DataFrame | None = None
    history: list[tuple[int, float, int]] = []
    for it in range(iters):
        dists = F.array(*[_sq_dist(F.col("embedding"), c) for c in cents])
        assigned = e.select(
            "vec_id",
            "embedding",
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int")
            .alias("cluster"),
            F.array_min(dists).alias("d2"),
        ).persist()
        # update step: one mergeable agg -> k rows x (d means + inertia)
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("d2").alias("inertia"),
                *[
                    F.avg(F.col("embedding")[i].cast("double")).alias(f"m{i}")
                    for i in range(_DIM)
                ],
            )
            .collect()
        )
        inertia = float(sum(r["inertia"] for r in stats))
        if prev_assign is not None:
            n_moved = (
                assigned.select("vec_id", "cluster")
                .join(
                    prev_assign.withColumnRenamed("cluster", "prev"),
                    "vec_id",
                )
                .filter(F.col("cluster") != F.col("prev"))
                .count()
            )
        else:
            n_moved = -1
        history.append((it, inertia, n_moved))
        by_cluster = {r["cluster"]: r for r in stats}
        cents = [
            [float(by_cluster[c][f"m{i}"]) for i in range(_DIM)]
            if c in by_cluster
            else cents[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
        if prev_assign is not None:
            prev_assign.unpersist()
        prev_assign = assigned.select("vec_id", "cluster")
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
    pins non-increasing inertia, convergence (n_moved hits 0 on this
    fixture), and centroid agreement with an identical-init numpy
    Lloyd run. At 100 TB: iters linear scans, k·d scalars back per
    scan — the textbook data-parallel shape."""
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


@register("ml_naive_bayes_classify", tags=("ml", "text", "join"))
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
    matrix (true lang vs predicted) — class-count sized. Rows-only
    (libm log in the model constants); tests/test_round6_ops.py pins
    the full matrix against an independent pure-python NB on the same
    quantization."""
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
