"""Distributed PCA over an ArrayType(Float) embedding column.

The scale-correct pattern for dense linear algebra on 100 TB:

1. **Partition-partial sufficient statistics.** One `mapInPandas` pass
   emits, per partition, the triple (n, sum vector, Gram matrix) —
   communication is O(partitions x d^2), never O(rows).
2. **Distributed combine.** The per-partition partials are element-wise
   summed with posexplode + groupBy(pos) — still Spark, so the driver
   never sees more than d^2 + d + 1 numbers regardless of partition
   count.
3. **Driver eigendecomposition.** The covariance matrix is d x d
   (64 x 64 here) — microseconds in numpy, and the only step that is
   inherently serial. Eigenvector signs are fixed deterministically
   (largest-|component| entry made positive) so output is stable
   across runs and partitionings.
4. **Broadcast projection.** The d x k component matrix ships to every
   task inside a vectorized pandas UDF closure; the projection itself
   is a map-side matmul — zero shuffle, embarrassingly parallel.

This mirrors how the reference sizes its only "wide" computation —
whole-frame pandas ops on the driver (/root/reference/utils/
data_manager.py:96-112) — but keeps the O(rows) part distributed and
sends only the O(d^2) reduction through the narrow waist.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("g", T.ArrayType(T.DoubleType())),
    ]
)


def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One (n, sum, gram) row per partition, accumulated across Arrow
    batches so driver traffic is bounded by partition count."""
    n = 0
    s = None
    g = None
    for pdf in it:
        if pdf.empty:
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        n += x.shape[0]
        s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
        g = x.T @ x if g is None else g + x.T @ x
    if n:
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
        )


def fit_pca(embeddings: DataFrame, k: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (mean[d], components[d,k], eigenvalues[k]) for the top-k
    principal axes of `embeddings.embedding`. Distributed through the
    covariance reduction; only the d x d eigensolve runs on the driver."""
    parts = embeddings.select("embedding").mapInPandas(
        _partials, schema=_PARTIAL_SCHEMA
    )
    # element-wise combine stays in Spark: d^2 + d rows to the driver,
    # independent of how many partitions produced partials
    summed = (
        parts.select(
            "n", F.posexplode(F.concat(F.col("s"), F.col("g")))
        )
        .groupBy("pos")
        .agg(F.sum("col").alias("v"), F.sum("n").alias("n_dup"))
        .collect()
    )
    if not summed:
        raise ValueError("empty embeddings input")
    by_pos = {r["pos"]: r["v"] for r in summed}
    d = int(round((np.sqrt(4 * len(by_pos) + 1) - 1) / 2))  # d + d^2 = len
    # every pos group holds one row per partition-partial, so the
    # summed n at any pos is the total row count — no second scan
    n_total = int(summed[0]["n_dup"])
    s = np.array([by_pos[i] for i in range(d)])
    g = np.array([by_pos[d + i] for i in range(d * d)]).reshape(d, d)
    mean = s / n_total
    cov = (g - n_total * np.outer(mean, mean)) / max(n_total - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    w = evecs[:, order]
    # deterministic sign: make the largest-|component| entry positive
    for j in range(w.shape[1]):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    return mean, w, evals[order]


def project(embeddings: DataFrame, mean: np.ndarray, w: np.ndarray) -> DataFrame:
    """Map-side projection onto the fitted axes: (X - mean) @ W.
    The (d x k) matrix rides inside the UDF closure (broadcast with the
    task binary) — zero shuffle."""
    mean_c = mean.copy()
    w_c = w.copy()

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(col: pd.Series) -> pd.Series:
        x = np.stack(col.to_numpy()).astype(np.float64)
        out = (x - mean_c) @ w_c
        return pd.Series(list(out))

    return embeddings.withColumn("pc", _proj(F.col("embedding")))
