"""Vector math over ArrayType(Float) columns — JVM-side sequential
folds, no Python in the row path.

Determinism contract: dot products and norms are computed as a
sequential left fold in array order of exact double products (each
float32 -> double conversion is exact, each IEEE double op is
deterministic), so results are bit-identical across engines and
partitionings — verified against DuckDB's list_sum/list_transform fold
at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """dot / (||a|| * ||b||) — keep this exact operation order on both
    engines for bit equality."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
