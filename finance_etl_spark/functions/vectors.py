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


def serialize_double_array(c: Column | str, scale: int = 10) -> Column:
    """Canonical cross-engine string form of an array<float|double>
    column: '[v1,...,vn]' with each element double → DECIMAL(20,scale)
    → string. Registered queries must NOT return raw ARRAY/MAP columns
    (the round driver's pandas canonicalizer cannot sort/hash numpy
    arrays — round-6 lesson), and to_json is not format-stable across
    engines (Java emits scientific notation below 1e-3, DuckDB trims
    trailing zeros). DuckDB mirror:
    '[' || array_to_string(list_transform(arr, x -> CAST(CAST(CAST(x
    AS DOUBLE) AS DECIMAL(20,10)) AS VARCHAR)), ',') || ']'
    (the inner double cast matters: DuckDB casts FLOAT→DECIMAL at
    float32 precision otherwise). Byte-identical at sf0.01/0.1."""
    c = F.col(c) if isinstance(c, str) else c
    return F.concat(
        F.lit("["),
        F.concat_ws(
            ",",
            F.transform(
                c,
                lambda x: x.cast("double")
                .cast(f"decimal(20,{scale})")
                .cast("string"),
            ),
        ),
        F.lit("]"),
    )
