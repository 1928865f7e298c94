"""Skew mitigation: salted two-stage aggregation.

A groupBy on a low-cardinality / hot-keyed column funnels each key's
entire data through one reducer. Salting splits every key into
``n_salts`` sub-keys for a partial aggregate, then merges the partials
— the heavy shuffle carries pre-aggregated rows and no reducer sees
more than 1/n_salts of a hot key. Only valid for re-aggregatable
functions (sum/count/min/max — avg must be decomposed by the caller
into sum+count).

AQE's skew-join handling covers joins; this operator covers the
aggregation side, where AQE cannot split a single group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``partial_aggs`` run per (keys, salt),
    ``merge_aggs`` combine the partials per keys.

    The salt is a deterministic-per-row-content hash is NOT required —
    distribution is what matters — but a content hash (over all
    columns) keeps the operator deterministic for differential
    testing, unlike rand().
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts))
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: every fact row gets a deterministic salt in
    [0, n_salts); the (small) dim side is replicated once per salt via
    an explode of ``sequence(0, n_salts-1)``. The shuffle key becomes
    (key, salt), so a hot join key spreads over ``n_salts`` reducers
    instead of melting one. Dim-side cost is |dim| × n_salts rows —
    use for moderate dims too big to broadcast outright but far
    smaller than the fact side; result is identical to a plain inner
    join on ``key``.

    The salt hashes the full fact row (not rand()), keeping the
    operator deterministic under retries and differential testing.
    """
    salt = F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    salted_fact = fact.withColumn(_SALT, salt)
    salted_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, on=[key, _SALT], how="inner").drop(_SALT)
