"""Incremental (idempotent) load: keep only source rows whose surrogate
key is not already present in the sink.

This is the reference's exactly-once story (reference:
utils/data_manager.py:172-201 ``get_new_records``): an anti-join of the
freshly-transformed batch against the existing key set. In Spark the
anti-join is a single shuffle on the key (or a broadcast when the
existing-key side is small); an empty existing side passes everything
through, matching the reference's explicit empty-DF branch
(utils/data_manager.py:180-182) without special-casing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_etl_spark.functions.keys import surrogate_key

KEY_COL = "surrogate_key"


def with_surrogate_key(
    df: DataFrame, key_cols: Sequence[str], key_col: str = KEY_COL
) -> DataFrame:
    """Stamp the MD5 surrogate key (reference T1+T2 semantics:
    '#'-joined, nulls encoded as 'nan' — see functions.keys)."""
    return df.withColumn(key_col, surrogate_key(list(key_cols)))


def incremental_new_records(
    source: DataFrame, existing: DataFrame, key_col: str = KEY_COL
) -> DataFrame:
    """Rows of ``source`` whose ``key_col`` is absent from ``existing``.

    Semantics (reference utils/data_manager.py:185-195):
    - empty ``existing``  -> all of ``source`` (pass-through)
    - empty ``source``    -> empty
    - re-running on already-loaded data -> empty (idempotent append)

    ``existing`` only needs the key column; extra columns are pruned
    before the join so the shuffle carries keys only.
    """
    keys = existing.select(key_col)
    return source.join(keys, on=key_col, how="left_anti")
