"""Surrogate-key derivation (reference parity).

The reference derives an MD5 surrogate key from a '#'-joined string of
key columns, where pandas ``astype(str)`` renders nulls as the literal
``'nan'`` (reference: utils/data_manager.py:62-63). Spark's
``concat_ws`` *skips* nulls, which would silently merge distinct keys,
so the engine fixes one canonical encoding: every key column is cast to
string and null-coalesced to ``'nan'`` before joining. Hash equality is
the dedup contract, so this encoding is part of the public semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_TOKEN = "nan"
KEY_SEPARATOR = "#"


def null_safe_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(NULL_TOKEN))


def surrogate_key(cols: Sequence[Column | str], sep: str = KEY_SEPARATOR) -> Column:
    """md5(join(sep, null_safe_str(c) for c in cols)) — the reference's key."""
    parts = [null_safe_str(c) for c in cols]
    return F.md5(F.concat_ws(sep, *parts))
