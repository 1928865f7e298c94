"""MERGE INTO semantics (SCD1 upsert-with-delete) as a relational
reduction — the operator table formats (Delta/Iceberg) run under
copy-on-write MERGE, with no table format required.

Contract, per target/source key match state:

- matched,   source.is_delete      -> row dropped
- matched,   not source.is_delete  -> source values win ("updated")
- unmatched source, not is_delete  -> inserted
- unmatched source, is_delete      -> no-op (delete of an absent key)
- unmatched target                 -> survives unchanged ("kept")

One co-partitioned full outer join + a classification projection; both
sides shuffle once on the merge key, nothing is quadratic, and
replaying the same source batch against the merged output is
idempotent (asserted in tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTION_COL = "action"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    value_cols: Sequence[str],
    is_delete: str = "is_delete",
    action_col: str = ACTION_COL,
) -> DataFrame:
    """Apply ``source`` (one row per key, with a boolean ``is_delete``
    channel) onto ``target`` (one row per key). Returns the merged
    snapshot: ``key``, each of ``value_cols`` (source wins on match),
    and ``action_col`` in {'kept','updated','inserted'}."""
    t, s = target.alias("t"), source.alias("s")
    matched = F.col(f"s.{key}").isNotNull()
    pick = lambda col: F.when(matched, F.col(f"s.{col}")).otherwise(  # noqa: E731
        F.col(f"t.{col}")
    )
    return (
        t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
        .filter(
            ~(matched & F.coalesce(F.col(f"s.{is_delete}"), F.lit(False)))
        )
        .select(
            F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key),
            *[pick(c).alias(c) for c in value_cols],
            F.when(~matched, F.lit("kept"))
            .when(F.col(f"t.{key}").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias(action_col),
        )
    )
