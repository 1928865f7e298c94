"""Sessionization: assign gap-based session ids to an event stream.

Classic lag + cumulative-sum formulation: one shuffle on the entity
key, window state O(1) per row — scales linearly. (Structured
Streaming's native ``session_window`` covers the streaming path; this
operator is the batch equivalent and its differential oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "10 minutes",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Add a ``session_id`` column: sessions break when the gap between
    consecutive events of the same ``key`` exceeds ``gap``.

    ``session_id`` is 1-based and contiguous per key, ordered by (ts,
    tiebreak) so the assignment is deterministic under equal timestamps.
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts).over(w)
    # Interval-to-interval comparison: (ts - prev_ts) yields an interval,
    # compared against the gap interval directly. (An epoch-second delta
    # vs CAST(INTERVAL ... AS LONG) would compare seconds against the
    # interval's own unit count — e.g. 10 for '10 minutes'.)
    gap_exceeded = (F.col(ts) - prev_ts) > F.expr(f"INTERVAL {gap}")
    new_session = F.when(prev_ts.isNull() | gap_exceeded, 1).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new_session", new_session).withColumn(
        "session_id", F.sum("__new_session").over(running)
    ).drop("__new_session")
