"""Streaming window semantics, oracle-checked in batch form.

Tumbling / sliding / session windows are registered as BATCH queries
over ``events`` using the exact window functions Structured Streaming
executes (``F.window``, ``F.session_window``) — so the DuckDB oracle
checks the same semantics the streaming engine applies per micro-batch.
The genuinely-streaming paths (watermarks, late data,
dropDuplicatesWithinWatermark, the foreachBatch idempotent sink) run as
real readStream pipelines in tests/test_streaming.py, asserted against
these batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_spark.functions.money import dsum
from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.registry import o_dsum, register


@register(
    "stream_tumbling_window",
    headline=True,
    tags=("streaming", "window", "agg"),
    oracle=f"""
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               COUNT(*) AS n_events,
               {o_dsum('value')} AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation — identical code shape in
    readStream (plus withWatermark); partial aggregation runs map-side
    so the shuffle carries one row per (window, type) per partition."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_sliding_window",
    tags=("streaming", "window", "agg"),
    oracle="""
        WITH slid AS (
            SELECT time_bucket(INTERVAL 30 MINUTE, ts)
                       - k.k * INTERVAL 30 MINUTE AS window_start,
                   user_id, value
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
        )
        SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
               COUNT(*) AS n_events
        FROM slid GROUP BY 1, 2
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour length, 30 minute slide): every event
    belongs to exactly 2 overlapping windows; Spark expands them
    without duplicating the input scan."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


@register(
    "stream_session_window",
    tags=("streaming", "window", "session"),
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-minute gap) aggregation — the same
    operator Structured Streaming runs with state; window end = last
    event + gap, which the lag/cumsum oracle reproduces exactly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
