"""Time-series operators registered as oracle-checked queries: as-of
join (DuckDB has native ASOF JOIN to check against), range/interval
join, and gap-based sessionization (SQL-expressible via lag + cumsum).

The operators themselves live in finance_etl_spark.operators.joins and
.sessionize; these queries bind them to the events fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.operators.joins import asof_join, range_join
from finance_etl_spark.operators.sessionize import sessionize
from finance_etl_spark.plans.registry import register


def _events(spark, sf_dir, etype: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == etype)
        .select("event_id", "user_id", "ts", "value")
    )


@register(
    "ts_asof_join",
    headline=True,
    tags=("join", "asof"),
    oracle="""
        WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             purchases AS (SELECT user_id, ts, MAX(value) AS value
                           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id, c.ts, p.value AS last_purchase_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the user's latest purchase
    value at-or-before the click. One shuffle on (user_id, ts) via the
    union+window formulation — no quadratic per-key blowup (operators/
    joins.py). Right side pre-reduced per (key, ts) for determinism."""
    clicks = _events(spark, sf_dir, "click").drop("value")
    purchases = (
        _events(spark, sf_dir, "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return out.withColumnRenamed("value", "last_purchase_value")


@register(
    "ts_asof_tolerance",
    tags=("join", "asof"),
    oracle="""
        WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             purchases AS (SELECT user_id, ts, MAX(value) AS value
                           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN p.ts >= c.ts - INTERVAL 1 DAY THEN p.value END AS recent_purchase_value
        FROM clicks c ASOF LEFT JOIN purchases p
          ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def ts_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with staleness tolerance: matches older than 1 day
    are nulled (stale quotes must not price trades)."""
    clicks = _events(spark, sf_dir, "click").drop("value")
    purchases = (
        _events(spark, sf_dir, "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(
        clicks, purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], tolerance="1 day",
    )
    return out.withColumnRenamed("value", "recent_purchase_value")


@register(
    "ts_range_join",
    tags=("join", "range"),
    oracle="""
        SELECT l.event_id, l.user_id, COUNT(*) AS n_recent_clicks
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
        JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') r
          ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
        GROUP BY l.event_id, l.user_id
    """,
)
def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: clicks in the hour leading up to each purchase.
    Equi-key on user_id keeps it a shuffled hash join with a residual
    range predicate — linear in input (operators/joins.py:range_join)."""
    purchases = _events(spark, sf_dir, "purchase").drop("value")
    clicks = (
        _events(spark, sf_dir, "click")
        .select(F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts"))
    )
    joined = range_join(
        purchases,
        clicks.withColumnRenamed("c_user_id", "user_id").withColumnRenamed("c_ts", "ts2"),
        on="user_id",
        left_ts="ts",
        right_ts="ts2",
        lower="1 hour",
        upper="0 seconds",
    )
    return joined.groupBy("event_id", purchases["user_id"]).agg(
        F.count(F.lit(1)).alias("n_recent_clicks")
    )


@register(
    "ts_sessionize",
    tags=("window", "session"),
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    """,
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity breaks a session),
    batch analog of Structured Streaming's session_window."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return sessionize(
        e, key="user_id", ts="ts", gap="30 minutes", order_tiebreak="event_id"
    )


@register(
    "ts_session_stats",
    tags=("window", "session", "agg"),
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, event_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
        FROM sessions GROUP BY user_id, session_id
    """,
)
def ts_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup: event count + wall duration. Composes the
    sessionize operator with a standard hash aggregation."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    s = sessionize(e, key="user_id", ts="ts", gap="30 minutes", order_tiebreak="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_sec"
        ),
    )


def _rollup_oracle() -> str:
    from finance_etl_spark.plans.registry import o_dsum

    def level(grain: str) -> str:
        return f"""
        SELECT '{grain}' AS grain,
               CAST(date_trunc('{grain}', ts) AS TIMESTAMP) AS bucket,
               event_type,
               COUNT(*) AS n_events,
               {o_dsum('value')} AS total_value
        FROM events
        GROUP BY bucket, event_type"""

    return " UNION ALL ".join(level(g) for g in ("minute", "hour", "day"))


@register(
    "ts_hypertable_rollup",
    headline=True,
    tags=("timeseries", "rollup", "agg"),
    oracle=_rollup_oracle(),
)
def ts_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate-style multi-granularity rollup
    (minute/hour/day buckets per event type), the hypertable pattern:
    aggregate ONCE at the finest grain, then derive every coarser grain
    by re-aggregating the minute partials (decimal sums are exactly
    associative, so sum-of-sums == direct sum bit-for-bit). At 100 TB
    the raw events are scanned a single time and the hour/day passes
    run over the (tiny) minute aggregate — vs 3 full scans for the
    naive UNION of three GROUP BYs the oracle runs."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("minute", "ts").alias("bucket"),
        "event_type",
        F.col("value").cast("decimal(30,10)").alias("dv"),
    )
    minute = ev.groupBy("bucket", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("dv").alias("dec_total")
    ).persist()

    def coarsen(df: DataFrame, grain: str) -> DataFrame:
        return df.groupBy(
            F.date_trunc(grain, "bucket").alias("bucket"), "event_type"
        ).agg(
            F.sum("n_events").alias("n_events"), F.sum("dec_total").alias("dec_total")
        )

    hour = coarsen(minute, "hour").persist()
    day = coarsen(hour, "day")

    def present(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("dec_total").cast("double").alias("total_value"),
        )

    return (
        present(minute, "minute")
        .unionByName(present(hour, "hour"))
        .unionByName(present(day, "day"))
    )
