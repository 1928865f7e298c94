"""SparkSession construction and per-query session hygiene.

The driver may hand us an arbitrary SparkSession; ``configure(spark)``
pins the runtime-settable confs our semantics rely on (UTC session
timezone so timestamp values agree with DuckDB's UTC-naive timestamps,
AQE for runtime re-planning). Everything else is expressed with
explicit ``try_*`` / typed expressions so we do not depend on the
session's ANSI mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to set at runtime on a live session.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events fixture stores ts as parquet TIMESTAMP(NANOS), which
    # Spark rejects outright; with this conf the column surfaces as a
    # LONG of epoch-nanos and io.readers converts it back to timestamp.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Pin runtime confs this engine's semantics rely on. Idempotent."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # read-only in some deployments; queries are written to survive
    _quiet_bounded_window_warning(spark)
    return spark


def _quiet_bounded_window_warning(spark: SparkSession) -> None:
    """Silence WindowExec's "No Partition Defined for Window" warning.

    Every remaining unpartitioned window in this engine runs over a
    BOUNDED aggregate by construction — O(buckets) carry rows in the
    bucket+carry decompositions (plans/stats.py, relational.py), O(days
    | months) calendar spines in the timeseries plans, O(numPartitions)
    offsets in operators/ranks.py — never over row-scale data
    (tests/test_plan_shapes.py pins the row-scale cases to partitioned
    or range-decomposed plans). The blanket warning is therefore noise
    here; scope the logger down rather than suppressing WARN globally.
    """
    try:
        jvm = spark.sparkContext._jvm
        for cls in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowGroupLimitExec",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                cls, jvm.org.apache.logging.log4j.Level.ERROR
            )
    except Exception:
        pass  # cosmetic only; never fail a query over logging config


def get_spark(
    app_name: str = "finance-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a session tuned for the current machine.

    In local mode the shuffle partition count defaults to the core count:
    200 partitions over kilobyte-scale local shuffles is pure overhead,
    while at cluster scale AQE coalescing handles the right-sizing.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
