"""Table readers over the engine's storage layout.

At 100 TB the tables are directories of parquet (optionally
hive-partitioned); ``spark.read.parquet`` gives partition pruning,
predicate pushdown, and column pruning for free. The test corpus is
one parquet file per table under ``{sf_dir}/{name}.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # TIMESTAMP(NANOS) surfaced as epoch-nanos LONG (see
            # session.RUNTIME_CONFS). Integer-divide to micros before the
            # cast — a double division would lose precision above 2^53 ns.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif not isinstance(ts_type, TimestampType):
            # Parquet TIMESTAMP with isAdjustedToUTC=false surfaces as
            # TIMESTAMP_NTZ. The engine stores instants; with the session
            # pinned to UTC the NTZ→TZ cast is value-preserving, and every
            # downstream epoch computation (unix_micros, cast-to-double)
            # requires the instant type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
