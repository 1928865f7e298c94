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


def scan_layout(sf_dir: str, name: str) -> tuple[int, int]:
    """(row_groups, uncompressed_bytes) for a table, from parquet
    footers only — driver-side, metadata-cheap. Row groups are the
    split unit (a 10 GB file with one row group decodes in ONE task no
    matter what maxPartitionBytes says), so this is the table's
    effective maximum scan parallelism."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    paths = [path]
    if os.path.isdir(path):
        paths = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
    groups = bytes_ = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        groups += md.num_row_groups
        for i in range(md.num_row_groups):
            bytes_ += md.row_group(i).total_byte_size
    return groups, bytes_


def load_table_parallel(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    """``load_table`` + adaptive decode-spreading: when the physical
    layout offers fewer row groups than cores (single-file tables,
    badly bucketed upstream writers), insert ONE round-robin
    repartition so CPU-heavy downstream operators (decimal aggs,
    shingling, signatures) use the whole machine instead of the lone
    scan task. The target partition count is sized from the footer's
    uncompressed byte count (~256 KiB per task, capped at cores) —
    over-splitting a small table costs more in task scheduling and
    per-partition cache overhead than the parallelism buys (measured:
    32 partitions LOSES to 8 on a 5 MB corpus). On a properly
    laid-out 100 TB table (row groups >> cores) this is a NO-OP — no
    shuffle is added — so the helper is safe to use unconditionally in
    scan→heavy-compute queries."""
    df = load_table(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    groups, nbytes = scan_layout(sf_dir, name)
    if groups < max(2, cores // 2):
        target = min(cores, max(2, nbytes >> 18))
        if target > groups:
            df = df.repartition(target)
    return df
