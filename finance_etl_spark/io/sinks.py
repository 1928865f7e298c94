"""Load-side operators (reference D1-D4, utils/db_manager.py:53-91),
generalized over two backends:

- parquet/catalog tables (the engine's own storage; testable here)
- JDBC (the reference's Postgres path; same call shape, requires a
  driver jar on the classpath — adapters below, exercised only where
  a driver is present)

The incremental contract (key scan -> anti-join -> append-if-nonempty)
is identical across backends; only the physical reader/writer differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from finance_etl_spark.operators.incremental import incremental_new_records


# --- parquet-backed (engine-native) -----------------------------------------

def read_existing_keys(
    spark: SparkSession, path: str, key_col: str = "surrogate_key"
) -> DataFrame | None:
    """D1: key scan with projection pushdown — only the key column is
    read from the sink (column pruning reaches the parquet reader).
    Returns None when the sink does not exist yet."""
    try:
        return spark.read.parquet(path).select(key_col)
    except Exception:
        return None


def append_new_records(
    source: DataFrame, path: str, key_col: str = "surrogate_key"
) -> int:
    """D3+D4+J1: anti-join against existing keys, append only new rows,
    skip the write when nothing is new. Returns rows written."""
    existing = read_existing_keys(source.sparkSession, path, key_col)
    new = source if existing is None else incremental_new_records(
        source, existing, key_col
    )
    new = new.cache()
    try:
        n = new.count()
        if n:  # D4: conditional load
            new.write.mode("append").parquet(path)
        return n
    finally:
        new.unpersist()


# --- JDBC (reference parity; needs a driver jar) ----------------------------

def jdbc_read(
    spark: SparkSession, url: str, query: str, properties: dict | None = None
) -> DataFrame:
    """D2: generic JDBC select (reference _select_data,
    utils/db_manager.py:75-83). Catalyst pushes projections/filters
    into the remote query where the dialect allows."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "query", query
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_scan_keys(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str = "surrogate_key",
    properties: dict | None = None,
) -> DataFrame:
    """D1: existing-key scan — the projection is pushed into the remote
    SQL, so only key bytes cross the wire (the reference does this by
    hand at utils/db_manager.py:56-57)."""
    return jdbc_read(
        spark, url, f"SELECT {key_col} FROM {table}", properties
    )


def jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict | None = None
) -> None:
    """D3: batched parallel append (one JDBC connection per partition —
    versus the reference's single-connection row loop via to_sql,
    utils/db_manager.py:85-91)."""
    writer = df.write.format("jdbc").option("url", url).option(
        "dbtable", table
    ).mode("append")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
