"""Config-driven DDL (reference X1-X3: db_init.py:45-96) on the Spark
catalog.

The reference builds SQLAlchemy models dynamically from a YAML type
config and does CREATE SCHEMA / drop_all / create_all against
Postgres. Here the same 5-type vocabulary (db_init.py:20-43) maps to
Spark SQL types and the tables are catalog tables backed by parquet —
partition-friendly, queryable by name, droppable/recreatable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DataType,
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# reference db_init.py:20-26 TYPE_MAPPING + :28-43 get_sql_type params
def config_type_to_spark(field_cfg: dict) -> DataType:
    t = field_cfg["type"]
    if t == "Integer":
        return IntegerType()
    if t == "String":
        return StringType()  # length enforced only at JDBC DDL time
    if t == "Date":
        return DateType()
    if t == "Decimal":
        return DecimalType(
            int(field_cfg.get("precision", 10)), int(field_cfg.get("scale", 2))
        )
    if t == "Timestamp":
        return (
            TimestampType() if field_cfg.get("timezone") else TimestampNTZType()
        )
    raise ValueError(f"unknown config type {t!r}")


def build_schema(fields_cfg: dict[str, dict]) -> StructType:
    """Config fields -> StructType (reference TableModelBuilder,
    db_init.py:45-58; nullable flag per db_init.py:52-56)."""
    return StructType(
        [
            StructField(
                name,
                config_type_to_spark(cfg),
                bool(cfg.get("nullable", True)),
            )
            for name, cfg in fields_cfg.items()
        ]
    )


def _ddl_cols(schema: StructType) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )


def create_schema(spark: SparkSession, name: str) -> None:
    """X1: CREATE SCHEMA if absent (reference db_init.py:72-81)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def recreate_tables(
    spark: SparkSession,
    schema_name: str,
    tables: dict[str, dict],
    location_root: str | None = None,
) -> None:
    """X2+X3: destructive drop + create from config (reference
    db_init.py:84-96). ``tables`` maps table_name -> fields config."""
    create_schema(spark, schema_name)
    for table_name, fields_cfg in tables.items():
        st = build_schema(fields_cfg)
        fq = f"{schema_name}.{table_name}"
        spark.sql(f"DROP TABLE IF EXISTS {fq}")
        loc = (
            f" LOCATION '{location_root}/{table_name}'" if location_root else ""
        )
        spark.sql(f"CREATE TABLE {fq} ({_ddl_cols(st)}) USING parquet{loc}")
