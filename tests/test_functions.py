"""Unit tests for the scalar-function layer: surrogate keys (null
encoding), strftime translation, decimal money aggregation."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from finance_etl_spark.functions.datetime import strftime_to_java
from finance_etl_spark.functions.keys import surrogate_key
from finance_etl_spark.functions.money import dsum


def test_surrogate_key_null_encodes_as_nan(spark):
    """Nulls in key columns must hash as the literal 'nan' — pandas
    astype(str) parity (reference utils/data_manager.py:62)."""
    df = spark.createDataFrame(
        [Row(a="x", b=None, c=1), Row(a=None, b="y", c=None)]
    )
    out = df.select(surrogate_key(["a", "b", "c"]).alias("k")).collect()
    exp0 = hashlib.md5(b"x#nan#1").hexdigest()
    exp1 = hashlib.md5(b"nan#y#nan").hexdigest()
    assert [r.k for r in out] == [exp0, exp1]


def test_surrogate_key_distinguishes_null_positions(spark):
    df = spark.createDataFrame([Row(a="x", b=None), Row(a=None, b="x")])
    out = {r.k for r in df.select(surrogate_key(["a", "b"]).alias("k")).collect()}
    assert len(out) == 2


@pytest.mark.parametrize(
    "py,java",
    [
        ("%d.%m.%Y", "dd.MM.yyyy"),
        ("%Y-%m-%d", "yyyy-MM-dd"),
        ("%Y/%m/%d %H:%M:%S", "yyyy/MM/dd HH:mm:ss"),
        ("%d %b %Y", "dd MMM yyyy"),
        ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss"),
    ],
)
def test_strftime_translation(py, java):
    assert strftime_to_java(py) == java


def test_strftime_rejects_unknown_directive():
    with pytest.raises(ValueError):
        strftime_to_java("%Q")


def test_strftime_roundtrip_parses(spark):
    fmt = strftime_to_java("%d.%m.%Y")
    out = spark.createDataFrame([Row(s="03.01.2025")]).select(
        F.to_timestamp("s", fmt).alias("t")
    ).collect()
    assert str(out[0].t) == "2025-01-03 00:00:00"


def test_dsum_order_and_partition_independent(spark):
    """The decimal-sum recipe must produce identical bits regardless of
    row order or partitioning (the 1000-executor reproducibility
    contract)."""
    vals = [((-1) ** i) * (1.1 ** (i % 50)) * 0.37 for i in range(2000)]
    a = spark.createDataFrame([(v,) for v in vals], "v double").repartition(1)
    b = spark.createDataFrame([(v,) for v in reversed(vals)], "v double").repartition(13)
    ra = a.agg(dsum("v").alias("s")).collect()[0].s
    rb = b.agg(dsum("v").alias("s")).collect()[0].s
    assert ra == rb  # exact bit equality, not approx
