"""DDL (X1-X3), parquet sink (D1-D4), and the UDF/UDTF API surfaces."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from finance_etl_spark.io.ddl import build_schema, recreate_tables
from finance_etl_spark.io.sinks import append_new_records
from finance_etl_spark.operators.incremental import with_surrogate_key

FIELDS = {
    "surrogate_key": {"type": "String", "nullable": False},
    "acc_number": {"type": "String"},
    "dt": {"type": "Timestamp", "timezone": True},
    "amount": {"type": "Decimal", "precision": 18, "scale": 2},
    "year": {"type": "Integer"},
}


def test_build_schema_type_mapping():
    st = build_schema(FIELDS)
    assert st["surrogate_key"].dataType.simpleString() == "string"
    assert not st["surrogate_key"].nullable
    assert st["dt"].dataType.simpleString() == "timestamp"
    assert st["amount"].dataType.simpleString() == "decimal(18,2)"
    assert st["year"].dataType.simpleString() == "int"


def test_recreate_tables_roundtrip(spark, tmp_path):
    tables = {"stm": FIELDS, "sec": {"surrogate_key": {"type": "String"}}}
    recreate_tables(spark, "fin_test", tables, str(tmp_path / "wh"))
    assert spark.catalog.tableExists("fin_test.stm")
    got = dict(spark.table("fin_test.stm").dtypes)
    assert got["amount"] == "decimal(18,2)"
    # destructive re-init must succeed on existing tables (X3)
    recreate_tables(spark, "fin_test", tables, str(tmp_path / "wh"))
    assert spark.table("fin_test.sec").count() == 0


def test_parquet_sink_incremental(spark, tmp_path):
    sink = str(tmp_path / "t")
    df = with_surrogate_key(
        spark.createDataFrame([Row(a="x", v=1), Row(a="y", v=2)]), ["a"]
    )
    assert append_new_records(df, sink) == 2
    assert append_new_records(df, sink) == 0  # idempotent re-run
    more = with_surrogate_key(
        spark.createDataFrame([Row(a="y", v=2), Row(a="z", v=3)]), ["a"]
    )
    assert append_new_records(more, sink) == 1  # only 'z' is new
    assert spark.read.parquet(sink).count() == 3


def test_rowwise_udf_agrees_with_builtin(spark, sf_dir):
    from finance_etl_spark.functions.udfs import token_count_rowwise
    from finance_etl_spark.io.readers import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    cmp = d.select(
        token_count_rowwise("text").alias("py"),
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("jvm"),
    )
    assert cmp.filter(F.col("py") != F.col("jvm")).count() == 0


def test_udtf_split_words(spark):
    from pyspark.sql.functions import udtf

    from finance_etl_spark.functions.udfs import SplitWords

    split_words = udtf(SplitWords, returnType="doc_id long, pos int, tok string")
    spark.udtf.register("split_words", split_words)
    out = spark.sql(
        "SELECT * FROM split_words(42L, 'alpha  beta gamma')"
    ).collect()
    assert [(r.pos, r.tok) for r in out] == [(0, "alpha"), (1, "beta"), (2, "gamma")]
    assert all(r.doc_id == 42 for r in out)


def test_transcendentals_match_python_libm(spark):
    import math

    vals = [0.01, 0.5, 1.0, 2.7, 1234.56, 98765.4321]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    rows = df.select(
        "i", F.log("v").alias("ln_v"), F.exp(F.col("v") / 100000).alias("exp_v")
    ).collect()
    for r in rows:
        v = vals[r.i]
        assert r.ln_v == pytest.approx(math.log(v), rel=1e-12)
        assert r.exp_v == pytest.approx(math.exp(v / 100000), rel=1e-12)
