"""Embedded-Derby JDBC adapter tests (reference D1-D4): append, key
scan, and the idempotent incremental contract (re-running inserts
nothing twice)."""

import pyspark.sql.functions as F

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.io.sinks import jdbc_append, jdbc_read, jdbc_scan_keys
from finance_etl_spark.operators.incremental import (
    incremental_new_records,
    with_surrogate_key,
)
from finance_etl_spark.plans.jdbc_queries import DERBY_PROPS, _fresh_db


def test_jdbc_append_and_key_scan(spark, sf_dir):
    url = _fresh_db()
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    keyed = with_surrogate_key(n, ["n_nationkey", "n_name"])
    jdbc_append(keyed, url, "t", DERBY_PROPS)

    keys = jdbc_scan_keys(
        spark, url, "t", key_col='"surrogate_key"', properties=DERBY_PROPS
    )
    assert keys.columns == ["surrogate_key"]
    assert keys.count() == keyed.count()
    assert keys.distinct().count() == keyed.count()


def test_jdbc_incremental_rerun_is_noop(spark, sf_dir):
    url = _fresh_db()
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    keyed = with_surrogate_key(n, ["n_nationkey", "n_name"])
    jdbc_append(keyed, url, "t", DERBY_PROPS)

    existing = jdbc_scan_keys(
        spark, url, "t", key_col='"surrogate_key"', properties=DERBY_PROPS
    )
    new = incremental_new_records(keyed, existing)
    assert new.isEmpty()  # full re-run: nothing new to insert

    back = jdbc_read(spark, url, 'SELECT "n_nationkey" FROM t', DERBY_PROPS)
    assert back.count() == n.count()


def test_jdbc_roundtrip_preserves_values(spark, sf_dir):
    url = _fresh_db()
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    jdbc_append(r, url, "r", DERBY_PROPS)
    back = jdbc_read(
        spark, url, 'SELECT "r_regionkey", "r_name" FROM r', DERBY_PROPS
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, r.collect()))
    # filter pushdown reaches the JDBC scan on the dbtable path
    one = (
        spark.read.format("jdbc")
        .options(url=url, dbtable="r", **DERBY_PROPS)
        .load()
        .filter(F.col("r_regionkey") == 0)
    )
    assert one.count() == 1
