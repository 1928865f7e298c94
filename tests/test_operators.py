"""Operator semantics: as-of ties/tolerance, sessionize gap edges,
incremental anti-join algebra, global row_number."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from finance_etl_spark.operators.incremental import (
    incremental_new_records,
    with_surrogate_key,
)
from finance_etl_spark.operators.joins import asof_join
from finance_etl_spark.operators.ranks import global_row_number
from finance_etl_spark.operators.sessionize import sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_tie_is_inclusive(spark):
    """A right row at exactly left.ts must match (backward inclusive)."""
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 10:00:00"), px=5.0),
            Row(k="a", ts=_ts("2024-01-01 09:00:00"), px=3.0),
        ]
    )
    out = asof_join(left, right, "k", "ts", "ts", ["px"]).collect()
    assert out[0].px == 5.0


def test_asof_no_future_match(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 08:00:00"), lid=1)])
    right = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 09:00:00"), px=3.0)])
    out = asof_join(left, right, "k", "ts", "ts", ["px"]).collect()
    assert out[0].px is None


def test_asof_key_isolation(spark):
    """Rows must never match across join keys."""
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 10:00:00"), lid=1)])
    right = spark.createDataFrame([Row(k="b", ts=_ts("2024-01-01 09:00:00"), px=3.0)])
    out = asof_join(left, right, "k", "ts", "ts", ["px"]).collect()
    assert out[0].px is None


def test_asof_tolerance_nulls_stale_match(spark):
    left = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-10 00:00:00"), lid=1)])
    right = spark.createDataFrame([Row(k="a", ts=_ts("2024-01-01 00:00:00"), px=3.0)])
    ok = asof_join(left, right, "k", "ts", "ts", ["px"], tolerance="30 days").collect()
    stale = asof_join(left, right, "k", "ts", "ts", ["px"], tolerance="2 days").collect()
    assert ok[0].px == 3.0 and stale[0].px is None


def test_sessionize_gap_units(spark):
    """Regression for the interval-unit bug: a 5-minute gap with
    gap='10 minutes' must NOT break the session (10 'minutes' must not
    be read as 10 seconds)."""
    rows = [
        Row(u="a", ts=_ts("2024-01-01 10:00:00"), i=1),
        Row(u="a", ts=_ts("2024-01-01 10:05:00"), i=2),  # 5 min -> same session
        Row(u="a", ts=_ts("2024-01-01 10:16:00"), i=3),  # 11 min -> new session
    ]
    out = (
        sessionize(spark.createDataFrame(rows), "u", "ts", "10 minutes", "i")
        .orderBy("i")
        .collect()
    )
    assert [r.session_id for r in out] == [1, 1, 2]


def test_sessionize_gap_exactly_equal_keeps_session(spark):
    """Gap == threshold stays in-session (strictly-greater breaks)."""
    rows = [
        Row(u="a", ts=_ts("2024-01-01 10:00:00"), i=1),
        Row(u="a", ts=_ts("2024-01-01 10:10:00"), i=2),
    ]
    out = (
        sessionize(spark.createDataFrame(rows), "u", "ts", "10 minutes", "i")
        .orderBy("i")
        .collect()
    )
    assert [r.session_id for r in out] == [1, 1]


def test_incremental_antijoin_algebra(spark):
    """new ∩ existing = ∅ ; empty existing -> pass-through ; re-run
    against (existing ∪ new) -> empty (idempotency)."""
    src = spark.createDataFrame([Row(a=str(i), b=i % 3) for i in range(20)])
    src = with_surrogate_key(src, ["a", "b"])
    empty = src.filter(F.lit(False)).select("surrogate_key")

    all_new = incremental_new_records(src, empty)
    assert all_new.count() == 20

    existing = src.limit(7).select("surrogate_key")
    new = incremental_new_records(src, existing)
    assert new.count() == 13
    assert (
        new.join(existing, "surrogate_key", "inner").count() == 0
    )

    rerun = incremental_new_records(src, src.select("surrogate_key"))
    assert rerun.count() == 0


def test_global_row_number_matches_window(spark, sf_dir):
    from finance_etl_spark.io.readers import load_table
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    got = global_row_number(o, order, out_col="rn", num_partitions=7)
    ref = o.withColumn("rn", F.row_number().over(Window.orderBy(*order)).cast("long"))
    assert got.join(ref, ["o_orderkey"], "inner").filter(
        got["rn"] != ref["rn"]
    ).count() == 0
    assert got.count() == ref.count()


def test_salted_join_equals_plain_join(spark):
    """salted_join must be row-identical to the plain inner join, hot
    keys included, for any n_salts."""
    from finance_etl_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1), (3, 7)], "k int, v int"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "a"), (4, "absent")], "k int, name string")
    got = salted_join(fact, dim, key="k", n_salts=8)
    want = fact.join(dim, "k")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
