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


def _merge_fixture(spark):
    target = spark.createDataFrame(
        [(1, "t1"), (2, "t2"), (3, "t3")], "k int, v string"
    )
    source = spark.createDataFrame(
        [(2, "s2", False),   # matched update
         (3, None, True),    # matched delete
         (4, "s4", False),   # insert
         (5, None, True)],   # delete of absent key -> no-op
        "k int, v string, is_delete boolean",
    )
    return target, source


def test_merge_upsert_all_branches(spark):
    from finance_etl_spark.operators.merge import merge_upsert

    target, source = _merge_fixture(spark)
    got = {
        r["k"]: (r["v"], r["action"])
        for r in merge_upsert(target, source, "k", ["v"]).collect()
    }
    assert got == {
        1: ("t1", "kept"),       # unmatched target survives
        2: ("s2", "updated"),    # source value wins
        4: ("s4", "inserted"),   # unmatched source lands
    }                            # 3 deleted; 5 never existed


def test_merge_upsert_replay_is_idempotent(spark):
    """Re-applying the same change batch to the merged snapshot changes
    no values and deletes nothing new — the exactly-once property that
    makes retried MERGE jobs safe."""
    from finance_etl_spark.operators.merge import merge_upsert

    target, source = _merge_fixture(spark)
    once = merge_upsert(target, source, "k", ["v"]).drop("action")
    twice = merge_upsert(once, source, "k", ["v"]).drop("action")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_gap_fill_locf_fills_forward_only(spark):
    """The registered LOCF query contract on a controlled frame: gaps
    take the latest PRIOR day's value, never a future one, and the
    spine starts at each user's own first day."""
    from pyspark.sql import Window

    daily = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-04", 40.0),
         (2, "2024-01-02", 5.0)],
        "user_id int, d string, v double",
    ).select("user_id", F.col("d").cast("date").alias("d"), "v")
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
        .select("user_id", F.explode(F.sequence("mind", "maxd")).alias("d"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id", "d",
            F.coalesce("v", F.last("v", ignorenulls=True).over(w)).alias("vf"),
        )
    )
    got = {(r["user_id"], str(r["d"])): r["vf"] for r in out.collect()}
    assert got == {
        (1, "2024-01-01"): 10.0,
        (1, "2024-01-02"): 10.0,  # carried forward
        (1, "2024-01-03"): 10.0,  # still the 01-01 value, not 40.0
        (1, "2024-01-04"): 40.0,
        (2, "2024-01-02"): 5.0,   # single-day user: spine is one day
    }


def test_range_join_bucketed_equals_naive_with_boundary_cases(spark):
    """The bin trick must return EXACTLY the naive |Δt|<=tol pairs,
    including pairs exactly at the tolerance, at the same instant, and
    pairs whose bins differ by exactly one — and nothing just over."""
    from finance_etl_spark.operators.joins import range_join_bucketed

    base = 1_700_000_000  # seconds
    left = spark.createDataFrame(
        [(1, base), (2, base + 299), (3, base + 601)],
        "lid int, s long",
    ).select("lid", F.col("s").cast("timestamp").alias("l_ts"))
    right = spark.createDataFrame(
        [(10, base),          # same instant as lid=1
         (11, base + 300),    # exactly tolerance from lid=1; 1s from lid=2
         (12, base + 600),    # 301s from lid=2 (out); 1s from lid=3
         (13, base + 902)],   # 301s from lid=3 (out)
        "rid int, s long",
    ).select("rid", F.col("s").cast("timestamp").alias("r_ts"))
    got = {
        (r["lid"], r["rid"])
        for r in range_join_bucketed(left, right, "l_ts", "r_ts", 300).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter(
            F.abs(F.col("l_ts").cast("double") - F.col("r_ts").cast("double"))
            <= 300.0
        )
        .collect()
    }
    assert got == naive
    assert (1, 11) in got and (2, 12) not in got  # boundary in, 301s out


def test_global_row_number_is_exact_permutation_at_scale(spark):
    """The two-pass ranker must emit exactly 1..n with no gaps or
    duplicates. Regression for the repartitionByRange double-sampling
    bug: boundaries are sampled per job, so the size-count job and the
    final job could disagree on the layout unless the ranged relation
    is pinned — uneven rank blocks (observed as lopsided deciles at
    sf0.1) were the symptom."""
    from pyspark.sql import functions as F

    from finance_etl_spark.operators.ranks import global_row_number

    n = 20011
    df = spark.range(n).select(
        F.xxhash64("id").alias("k"), F.col("id").alias("uid")
    )
    out = global_row_number(
        df, [F.col("k").desc(), F.col("uid").asc()], out_col="rn",
        num_partitions=8,
    )
    rns = sorted(r.rn for r in out.select("rn").collect())
    assert rns == list(range(1, n + 1))


def test_label_propagation_two_cliques(spark):
    from finance_etl_spark.operators.components import label_propagation

    # two 4-cliques bridged by one edge: propagation must keep them as
    # two communities (the bridge is outvoted by each side's clique)
    edges = []
    for base in (0, 10):
        nodes = [base + i for i in range(4)]
        edges += [(a, b) for a in nodes for b in nodes if a < b]
    edges.append((3, 10))
    df = spark.createDataFrame(edges, "src long, dst long")
    comm = {
        r.node: r.community_id
        for r in label_propagation(df, n_rounds=6).collect()
    }
    left = {comm[n] for n in (0, 1, 2, 3)}
    right = {comm[n] for n in (10, 11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_repartition_deterministic(spark):
    from finance_etl_spark.operators.components import label_propagation

    edges = [(i, (i * 7 + 3) % 30) for i in range(60)]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "src long, dst long"
    )
    a = sorted(map(tuple, label_propagation(df, n_rounds=4).collect()))
    b = sorted(
        map(tuple, label_propagation(df.repartition(13), n_rounds=4).collect())
    )
    assert a == b


def test_components_star_equals_propagation_on_long_path(spark):
    """A 60-node path has diameter 59 — beyond propagation's default
    round budget, exactly the regime the star algorithm exists for.
    Verify star labels = ground truth (all nodes -> 0)."""
    from finance_etl_spark.operators.components import (
        connected_components_star,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "src long, dst long"
    )
    got = {
        (r.node, r.component_id)
        for r in connected_components_star(edges).collect()
    }
    assert got == {(i, 0) for i in range(60)}


def test_components_star_equals_propagation_random(spark):
    """Star and propagation must agree label-for-label on a seeded
    random graph with several components."""
    import random

    from finance_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    edges = [
        (rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(150)
    ]
    edf = spark.createDataFrame(
        [e for e in edges if e[0] != e[1]], "src long, dst long"
    )
    a = {
        (r.node, r.component_id)
        for r in connected_components(edf, max_rounds=60).collect()
    }
    b = {
        (r.node, r.component_id)
        for r in connected_components_star(edf).collect()
    }
    assert a == b


def test_asof_forward_ties_and_direction(spark):
    """Forward as-of: equal timestamps match (inclusive); strictly
    earlier right rows never match; tolerance nulls far futures."""
    import datetime as dt

    from pyspark.sql import functions as F

    from finance_etl_spark.operators.joins import asof_join_forward

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t("2025-01-01T10:00:00")), (1, t("2025-01-01T12:00:00"))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, t("2025-01-01T09:00:00"), 1.0),   # past: never matches
            (1, t("2025-01-01T10:00:00"), 2.0),   # tie: matches first row
            (1, t("2025-01-01T15:00:00"), 3.0),   # future: matches second
        ],
        "k long, ts timestamp, v double",
    )
    rows = {
        r.ts: r.v
        for r in asof_join_forward(
            left, right, on="k", left_ts="ts", right_ts="ts", value_cols=["v"]
        ).collect()
    }
    assert rows[t("2025-01-01T10:00:00")] == 2.0
    assert rows[t("2025-01-01T12:00:00")] == 3.0
    rows_tol = {
        r.ts: r.v
        for r in asof_join_forward(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], tolerance="1 hour",
        ).collect()
    }
    assert rows_tol[t("2025-01-01T10:00:00")] == 2.0
    assert rows_tol[t("2025-01-01T12:00:00")] is None
