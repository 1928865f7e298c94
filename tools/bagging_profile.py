"""Stage-level profile of ml_bagging_oob at sf0.1 (round-12 directive:
the quiet wall drifted ~3.34 s -> 4.0 s across round 11 despite the
packed-word reshape; isolate WHERE the time goes and adjudicate the
string-key vs numeric-key dedup exchange head-to-head).

Variants (each min-of-N cold runs, cache cleared between):
  full_numeric   current registry shape (numeric-key dedup exchange)
  full_string    identical except the dedup groupBy keys the string
                 concat (the round-10 shape the advisor asked to
                 re-benchmark head-to-head)
  base_only      build wsb (md5 ladder + packed word), noop-sink it —
                 the shared prefix both consumers pay
  hist_branch    wsb -> histogram -> stumps only
  oob_branch     wsb -> OOB census only (stump arrays stubbed as
                 literals so the branch is isolated from hist)

Prints one JSON line with all timings + loadavg.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce as _reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.ml import _BAG_B, _BAG_POIS
from finance_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _w_of(b: int):
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("k"), F.lit(f"#{b}"))), 1, 4), 16, 10
    ).cast("bigint")
    w = F.when(u < _BAG_POIS[0], 0)
    for i, t in enumerate(_BAG_POIS[1:], start=1):
        w = w.when(u < t, i)
    return w.otherwise(len(_BAG_POIS))


def _w_at(b: int):
    return F.shiftright(F.col("ws"), 4 * b).bitwiseAND(F.lit(15))


def _base(spark, string_key: bool):
    li = load_table(spark, SF_DIR, "lineitem")
    rng = li.agg(
        F.min("l_extendedprice").cast("double").alias("xmin"),
        F.max("l_extendedprice").cast("double").alias("xmax"),
    )
    feat = li.crossJoin(F.broadcast(rng)).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.least(
            F.lit(31),
            F.floor(
                (F.col("l_extendedprice").cast("double") - F.col("xmin"))
                / ((F.col("xmax") - F.col("xmin")) / F.lit(32.0))
            ).cast("int"),
        ).alias("bin"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    if string_key:
        return (
            feat.select(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.col("l_partkey").cast("string"),
                ).alias("k"),
                "bin",
                "y",
            )
            .groupBy("k", "bin", "y")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
    return (
        feat.groupBy("l_orderkey", "l_linenumber", "l_partkey", "bin", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("l_partkey").cast("string"),
            ).alias("k"),
            "bin",
            "y",
            "cnt",
        )
    )


def _wsb(spark, string_key: bool):
    return _base(spark, string_key).select(
        "bin",
        "y",
        "cnt",
        _reduce(
            lambda a, b: a.bitwiseOR(b),
            [F.shiftleft(_w_of(b).cast("bigint"), 4 * b) for b in range(_BAG_B)],
        ).alias("ws"),
    )


def _w_of_slice(h, i: int):
    """Weight from 16-bit slice i (0..7) of a 32-hex md5 column."""
    u = F.conv(F.substring(h, 4 * i + 1, 4), 16, 10).cast("bigint")
    w = F.when(u < _BAG_POIS[0], 0)
    for j, t in enumerate(_BAG_POIS[1:], start=1):
        w = w.when(u < t, j)
    return w.otherwise(len(_BAG_POIS))


def _wsb_2md5(spark):
    """Variant: all 16 Poisson draws sliced from TWO md5 digests
    (8x 16-bit lanes each) instead of 16 per-replicate digests."""
    hashed = _base(spark, False).select(
        "bin",
        "y",
        "cnt",
        F.md5(F.concat(F.col("k"), F.lit("#0"))).alias("h0"),
        F.md5(F.concat(F.col("k"), F.lit("#1"))).alias("h1"),
    )
    return hashed.select(
        "bin",
        "y",
        "cnt",
        _reduce(
            lambda a, b: a.bitwiseOR(b),
            [
                F.shiftleft(
                    _w_of_slice(F.col("h0" if b < 8 else "h1"), b % 8).cast(
                        "bigint"
                    ),
                    4 * b,
                )
                for b in range(_BAG_B)
            ],
        ).alias("ws"),
    )


def _hist_stumps(wsb):
    hist = (
        wsb.select(
            "bin",
            "cnt",
            "y",
            F.posexplode(
                F.array(*[_w_at(b).cast("int") for b in range(_BAG_B)])
            ),
        )
        .groupBy(F.col("pos").cast("int").alias("b"), "bin")
        .agg(
            F.sum(F.col("col") * F.col("cnt")).cast("bigint").alias("n_w"),
            F.sum(F.col("col") * F.col("cnt") * F.col("y"))
            .cast("bigint")
            .alias("pos_w"),
        )
    )
    wc = Window.partitionBy("b").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("b")
    cum = hist.select(
        "b",
        "bin",
        F.sum("n_w").over(wc).cast("bigint").alias("cum_n"),
        F.sum("pos_w").over(wc).cast("bigint").alias("cum_pos"),
        F.sum("n_w").over(wall).cast("bigint").alias("tot_n"),
        F.sum("pos_w").over(wall).cast("bigint").alias("tot_pos"),
    ).filter(F.col("cum_n") < F.col("tot_n"))
    return cum


def _full(spark, string_key: bool):
    """Complete query (same plan as the registry builder) on either
    key shape — the advisor's head-to-head."""
    wsb = _wsb(spark, string_key).persist()
    cum = _hist_stumps(wsb)
    pol = spark.createDataFrame(
        [("left_pos",), ("left_neg",)], "polarity string"
    )
    cand = cum.crossJoin(F.broadcast(pol)).select(
        "b",
        "bin",
        "polarity",
        F.when(
            F.col("polarity") == "left_pos",
            (F.col("cum_n") - F.col("cum_pos"))
            + (F.col("tot_pos") - F.col("cum_pos")),
        )
        .otherwise(
            F.col("cum_pos")
            + (F.col("tot_n") - F.col("cum_n"))
            - (F.col("tot_pos") - F.col("cum_pos"))
        )
        .alias("wrong"),
    )
    wpick = Window.partitionBy("b").orderBy("wrong", "bin", "polarity")
    stumps = (
        cand.withColumn("pk", F.row_number().over(wpick))
        .filter(F.col("pk") == 1)
        .select("b", F.col("bin").alias("split_bin"), "polarity", "wrong")
        .persist()
    )
    srow = stumps.agg(
        F.array_sort(
            F.collect_list(F.struct("b", "split_bin", "polarity"))
        ).alias("sarr")
    ).select(
        F.transform("sarr", lambda s: s["split_bin"]).alias("sb"),
        F.transform(
            "sarr", lambda s: s["polarity"] == F.lit("left_pos")
        ).alias("lp"),
    )
    n_oob_expr = sum((_w_at(b) == 0).cast("int") for b in range(_BAG_B))
    votes_expr = sum(
        (
            (_w_at(b) == 0)
            & ((F.col("bin") <= F.col("sb")[b]) == F.col("lp")[b])
        ).cast("int")
        for b in range(_BAG_B)
    )
    oob = wsb.crossJoin(F.broadcast(srow)).select(
        "cnt",
        "y",
        n_oob_expr.alias("n_oob"),
        votes_expr.alias("votes_1"),
    )
    scored = oob.filter(F.col("n_oob") > 0).select(
        "cnt",
        "y",
        F.when(2 * F.col("votes_1") > F.col("n_oob"), 1)
        .otherwise(0)
        .alias("pred"),
    )
    summary = scored.agg(
        F.sum("cnt").cast("bigint").alias("n_oob_rows"),
        F.sum(
            F.when(F.col("pred") != F.col("y"), F.col("cnt")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_err"),
    )
    return (
        stumps.crossJoin(F.broadcast(summary))
        .select(
            "b",
            F.col("split_bin").cast("int").alias("split_bin"),
            "polarity",
            F.col("wrong").cast("bigint").alias("weighted_wrong"),
            "n_oob_rows",
            (
                F.col("n_err").cast("double")
                / F.col("n_oob_rows").cast("double")
            ).alias("oob_error"),
        )
        .orderBy("b")
    )


def _oob_predmask(wsb):
    """Round-15 census shape: zmask popcounts + a per-bin prediction
    bitmask (one array lookup/row) — what the registry builder now
    plans. Stump arrays stubbed as literals, same as _oob."""
    pm = F.array(
        *[F.lit((1 << _BAG_B) - 1) for _ in range(32)]
    )  # all-ones masks: every stubbed stump (sb=15, lp=True) differs
    # from this only through the (bin <= 15) == True term; for the
    # branch-cost comparison the arithmetic shape is what matters
    zmask = _reduce(
        lambda a, b: a.bitwiseOR(b),
        [F.shiftleft((_w_at(b) == 0).cast("bigint"), b) for b in range(_BAG_B)],
    )
    scored = wsb.select(
        "cnt",
        "y",
        F.bit_count(zmask).alias("n_oob"),
        F.bit_count(
            zmask.bitwiseAND(F.element_at(pm, F.col("bin") + 1))
        ).alias("votes_1"),
    ).filter(F.col("n_oob") > 0)
    return scored.agg(
        F.sum("cnt").cast("bigint").alias("n_oob_rows"),
        F.sum(
            F.when(
                (F.when(2 * F.col("votes_1") > F.col("n_oob"), 1).otherwise(0))
                != F.col("y"),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_err"),
    )


def _oob(wsb):
    sb = F.array(*[F.lit(15) for _ in range(_BAG_B)])
    lp = F.array(*[F.lit(True) for _ in range(_BAG_B)])
    n_oob_expr = sum((_w_at(b) == 0).cast("int") for b in range(_BAG_B))
    votes_expr = sum(
        ((_w_at(b) == 0) & ((F.col("bin") <= sb[b]) == lp[b])).cast("int")
        for b in range(_BAG_B)
    )
    scored = wsb.select(
        "cnt", "y", n_oob_expr.alias("n_oob"), votes_expr.alias("votes_1")
    ).filter(F.col("n_oob") > 0)
    return scored.agg(
        F.sum("cnt").cast("bigint").alias("n_oob_rows"),
        F.sum(
            F.when(
                (F.when(2 * F.col("votes_1") > F.col("n_oob"), 1).otherwise(0))
                != F.col("y"),
                F.col("cnt"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_err"),
    )


def _time(spark, build) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def _time_nocache(spark, build) -> float:
    """Like _time but KEEPS caches (for warm-cache branch timings)."""
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        build().write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    spark = get_spark("bagging-profile")
    from finance_etl_spark import plans

    # warm-up
    plans.get("q1_pricing_summary").build(
        spark, "/root/testdata/sf0.001"
    ).write.mode("overwrite").format("noop").save()
    load0 = os.getloadavg()[0]
    out = {}
    # steady-state warm-up on the real query (first-position runs
    # measured ~1.9 s slower than last-position in the same session)
    _time(spark, lambda: plans.get("ml_bagging_oob").build(spark, SF_DIR))
    out["base_only_2md5"] = _time(spark, lambda: _wsb_2md5(spark))
    out["full_numeric"] = _time(
        spark, lambda: plans.get("ml_bagging_oob").build(spark, SF_DIR)
    )
    # _full keeps the PRE-round-15 census (unrolled 16-term sums), so
    # full_numeric (registry, predmask census) vs full_numeric_rebuilt
    # (old census, same keys) is the census before/after end-to-end
    out["full_string"] = _time(spark, lambda: _full(spark, True))
    out["full_numeric_rebuilt"] = _time(spark, lambda: _full(spark, False))
    # registry builder again at the END: a gap between this and the
    # first measurement flags order effects / host noise
    out["full_numeric_again"] = _time(
        spark, lambda: plans.get("ml_bagging_oob").build(spark, SF_DIR)
    )
    out["base_only_numeric"] = _time(spark, lambda: _wsb(spark, False))
    out["base_only_string"] = _time(spark, lambda: _wsb(spark, True))
    # cache-warmed branch costs: materialize wsb once, then time each
    # consumer against the warm cache (what the two branches really
    # cost on top of the shared base)
    wsb_warm = _wsb(spark, False).persist()
    wsb_warm.count()
    out["hist_from_cache"] = _time_nocache(spark, lambda: _hist_stumps(wsb_warm))
    # census before/after: _oob is the pre-round-15 unrolled 16-term
    # census, _oob_predmask the shipped popcount+bitmask shape
    out["oob_from_cache"] = _time_nocache(spark, lambda: _oob(wsb_warm))
    out["oob_from_cache_predmask"] = _time_nocache(
        spark, lambda: _oob_predmask(wsb_warm)
    )
    wsb_warm.unpersist()
    spark.catalog.clearCache()
    out["hist_branch"] = _time(
        spark, lambda: _hist_stumps(_wsb(spark, False).persist())
    )
    out["oob_branch"] = _time(spark, lambda: _oob(_wsb(spark, False).persist()))
    out["loadavg"] = [round(load0, 2), round(os.getloadavg()[0], 2)]
    out["sf_dir"] = SF_DIR
    out["runs"] = N_RUNS
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
