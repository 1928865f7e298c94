"""Isolate q1's per-row cost: which aggregate formulation is fastest?

Arms (all the same scan/filter/groupBy; only the aggregates differ):
  scan      projection + count-star agg only (floor: scan+shuffle cost)
  dsum      r15 production: SUM(CAST(x AS DECIMAL(30,10)))
  cents38   r16 candidate: long cents, SUM(CAST(c AS DECIMAL(38,0)))
  cents_lg  long cents, plain SUM(long) (scale-UNSAFE, isolation only)
  dbl       plain SUM(double) (not bit-identical, isolation only)

Order rotates each rep to kill ordering bias; loadavg-gated.
Usage: python tools/q1_variants_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark.io.readers import load_table_parallel  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "5"))
LOAD_GATE = float(os.environ.get("AB_LOAD_GATE", "0.8"))


def wait_quiet():
    t0 = time.time()
    while os.getloadavg()[0] >= LOAD_GATE and time.time() - t0 < 240:
        time.sleep(5)


def base(spark):
    li = load_table_parallel(spark, SF_DIR, "lineitem")
    return li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )


def cents(c):
    return (F.col(c) * 100 + F.lit(0.5)).cast("long")


def arm_scan(spark):
    return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


def arm_dsum(spark):
    dec = "decimal(30,10)"
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ch = dp * (1 + F.col("l_tax"))
    return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("a"),
        F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("b"),
        F.sum(dp.cast(dec)).cast("double").alias("c"),
        F.sum(ch.cast(dec)).cast("double").alias("d"),
        F.count(F.lit(1)).alias("n"),
    )


def _cents_cols():
    qc, pc = cents("l_quantity"), cents("l_extendedprice")
    dc, tc = cents("l_discount"), cents("l_tax")
    disc_i = pc * (100 - dc)
    charge_i = disc_i * (100 + tc)
    return qc, pc, disc_i, charge_i


def arm_cents38(spark):
    d38 = "decimal(38,0)"
    qc, pc, disc_i, charge_i = _cents_cols()
    return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qc.cast(d38)).alias("a"),
        F.sum(pc.cast(d38)).alias("b"),
        F.sum(disc_i.cast(d38)).alias("c"),
        F.sum(charge_i.cast(d38)).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )


def arm_cents_lg(spark):
    qc, pc, disc_i, charge_i = _cents_cols()
    return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qc).alias("a"),
        F.sum(pc).alias("b"),
        F.sum(disc_i).alias("c"),
        F.sum(charge_i).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )


def arm_dbl(spark):
    dp = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ch = dp * (1 + F.col("l_tax"))
    return base(spark).groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("a"),
        F.sum("l_extendedprice").alias("b"),
        F.sum(dp).alias("c"),
        F.sum(ch).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )


ARMS = {
    "scan": arm_scan,
    "dsum": arm_dsum,
    "cents38": arm_cents38,
    "cents_lg": arm_cents_lg,
    "dbl": arm_dbl,
}


def main() -> int:
    spark = get_spark("q1-variants-probe")
    # warm the JVM on a tiny SF
    arm_dsum(spark).write.mode("overwrite").format("noop").save()
    times = {k: [] for k in ARMS}
    names = list(ARMS)
    for rep in range(N):
        wait_quiet()
        order = names[rep % len(names):] + names[: rep % len(names)]
        for name in order:
            t0 = time.time()
            ARMS[name](spark).write.mode("overwrite").format("noop").save()
            times[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    out = {k: {"min": min(v), "all": v} for k, v in times.items()}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
