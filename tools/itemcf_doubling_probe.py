"""Scaling probe for ml_item_item_cf.

Design claim: the co-occurrence join's work is the sum of squared
per-customer basket sizes. In TPC-H-shaped data, basket size is a
property of customer BEHAVIOR, not of scale factor (orders/customer
and lines/order are constant), so a 10x corpus means ~10x baskets of
the same size — the pair relation grows LINEARLY and wall-clock
should grow far less than the 100x a naive |items|^2 implementation
would show.

Usage:
  python tools/itemcf_doubling_probe.py [--md]   # --md appends SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RUNS = 2


def _time(spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        plans.get("ml_item_item_cf").build(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("itemcf-doubling-probe")
    # warm the JVM/codegen path once
    plans.get("ml_item_item_cf").build(spark, "/root/testdata/sf0.001").count()
    t_small = _time(spark, "/root/testdata/sf0.001")
    t_big = _time(spark, "/root/testdata/sf0.01")
    ratio = t_big / t_small
    out = {
        "probe": "ml_item_item_cf",
        "sf_small": 0.001,
        "sf_big": 0.01,
        "wall_small_s": round(t_small, 3),
        "wall_big_s": round(t_big, 3),
        "ratio_per_10x_corpus": round(ratio, 2),
    }
    print(json.dumps(out))
    if emit_md:
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write(
                f"\n- **ml_item_item_cf 10x probe**: {t_small:.2f}s @ sf0.001 -> "
                f"{t_big:.2f}s @ sf0.01 (ratio {ratio:.2f}x per 10x corpus; "
                "pair relation linear in SF because TPC-H basket size is "
                "scale-free — measured, not claimed).\n"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
