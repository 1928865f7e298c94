"""A/B: single-task scan (status quo) vs load_table_parallel's
adaptive decode-spreading, per headline query, alternating in ONE
session (min-of-N each) so host noise hits both arms equally.

The fixture tables are single-row-group parquet, so every scan runs
as ONE task and the scan-adjacent work (decimal partial aggs, hash
maps over 600k keys) is single-threaded. load_table_parallel inserts
one round-robin repartition sized from the footer bytes; on a
properly laid-out table (row groups >= cores/2) it is a structural
no-op. This experiment patches the `load_table` binding inside the
plans modules so every query under test reads through the adaptive
loader, without touching query code.

Usage: python tools/parallel_scan_ab.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.io import readers  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "4"))

DEFAULT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "stat_ks_two_sample",
    "ml_ols_normal_equations",
    "fin_fifo_cost_basis",
    "cur_quality_filter",
    "join_inner_agg",
    "ml_bagging_oob",
    "ts_asof_join",
    "window_topk_per_group",
]


def _plans_modules():
    import importlib
    import pkgutil

    import finance_etl_spark.plans as pkg

    mods = []
    for m in pkgutil.iter_modules(pkg.__path__):
        mods.append(importlib.import_module(f"finance_etl_spark.plans.{m.name}"))
    return mods


def main(argv: list[str]) -> int:
    names = argv or DEFAULT
    spark = get_spark("parallel-scan-ab")
    df = plans.get("q1_pricing_summary").build(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    mods = [m for m in _plans_modules() if getattr(m, "load_table", None) is readers.load_table]

    def set_loader(fn):
        for m in mods:
            m.load_table = fn

    def run(name: str) -> float:
        t0 = time.time()
        d = plans.get(name).build(spark, SF_DIR)
        d.write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        return el

    out = {}
    for name in names:
        a, b = [], []
        for _ in range(N):
            set_loader(readers.load_table)
            a.append(run(name))
            set_loader(readers.load_table_parallel)
            b.append(run(name))
        set_loader(readers.load_table)
        out[name] = {"base": round(min(a), 3), "parallel": round(min(b), 3)}
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"loadavg": os.getloadavg()[0], "runs": N, "ab": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
