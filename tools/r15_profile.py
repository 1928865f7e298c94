"""Round-15 headline decomposition: per query, how much of the bench
second is Python/py4j PLAN BUILD vs JVM EXECUTION (noop sink).

For each headline query (or names given on argv): N reps of
  t_build: plans.get(name).build(spark, sf_dir)   (driver-side only)
  t_exec:  noop write of a pre-built df            (analysis+opt+run)
min over reps, bench-identical session and clearCache hygiene.

Usage: python tools/r15_profile.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("R15_PROFILE_RUNS", "3"))


def main(argv: list[str]) -> int:
    names = argv or sorted(plans.headline_queries())
    spark = get_spark("r15-profile")
    # warm-up, bench-identical
    df = plans.get("q1_pricing_summary").build(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()
    out = {}
    for name in names:
        tb, te = [], []
        for _ in range(N):
            t0 = time.time()
            df = plans.get(name).build(spark, SF_DIR)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            spark.catalog.clearCache()
            tb.append(t1 - t0)
            te.append(t2 - t1)
        out[name] = {
            "build": round(min(tb), 3),
            "exec": round(min(te), 3),
            "total": round(min(b + e for b, e in zip(tb, te)), 3),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"loadavg": os.getloadavg()[0], "runs": N,
                      "sf_dir": SF_DIR, "profile": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
