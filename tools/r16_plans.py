"""Dump `.explain("formatted")` for named queries into plans/r16/.

Usage:
  python tools/r16_plans.py before q1_pricing_summary text_minhash_lsh_pairs ...
  python tools/r16_plans.py after  <names...>
  python tools/r16_plans.py before --headline      (the whole headline set)

Plans are built at sf0.1 (the bench SF) — driver-side only, nothing
executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(em)


def main(argv: list[str]) -> int:
    tag = argv[0]
    names = argv[1:]
    if names == ["--headline"]:
        names = sorted(plans.headline_queries())
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("r16-plans")
    for name in names:
        df = plans.get(name).build(spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan_str(df))
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
