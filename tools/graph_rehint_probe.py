"""Round-14 re-probe of the trade-graph family after the broadcast-hint
removal (round-13 verdict directive #6): show that at shipped SFs the
UNHINTED edge build plans the same physical joins the forced hints
produced (AQE/statistics still pick broadcast-hash), and that wall
time does not regress across a decade of growth.

Two instruments:
1. Plan diff — build the nation-trade edge aggregation twice, with and
   without explicit F.broadcast() on the orders/customer/supplier
   projections, and report the multiset of physical join operators in
   each plan at sf0.01 and sf0.1.
2. Doubling-direction timing — graph_edge_triangle_support and
   graph_pagerank_trade (registry builds, hints removed) min-of-2 cold
   at sf0.01 and sf0.1, loadavg recorded.

Prints one JSON line (committed narrative goes to SCALING.md).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from finance_etl_spark import plans
from finance_etl_spark.io.readers import load_table
from finance_etl_spark.session import get_spark

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)"
)


def _edges(spark, sf_dir: str, hinted: bool):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    if hinted:
        o, c, s = F.broadcast(o), F.broadcast(c), F.broadcast(s)
    return (
        li.join(o, li.l_orderkey == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


def _joins(df) -> list[str]:
    return sorted(JOIN_RE.findall(df._jdf.queryExecution().executedPlan().toString()))


def _time(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        plans.get(name).build(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.monotonic() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> int:
    spark = get_spark("graph-rehint-probe")
    out: dict = {"loadavg": list(os.getloadavg()), "plan_diff": {}, "timings": {}}
    for sf in SFS:
        tag = sf.rsplit("/", 1)[1]
        out["plan_diff"][tag] = {
            "hinted": _joins(_edges(spark, sf, True)),
            "unhinted": _joins(_edges(spark, sf, False)),
        }
    for q in ["graph_edge_triangle_support", "graph_pagerank_trade"]:
        out["timings"][q] = {
            sf.rsplit("/", 1)[1]: _time(spark, q, sf) for sf in SFS
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
