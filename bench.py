"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query executes end-to-end via the noop sink (full computation, no
driver-side collect). A small warm-up query runs first so JVM/codegen
startup does not pollute the first measurement, and each query is
timed $SPARK_GRAFT_BENCH_RUNS times (default 3) reporting the MINIMUM —
steady-state cost, robust to host-level noise on shared VMs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = plans.get(name).build(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    elapsed = time.time() - t0
    # queries that persist intermediates (LSH) must not hand their
    # cache to the next run — each timing is a full cold computation
    spark.catalog.clearCache()
    return elapsed


def main() -> int:
    spark = get_spark("bench")
    names = sorted(plans.headline_queries())
    # warm-up: tiny query end-to-end (JVM + codegen + parquet footer IO)
    run_query(spark, "q1_pricing_summary", "/root/testdata/sf0.001")

    load_start = os.getloadavg()[0]
    timings: dict[str, float] = {}
    for name in names:
        timings[name] = round(
            min(run_query(spark, name, SF_DIR) for _ in range(N_RUNS)), 3
        )
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        # Host-noise context: this machine is a shared VM and wall
        # times swing ±30% with background load (BENCH_r04 recorded
        # 14.4 s under load vs 11.3 s quiet, identical plans). The
        # loadavg captured around the run plus the committed
        # quiet-machine reference (BENCH_LOCAL.json, produced by the
        # same harness at round end on an idle host) let a reader
        # compare rounds without re-running.
        "runs_per_query": N_RUNS,
        "loadavg_1m": [round(load_start, 2), round(os.getloadavg()[0], 2)],
        # The headline set changes across rounds (r4 added
        # stat_ks_two_sample, r5 added text_vocab_coverage): totals are
        # only comparable on the intersection, so the composition is
        # recorded explicitly.
        "headline_count": len(names),
        "headline_set": names,
    }
    local_ref = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")
    try:
        with open(local_ref) as f:
            out["quiet_rerun"] = json.load(f)
    except FileNotFoundError:
        out["quiet_rerun"] = None
        print(
            f"bench: no quiet-machine reference at {local_ref} "
            "(run tools/bench_local.py on an idle host to record one)",
            file=sys.stderr,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
