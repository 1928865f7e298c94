"""Head-to-head end-to-end adjudication of ml_bagging_oob (v1) vs
ml_bagging_oob_v2 at sf0.1 — the round-13 verdict's bookkeeping fix:
the v2 docstring must cite a committed artifact, and the headline
pointer stays on v2 only if this run substantiates an end-to-end win.

Protocol (the round-13 bench discipline): single session, BOTH
queries warmed once before any timed run (first-position heavy-codegen
runs pay a documented ~1.5-2 s JIT tax), then alternating min-of-N
timed runs (v1, v2, v1, v2, ...) so neither variant systematically
benefits from later-session JIT; loadavg recorded before and after;
run ONLY on a quiet host (loadavg < 1) with no concurrent Spark work.

Prints one JSON line; the committed artifact is BAGGING_V1V2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans
from finance_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))


def main() -> int:
    spark = get_spark()
    load0 = os.getloadavg()
    names = ["ml_bagging_oob", "ml_bagging_oob_v2"]
    # warm both once (JIT + code cache), untimed
    for n in names:
        plans.get(n).build(spark, SF_DIR).count()
    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(N_RUNS):
        for n in names:  # alternate so session effects don't bias
            t0 = time.monotonic()
            plans.get(n).build(spark, SF_DIR).count()
            times[n].append(time.monotonic() - t0)
    load1 = os.getloadavg()
    out = {
        "sf_dir": SF_DIR,
        "n_runs": N_RUNS,
        "loadavg_before": list(load0),
        "loadavg_after": list(load1),
        "v1_runs_sec": [round(t, 3) for t in times["ml_bagging_oob"]],
        "v2_runs_sec": [round(t, 3) for t in times["ml_bagging_oob_v2"]],
        "v1_min_sec": round(min(times["ml_bagging_oob"]), 3),
        "v2_min_sec": round(min(times["ml_bagging_oob_v2"]), 3),
    }
    out["v2_wins"] = out["v2_min_sec"] < out["v1_min_sec"]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
