"""Head-to-head end-to-end adjudication of ml_bagging_oob (v1) vs
ml_bagging_oob_v2 at sf0.1 — the round-13 verdict's bookkeeping fix:
the v2 docstring must cite a committed artifact, and the headline
pointer stays on v2 only if this run substantiates an end-to-end win.

Protocol (the round-13 bench discipline): single session, BOTH
queries warmed once before any timed run (first-position heavy-codegen
runs pay a documented ~1.5-2 s JIT tax), then alternating min-of-N
timed runs (v1, v2, v1, v2, ...) so neither variant systematically
benefits from later-session JIT OR from load drift — each pair runs
back-to-back, so the PER-PAIR delta is the load-controlled comparison
and the verdict requires v2 to win a majority of pairs, not just the
global min. All three loadavg fields (1/5/15 min) are recorded and
gated: the script refuses to adjudicate when the 1-minute average is
over 1.0 (use --force to record anyway; the JSON then carries
"quiet_gate": false so the artifact cannot be cited as a quiet run).

Prints one JSON line; the committed artifact is BAGGING_V1V2.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

# snapshot BEFORE the heavy pyspark/registry imports below: importing
# the 671-query registry burns enough CPU to push the 1-minute loadavg
# over the gate on an otherwise idle host
_LOAD_AT_LAUNCH = os.getloadavg()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans
from finance_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))


def main() -> int:
    force = "--force" in sys.argv
    load0 = _LOAD_AT_LAUNCH
    if load0[0] > 1.0 and not force:
        print(
            f"host loadavg {load0[0]:.2f} > 1.0 — not quiet; use --force",
            file=sys.stderr,
        )
        return 1
    spark = get_spark()
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
    pair_deltas = [
        round(v2 - v1, 3)
        for v1, v2 in zip(times["ml_bagging_oob"], times["ml_bagging_oob_v2"])
    ]
    out["pair_deltas_sec"] = pair_deltas  # v2 - v1 per back-to-back pair
    out["v2_pair_wins"] = sum(1 for d in pair_deltas if d < 0)
    out["quiet_gate"] = load0[0] <= 1.0
    # verdict: majority of load-controlled pairs AND the global min
    out["v2_wins"] = (
        out["v2_pair_wins"] * 2 > len(pair_deltas)
        and out["v2_min_sec"] < out["v1_min_sec"]
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
