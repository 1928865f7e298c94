"""Record the quiet-machine bench reference (BENCH_LOCAL.json).

Runs the exact bench.py harness in a subprocess and stores its parsed
JSON (plus the host loadavg around the run) at repo root as
BENCH_LOCAL.json. bench.py embeds that file as `quiet_rerun` so the
per-round BENCH_r{N}.json carries its own noise context and
round-over-round comparisons don't require a judge re-run.

Run this at round end when loadavg is low (< ~4 on this 32-vCPU VM);
the script refuses noisy hosts unless --force is given.

If BENCH_BUDGET.json exists (frozen from a quiet run by
tools/bench_budget.py), the fresh numbers are gated against it: any
query over its absolute budget, or a total over the total budget,
makes this script exit 2 with a per-query breach report. That makes
the perf gate an absolute, committed contract rather than a
round-over-round comparison under variable load.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true", help="record even on a loaded host")
    args = ap.parse_args()

    load = os.getloadavg()[0]
    if load > 4.0 and not args.force:
        print(f"host loadavg {load:.1f} > 4.0 — not a quiet machine; use --force", file=sys.stderr)
        return 1

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if proc.returncode != 0:
        print(f"bench.py exited {proc.returncode}", file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        return 1
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print("bench.py emitted no JSON line", file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        return 1
    parsed = json.loads(lines[-1])
    parsed.pop("quiet_rerun", None)  # never nest a stale self-reference
    out = {"loadavg_at_start": round(load, 2), **parsed}
    with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"recorded": out["value"], "queries": len(out["queries"])}))

    budget_path = os.path.join(REPO, "BENCH_BUDGET.json")
    if os.path.exists(budget_path):
        with open(budget_path) as f:
            budget = json.load(f)
        breaches = {
            q: {"wall": t, "budget": budget["queries"][q]}
            for q, t in out["queries"].items()
            if q in budget["queries"] and t > budget["queries"][q]
        }
        missing = sorted(set(out["queries"]) - set(budget["queries"]))
        if out["value"] > budget["total_budget"]:
            breaches["__total__"] = {
                "wall": out["value"],
                "budget": budget["total_budget"],
            }
        if missing:
            print(
                f"note: {len(missing)} headline queries have no budget yet "
                f"(regenerate via tools/bench_budget.py): {missing}",
                file=sys.stderr,
            )
        if breaches:
            print("BENCH BUDGET BREACH:", json.dumps(breaches, indent=1), file=sys.stderr)
            return 2
        print(json.dumps({"budget_gate": "pass", "total_budget": budget["total_budget"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
