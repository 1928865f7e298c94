"""Record the quiet-machine bench reference (BENCH_LOCAL.json).

Runs the exact bench.py harness in a subprocess and stores its parsed
JSON (plus the host loadavg around the run) at repo root as
BENCH_LOCAL.json. bench.py embeds that file as `quiet_rerun` so the
per-round BENCH_r{N}.json carries its own noise context and
round-over-round comparisons don't require a judge re-run.

Run this at round end when loadavg is low (< ~4 on this 32-vCPU VM);
the script refuses noisy hosts unless --force is given.
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
