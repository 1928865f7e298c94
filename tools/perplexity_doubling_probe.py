"""Doubling probe for the round-7 LLM-corpus flagship.

`text_perplexity_filter` builds a corpus bigram LM (distinct-bigram-
bounded) and scores every document against it. Its measured decade
ratio (sf0.01 → sf0.1) is 1.78× on 10× data; the design claim is that
the cost tracks corpus size plus distinct-bigram count — never a
quadratic term — so a corpus DOUBLING deep into the multi-million-
token regime should cost ~2× or less.

This probe reuses the sf1/sf2-equivalent document fixtures from
tools/phash_doubling_probe.py (10 vs 20 per-copy alphabet-PERMUTED
copies of sf0.1 — permutations, not rotations, so no cross-copy
structure is planted; each copy contributes its own vocabulary, which
makes the LM grow linearly — the honest worst case for this operator).

Also reported: the distinct-bigram count at each size (the quantity
that bounds the model join) so the wall ratio can be attributed.

Usage:
  python tools/perplexity_doubling_probe.py [--md]  # --md appends SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402
from tools.phash_doubling_probe import SF1, SF2, generate_docs  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_RUNS = 2


def _bigram_types(spark, sf_dir: str) -> int:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = d.select(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "").alias("lst")
    ).filter(F.size("lst") >= 2)
    return (
        docs.select(F.posexplode("lst").alias("i", "w1"), "lst")
        .filter(F.col("i") < F.size("lst") - 1)
        .select("w1", F.element_at(F.col("lst"), F.col("i") + 2).alias("w2"))
        .distinct()
        .count()
    )


def _time(spark, sf_dir: str) -> tuple[float, int, int]:
    best = float("inf")
    n_out = 0
    for _ in range(N_RUNS):
        t0 = time.time()
        df = plans.get("text_perplexity_filter").build(spark, sf_dir)
        n_out = df.count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best, n_out, _bigram_types(spark, sf_dir)


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("perplexity-doubling-probe")
    if not os.path.exists(os.path.join(SF1, "documents.parquet")):
        generate_docs(spark, SF1, 10)
    if not os.path.exists(os.path.join(SF2, "documents.parquet")):
        generate_docs(spark, SF2, 20)
    # warm-up
    plans.get("text_perplexity_filter").build(
        spark, "/root/testdata/sf0.01"
    ).count()
    spark.catalog.clearCache()

    t1, out1, big1 = _time(spark, SF1)
    t2, out2, big2 = _time(spark, SF2)
    res = {
        "metric": "perplexity_doubling",
        "sf1": {"docs_scored": out1, "bigram_types": big1, "sec": round(t1, 3)},
        "sf2": {"docs_scored": out2, "bigram_types": big2, "sec": round(t2, 3)},
        "wall_ratio": round(t2 / t1, 2),
        "bigram_ratio": round(big2 / max(big1, 1), 2),
    }
    print(json.dumps(res))

    if emit_md:
        md = f"""

## Round-7 doubling probe: text_perplexity_filter (sf1 → sf2-equivalent)

Same fixture discipline as the pHash probe (per-copy alphabet
permutations — each copy brings its own vocabulary, the honest
LM-growth worst case). One corpus DOUBLING deep inside the
multi-million-token regime:

| corpus | docs scored | distinct bigrams | wall (s) |
|---|---|---|---|
| sf1-equiv | {out1} | {big1} | {res['sf1']['sec']} |
| sf2-equiv | {out2} | {big2} | {res['sf2']['sec']} |

Doubling wall ratio: **{res['wall_ratio']}×** (distinct bigrams grew
{res['bigram_ratio']}×). The LM join stays bigram-bounded, so the
per-doubling cost holds at ~linear even while the model itself doubles
— no quadratic term surfaces.
"""
        marker = "perplexity_filter (sf1 → sf2-equivalent)"
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
