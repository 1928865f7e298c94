"""Third-decade-direction probe for the two untested worst
second-decade ratios (round-12 verdict directive #6).

`cur_decontaminate` (2.52x on sf0.1 -> sf1) and
`q18_large_volume_customer` (2.51x) were the only second-decade rows
above 2.5x that had not yet received the doubling treatment
mm_phash_near_dup got (tools/phash_doubling_probe.py). This probe
measures one more DOUBLING for each — sf1-equivalent vs
sf2-equivalent — to show the per-doubling ratio bending toward ~2x
(linear) rather than expanding:

- cur_decontaminate: documents grow 10 -> 20 permuted copies (same
  per-copy seeded alphabet-permutation discipline as decade 2, so
  cross-copy shingle collisions cannot be planted). The df-capped
  (<= 50) inverted shingle index is the quantity under test: the cap
  is a CONSTANT, so as the corpus grows, a larger share of shingles
  exceeds it and drops out — candidate work should grow ~linearly
  with surviving shingles, not quadratically with docs.
- q18_large_volume_customer: lineitem/orders grow 10 -> 20 key-shifted
  copies (customer stays dim-sized, TPC-H-style). The HAVING
  subquery's qualifying-orderkey survivor set grows linearly and the
  semi-join-then-wide-join shape should track it.

Also reported: the row count of each query's result at both sizes, so
the wall ratio can be attributed to data vs survivors.

Usage:
  python tools/decon_q18_doubling_probe.py [--md]  # --md appends SCALING.md
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("DECADE2_SRC", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".scratch", "sf1")
SF2 = os.path.join(REPO, ".scratch", "sf2")
COPIES2 = 20
N_RUNS = 2
_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"


def _generate_sf2(spark) -> None:
    """20-copy fixture, only the tables these two queries read:
    lineitem/orders key-shifted, documents alphabet-permuted per copy
    (k=1..9 reuse decade 2's permutation seeds so sf1 is a strict
    prefix), customer copied as the unchanged dim."""
    os.makedirs(SF2, exist_ok=True)
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    okey_shift = 10 ** len(str(o.agg(F.max("o_orderkey")).first()[0]))
    for name, df, keycol in (
        ("lineitem", li, "l_orderkey"),
        ("orders", o, "o_orderkey"),
    ):
        big = df
        for k in range(1, COPIES2):
            big = big.unionByName(
                df.withColumn(keycol, F.col(keycol) + F.lit(k * okey_shift))
            )
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(SF2, f"{name}.parquet")
        )
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    did_shift = 10 ** len(str(docs.agg(F.max("doc_id")).first()[0]))
    big_docs = docs
    for k in range(1, COPIES2):
        rng = random.Random(k)  # k=1..9 identical to the sf1 fixture
        perm = list(_ALPHABET)
        rng.shuffle(perm)
        big_docs = big_docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * did_shift))
            .withColumn("text", F.translate("text", _ALPHABET, "".join(perm)))
        )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF2, "documents.parquet")
    )
    shutil.copyfile(
        os.path.join(SRC, "customer.parquet"),
        os.path.join(SF2, "customer.parquet"),
    )


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    best, n_rows = float("inf"), 0
    for _ in range(N_RUNS):
        t0 = time.time()
        n_rows = plans.get(name).build(spark, sf_dir).count()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best, n_rows


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("decon-q18-doubling")
    if not os.path.exists(os.path.join(SF1, "lineitem.parquet")):
        import decade2_probe

        decade2_probe.generate(spark)
    if not os.path.exists(os.path.join(SF2, "lineitem.parquet")):
        _generate_sf2(spark)
    _time(spark, "q1_pricing_summary", "/root/testdata/sf0.001")  # warm-up
    load0 = os.getloadavg()[0]
    rows = []
    for name in ("cur_decontaminate", "q18_large_volume_customer"):
        t1, r1 = _time(spark, name, SF1)
        t2, r2 = _time(spark, name, SF2)
        rows.append(
            {
                "query": name,
                "t_sf1": round(t1, 3),
                "rows_sf1": r1,
                "t_sf2": round(t2, 3),
                "rows_sf2": r2,
                "ratio_per_doubling": round(t2 / t1, 2) if t1 > 0 else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(
        json.dumps(
            {
                "metric": "decon_q18_doubling",
                "loadavg_at_start": round(load0, 2),
                "rows": rows,
            }
        )
    )
    if emit_md:
        lines = [
            "",
            "## Third-decade direction: cur_decontaminate & q18 doubling probes (sf1 → sf2-equivalent)",
            "",
            "The two untested worst second-decade ratios (2.52× and 2.51×),",
            "given the same one-more-doubling treatment as mm_phash_near_dup",
            "(tools/decon_q18_doubling_probe.py): 10 vs 20 copies, same",
            "fixture discipline as decade 2. A ratio ≤ ~2× per doubling means",
            "the curve is bending toward linear; result rows are reported so",
            "survivor growth can be attributed.",
            "",
            "| query | sf1 (s) | rows | sf2 (s) | rows | ratio/doubling |",
            "|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['query']} | {r['t_sf1']} | {r['rows_sf1']} |"
                f" {r['t_sf2']} | {r['rows_sf2']} |"
                f" {r['ratio_per_doubling']} |"
            )
        lines.append("")
        lines.append(
            f"(loadavg at probe start: {round(load0, 2)}; min-of-{N_RUNS}"
            " cold runs per cell.)"
        )
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
