"""ANN quality/throughput evaluation: recall@5 and wall time of every
approximate-nearest-neighbor path against the exact brute-force top-5,
at a given SF (default sf0.1).

This is the quantitative counterpart of the per-path recall pytests:
one table showing what each index family trades for its speed.

Usage: python tools/ann_eval.py [--md]   # --md rewrites ANN_EVAL.md
Prints one JSON line.
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
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PATHS = (
    ("vec_cosine_topk", "exact (JVM fold)"),
    ("vec_matmul_topk", "exact (Arrow+BLAS)"),
    ("vec_ann_lsh_topk", "LSH (hyperplane bands)"),
    ("vec_ann_ivf_topk", "IVF (8/16 probes)"),
    ("vec_ann_pq_topk", "PQ (16x16 ADC + re-rank)"),
)


def topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def main() -> int:
    emit_md = "--md" in sys.argv
    spark = get_spark("ann-eval")
    # warm-up so the first path doesn't absorb JVM/codegen startup
    plans.get("vec_cosine_topk").build(spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    results = []
    truth = None
    for name, label in PATHS:
        wall, rows = float("inf"), None
        for _ in range(2):  # min of 2: steady-state, not first-plan codegen
            t0 = time.time()
            rows = plans.get(name).build(spark, SF_DIR).collect()
            wall = min(wall, round(time.time() - t0, 3))
            spark.catalog.clearCache()
        got = topk_sets(rows)
        if truth is None:  # first entry is the exact baseline
            truth = got
            recall = 1.0
        else:
            hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
            denom = sum(len(s) for s in truth.values())
            recall = round(hits / denom, 3) if denom else 0.0
        results.append(
            {"path": name, "label": label, "recall_at_5": recall, "sec": wall}
        )
        print(json.dumps(results[-1]), flush=True)

    # Binary quantization (sign bits + Hamming) measured against the
    # FLOAT cosine truth — the standard BQ quality metric (the
    # registered query vec_binary_hamming_topk is oracle-exact in the
    # quantized space; this measures what the quantization itself
    # loses). Reuses the same 5 probes as the exact baseline.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.plans.vectors import _pack_sign_bits

    emb = load_table(spark, SF_DIR, "embeddings")
    codes = emb.select(
        "vec_id",
        _pack_sign_bits("embedding", 0, 32).alias("lo"),
        _pack_sign_bits("embedding", 32, 64).alias("hi"),
    )
    qc = codes.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("q_lo"),
        F.col("hi").alias("q_hi"),
    )
    t0 = time.time()
    bq_rows = (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("q_lo").bitwiseXOR(F.col("lo")))
                + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("hi")))
            ).alias("hamming"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
            ),
        )
        .filter(F.col("rn") <= 5)
        .collect()
    )
    bq_wall = round(time.time() - t0, 3)
    got = topk_sets(bq_rows)
    hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    denom = sum(len(s) for s in truth.values())
    results.append(
        {
            "path": "binary_hamming_topk",
            "label": "binary quantization (64 sign bits)",
            "recall_at_5": round(hits / denom, 3) if denom else 0.0,
            "sec": bq_wall,
        }
    )
    print(json.dumps(results[-1]), flush=True)

    # BQ + exact float re-rank: shortlist by Hamming (top-100), price
    # the shortlist with true cosine — the production two-stage shape
    # (bits cut the scan 32x; floats fix the ranking).
    from finance_etl_spark.functions.vectors import cosine

    t0 = time.time()
    shortlist = (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("q_lo").bitwiseXOR(F.col("lo")))
                + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("hi")))
            ).alias("hamming"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
            ),
        )
        .filter(F.col("rn") <= 100)
        .drop("rn", "hamming")
    )
    qv = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    nv = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    rr_rows = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("embedding"), F.col("q_emb")).alias("cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cos").desc(), "neighbor_id"
                )
            ),
        )
        .filter(F.col("rn") <= 5)
        .collect()
    )
    rr_wall = round(time.time() - t0, 3)
    got = topk_sets(rr_rows)
    hits = sum(len(got.get(q, set()) & s) for q, s in truth.items())
    results.append(
        {
            "path": "binary_hamming_rerank",
            "label": "BQ shortlist(100) + exact re-rank",
            "recall_at_5": round(hits / denom, 3) if denom else 0.0,
            "sec": rr_wall,
        }
    )
    print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"metric": "ann_recall_eval", "sf_dir": SF_DIR, "rows": results}))

    if emit_md:
        lines = [
            "# ANN_EVAL — recall@5 vs the exact top-5 (sf0.1 embeddings)",
            "",
            "Generated by `python tools/ann_eval.py --md` (single collect per",
            "path, cache cleared between; recall measured per query over the",
            "5 fixed query vectors against the exact baseline's id sets).",
            "",
            "| path | recall@5 | wall (s) |",
            "|---|---|---|",
        ]
        for r in results:
            lines.append(
                f"| `{r['path']}` ({r['label']}) | {r['recall_at_5']} | {r['sec']} |"
            )
        lines += [
            "",
            "The exact Arrow+BLAS path must score 1.0 (same answer, different",
            "execution strategy); the sketch-indexed paths trade recall for",
            "sublinear candidate generation — each one's recall floor is also",
            "pinned as a pytest in tests/test_dedup_vectors.py.",
            "",
            "Caveat on wall times: at sf0.1 the corpus is 2,000×64-dim, so",
            "fixed costs (plan, shuffle setup, index build) dominate and the",
            "index paths show NO latency win — their point is the asymptotic",
            "shape (candidates ≪ corpus at 100 TB), which the plan audits",
            "pin; the index build amortizes across queries in production.",
            "",
        ]
        with open(os.path.join(REPO, "ANN_EVAL.md"), "w") as f:
            f.write("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
