"""A/B: production minhash_lsh_dedup_pairs vs restructured variants,
alternating end-to-end noop runs in ONE session (min-of-N).

Variants:
  v1 (production): arr.count -> sigs.count -> cands.count -> verify
  v2 (fewer barriers): sigs.count (materializes arr+sigs in one job),
      n_docs from the arr cache, candidate-pair UPPER BOUND from one
      bucket-size agg (sum k*(k-1)/2) instead of materializing the
      exact pair count; when even the bound says "no prune", cands has
      a single consumer and stays lazy — no third barrier job.
  v3: v2 + collect_list pair generation (one exchange on the bucket
      key + map-side pair explode) instead of the bucket self-join.

All variants compute the identical result set (prune and pair-gen
shape never change rows; v3's pair set is the same i<j bucket pairs).

Usage: python tools/minhash_restructure_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.io.readers import load_table_parallel  # noqa: E402
from finance_etl_spark.operators import dedup as D  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("MH_RUNS", "5"))
THRESHOLD = 0.5


def _bands(sigs):
    return sigs.select(
        F.col("doc_id"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col("sig")[i]
                            for i in range(
                                b * D.ROWS_PER_BAND, (b + 1) * D.ROWS_PER_BAND
                            )
                        ]
                    )
                    for b in range(D.N_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
    )


def cands_collect_list(sigs):
    """Same (id_a, id_b, n_matching_bands) as lsh_candidate_pairs via
    ONE bucket-key exchange + map-side pair explode."""
    bands = _bands(sigs)
    buckets = bands.groupBy("band_id", "band_hash").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    ).filter(F.size("ids") >= 2)
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.col("ids"), i + 2, F.size(F.col("ids"))
                        ),
                        lambda b: F.struct(
                            a.alias("id_a"), b.alias("id_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_matching_bands")
    )


def pipeline_v2(spark, cand_fn):
    d = load_table_parallel(spark, SF_DIR, "documents")
    arr = D.shingle_array(d, "doc_id", "text", 3).persist()
    sigs = D.minhash_signatures(arr, "doc_id").persist()
    sigs.count()  # one job: tokenize -> arr cache -> signatures -> sigs cache
    n_docs = arr.count()  # cached scan
    k = F.col("k").cast("bigint")
    pair_bound = (
        _bands(sigs)
        .groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("k"))
        .agg(F.sum(k * (k - 1) / 2).alias("ub"))
        .collect()[0]["ub"]
        or 0
    )
    cands = cand_fn(sigs)
    prune = pair_bound * 4 < n_docs
    if prune:
        cands = cands.persist()
        cands.count()
    sh = arr.select(F.col("doc_id"), F.explode("sh_arr").alias("shingle"))
    verified = D.exact_jaccard(sh, cands, "doc_id", arr=arr, prune=prune)
    return verified.filter(F.col("jaccard") >= THRESHOLD)


def main() -> int:
    spark = get_spark("minhash-restructure-ab")
    df = plans.get("q1_pricing_summary").build(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    def run(make):
        t0 = time.time()
        out = make()
        out.write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        return el

    variants = {
        "v1_prod": lambda: plans.get("text_minhash_lsh_pairs").build(spark, SF_DIR),
        "v2_fewer_barriers": lambda: pipeline_v2(
            spark, lambda s: D.lsh_candidate_pairs(s, "doc_id")
        ),
        "v3_v2_collect_list": lambda: pipeline_v2(spark, cands_collect_list),
    }
    times = {k: [] for k in variants}
    for _ in range(N):
        for k, make in variants.items():
            times[k].append(run(make))
    out = {k: round(min(v), 3) for k, v in times.items()}
    # result identity: v1 vs v3 rows
    a = sorted(map(tuple, variants["v1_prod"]().collect()))
    b = sorted(map(tuple, variants["v3_v2_collect_list"]().collect()))
    out["rows_equal_v1_v3"] = a == b
    out["n_rows"] = len(a)
    print(json.dumps({"loadavg": os.getloadavg()[0], "runs": N, "ab": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
