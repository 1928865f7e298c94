"""Stage decomposition of text_minhash_lsh_pairs' eager pipeline:
times each barrier job (arr.count / sigs.count / cands.count) and the
final verify noop separately, bench-identical session, min-of-N.

Usage: python tools/minhash_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.io.readers import load_table_parallel  # noqa: E402
from finance_etl_spark.operators.dedup import (  # noqa: E402
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_array,
)
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("MH_RUNS", "4"))


def main() -> int:
    spark = get_spark("minhash-profile")
    df = plans.get("q1_pricing_summary").build(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    from pyspark.sql import functions as F

    rows = []
    for _ in range(N):
        t = {}
        t0 = time.time()
        d = load_table_parallel(spark, SF_DIR, "documents")
        arr = shingle_array(d, "doc_id", "text", 3).persist()
        n_docs = arr.count()
        t["arr_count"] = time.time() - t0

        t0 = time.time()
        sh = arr.select(F.col("doc_id"), F.explode("sh_arr").alias("shingle"))
        sigs = minhash_signatures(arr, "doc_id").persist()
        sigs.count()
        t["sigs_count"] = time.time() - t0

        t0 = time.time()
        cands = lsh_candidate_pairs(sigs, "doc_id").persist()
        n_pairs = cands.count()
        t["cands_count"] = time.time() - t0

        t0 = time.time()
        prune = n_pairs * 4 < n_docs
        verified = exact_jaccard(sh, cands, "doc_id", arr=arr, prune=prune)
        out = verified.filter(F.col("jaccard") >= 0.5)
        out.write.mode("overwrite").format("noop").save()
        t["verify"] = time.time() - t0
        t["n_docs"], t["n_pairs"], t["prune"] = n_docs, n_pairs, prune
        spark.catalog.clearCache()
        rows.append(t)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v) for k, v in t.items()}), flush=True)

    best = {
        k: round(min(r[k] for r in rows), 3)
        for k in ("arr_count", "sigs_count", "cands_count", "verify")
    }
    best["total_min_sum"] = round(sum(best.values()), 3)
    best["n_docs"], best["n_pairs"], best["prune"] = (
        rows[0]["n_docs"], rows[0]["n_pairs"], rows[0]["prune"],
    )
    print(json.dumps({"loadavg": os.getloadavg()[0], "stages": best}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
