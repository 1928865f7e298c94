"""Load-gated alternating A/B harness: the shared VM's noise arrives
in multi-second bursts (observed loadavg 0.3 -> 10 swings between
reps), so each rep WAITS for 1-minute loadavg below a threshold
before timing either arm. Reports min and the per-rep series.

Variants under test this round (each returns a DataFrame; rows are
asserted identical to production at the end):

  bagging_keyed    ml_bagging_oob with a keyed repartition on the
                   dedup key triple (one exchange serves decode
                   spreading AND the groupBy distribution).
  ppl_parallel     text_perplexity_filter reading documents through
                   load_table_parallel (docs persist becomes multi-
                   partition; all three bigram explodes parallelize).
  minhash_v5       text_minhash_lsh_pairs with the arr.count barrier
                   merged into the sigs job (n_docs from the cache).
  ks_parallel      stat_ks_two_sample reading orders through
                   load_table_parallel.

Usage: python tools/quiet_ab.py [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark import plans  # noqa: E402
from finance_etl_spark.io import readers  # noqa: E402
from finance_etl_spark.operators import dedup as D  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "6"))
LOAD_GATE = float(os.environ.get("AB_LOAD_GATE", "0.8"))
GATE_TIMEOUT = float(os.environ.get("AB_GATE_TIMEOUT", "240"))


def wait_quiet():
    t0 = time.time()
    while os.getloadavg()[0] >= LOAD_GATE and time.time() - t0 < GATE_TIMEOUT:
        time.sleep(5)
    return os.getloadavg()[0]


def minhash_v5(spark):
    d = readers.load_table_parallel(spark, SF_DIR, "documents")
    arr = D.shingle_array(d, "doc_id", "text", 3).persist()
    sigs = D.minhash_signatures(arr, "doc_id").persist()
    sigs.count()
    n_docs = arr.count()
    cands = D.lsh_candidate_pairs(sigs, "doc_id").persist()
    n_pairs = cands.count()
    sh = arr.select(F.col("doc_id"), F.explode("sh_arr").alias("shingle"))
    verified = D.exact_jaccard(
        sh, cands, "doc_id", arr=arr, prune=(n_pairs * 4 < n_docs)
    )
    return verified.filter(F.col("jaccard") >= 0.5)


def minhash_v6(spark):
    """Round-16 candidate: drop the sigs persist+count barrier — the
    LSH self-join's two band sides canonicalize to the SAME exchange
    subtree, so ReusedExchange computes the signature lineage ONCE
    inside the cands job; the first action is cands.count(), which
    also fills the arr cache (single sequential action, no race)."""
    d = readers.load_table_parallel(spark, SF_DIR, "documents")
    arr = D.shingle_array(d, "doc_id", "text", 3).persist()
    sigs = D.minhash_signatures(arr, "doc_id")
    cands = D.lsh_candidate_pairs(sigs, "doc_id").persist()
    n_pairs = cands.count()
    n_docs = arr.count()
    sh = arr.select(F.col("doc_id"), F.explode("sh_arr").alias("shingle"))
    verified = D.exact_jaccard(
        sh, cands, "doc_id", arr=arr, prune=(n_pairs * 4 < n_docs)
    )
    return verified.filter(F.col("jaccard") >= 0.5)


def q1_dsum_r15(spark):
    """Round-15 q1 (dsum/davg over decimal(30,10)) — the A arm for the
    round-16 long-cents reshape; prod is the new cents build."""
    from finance_etl_spark.functions.money import davg, dsum

    li = readers.load_table_parallel(spark, SF_DIR, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def make_patched(module_name, query, loader=None, table=None, keys=None):
    """Return (prod_fn, variant_fn) where variant patches the module's
    load_table: loader swap, or keyed repartition of one table."""
    import importlib

    mod = importlib.import_module(f"finance_etl_spark.plans.{module_name}")
    orig = mod.load_table

    def patched_load(spark_, sf_dir_, name):
        df_ = orig(spark_, sf_dir_, name)
        if table is None or name == table:
            if keys:
                df_ = df_.repartition(*[F.col(k) for k in keys])
            elif loader:
                return loader(spark_, sf_dir_, name)
        return df_

    def prod(spark):
        mod.load_table = orig
        return plans.get(query).build(spark, SF_DIR)

    def variant(spark):
        mod.load_table = patched_load
        try:
            return plans.get(query).build(spark, SF_DIR)
        finally:
            mod.load_table = orig

    return prod, variant


VARIANTS = {
    "bagging_keyed": (
        "ml_bagging_oob",
        make_patched(
            "ml", "ml_bagging_oob", table="lineitem",
            keys=("l_orderkey", "l_linenumber", "l_partkey"),
        ),
    ),
    "ppl_parallel": (
        "text_perplexity_filter",
        make_patched(
            "text", "text_perplexity_filter",
            loader=readers.load_table_parallel, table="documents",
        ),
    ),
    "minhash_v5": (
        "text_minhash_lsh_pairs",
        (lambda spark: plans.get("text_minhash_lsh_pairs").build(spark, SF_DIR),
         minhash_v5),
    ),
    "ks_parallel": (
        "stat_ks_two_sample",
        make_patched(
            "stats", "stat_ks_two_sample",
            loader=readers.load_table_parallel, table="orders",
        ),
    ),
    "q1_cents": (
        "q1_pricing_summary",
        (lambda spark: plans.get("q1_pricing_summary").build(spark, SF_DIR),
         q1_dsum_r15),
    ),
    "minhash_v6": (
        "text_minhash_lsh_pairs",
        (lambda spark: plans.get("text_minhash_lsh_pairs").build(spark, SF_DIR),
         minhash_v6),
    ),
}


def main(argv: list[str]) -> int:
    chosen = argv or list(VARIANTS)
    spark = get_spark("quiet-ab")
    df = plans.get("q1_pricing_summary").build(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    def run(make):
        t0 = time.time()
        make(spark).write.mode("overwrite").format("noop").save()
        el = time.time() - t0
        spark.catalog.clearCache()
        return el

    results = {}
    for name in chosen:
        _, (prod, variant) = VARIANTS[name]
        ta, tb, gates = [], [], []
        for _ in range(N):
            gates.append(round(wait_quiet(), 2))
            ta.append(run(prod))
            tb.append(run(variant))
        a = sorted(map(tuple, prod(spark).collect()))
        b = sorted(map(tuple, variant(spark).collect()))
        results[name] = {
            "prod_min": round(min(ta), 3),
            "variant_min": round(min(tb), 3),
            "rows_equal": a == b,
            "prod": [round(x, 3) for x in ta],
            "variant": [round(x, 3) for x in tb],
            "gate_loads": gates,
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"results": {k: {kk: v[kk] for kk in ("prod_min", "variant_min", "rows_equal")} for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
