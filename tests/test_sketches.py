"""KMV sketch accuracy: union/intersection estimates vs exact counts
on a constructed overlap, and exactness below the sketch threshold."""

from pyspark.sql import functions as F

from finance_etl_spark import plans
from finance_etl_spark.plans.relational import _KMV_K, kmv_sketches, _kmv_estimate


def test_kmv_overlap_error_bound(spark):
    # A = [0, 15000), B = [8000, 20000): |A|=15000 |B|=12000 |A∩B|=7000
    a = spark.range(0, 15000).select(F.lit("A").alias("g"), F.col("id"))
    b = spark.range(8000, 20000).select(F.lit("B").alias("g"), F.col("id"))
    df = a.unionByName(b)
    sk = kmv_sketches(df, "g", "id")
    per = sk.groupBy("grp").agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    est = {
        r.grp: r.e
        for r in per.select(
            "grp", _kmv_estimate(F.col("n"), F.col("kth"), _KMV_K).alias("e")
        ).collect()
    }
    # ~1/sqrt(256) ≈ 6.25% expected; allow 3 sigma
    assert abs(est["A"] - 15000) / 15000 < 0.20
    assert abs(est["B"] - 12000) / 12000 < 0.20


def test_kmv_exact_below_threshold(spark):
    small = spark.range(0, 100).select(F.lit("S").alias("g"), F.col("id"))
    sk = kmv_sketches(small, "g", "id")
    per = sk.groupBy("grp").agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
    est = per.select(
        _kmv_estimate(F.col("n"), F.col("kth"), _KMV_K).alias("e")
    ).collect()[0].e
    assert est == 100.0


def test_kmv_query_intersections_close_to_exact(spark, sf_dir):
    out = plans.get("agg_kmv_intersection_sketch").build(spark, sf_dir)
    got = {(r.grp_a, r.grp_b): r for r in out.collect()}
    assert len(got) == 10  # 5 priorities -> C(5,2) pairs
    from finance_etl_spark.io.readers import load_table

    o = load_table(spark, sf_dir, "orders")
    sets = {
        r.o_orderpriority: set()
        for r in o.select("o_orderpriority").distinct().collect()
    }
    for r in o.select("o_orderpriority", "o_custkey").distinct().collect():
        sets[r.o_orderpriority].add(r.o_custkey)
    for (ga, gb), row in got.items():
        exact_i = len(sets[ga] & sets[gb])
        exact_u = len(sets[ga] | sets[gb])
        assert abs(row.est_union - exact_u) <= max(0.2 * exact_u, 2.0)
        # intersection inherits three estimates' noise — wider band
        assert abs(row.est_intersection - exact_i) <= max(0.35 * exact_u, 2.0)
