"""Weighted-sampling contracts: exact n, repartition determinism, and
weight proportionality measured across many independent salts."""

from pyspark.sql import functions as F

from finance_etl_spark.plans.curation import weighted_sample


def _pop(spark):
    # 900 light items (w=1) and 100 heavy items (w=10): equal total
    # mass, so an n-sample should split roughly evenly between classes
    return spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 100, F.lit(10.0)).otherwise(F.lit(1.0)).alias("w"),
    )


def test_exact_n_and_determinism(spark):
    df = _pop(spark)
    a = sorted(r.id for r in weighted_sample(df, "w", 50, ["id"]).collect())
    b = sorted(
        r.id for r in weighted_sample(df.repartition(13), "w", 50, ["id"]).collect()
    )
    assert len(a) == 50 and a == b


def test_weight_proportionality_over_salts(spark):
    df = _pop(spark)
    heavy = light = 0
    for s in range(40):
        got = weighted_sample(df, "w", 50, ["id"], salt=f"s{s}").collect()
        heavy += sum(1 for r in got if r.id < 100)
        light += sum(1 for r in got if r.id >= 100)
    # expectation: heavy mass 1000/1900 of each draw -> heavy ~ 48%-58%
    # of picks despite being 10% of rows; require a wide-margin win
    # over the unweighted rate (which would put heavy at ~5 of 50)
    assert heavy / (heavy + light) > 0.35
    # and the light class must still be sampled (without-replacement
    # exploration, not a pure top-by-weight)
    assert light > 0
