"""Differential-privacy noise contracts: determinism per salt,
independence/unbiasedness across salts, and Laplace scale."""

import math

from pyspark.sql import functions as F

from finance_etl_spark.plans.curation import dp_noisy_counts


def _pop(spark):
    return spark.range(3000).select((F.col("id") % 3).alias("g"))


def test_deterministic_per_salt(spark):
    df = _pop(spark)
    a = sorted((r.g, r.noisy_n) for r in dp_noisy_counts(df, ["g"]).collect())
    b = sorted(
        (r.g, r.noisy_n)
        for r in dp_noisy_counts(df.repartition(11), ["g"]).collect()
    )
    assert a == b


def test_noise_unbiased_and_laplace_scale(spark):
    df = _pop(spark)
    errs = []
    for s in range(200):
        rows = dp_noisy_counts(df, ["g"], epsilon=1.0, salt=f"s{s}").collect()
        errs.extend(r.noisy_n - r.exact_n for r in rows)
    n = len(errs)
    mean = sum(errs) / n
    # Laplace(b=1): mean 0, std sqrt(2); 600 draws -> se ~ 0.06
    assert abs(mean) < 0.25
    std = math.sqrt(sum((e - mean) ** 2 for e in errs) / n)
    assert 1.0 < std < 2.0
    # exact counts are never altered in the exact channel
    assert all(r.exact_n == 1000 for r in dp_noisy_counts(df, ["g"]).collect())
