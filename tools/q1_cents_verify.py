"""Per-row proof harness for the q1 long-cents reshape (round 16).

dsum's semantics is `SUM(CAST(x AS DECIMAL(30,10)))` where x is a
double. The reshape replaces each decimal cast+sum with an exact
integer sum of cents-scaled longs. The two are bit-identical iff for
EVERY row the decimal(30,10) cast of the double expression equals the
exact cents-derived rational. That holds by a rounding-error theorem
for raw 2-dp money columns, and within a worst-case bound that is
tight (see q1 docstring) for the disc_price/charge products — so this
harness checks every row of every SF and prints the mismatch count per
expression. All-zero output is the adoption gate.

Usage: python tools/q1_cents_verify.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from finance_etl_spark.io.readers import load_table  # noqa: E402
from finance_etl_spark.session import get_spark  # noqa: E402


def cents(c: str):
    return (F.col(c) * 100 + F.lit(0.5)).cast("long")


def main() -> int:
    spark = get_spark("q1-cents-verify")
    d38 = "decimal(38,0)"
    bad_total = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        li = load_table(spark, f"/root/testdata/{sf}", "lineitem")
        qc, pc, dc, tc = (
            cents("l_quantity"),
            cents("l_extendedprice"),
            cents("l_discount"),
            cents("l_tax"),
        )
        disc_i = pc * (100 - dc)          # scale 4
        charge_i = disc_i * (100 + tc)    # scale 6
        disc_d = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge_d = disc_d * (1 + F.col("l_tax"))

        def as_dec(int_col, k):
            return (
                int_col.cast(d38).cast("decimal(30,0)")
                / F.lit(k).cast("decimal(9,0)")
            ).cast("decimal(30,10)")

        pairs = {
            "qty": (F.col("l_quantity"), as_dec(qc, 100)),
            "price": (F.col("l_extendedprice"), as_dec(pc, 100)),
            "discount": (F.col("l_discount"), as_dec(dc, 100)),
            "disc_price": (disc_d, as_dec(disc_i, 10_000)),
            "charge": (charge_d, as_dec(charge_i, 1_000_000)),
        }
        row = li.select(
            *[
                F.sum(
                    (~(dbl.cast("decimal(30,10)") == dec)).cast("long")
                ).alias(name)
                for name, (dbl, dec) in pairs.items()
            ],
            F.count(F.lit(1)).alias("n_rows"),
        ).collect()[0]
        print(sf, row.asDict(), flush=True)
        bad_total += sum(row[k] for k in pairs)
    print("TOTAL_MISMATCHES", bad_total)
    return 0 if bad_total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
