"""Money-safe aggregation.

The reference keeps monetary amounts as float64 in flight
(reference: utils/data_manager.py:75) and Numeric(10,2) at rest
(reference: db_init.py:39). This engine aggregates money in
DecimalType — exact, associative, therefore order- and
partition-independent, which is what makes results reproducible on a
1000-executor cluster where partial-aggregation order is arbitrary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"
D38 = "decimal(38,0)"


def dsum(col: Column | str, dec: str = DEC) -> Column:
    """Exact (decimal) sum presented as double.

    Order-independent: every input is rounded once to 10 decimal places,
    then summed exactly; the final decimal→double cast is correctly
    rounded. Identical bits regardless of partitioning.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double")


def davg(col: Column | str, dec: str = DEC) -> Column:
    """Exact-sum average: (decimal sum → double) / count(col)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double") / F.count(c)


def cents(col: Column | str, unit: int = 100) -> Column:
    """Exact integer quantization of a non-negative ≤2-dp money double.

    k = floor(x·unit + 0.5) equals the HALF_UP decimal cast exactly
    when x is the nearest-double encoding of a ≤2-dp rational (x·unit
    lands within ~1e-9·|x| of the integer, far from the .5 boundary)
    and 0 ≤ x·unit < 2^53. Null-preserving. Prerequisite for the
    dsum_cents fast path below — only adopt per column with that
    proof (see ml_ols_normal_equations for the template).
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c * unit + F.lit(0.5)).cast("long")


def dsum_cents(col: Column | str, k: int) -> Column:
    """dsum's bit-identical fast path over a cents-scaled long column.

    dsum(x) = CAST(SUM(CAST(x AS DECIMAL(30,10))) AS DOUBLE). When a
    long column c == round(x·k) exactly for every row (cents(), or an
    integer product of cents columns whose decimal(30,10) cast of the
    double twin equals the exact rational — verify per expression, see
    tools/q1_cents_verify.py), then SUM(c) / k is the same rational as
    the decimal sum, so the presented double is the same correctly
    rounded value. SUM accumulates in DECIMAL(38,0) — the compact-long
    fast path until a partial sum exceeds 2^63·1e-18, overflow-safe at
    any SF — and ONE exact decimal division per group restores the
    scale: decimal(30,0)/decimal(9,0) plans as decimal(36,6), exact
    for k ≤ 10^6 because the quotient's scale ≤ 6. No per-row
    BigDecimal work remains, and the shuffle carries longs instead of
    16-byte decimals.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(D38)).cast("decimal(30,0)") / F.lit(k).cast("decimal(9,0)")
    ).cast("double")
