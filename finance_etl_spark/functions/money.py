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
