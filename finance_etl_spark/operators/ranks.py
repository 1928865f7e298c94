"""Scale-safe global ranking.

``Window.orderBy(...)`` with no partitioning funnels the entire
dataset through one task — fine for a 25-row dimension, fatal at SF
100×. The classic distributed formulation is two-pass:

1. range-repartition on the sort key (globally ordered partitions),
2. local ``row_number`` per partition,
3. add per-partition offsets computed from partition sizes.

The only driver-side data is the per-partition row counts —
O(numPartitions) metadata, not O(rows) — so this preserves the
engine's no-collect discipline for row data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally ordered 1-based row numbers without a single-task sort.

    ``order_by`` must be a total order (include a unique tiebreaker) for
    the numbering to be deterministic.
    """
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    # localCheckpoint PINS the ranged layout: repartitionByRange picks
    # its boundaries by SAMPLING the upstream partitions per job, and
    # AQE can lay the upstream out differently between the size-count
    # job and the final job — offsets computed against one sampling
    # then applied to another silently corrupt the global numbering
    # (observed at sf0.1: uneven decile sizes). One materialization of
    # the rank INPUT (an entity-level aggregate, not the raw corpus)
    # makes both passes read the identical layout.
    with_pid = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()

    # Pass 1: partition sizes — O(numPartitions) rows to the driver.
    sizes = with_pid.groupBy("__pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(sizes, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]

    items: list[Column] = []
    for pid, off in offsets.items():
        items.append(F.lit(pid))
        items.append(F.lit(off))
    offmap = F.create_map(*items) if items else F.create_map()

    # Pass 2: local row_number + offset. The window partitions by the
    # physical partition id, so no data moves again.
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return with_pid.withColumn(
        out_col, (F.row_number().over(w) + offmap[F.col("__pid")]).cast("long")
    ).drop("__pid")
