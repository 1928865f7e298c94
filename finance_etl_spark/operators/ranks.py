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


def global_rank_running_sums(
    df: DataFrame,
    order_by: list[Column],
    sum_cols: list[str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Global ``row_number`` plus inclusive running sums over a total
    order, without funnelling the input through one window task.

    Same two-phase shape as :func:`global_row_number` — range
    repartition, per-partition windows keyed on the physical partition
    id, then per-partition offsets — extended to carry running sums:
    the offsets collected per partition are (row count, Σ sum_col …),
    O(numPartitions) metadata, never row data. Equal-key runs (e.g.
    the freq=1 hapax mass of a Zipfian vocabulary) are split across
    partitions by the range sampler as long as ``order_by`` ends in a
    unique tiebreaker, so no partition is skewed by a heavy key.

    Returns ``(df + rank_col + cum_<c> columns, grand_totals)`` where
    ``grand_totals[c]`` is the full-table sum of ``c`` (free — it is
    the last partition's offset plus its local total).
    """
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    # localCheckpoint pins the sampled range layout — see the
    # global_row_number comment for the AQE re-sampling hazard.
    with_pid = parts.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint()

    aggs = (
        with_pid.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        )
        .collect()
    )
    cnt_items: list[Column] = []
    sum_items: dict[str, list[Column]] = {c: [] for c in sum_cols}
    acc_cnt = 0
    acc_sum = {c: 0 for c in sum_cols}
    for row in sorted(aggs, key=lambda r: r["__pid"]):
        cnt_items += [F.lit(row["__pid"]), F.lit(acc_cnt)]
        acc_cnt += row["__cnt"]
        for c in sum_cols:
            sum_items[c] += [F.lit(row["__pid"]), F.lit(acc_sum[c])]
            acc_sum[c] += row[f"__s_{c}"] or 0
    cnt_map = F.create_map(*cnt_items) if cnt_items else F.create_map()
    sum_maps = {
        c: (F.create_map(*v) if v else F.create_map())
        for c, v in sum_items.items()
    }

    w = Window.partitionBy("__pid").orderBy(*order_by)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    out = with_pid.withColumn(
        rank_col, (F.row_number().over(w) + cnt_map[F.col("__pid")]).cast("long")
    )
    for c in sum_cols:
        # coalesce: a partition whose prefix is all-null would otherwise
        # null out `null + offset`, diverging from single-window
        # semantics where earlier partitions' non-null mass keeps the
        # cumsum non-null. (Residual edge: a *globally* all-null prefix
        # yields 0 here vs null in a single window — acceptable for a
        # running-sum utility; callers so far feed non-null counts.)
        out = out.withColumn(
            f"cum_{c}",
            F.coalesce(F.sum(c).over(w_run), F.lit(0))
            + sum_maps[c][F.col("__pid")],
        )
    return out.drop("__pid"), acc_sum
