"""Join operators Spark SQL lacks natively, composed from built-ins.

asof_join: the finance staple ("price as of trade time"). Batch Spark
has no ASOF JOIN, so it is composed as union + ordered window with
``last(..., ignoreNulls)`` — one shuffle on (keys, ts), no Python in
the row path, and state per group is O(1), so it scales to arbitrarily
large fact tables (unlike a naive range self-join, which is quadratic
per key, or per-group ``pd.merge_asof``, which materializes a group in
memory).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    with ``right.ts <= left.ts`` and equal join keys (backward as-of,
    inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).

    Implementation: tag both sides, union on (keys, ts), and propagate
    the right side's values forward with ``last(ignorenulls=True)`` over
    an ordered window. Right rows sort before left rows at equal ts so
    ties are inclusive. Rows never pair across keys because the window
    is partitioned by the join keys.

    ``tolerance``: optional max staleness (e.g. ``'7 days'``) — matches
    older than ``left_ts - tolerance`` are nulled out.

    If multiple right rows share (keys, ts), callers should pre-reduce
    the right side (e.g. ``max_by``) to make the result deterministic.
    """
    keys = [on] if isinstance(on, str) else list(on)

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        *[F.col(v) for v in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l_cols = [F.col(c).alias(f"__l_{c}") for c in left.columns]
    lft = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in value_cols],
        *l_cols,
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col(_SIDE).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled_vals = [F.last(v, ignorenulls=True).over(w).alias(v) for v in value_cols]
    filled_ts = F.last(F.when(F.col(_SIDE) == 1, F.col("__ts")), ignorenulls=True).over(w)

    out = (
        r.unionByName(lft)
        .select(
            F.col("__ts"),
            F.col(_SIDE),
            filled_ts.alias("__match_ts"),
            *filled_vals,
            *[F.col(f"__l_{c}") for c in left.columns],
        )
        .filter(F.col(_SIDE) == 0)
    )

    vals: list[Column] = []
    for v in value_cols:
        c = F.col(v)
        if tolerance is not None:
            c = F.when(
                F.col("__match_ts")
                >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}"),
                c,
            )
        vals.append(c.alias(v))

    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *vals,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Equi-key join constrained to a time interval:
    ``left_ts - lower <= right_ts <= left_ts + upper``.

    With equality keys present this is a plain shuffled equi-join with a
    residual range predicate — linear, not quadratic, in input size as
    long as per-key fan-out within the interval is bounded.
    """
    keys = [on] if isinstance(on, str) else list(on)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_s: int,
) -> DataFrame:
    """Key-LESS time-proximity join: all (left, right) pairs with
    ``|left_ts - right_ts| <= tolerance_s`` — WITHOUT the
    BroadcastNestedLoopJoin that a bare range predicate plans to.

    Timestamps bucket into tolerance-sized bins; a pair within
    tolerance is always in the same or an adjacent bin, so exploding
    {b-1, b, b+1} on the left side turns the range predicate into an
    EQUI-join on the bin (hash-partitionable, linear shuffle) with the
    exact |Δt| filter as a residual. Cost follows actual temporal
    collisions (pairs per bin), never |L|×|R|. Integer-microsecond
    epoch arithmetic keeps the bin assignment and the residual exact.
    """
    tol_us = int(tolerance_s) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = F.floor(l_us / tol_us)
    rb = F.floor(r_us / tol_us)
    l_expl = left.withColumn(
        "__bin", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_b = right.withColumn("__bin", rb)
    dt = F.abs(
        F.unix_micros(F.col(left_ts).cast("timestamp"))
        - F.unix_micros(F.col(right_ts).cast("timestamp"))
    )
    return (
        l_expl.join(r_b, "__bin")
        .filter(dt <= F.lit(tol_us))
        .drop("__bin")
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str,
) -> DataFrame:
    """Nearest-in-time as-of join, EITHER direction: each left row
    attaches the right row minimizing |left_ts - right_ts| within
    ``tolerance``; equal distances break toward the EARLIER right row
    (the backward match). Returns left.* + ``__match_ts`` +
    ``value_cols`` (nulls when nothing lies inside the window).

    Same execution shape as ``asof_join`` — tag, union, ONE
    (keys, ts)-ordered window pass computing the backward last AND
    forward first simultaneously — so state per group stays O(1) and
    there is exactly one shuffle. A naive candidates-then-argmin
    range join is quadratic per key; this is linear. Callers
    pre-reduce right to one row per (keys, ts) for determinism.
    """
    keys = [on] if isinstance(on, str) else list(on)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        *[F.col(v) for v in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    lft = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # backward window: right rows at equal ts sort FIRST (inclusive tie);
    # forward window: strictly-later right rows only
    wb = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col(_SIDE).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col(_SIDE).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_r = F.col(_SIDE) == 1
    prev_ts = F.last(F.when(is_r, F.col("__ts")), ignorenulls=True).over(wb)
    next_ts = F.first(F.when(is_r, F.col("__ts")), ignorenulls=True).over(wf)
    prevs = {
        v: F.last(F.when(is_r, F.col(v)), ignorenulls=True).over(wb)
        for v in value_cols
    }
    nexts = {
        v: F.first(F.when(is_r, F.col(v)), ignorenulls=True).over(wf)
        for v in value_cols
    }
    u = r.unionByName(lft).select(
        F.col("__ts"),
        F.col(_SIDE),
        prev_ts.alias("__prev_ts"),
        next_ts.alias("__next_ts"),
        *[prevs[v].alias(f"__prev_{v}") for v in value_cols],
        *[nexts[v].alias(f"__next_{v}") for v in value_cols],
        *[F.col(f"__l_{c}") for c in left.columns],
    ).filter(F.col(_SIDE) == 0)

    tol = F.expr(f"INTERVAL {tolerance}")
    d_prev = F.when(
        F.col("__prev_ts").isNotNull() & (F.col("__prev_ts") >= F.col("__ts") - tol),
        F.unix_micros("__ts") - F.unix_micros("__prev_ts"),
    )
    d_next = F.when(
        F.col("__next_ts").isNotNull() & (F.col("__next_ts") <= F.col("__ts") + tol),
        F.unix_micros("__next_ts") - F.unix_micros("__ts"),
    )
    # earlier (backward) wins ties: strict < for the forward candidate
    use_next = d_next.isNotNull() & (d_prev.isNull() | (d_next < d_prev))
    use_prev = d_prev.isNotNull() & ~F.coalesce(use_next, F.lit(False))
    match_ts = (
        F.when(use_next, F.col("__next_ts"))
        .when(use_prev, F.col("__prev_ts"))
    )
    vals = [
        F.when(use_next, F.col(f"__next_{v}"))
        .when(use_prev, F.col(f"__prev_{v}"))
        .alias(v)
        for v in value_cols
    ]
    return u.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        match_ts.alias("__match_ts"),
        *vals,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of: each left row takes ``value_cols`` from the
    EARLIEST right row with ``right.ts >= left.ts`` (inclusive) on
    equal keys — the settlement-side mirror of ``asof_join`` (next
    fixing after the trade, next price print after the order). Same
    union+window shape, with the window running from the current row
    to unbounded FOLLOWING and right rows ordering after left at equal
    timestamps so ties stay inclusive. ``tolerance`` nulls matches
    further than ``left_ts + tolerance`` into the future."""
    keys = [on] if isinstance(on, str) else list(on)

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        *[F.col(v) for v in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    lft = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), F.col(_SIDE).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled_vals = [F.first(v, ignorenulls=True).over(w).alias(v) for v in value_cols]
    filled_ts = F.first(
        F.when(F.col(_SIDE) == 1, F.col("__ts")), ignorenulls=True
    ).over(w)

    out = (
        r.unionByName(lft)
        .select(
            F.col("__ts"),
            F.col(_SIDE),
            filled_ts.alias("__match_ts"),
            *filled_vals,
            *[F.col(f"__l_{c}") for c in left.columns],
        )
        .filter(F.col(_SIDE) == 0)
    )

    vals: list[Column] = []
    for v in value_cols:
        c = F.col(v)
        if tolerance is not None:
            c = F.when(
                F.col("__match_ts")
                <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}"),
                c,
            )
        vals.append(c.alias(v))

    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *vals,
    )
