"""Python DataSource (Spark 4 custom-source API): deterministic
synthetic tick stream.

The reference's only source is a directory of CSVs read through pandas
(reference: utils/data_manager.py:34-44, config/settings.py:33-45);
its "source API" is therefore not extensible. This engine demonstrates
the Spark-native extension point instead: a `pyspark.sql.datasource.
DataSource` that executors read PARTITION-PARALLEL — `partitions()`
declares the split set on the driver, `read(partition)` runs on the
executor that owns the split, so a 1000-executor cluster pulls 1000
splits concurrently with zero driver involvement per row.

Rows are a pure function of `tick_id` (Knuth multiplicative hash mod a
price band), so the source is exactly reproducible: the DuckDB oracle
rebuilds the identical rows from `range()`, and the differential gate
hash-compares a custom source against SQL — no files involved.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EPOCH = dt.datetime(2024, 1, 1)
KNUTH = 2654435761  # 2^32 * golden-ratio conjugate, classic mult-hash


def tick_price(tick_id: int) -> float:
    """Deterministic pseudo-price: integer hash → cents offset in
    [-10.00, +10.00] around 100.00. Integer ops + one exact-by-IEEE
    double division; no RNG state, no libm."""
    cents = (tick_id * KNUTH) % 2001 - 1000
    return 100.0 + cents / 100.0


class TickDataSource(DataSource):
    """`spark.read.format("ticks").option("parts", 8).option(
    "rows_per_part", 1000)` — a splittable, deterministic source."""

    @classmethod
    def name(cls) -> str:
        return "ticks"

    def schema(self) -> str:
        return "tick_id bigint, ts timestamp_ntz, px double"

    def reader(self, schema) -> "TickReader":
        return TickReader(
            int(self.options.get("parts", 8)),
            int(self.options.get("rows_per_part", 1000)),
        )

    def simpleStreamReader(self, schema) -> "TickStreamReader":
        return TickStreamReader(
            int(self.options.get("batch_rows", 100)),
            int(self.options.get("max_rows", 500)),
        )


class TickReader(DataSourceReader):
    def __init__(self, parts: int, rows_per_part: int):
        self.parts = parts
        self.rows_per_part = rows_per_part

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition: InputPartition):
        base = partition.value * self.rows_per_part
        for i in range(self.rows_per_part):
            tick_id = base + i
            yield (
                tick_id,
                EPOCH + dt.timedelta(seconds=tick_id),
                tick_price(tick_id),
            )


class TickStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the tick source (Spark 4
    SimpleDataSourceStreamReader): offsets are plain tick counters, so
    the engine's offset log gives exactly-once replay for free —
    ``readBetweenOffsets`` regenerates any [start, end) slice
    bit-identically (rows are a pure function of tick_id). ``read``
    serves at most ``batch_rows`` per microbatch and stops advancing at
    ``max_rows``; an unbounded deployment just never hits the cap."""

    def __init__(self, batch_rows: int, max_rows: int):
        self.batch_rows = batch_rows
        self.max_rows = max_rows

    def initialOffset(self):
        return {"tick": 0}

    def _rows(self, start: int, end: int):
        # a concrete list, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator when planning partitions, which a
        # generator cannot survive
        return iter(
            [
                (
                    tick_id,
                    EPOCH + dt.timedelta(seconds=tick_id),
                    tick_price(tick_id),
                )
                for tick_id in range(start, end)
            ]
        )

    def read(self, start):
        s = start["tick"]
        e = min(s + self.batch_rows, self.max_rows)
        return (self._rows(s, e), {"tick": e})

    def readBetweenOffsets(self, start, end):
        return self._rows(start["tick"], end["tick"])
