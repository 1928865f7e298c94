"""Table-format features a 100 TB lakehouse needs beyond raw parquet
directories: file-statistics data skipping and manifest-based snapshot
versioning (time travel) with copy-on-write deletes.

These are the mechanisms Delta/Iceberg/Hudi build on, re-expressed with
parquet + footer statistics + a tiny manifest relation — no table-format
dependency. The scale contract:

- The STATS MANIFEST is O(files), not O(rows): one row per data file
  with per-column min/max pulled from parquet footers. Planning a
  range query = filtering the manifest (kilobytes) before touching any
  data file. At 100 TB with 100k files the manifest is still a
  single-task relation.
- SNAPSHOTS are immutable file lists. Appends add files to a new
  manifest; deletes REWRITE ONLY the files whose stats overlap the
  delete predicate (copy-on-write) and carry every untouched file
  forward by reference. Time travel = reading an old manifest.

Reference parity note: the reference has no table format at all — it
re-reads every CSV on every run (utils/data_manager.py:34-44) and its
only "versioning" is the destructive drop+create in db_init.py:45-96.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_spark.functions.money import dsum
from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.registry import o_dsum, register


def _norm_stat(v):
    """Footer statistics for date32 columns surface as datetime.datetime
    in pyarrow metadata — normalize to date so predicate bounds compare."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v.date()
    return v


def file_stats_manifest(data_dir: str, stat_cols: list[str]) -> list[dict]:
    """One row per parquet file: path, row count, and min/max for each
    of ``stat_cols``, read from footer metadata only (no data pages
    touched). Runs driver-side over the file listing — O(files) footer
    reads, the same cost profile as Delta's checkpoint read. At
    cluster scale the listing itself would be distributed
    (sc.parallelize over paths); footprint per file is identical."""
    import pyarrow.parquet as pq

    rows = []
    for path in sorted(glob.glob(os.path.join(data_dir, "*.parquet"))):
        md = pq.ParquetFile(path).metadata
        stats: dict = {"path": path, "n_rows": md.num_rows}
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in stat_cols:
            idx = name_to_idx[col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(idx).statistics
                if s is None or not s.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(s.min)
                maxs.append(s.max)
            stats[f"min_{col}"] = _norm_stat(min(mins)) if mins else None
            stats[f"max_{col}"] = _norm_stat(max(maxs)) if maxs else None
        rows.append(stats)
    return rows


def prune_files(manifest: list[dict], col: str, lo, hi) -> list[str]:
    """Files whose [min,max] interval for ``col`` overlaps [lo, hi].
    Files with missing stats are conservatively kept."""
    keep = []
    for m in manifest:
        mn, mx = m.get(f"min_{col}"), m.get(f"max_{col}")
        if mn is None or mx is None or (mx >= lo and mn <= hi):
            keep.append(m["path"])
    return keep


@register(
    "sink_file_stats_skipping",
    tags=("sink", "tableformat", "scale"),
    oracle=f"""
        SELECT
            l_returnflag,
            CAST(COUNT(*) AS BIGINT) AS n_items,
            {o_dsum('l_extendedprice')} AS revenue
        FROM lineitem
        WHERE l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-06-30'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def sink_file_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max file-statistics data skipping: lineitem is laid out
    range-clustered on l_shipdate (repartitionByRange + local sort →
    tight, non-overlapping per-file min/max), a footer-stats manifest
    is built, and a one-month query plans by pruning the manifest
    FIRST — only overlapping files are handed to the scan. The pruning
    ratio is asserted in tests/test_tableformat.py (a one-month probe
    must skip the majority of a 7-year table's files); the query
    result itself is oracle-checked here."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_shipdate"
    )
    out = tempfile.mkdtemp(prefix="stats_skip_")
    (
        li.repartitionByRange(16, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    manifest = file_stats_manifest(out, ["l_shipdate"])
    import datetime as dt

    lo, hi = dt.date(1995, 6, 1), dt.date(1995, 6, 30)
    files = prune_files(manifest, "l_shipdate", lo, hi)
    picked = spark.read.parquet(*files)
    return (
        picked.filter(F.col("l_shipdate").between(F.lit(lo), F.lit(hi)))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Snapshot versioning / time travel


def _write_snapshot(root: str, version: int, files: list[str]) -> None:
    with open(os.path.join(root, f"v{version}.json"), "w") as f:
        json.dump({"version": version, "files": sorted(files)}, f)


def read_snapshot(spark: SparkSession, root: str, version: int) -> DataFrame:
    """Time-travel read: the manifest IS the table at that version —
    no directory listing, no eventual-consistency window, identical to
    Delta's log-defined snapshot semantics."""
    with open(os.path.join(root, f"v{version}.json")) as f:
        files = json.load(f)["files"]
    return spark.read.parquet(*files)


def _data_files(d: str) -> list[str]:
    return glob.glob(os.path.join(d, "*.parquet"))


def versioned_append(
    spark: SparkSession, root: str, version: int, df: DataFrame, n_files: int = 4
) -> int:
    """Append = write ONLY the new rows as new files, then publish a
    manifest carrying every previous file forward by reference. No
    existing byte is rewritten — O(increment) I/O, like a Delta
    append commit."""
    add_dir = tempfile.mkdtemp(prefix=f"snap_add_v{version + 1}_", dir=root)
    df.repartition(n_files).write.mode("overwrite").parquet(add_dir)
    prev = []
    if version > 0:
        with open(os.path.join(root, f"v{version}.json")) as f:
            prev = json.load(f)["files"]
    _write_snapshot(root, version + 1, prev + _data_files(add_dir))
    return version + 1


def versioned_delete(
    spark: SparkSession,
    root: str,
    version: int,
    predicate,
    stat_col: str,
    stat_range: tuple,
) -> int:
    """Copy-on-write delete: footer stats decide which files CAN
    contain matching rows; only those are rewritten (minus the deleted
    rows), every other file is carried forward untouched. I/O is
    O(files overlapping the predicate), not O(table) — the reason
    copy-on-write stays viable at 100 TB when deletes are localized
    (GDPR erasure, late-partition corrections)."""
    with open(os.path.join(root, f"v{version}.json")) as f:
        prev = json.load(f)["files"]
    prev_set = set(prev)
    manifest = []
    for d in sorted({os.path.dirname(p) for p in prev}):
        manifest.extend(
            m for m in file_stats_manifest(d, [stat_col]) if m["path"] in prev_set
        )
    lo, hi = stat_range
    touched = set(prune_files(manifest, stat_col, lo, hi))
    carried = [p for p in prev if p not in touched]
    new_files: list[str] = []
    if touched:
        rw_dir = tempfile.mkdtemp(prefix=f"snap_rw_v{version + 1}_", dir=root)
        kept = spark.read.parquet(*sorted(touched)).filter(~predicate)
        kept.write.mode("overwrite").parquet(rw_dir)
        new_files = _data_files(rw_dir)
    _write_snapshot(root, version + 1, carried + new_files)
    return version + 1


@register(
    "sink_snapshot_time_travel",
    tags=("sink", "tableformat", "scale"),
    oracle=f"""
        WITH v1 AS (
            SELECT * FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1995
        ),
        v2 AS (
            SELECT * FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1996
        ),
        v3 AS (
            SELECT * FROM v2 WHERE NOT (o_orderstatus = 'F'
                AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31')
        )
        SELECT * FROM (
            SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   {o_dsum('o_totalprice')} AS total FROM v1
            UNION ALL
            SELECT 2, CAST(COUNT(*) AS BIGINT), {o_dsum('o_totalprice')} FROM v2
            UNION ALL
            SELECT 3, CAST(COUNT(*) AS BIGINT), {o_dsum('o_totalprice')} FROM v3
        ) ORDER BY version
    """,
)
def sink_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-based snapshot versioning: v1 = initial load (orders
    ≤1995), v2 = append of 1996 (new files only; v1 bytes untouched),
    v3 = copy-on-write delete of a Q1-1995 correction (only files
    whose o_orderdate stats overlap Q1-1995 are rewritten). All three
    versions are then read back BY MANIFEST — time travel — and
    aggregated; the oracle reconstructs each version relationally.
    tests/test_tableformat.py additionally asserts the physical
    contracts: append adds files without rewriting, delete rewrites
    only overlapping files, and old versions are bit-stable."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    root = tempfile.mkdtemp(prefix="snap_root_")
    yr = F.year("o_orderdate")
    v1 = versioned_append(spark, root, 0, o.filter(yr <= 1995))
    v2 = versioned_append(spark, root, v1, o.filter(yr == 1996))
    import datetime as dt

    pred = (F.col("o_orderstatus") == "F") & F.col("o_orderdate").between(
        F.lit(dt.date(1995, 1, 1)), F.lit(dt.date(1995, 3, 31))
    )
    v3 = versioned_delete(
        spark,
        root,
        v2,
        pred,
        "o_orderdate",
        (dt.date(1995, 1, 1), dt.date(1995, 3, 31)),
    )
    snaps = []
    for v in (v1, v2, v3):
        snaps.append(
            read_snapshot(spark, root, v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                dsum("o_totalprice").alias("total"),
            )
        )
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out.orderBy("version")


@register(
    "sink_manifest_count_pushdown",
    tags=("sink", "tableformat", "scale"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate BETWEEN DATE '1994-01-01' AND DATE '1996-12-31'
    """,
)
def sink_manifest_count_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only COUNT answering: on a range-clustered table a
    date-range COUNT(*) decomposes into (a) files fully CONTAINED in
    the predicate interval — their row counts come straight from the
    manifest, zero data I/O — plus (b) the at-most-two boundary files,
    which alone are scanned with the residual filter. For a 3-year
    predicate over a 7-year table this answers ~43% of the table from
    kilobytes of footer metadata; the oracle recomputes the count from
    a full scan. The same decomposition serves MIN/MAX and any
    per-file-aggregable statistic."""
    import datetime as dt

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    out = tempfile.mkdtemp(prefix="meta_count_")
    (
        li.repartitionByRange(16, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    manifest = file_stats_manifest(out, ["l_shipdate"])
    lo, hi = dt.date(1994, 1, 1), dt.date(1996, 12, 31)
    contained = [
        m for m in manifest
        if m["min_l_shipdate"] is not None
        and m["min_l_shipdate"] >= lo
        and m["max_l_shipdate"] <= hi
    ]
    contained_paths = {m["path"] for m in contained}
    meta_rows = sum(m["n_rows"] for m in contained)
    boundary = [
        p for p in prune_files(manifest, "l_shipdate", lo, hi)
        if p not in contained_paths
    ]
    if boundary:
        scanned = spark.read.parquet(*boundary).filter(
            F.col("l_shipdate").between(F.lit(lo), F.lit(hi))
        )
        return scanned.agg(
            (F.count(F.lit(1)) + F.lit(meta_rows)).alias("n_rows")
        )
    return spark.range(1).select(F.lit(meta_rows).cast("long").alias("n_rows"))


def versioned_replace(
    spark: SparkSession, root: str, version: int, df: DataFrame, n_files: int = 2
) -> int:
    """Replace commit: publish a manifest of ONLY the newly-written
    files (full-snapshot semantics — the CDC-compaction commit shape
    for dimension-sized tables). Old versions keep referencing their
    own files, so time travel across replaces still works."""
    rw_dir = tempfile.mkdtemp(prefix=f"snap_repl_v{version + 1}_", dir=root)
    df.repartition(n_files).write.mode("overwrite").parquet(rw_dir)
    _write_snapshot(root, version + 1, _data_files(rw_dir))
    return version + 1
