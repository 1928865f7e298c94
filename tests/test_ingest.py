"""Ingest-parity semantics on the committed CSV fixtures."""

from pyspark.sql import functions as F

from finance_etl_spark.plans.ingest_parity import CONFIG, FIX_DIR
from finance_etl_spark.ingest import run_ingest


def test_skip_semantics(spark):
    """gamma (no config) and badname.csv (regex miss) never load."""
    out = run_ingest(spark, FIX_DIR, CONFIG)
    stm = out["stm"]
    files = {r.file_name for r in stm.select("file_name").distinct().collect()}
    assert "gamma_current_stm_20250103.csv" not in files
    assert "badname.csv" not in files
    assert files == {
        "alpha_current_stm_20250101.csv",
        "alpha_current_stm_20250102.csv",
        "beta_savings_stm_20250103.csv",
    }


def test_dirty_amount_coerces_to_null_and_sign_flip(spark):
    stm = run_ingest(spark, FIX_DIR, CONFIG)["stm"]
    rows = {r.payee: r["sum"] for r in stm.collect()}
    assert rows["BadAmount"] is None  # 'N/A' -> null (T10)
    assert rows["Grocery"] == -89.10  # D -> negative (T9+T11)
    assert rows["Salary"] == 1500.00  # C -> positive
    assert rows["Coffee"] == -99.95


def test_account_lookup_missing_key_null(spark):
    stm = run_ingest(spark, FIX_DIR, CONFIG)["stm"]
    by_acc = {r.acc_number: r.acc_name for r in stm.collect()}
    assert by_acc["EE123456789012345678"] == "Main account"
    assert by_acc["EE999999999999999999"] is None  # T5 missing -> null


def test_duplicate_rows_share_surrogate_key_across_files(spark):
    stm = run_ingest(spark, FIX_DIR, CONFIG)["stm"]
    acme = stm.filter(F.col("payee") == "Acme OU").select("surrogate_key").collect()
    assert len(acme) == 2 and acme[0].surrogate_key == acme[1].surrogate_key


def test_processed_at_is_current_utc(spark):
    import datetime as dt

    stm = run_ingest(spark, FIX_DIR, CONFIG)["stm"]
    t = stm.select(F.max("processed_at").alias("t")).collect()[0].t
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    assert abs((now - t).total_seconds()) < 600


def test_per_bank_date_formats(spark):
    stm = run_ingest(spark, FIX_DIR, CONFIG)["stm"]
    by_payee = {r.payee: (str(r.dt), r.ym, r.year) for r in stm.collect()}
    assert by_payee["Acme OU"] == ("2025-01-03 00:00:00", "2025-01", 2025)
    assert by_payee["Coffee"] == ("2025-01-03 00:00:00", "2025-01", 2025)


def test_permissive_quarantine_split(spark):
    """Malformed lines (wrong field count) are captured verbatim, clean
    rows flow through — no whole-file discard (reference drops the
    entire file on any error)."""
    from finance_etl_spark.ingest import (
        load_config,
        quarantine_split,
        read_group_permissive,
    )
    from finance_etl_spark.plans.ingest_parity import CONFIG_PATH, FIX_CORRUPT_DIR

    config = load_config(CONFIG_PATH)
    cfg = config.group("stm", "alpha")
    df = read_group_permissive(
        spark, FIX_CORRUPT_DIR, cfg, config.file_pattern
    ).cache()
    good, bad = quarantine_split(df)
    assert good.count() == 3
    assert bad.count() == 2
    # quarantined lines keep the raw text for audit/replay
    raws = [r._corrupt_record for r in bad.collect()]
    assert all(";" in raw for raw in raws)
    # structurally-fine rows with unparseable values are NOT quarantined;
    # they coerce to null later (T10), preserving reference semantics
    assert good.filter(good["sum"] == "bad_amount").count() == 1


def test_zorder_layout_skips_files_on_both_dimensions(spark, sf_dir):
    """The z-ordered layout must give footer min/max stats that prune
    a majority of files for a small rectangle on (user_bucket,
    hour_of_day) — and, unlike a single-column sort, on EACH dimension
    alone as well."""
    import os

    import pyarrow.parquet as pq

    from finance_etl_spark.plans.ingest_parity import write_zorder_events

    out = write_zorder_events(spark, sf_dir)
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) >= 8
    stats = []
    for p in files:
        md = pq.ParquetFile(p).metadata
        cols = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        rg = md.row_group(0)
        ub = rg.column(cols["user_bucket"]).statistics
        hb = rg.column(cols["hour_of_day"]).statistics
        stats.append(((ub.min, ub.max), (hb.min, hb.max)))

    def overlaps(lo, hi, mn, mx):
        return not (mx < lo or mn > hi)

    rect = [
        s
        for s in stats
        if overlaps(8, 15, *s[0]) and overlaps(8, 11, *s[1])
    ]
    assert len(rect) <= len(files) // 2, (
        f"rectangle query overlaps {len(rect)}/{len(files)} files — "
        "layout is not clustering both dimensions"
    )
