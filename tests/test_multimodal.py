"""Multimodal plumbing: schema and batch shape of the Arrow-batched
decode stub, and binary-column metadata invariants."""

from pyspark.sql import functions as F

from finance_etl_spark import plans


def test_decode_features_schema_and_rows(spark, sf_dir):
    out = plans.get("mm_decode_features").build(spark, sf_dir)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "n_channels", "mean_byte",
    ]
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.n_bytes == (r.width - 1) + (r.height - 1) * 64
        assert 0.0 <= r.mean_byte <= 255.0
        assert r.n_channels in (1, 2, 3)


def test_binary_metadata_matches_text_bytes(spark, sf_dir):
    from finance_etl_spark.io.readers import load_table

    meta = plans.get("mm_binary_metadata").build(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    j = meta.join(d, "doc_id")
    # fixture text is ascii: byte length == char length
    assert j.filter(F.col("n_bytes") != F.col("n_chars")).count() == 0


def test_frame_sample_counts(spark, sf_dir):
    out = plans.get("mm_frame_sample").build(spark, sf_dir)
    per_doc = out.groupBy("doc_id", "n_frames").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    bad = per_doc.filter(
        F.col("n_sampled") != F.ceil(F.col("n_frames") / 10)
    )
    assert bad.count() == 0
