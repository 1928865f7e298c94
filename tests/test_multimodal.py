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


def _phash_of(spark, texts):
    from finance_etl_spark.plans.multimodal import phash64
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return {r.doc_id: r.phash for r in phash64(df).collect()}


def test_phash_locality(spark):
    base = " ".join(f"token{i} market price close volume" for i in range(40))
    near = base.replace("token7", "token7x").replace("token21", "tokenXX")
    far = " ".join(f"zzz{i} qqq www eee rrr" for i in range(40))
    h = _phash_of(spark, [base, near, far])
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(h[0], h[1]) < ham(h[0], h[2])
    assert ham(h[0], h[1]) <= 6  # light perturbation stays in MIH range


def test_phash_near_dup_mih_recall(spark, tmp_path):
    """Every pair within Hamming<=6 MUST be found (pigeonhole over the
    8x8-bit bands) — brute-force over the corpus is the oracle."""
    import itertools

    from finance_etl_spark import plans
    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.plans.multimodal import _with_payload, phash64

    sf = "/root/testdata/sf0.001"
    out = plans.get("mm_phash_near_dup").build(spark, sf)
    got = {(r.id_a, r.id_b): r.hamming for r in out.collect()}
    d = load_table(spark, sf, "documents")
    hashes = {r.doc_id: r.phash for r in phash64(_with_payload(d)).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    expect = {
        (a, b): ham(ha, hb)
        for (a, ha), (b, hb) in itertools.combinations(sorted(hashes.items()), 2)
        if ham(ha, hb) <= 6
    }
    assert got == expect


def test_phash_wide_path_identical_pairs(spark, sf_dir, monkeypatch):
    """The 4x16-bit multiprobe index (large-corpus path) must produce
    exactly the pair set of the 8x8-bit exact-band index: both
    candidate schemes have full recall at dist<=6 (pigeonhole: 6<=8-2
    exact bands / floor(6/4)=1-bit probes) and both verify exactly."""
    import finance_etl_spark.plans.multimodal as mm
    from finance_etl_spark import plans

    narrow = sorted(
        map(tuple, plans.get("mm_phash_near_dup").build(spark, sf_dir).collect())
    )
    monkeypatch.setattr(mm, "_PHASH_WIDE_MIN_DOCS", 0)
    wide = sorted(
        map(tuple, plans.get("mm_phash_near_dup").build(spark, sf_dir).collect())
    )
    assert narrow == wide
    assert len(narrow) > 0


def test_image_dedup_clusters_valid(spark, sf_dir):
    """Cluster output must be consistent with the pair relation: the
    survivor is the minimal member, counts cover every paired doc,
    and max_pair_hamming never exceeds the pairwise threshold."""
    from finance_etl_spark import plans

    pairs = plans.get("mm_phash_near_dup").build(spark, sf_dir).collect()
    clusters = plans.get("mm_image_dedup_clusters").build(spark, sf_dir).collect()
    # union-find over the pairs as an independent reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for p in pairs:
        union(p.id_a, p.id_b)
    ref = {}
    for node in list(parent):
        ref.setdefault(find(node), set()).add(node)
    got = {c.survivor_id: c for c in clusters}
    assert set(got) == set(ref)
    for root, members in ref.items():
        assert got[root].n_members == len(members)
        assert root == min(members)
        assert 0 <= got[root].max_pair_hamming <= 6
