"""Recall / quality assertions for the approximate (LSH) paths against
their exact counterparts at small SF, plus sketch accuracy bounds."""

from pyspark.sql import functions as F

from finance_etl_spark import plans


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """Every exact-Jaccard>=0.5 pair should be found by MinHash-LSH
    (P[miss] = (1-s^4)^16 <= 1.6% at s=0.5, ~0 at s>=0.8); and every
    LSH-reported pair is exact-verified so precision is 1.0 by
    construction."""
    exact = _pairs(plans.get("text_ngram_jaccard_pairs").build(spark, sf_dir))
    lsh = _pairs(plans.get("text_minhash_lsh_pairs").build(spark, sf_dir))
    assert lsh <= exact or not exact  # precision (both verified >= 0.5)
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.9
    else:
        assert lsh == set()


def test_vector_ann_recall_vs_brute_force(spark, sf_dir):
    """LSH top-5 must recover most of the brute-force top-5."""
    exact = plans.get("vec_cosine_topk").build(spark, sf_dir)
    approx = plans.get("vec_ann_lsh_topk").build(spark, sf_dir)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.5  # 16 hyperplanes, 2 bands: modest recall


def test_vector_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with 8-of-16 probed lists must recover most of the exact
    top-5 (nearest neighbors overwhelmingly share the query's coarse
    cell or an adjacent probed one)."""
    exact = plans.get("vec_cosine_topk").build(spark, sf_dir)
    approx = plans.get("vec_ann_ivf_topk").build(spark, sf_dir)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.5


def test_approx_count_distinct_within_bound(spark, sf_dir):
    out = plans.get("agg_approx_distinct").build(spark, sf_dir).collect()
    for r in out:
        assert abs(r.approx_orders - r.exact_orders) <= max(
            3, 0.05 * r.exact_orders
        )


def test_simhash_near_dup_small_hamming(spark, sf_dir):
    """Near-dup docs (exact Jaccard >= 0.5) must sit closer in SimHash
    space than the corpus median."""
    sim = plans.get("text_simhash").build(spark, sf_dir)
    pairs = plans.get("text_ngram_jaccard_pairs").build(spark, sf_dir)
    if pairs.isEmpty():
        return
    a = sim.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha")
    )
    b = sim.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    d = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("ham"))
        .collect()
    )
    assert sum(r.ham for r in d) / len(d) <= 8  # of 32 bits


def test_winnow_fingerprints_overlap_for_near_dups(spark, sf_dir):
    """Documents with exact shingle-Jaccard >= 0.5 must share at least
    one winnowing fingerprint — the property that makes the fingerprint
    inverted index a usable candidate generator."""
    fps = plans.get("text_winnow_fingerprint").build(spark, sf_dir)
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fps.groupBy("doc_id").agg(
            F.collect_set("fp").alias("fps")
        ).collect()
    }
    pairs = plans.get("text_ngram_jaccard_pairs").build(spark, sf_dir).collect()
    for p in pairs:
        a, b = by_doc.get(p.id_a, set()), by_doc.get(p.id_b, set())
        assert a & b, f"near-dup pair ({p.id_a},{p.id_b}) shares no fingerprints"


def test_kmeans_partitions_all_vectors_and_improves(spark, sf_dir):
    """3-iteration k-means: every vector lands in exactly one of K
    clusters, and refined centroids fit the data at least as well as
    the raw seeds (higher mean cosine cohesion)."""
    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.plans.vectors import (
        N_CLUSTERS,
        _assign_clusters,
        cosine,
        kmeans_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    out = plans.get("vec_kmeans_clusters").build(spark, sf_dir).collect()
    assert len(out) <= N_CLUSTERS
    assert sum(r.n_vectors for r in out) == e.count()

    def cohesion(cents):
        coh = (
            _assign_clusters(e, cents, n_keep=1)
            .join(e, "vec_id")
            .join(F.broadcast(cents), "cluster_id")
            .select(cosine("embedding", "centroid").alias("c"))
        )
        row = coh.agg(
            (F.sum(F.col("c").cast("decimal(30,10)")).cast("double")
             / F.count(F.lit(1))).alias("m")
        ).collect()[0]
        return row.m

    assert cohesion(kmeans_centroids(e, iters=3)) >= cohesion(
        kmeans_centroids(e, iters=0)
    )


def test_pca_orthonormal_centered_variance_ordered(spark, sf_dir):
    import numpy as np

    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.operators.pca import fit_pca, project

    e = load_table(spark, sf_dir, "embeddings")
    mean, w, evals = fit_pca(e, k=8)
    # components are orthonormal
    assert np.allclose(w.T @ w, np.eye(8), atol=1e-9)
    # eigenvalues returned in descending order, all non-negative
    assert all(evals[i] >= evals[i + 1] - 1e-12 for i in range(7))
    assert evals[-1] >= -1e-9
    pcs = np.stack(
        [r["pc"] for r in project(e, mean, w).select("pc").collect()]
    )
    # projections are centered, and their per-axis variance matches the
    # eigenvalue for that axis (definition of PCA)
    assert np.allclose(pcs.mean(axis=0), 0.0, atol=1e-9)
    assert np.allclose(pcs.var(axis=0, ddof=1), evals, rtol=1e-6)


def test_pca_partition_invariant(spark, sf_dir):
    import numpy as np

    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.operators.pca import fit_pca

    e = load_table(spark, sf_dir, "embeddings")
    m1, w1, v1 = fit_pca(e, k=4)
    m2, w2, v2 = fit_pca(e.repartition(17), k=4)
    # sufficient-statistic reduction + deterministic sign fix make the
    # fit independent of physical layout (up to float combine order)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(v1, v2, rtol=1e-9)
    assert np.allclose(w1, w2, atol=1e-7)


def test_edit1_blocking_finds_all_edit_kinds(spark):
    """Deletion-neighborhood blocking is exact for distance ≤ 1: it must
    find substitution, insertion, AND deletion pairs — and reject
    distance-2 pairs — matching a brute-force check."""
    from finance_etl_spark.operators.dedup import edit1_candidate_pairs

    rows = [
        (1, "kitten"),
        (2, "sitten"),   # substitution of row 1
        (3, "kittens"),  # insertion vs row 1
        (4, "kiten"),    # deletion vs row 1
        (5, "mitten"),   # substitution of 1 and 2
        (6, "banana"),   # unrelated
        (7, "kitty"),    # distance 2 from kitten -> must NOT pair
    ]
    df = spark.createDataFrame(rows, "id int, name string")
    got = {
        (r.id_a, r.id_b)
        for r in edit1_candidate_pairs(df, "id", "name").collect()
    }
    import itertools

    def lev(a, b):
        d = [[i + j if not i * j else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[len(a)][len(b)]

    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 1
    }
    assert got == want and (1, 7) not in got


def test_semantic_dedup_finds_planted_duplicates(spark, sf_dir):
    """A vector duplicated under a fresh id must be reported with the
    original as survivor (identical vectors always share a cluster:
    cosine to every centroid is equal, and the argmax tiebreak is by
    cluster_id on both copies)."""
    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.plans.vectors import (
        _assign_clusters,
        cosine,
        kmeans_centroids,
    )

    e = load_table(spark, sf_dir, "embeddings")
    clones = (
        e.orderBy("vec_id")
        .limit(3)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label")
    )
    planted = e.unionByName(clones)
    cents = kmeans_centroids(planted, iters=1)
    assigned = _assign_clusters(planted, cents, n_keep=1).join(planted, "vec_id")
    a = assigned.select(
        "cluster_id", F.col("vec_id").alias("id_keep"),
        F.col("embedding").alias("emb_a"),
    )
    b = assigned.select(
        "cluster_id", F.col("vec_id").alias("id_drop"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("id_keep") < F.col("id_drop"))
        .select("id_keep", "id_drop", cosine("emb_a", "emb_b").alias("cos"))
        .filter(F.col("cos") >= 0.999999)
    )
    found = {
        (r.id_drop, r.survivor)
        for r in pairs.groupBy("id_drop")
        .agg(F.min("id_keep").alias("survivor"))
        .collect()
    }
    for r in clones.select("vec_id").collect():
        assert (r.vec_id, r.vec_id - 1_000_000) in found


def test_semantic_dedup_repartition_invariant(spark, sf_dir):
    out1 = sorted(
        map(tuple, plans.get("vec_semantic_dedup").build(spark, sf_dir).collect())
    )
    out2 = sorted(
        map(tuple, plans.get("vec_semantic_dedup").build(spark, sf_dir).collect())
    )
    assert out1 == out2


def test_heavy_hitters_exact_vs_full_groupby(spark, sf_dir):
    """The MG candidate pass must not lose any true >0.1% hitter: the
    two-phase result equals the exact full-shuffle groupBy answer."""
    from finance_etl_spark.io.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("tok")
    )
    n = toks.count()
    exact = {
        (r.tok, r.c)
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * 1000 > n)
        .collect()
    }
    got = {
        (r.tok, r.n_occurrences)
        for r in plans.get("agg_heavy_hitters").build(spark, sf_dir).collect()
    }
    assert got == exact


def test_vector_pq_recall_vs_brute_force(spark, sf_dir):
    """PQ-ADC shortlist + exact re-rank (8-byte codes, 32x
    compression) must recover most of the exact cosine top-5 —
    normalized squared-L2 ranks identically to cosine, so the only
    error source is the code-level shortlist missing a true neighbor.
    Random near-orthogonal fixtures are PQ's worst case; real
    embedding corpora (clustered) do better."""
    exact = plans.get("vec_cosine_topk").build(spark, sf_dir)
    approx = plans.get("vec_ann_pq_topk").build(spark, sf_dir)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.6


def test_count_min_sketch_error_bounds(spark, sf_dir):
    """CMS guarantee: estimate >= exact always (one-sided error), and
    <= exact + eps*N for the probed keys (eps=0.005, 99% confidence —
    at these sizes the slack virtually never binds)."""
    from finance_etl_spark.io.readers import load_table

    out = plans.get("agg_count_min_sketch").build(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "orders").count()
    for r in out:
        assert r.cms_estimate >= r.exact_n
        assert r.cms_estimate <= r.exact_n + 0.005 * n


def test_matmul_topk_matches_jvm_topk(spark, sf_dir):
    """The BLAS (mapInPandas+numpy) brute-force path and the JVM
    expression path must agree on the top-5 neighbor ID SET per query
    (values differ by summation order ulps, never by membership on
    non-degenerate data), and emit exactly k ranked rows per query."""
    jvm = plans.get("vec_cosine_topk").build(spark, sf_dir).collect()
    blas = plans.get("vec_matmul_topk").build(spark, sf_dir).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    j, b = by_query(jvm), by_query(blas)
    assert j == b
    ranks = {}
    for r in blas:
        ranks.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 6)) for v in ranks.values())


def test_minhash_arrow_path_bit_identical_to_jvm(spark, sf_dir):
    """The Arrow/numpy signature sweep must reproduce the pure-JVM
    formulation bit for bit — same xxhash64 shingle hashes, same
    modular permutations, same minima — so swapping the execution
    strategy can never move an LSH band boundary."""
    from finance_etl_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_jvm,
        shingle_array,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = shingle_array(d, "doc_id", "text", 3).persist()
    arr.count()
    fast = {r.doc_id: list(r.sig) for r in minhash_signatures(arr, "doc_id").collect()}
    ref = {r.doc_id: list(r.sig) for r in minhash_signatures_jvm(arr, "doc_id").collect()}
    arr.unpersist()
    assert fast == ref and len(fast) > 0


def test_lsh_planes_are_independent():
    """Regression: the original plane-sign generator took the low bit
    of an odd-constant multiply, which preserves parity — every plane
    collapsed to the same (or negated) hyperplane and the 'index' had
    two buckets per band. Pin that the 16 planes are pairwise distinct
    up to negation and reasonably balanced."""
    from finance_etl_spark.plans.vectors import _PLANES, DIM, N_PLANES

    seen = set()
    for p in range(N_PLANES):
        row = tuple(_PLANES[p])
        neg = tuple(-x for x in row)
        assert row not in seen and neg not in seen, f"plane {p} duplicates another"
        seen.add(row)
        balance = sum(1 for x in row if x == 1)
        assert DIM // 4 <= balance <= 3 * DIM // 4, f"plane {p} is degenerate"


def test_mmr_rerank_deterministic_and_diverse(spark, sf_dir):
    """MMR must (a) be rerun-deterministic, (b) start from the top
    relevance hit, and (c) strictly diversify: the selected set's max
    pairwise cosine must not exceed the plain top-5's."""
    import numpy as np

    from finance_etl_spark.io.readers import load_table
    from finance_etl_spark.plans import get

    r1 = sorted(
        (r.query_id, r.sel_rank, r.vec_id)
        for r in get("vec_mmr_rerank").build(spark, sf_dir).collect()
    )
    r2 = sorted(
        (r.query_id, r.sel_rank, r.vec_id)
        for r in get("vec_mmr_rerank").build(spark, sf_dir).collect()
    )
    assert r1 == r2
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def maxpair(ids):
        V = np.stack([emb[i] / np.linalg.norm(emb[i]) for i in ids])
        S = V @ V.T
        np.fill_diagonal(S, -1)
        return S.max()

    by_q = {}
    for q, rank, vid in r1:
        by_q.setdefault(q, []).append(vid)
    for q, sel in by_q.items():
        assert len(sel) == 5
        # plain top-5 by cosine (excluding self), numpy ground truth
        qv = emb[q] / np.linalg.norm(emb[q])
        sims = sorted(
            (
                (float((emb[i] / np.linalg.norm(emb[i])) @ qv), i)
                for i in emb
                if i != q
            ),
            key=lambda t: (-t[0], t[1]),
        )
        top5 = [i for _, i in sims[:5]]
        # MMR's first pick is the max-relevance hit
        assert sel[0] == top5[0]
        # and the MMR set is no less diverse than plain top-5
        assert maxpair(sel) <= maxpair(top5) + 1e-9


def test_vec_recall_curve_query(spark, sf_dir):
    from finance_etl_spark import plans

    rows = {r.k: r for r in plans.get("vec_recall_curve").build(spark, sf_dir).collect()}
    assert sorted(rows) == [1, 5, 10]
    for k, r in rows.items():
        assert r.n_truth == 5 * k  # 5 queries x k slots
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hit <= r.n_truth
    # same floor as the direct ANN recall test (16 hyperplanes, 2 bands)
    assert rows[5].recall >= 0.5


def test_logreg_gd_converges(spark, sf_dir):
    from finance_etl_spark import plans

    rows = sorted(
        plans.get("ml_logreg_gd").build(spark, sf_dir).collect(),
        key=lambda r: r.iteration,
    )
    assert [r.iteration for r in rows] == list(range(12))
    losses = [r.avg_loss for r in rows]
    # full-batch GD on a separable problem: strictly decreasing loss
    assert all(a > b for a, b in zip(losses, losses[1:]))
    assert rows[-1].accuracy > 0.9


def test_active_learning_batch_selects_minimum_margins(spark, sf_dir):
    from finance_etl_spark import plans
    from finance_etl_spark.plans.vectors import (
        _logreg_features,
        _sigmoid_p,
        _train_logreg,
    )
    import pyspark.sql.functions as F

    sel = plans.get("cur_active_learning_batch").build(spark, sf_dir).collect()
    assert len(sel) == 20
    margins = [r.margin for r in sel]
    assert all(0.0 <= m <= 0.5 for m in margins)
    # every selected point is at least as uncertain as every
    # non-selected one: max selected margin <= min non-selected margin
    w, _ = _train_logreg(spark, sf_dir)
    p = _sigmoid_p(w)
    pool = _logreg_features(spark, sf_dir).select(
        "vec_id", F.abs(p - F.lit(0.5)).alias("margin")
    )
    chosen = {r.vec_id for r in sel}
    rest_min = (
        pool.filter(~F.col("vec_id").isin(list(chosen)))
        .agg(F.min("margin"))
        .first()[0]
    )
    assert max(margins) <= rest_min + 1e-12
