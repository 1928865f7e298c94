"""Curation-operator tests: connected components (exact labels on
crafted graphs, convergence guard), int8 quantization error bounds,
hash-split determinism, unpivot shape, rollup partial-reuse."""

import pytest
from pyspark.sql import functions as F

from finance_etl_spark.operators.components import connected_components
from finance_etl_spark.plans import get


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    rows = connected_components(df, "src", "dst", **kw).collect()
    return {r["node"]: r["component_id"] for r in rows}


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4, triangle 10-11-12, isolated pair 20-21
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_components_long_chain_converges(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(1, n)])
    assert set(got.values()) == {1} and len(got) == n


def test_components_raises_without_convergence_budget(spark):
    with pytest.raises(RuntimeError, match="no convergence"):
        _cc(spark, [(i, i + 1) for i in range(1, 10)], max_rounds=2)


def test_quantize_int8_bounds(spark, sf_dir):
    rows = get("vec_quantize_int8").build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # symmetric quantization always maps the max-|v| element to ±127
        assert r["max_q"] == 127
        # per-dim error <= (0.5 * max_abs / 127)^2
        bound = r["n_dims"] * (0.5 * r["max_abs"] / 127.0) ** 2
        assert 0.0 <= r["sq_err"] <= bound + 1e-9


def test_hash_split_deterministic_and_complete(spark, sf_dir):
    a = {r["split"]: r["n_docs"] for r in get("cur_hash_split").build(spark, sf_dir).collect()}
    b = {r["split"]: r["n_docs"] for r in get("cur_hash_split").build(spark, sf_dir).collect()}
    assert a == b
    assert set(a) == {"train", "val", "test"}
    total = sum(a.values())
    # expected ~79.7/10.2/10.2; loose bounds for a small corpus
    assert 0.6 < a["train"] / total < 0.95


def test_unpivot_three_measures_per_flag(spark, sf_dir):
    df = get("cur_unpivot_measures").build(spark, sf_dir)
    counts = df.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    assert counts and all(r["n"] == 3 for r in counts)
    assert set(df.select("measure").distinct().toPandas()["measure"]) == {
        "sum_qty",
        "sum_price",
        "sum_disc",
    }


def test_rollup_partial_reuse_matches_direct(spark, sf_dir):
    """Day grain derived from minute partials == direct day aggregation
    (decimal associativity), bit-for-bit on the presented double."""
    from finance_etl_spark.io.readers import load_table

    out = get("ts_hypertable_rollup").build(spark, sf_dir)
    day = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in out.filter(F.col("grain") == "day").collect()
    }
    direct = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,10)")).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert day == direct


def test_cdc_latest_unique_per_key(spark, sf_dir):
    df = get("cur_cdc_latest_per_key").build(spark, sf_dir)
    dup = df.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
    assert dup.isEmpty()


def test_stratified_sample_rates(spark, sf_dir):
    """Hash-gated sampling hits the configured per-stratum rate within
    binomial tolerance, and is bit-identical across runs."""
    from finance_etl_spark.io.readers import load_table

    pop = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    a = {r["lang"]: r["n_sampled"] for r in get("cur_stratified_sample").build(spark, sf_dir).collect()}
    b = {r["lang"]: r["n_sampled"] for r in get("cur_stratified_sample").build(spark, sf_dir).collect()}
    assert a == b
    for lang, n in a.items():
        assert n <= pop[lang]


def test_pii_redact_idempotent_and_bounded(spark, sf_dir):
    df = get("cur_pii_redact").build(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["email_chars_removed"] >= 0
        assert r["n_after_email"] >= 0


def test_decontaminate_only_test_split_docs(spark, sf_dir):
    """Every flagged doc must be in the test split (md5 gate >= 'e6')."""
    import hashlib

    rows = get("cur_decontaminate").build(spark, sf_dir).collect()
    for r in rows:
        gate = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2]
        assert gate >= "e6"
        assert r["n_shared_shingles"] >= 1 and r["n_train_docs"] >= 1


def test_repetition_filter_known_fractions(spark):
    # "a b a b a" -> bigrams [a b, b a, a b, b a]: 4 total, 2 distinct,
    # top multiplicity 2 -> dup=0.5 top=0.5; "w x y z" is all-unique.
    d = spark.createDataFrame(
        [(1, "a b a b a"), (2, "w x y z"), (3, "solo")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in _run_repetition(spark, d).collect()}
    assert set(got) == {1, 2}  # single-token doc has no bigram
    assert got[1]["n_bigrams"] == 4
    assert abs(got[1]["dup_bigram_frac"] - 0.5) < 1e-12
    assert abs(got[1]["top_bigram_frac"] - 0.5) < 1e-12
    assert not got[1]["keep"]
    assert got[2]["dup_bigram_frac"] == 0.0
    assert abs(got[2]["top_bigram_frac"] - (1 / 3)) < 1e-12


def _run_repetition(spark, d):
    """Run text_repetition_filter's dataflow on an arbitrary documents
    frame (the registered query binds the table path; tests need
    synthetic rows)."""
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="repet_")
    d.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    return get("text_repetition_filter").build(spark, tmp)


def test_mixture_weights_sum_to_sources(spark, sf_dir):
    from finance_etl_spark.plans import get

    rows = get("cur_mixture_weights").build(spark, sf_dir).collect()
    assert rows
    # fractions sum to 1; weight * frac = 1/n_sources for every source
    n_src = len(rows)
    assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["weight"] * r["frac"] - 1.0 / n_src) < 1e-12


def test_scd2_intervals_chain_per_key(spark, sf_dir):
    from finance_etl_spark.plans import get

    df = get("cur_scd2_intervals").build(spark, sf_dir)
    # exactly one open (current) interval per business key
    cur = (
        df.groupBy("o_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
    )
    assert cur.isEmpty()
    # intervals never invert
    bad = df.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") < F.col("valid_from"))
    )
    assert bad.isEmpty()


def test_sequence_pack_budget_and_conservation(spark, sf_dir):
    from finance_etl_spark.io.readers import load_table

    out = get("cur_sequence_pack").build(spark, sf_dir).collect()
    assert out
    d = load_table(spark, sf_dir, "documents")
    total_tokens = d.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0]
    # token conservation: every token lands in exactly one sequence
    assert sum(r["n_tokens"] for r in out) == total_tokens
    for r in out:
        # a sequence only exceeds the budget via its LAST doc spanning
        # the boundary; it can never start beyond it
        assert r["n_docs"] >= 1
        # start-offset rule: all docs in seq k start before (k+1)*2048,
        # so tokens from docs STARTING here are < 2048 + one doc length
        assert r["n_tokens"] >= 1


def test_pagerank_invariants(spark):
    """Rank vector is a probability distribution; a star graph
    concentrates rank at the hub; results are repartition-invariant
    (decimal-exact per-round sums)."""
    from finance_etl_spark.operators.pagerank import pagerank

    # star: everyone links to node 0
    star = spark.createDataFrame(
        [(i, 0, 1.0) for i in range(1, 8)], "src long, dst long, w double"
    )
    r = {row.node: row.rank for row in pagerank(star, n_iter=15).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    hub, spokes = r[0], [v for k, v in r.items() if k]
    assert all(hub > 3 * v for v in spokes)
    assert len(set(round(v, 15) for v in spokes)) == 1  # symmetric spokes tie

    # repartition invariance: same graph, adversarial layout
    star_relaid = star.repartition(13, "dst")
    r2 = {row.node: row.rank for row in pagerank(star_relaid, n_iter=15).collect()}
    assert r == r2


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is perfectly symmetric — every node must get
    exactly 1/n."""
    from finance_etl_spark.operators.pagerank import pagerank

    n = 6
    cyc = spark.createDataFrame(
        [(i, (i + 1) % n, 2.5) for i in range(n)], "src long, dst long, w double"
    )
    r = [row.rank for row in pagerank(cyc, n_iter=10).collect()]
    assert all(abs(v - 1.0 / n) < 1e-12 for v in r)


def test_tablesample_fraction_within_binomial_bounds(spark, sf_dir):
    """20% Bernoulli TABLESAMPLE must land within 5 sigma of its
    expectation and re-run bit-identically under the REPEATABLE seed
    (same session + layout)."""
    a = get("cur_sample_tablesample").build(spark, sf_dir).collect()
    b = get("cur_sample_tablesample").build(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = sum(r.n_sampled for r in a)
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    p = 0.2
    sigma = (total * p * (1 - p)) ** 0.5
    assert abs(n - total * p) < 5 * sigma + 1


def test_mixture_waterfill_conservation(spark, sf_dir):
    """Waterfilling must spend the budget exactly: saturated sources
    get their caps, unsaturated ones the common level, and the total
    allocation equals the budget (up to float division)."""
    from finance_etl_spark import plans

    rows = plans.get("cur_mixture_waterfill").build(spark, sf_dir).collect()
    assert rows
    budget = rows[0].budget
    assert all(r.budget == budget for r in rows)
    total_alloc = sum(r.allocated for r in rows)
    assert total_alloc == pytest.approx(budget, rel=1e-9)
    levels = {r.allocated for r in rows if not r.saturated}
    assert len(levels) <= 1  # one common water level
    for r in rows:
        if r.saturated:
            assert r.allocated == pytest.approx(float(r.cap))
        else:
            assert r.allocated <= r.cap + 1e-9
