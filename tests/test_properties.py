"""Property-based tests (hypothesis) for the engine's semantic
contracts, each checked against a pure-Python model (SURVEY §5.2.5):

- surrogate-key encoding == the pandas-parity model (null -> 'nan')
- anti-join algebra: new = source keys minus existing keys, and the
  incremental load is idempotent (applying it twice adds nothing)
- dsum is bit-identical under any partitioning / row order
- strftime translation round-trips through Spark's parser

Example counts are kept small: every example is a real Spark job.
"""

import hashlib
from datetime import date, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

opt_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs")),
        max_size=12,
    ),
)
rows3 = st.lists(st.tuples(opt_text, opt_text, opt_text), min_size=1, max_size=20)


def model_key(vals) -> str:
    joined = "#".join("nan" if v is None else v for v in vals)
    return hashlib.md5(joined.encode("utf-8")).hexdigest()


@SET
@given(rows=rows3)
def test_surrogate_key_matches_pandas_model(spark, rows):
    from finance_etl_spark.functions.keys import surrogate_key

    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = [r.k for r in df.select(surrogate_key(["a", "b", "c"]).alias("k")).collect()]
    want = [model_key(vals) for vals in rows]
    assert sorted(got) == sorted(want)


key_sets = st.tuples(
    st.lists(st.integers(0, 30), min_size=0, max_size=25),
    st.lists(st.integers(0, 30), min_size=0, max_size=25),
)


@SET
@given(ks=key_sets)
def test_anti_join_algebra_and_idempotency(spark, ks):
    from finance_etl_spark.operators.incremental import incremental_new_records

    src_keys, exist_keys = ks
    src = spark.createDataFrame(
        [(str(k), k) for k in src_keys], "surrogate_key string, payload long"
    )
    exist = spark.createDataFrame(
        [(str(k),) for k in exist_keys], "surrogate_key string"
    )
    new = incremental_new_records(src, exist)
    got = sorted(r.surrogate_key for r in new.collect())
    # multiset semantics: every source occurrence of an unseen key survives
    want = sorted(str(k) for k in src_keys if k not in set(exist_keys))
    assert got == want
    # idempotency: after appending `new`'s keys, a re-run adds nothing
    merged = exist.unionByName(new.select("surrogate_key"))
    assert incremental_new_records(src, merged).isEmpty()


amounts = st.lists(
    st.decimals(
        min_value=-10**6, max_value=10**6, places=2, allow_nan=False
    ).map(float),
    min_size=1,
    max_size=50,
)


@SET
@given(xs=amounts)
def test_dsum_bit_identical_across_partitionings(spark, xs):
    from finance_etl_spark.functions.money import dsum

    df = spark.createDataFrame([(x,) for x in xs], "v double")
    a = df.repartition(1).agg(dsum("v").alias("s")).collect()[0].s
    b = df.repartition(7).agg(dsum("v").alias("s")).collect()[0].s
    c = (
        df.orderBy(F.col("v").desc())
        .coalesce(1)
        .agg(dsum("v").alias("s"))
        .collect()[0]
        .s
    )
    assert a == b == c  # exact equality, not approx


dates = st.dates(min_value=date(1970, 1, 1), max_value=date(2100, 1, 1))


@SET
@given(d=dates, fmt=st.sampled_from(["%d.%m.%Y", "%Y-%m-%d", "%Y/%m/%d", "%d-%m-%Y"]))
def test_strftime_translation_roundtrip(spark, d, fmt):
    from finance_etl_spark.functions.datetime import strftime_to_java

    rendered = d.strftime(fmt)
    df = spark.createDataFrame([(rendered,)], "s string")
    got = df.select(
        F.to_timestamp("s", strftime_to_java(fmt)).alias("ts")
    ).collect()[0].ts
    assert got is not None and got.date() == d


def test_union_order_invariance_of_key_multiset(spark):
    """U1: the surrogate-key multiset is invariant to file/union order
    (the accumulate-union contract)."""
    from finance_etl_spark.functions.keys import surrogate_key

    rows = [(str(i % 7), str(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "a string, b string")
    h1 = df.select(surrogate_key(["a", "b"]).alias("k"))
    parts = [df.filter(F.col("b").cast("int") % 3 == i) for i in range(3)]
    h2 = parts[2].unionByName(parts[0]).unionByName(parts[1]).select(
        surrogate_key(["a", "b"]).alias("k")
    )
    assert sorted(r.k for r in h1.collect()) == sorted(r.k for r in h2.collect())


# --- connected components == union-find model --------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(1, 30), st.integers(1, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def model_components(edges):
    """Pure-Python union-find: node -> min node id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@SET
@given(edges=edge_lists)
def test_connected_components_matches_union_find(spark, edges):
    from finance_etl_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(df, "src", "dst", max_rounds=40).collect()
    }
    assert got == model_components(edges)


def _misra_gries(stream, k):
    """Reference Misra-Gries summary (mirrors the mapInPandas pass in
    plans/udf_queries.py::agg_heavy_hitters)."""
    counters = {}
    for tok in stream:
        if tok in counters:
            counters[tok] += 1
        elif len(counters) < k:
            counters[tok] = 1
        else:
            dead = []
            for t in counters:
                counters[t] -= 1
                if counters[t] == 0:
                    dead.append(t)
            for t in dead:
                del counters[t]
    return set(counters)


@given(
    data=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    n_parts=st.integers(min_value=1, max_value=5),
    k=st.integers(min_value=4, max_value=12),
)
@settings(deadline=None, max_examples=200)
def test_misra_gries_candidates_cover_all_heavy_hitters(data, n_parts, k):
    """The no-false-negative guarantee agg_heavy_hitters relies on:
    for ANY stream and ANY partitioning, the union of per-partition
    MG(k) candidate sets contains every item with global count > N/k
    (an item that heavy globally must exceed n_p/k in at least one
    partition, where MG(k) is guaranteed to retain it)."""
    n = len(data)
    if n == 0:
        return
    parts = [data[i::n_parts] for i in range(n_parts)]
    candidates = set()
    for p in parts:
        candidates |= _misra_gries(p, k)
    from collections import Counter

    counts = Counter(data)
    heavy = {t for t, c in counts.items() if c * k > n}
    assert heavy <= candidates, (heavy - candidates, n, k, n_parts)


asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=5000),   # seconds offset
    ),
    min_size=0,
    max_size=25,
)


@SET
@given(lefts=asof_events, rights=asof_events)
def test_asof_nearest_matches_brute_force(spark, lefts, rights):
    """asof_nearest (one union+window pass) must agree with the
    brute-force model: nearest right row within tolerance by |Δt|,
    ties to the earlier right timestamp, per key."""
    from datetime import datetime, timedelta

    from finance_etl_spark.operators.joins import asof_nearest

    base = datetime(2024, 1, 1)
    tol = 600  # seconds
    l_rows = [
        (i, k, base + timedelta(seconds=s)) for i, (k, s) in enumerate(lefts)
    ]
    # one right row per (key, ts): dedup by keeping max value like the
    # production pre-reduction
    r_map = {}
    for k, s in rights:
        r_map[(k, s)] = max(r_map.get((k, s), 0), s * 10)
    r_rows = [
        (k, base + timedelta(seconds=s), float(v))
        for (k, s), v in r_map.items()
    ]
    if not l_rows:
        return
    ldf = spark.createDataFrame(l_rows, "lid int, k int, ts timestamp")
    rdf = spark.createDataFrame(r_rows, "k int, rts timestamp, val double")

    out = asof_nearest(
        ldf, rdf, on="k", left_ts="ts", right_ts="rts",
        value_cols=["val"], tolerance="10 MINUTES",
    )
    got = {r["lid"]: (r["__match_ts"], r["val"]) for r in out.collect()}

    for lid, k, lts in l_rows:
        cands = [
            (rts, v)
            for (kk, rts, v) in r_rows
            if kk == k and abs((rts - lts).total_seconds()) <= tol
        ]
        if not cands:
            assert got[lid] == (None, None), lid
        else:
            best = min(
                cands,
                key=lambda c: (abs((c[0] - lts).total_seconds()), c[0]),
            )
            assert got[lid] == best, (lid, got[lid], best)
