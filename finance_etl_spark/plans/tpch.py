"""TPC-H query-shape completion: the 16 shapes not already registered
elsewhere (q1/q3/q5/q14/q16/q18 live in relational.py/timeseries.py).

The driver's star schema is a simplified TPC-H (TESTDATA.md): no
partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no
c_phone/o_comment. Each query below keeps its canonical *shape* — the
join topology, subquery pattern, and optimizer feature the original
exercises — re-parameterized onto the available columns, with the
adaptation documented per query. Together with the six existing shapes
this gives the full 22-query relational surface a reference user would
expect to run.

Determinism contract (registry.py module docstring): every money sum
is a decimal-exact ``dsum``; per-row arithmetic and comparisons are
IEEE-identical across engines; thresholds derived from aggregates are
decimal-routed on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_spark.functions.money import dsum
from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.registry import o_dsum, register


def _eur_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers in region EUROPE with their nation name — an SF-scaling
    supplier subset, so no broadcast hint: AQE broadcasts it while it
    fits and degrades to a shuffled join beyond the limit."""
    nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


@register(
    "q2_min_cost_supplier",
    tags=("tpch", "join", "window", "subquery"),
    oracle="""
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ), eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), cand AS (
            SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
            FROM supply
            JOIN part ON l_partkey = p_partkey
            JOIN eur ON l_suppkey = s_suppkey
            WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 25
        )
        SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost
        FROM (SELECT *, MIN(unit_cost) OVER (PARTITION BY p_partkey) AS mc
              FROM cand)
        WHERE unit_cost = mc
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated
    "cost = (SELECT MIN(cost) ... same part)" subquery, adapted to a
    supply relation derived from lineitem (no partsupp table): unit
    cost = min observed extendedprice/quantity per (part, supplier).

    Plan: the supply agg is the only fact shuffle; the part filter and
    European-supplier subsets join into it AQE-sized (broadcast while
    they fit, shuffle joins at scale), and the correlated
    min decorrelates to a window MIN partitioned by part — one extra
    hash-partitioned pass over the candidate set, never a self-join.
    Per-row division and MIN are IEEE-exact, so the min-cost equality
    selects identical rows (including ties) in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & F.col("p_size").between(10, 25))
        .select("p_partkey", "p_name")
    )
    cand = supply.join(
        parts, F.col("l_partkey") == F.col("p_partkey")
    ).join(
        _eur_suppliers(spark, sf_dir),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mc", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("mc"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_cost")
    )


@register(
    "q4_order_priority",
    tags=("tpch", "subquery", "semi-join"),
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): quarterly orders with
    EXISTS a lineitem shipped after the order date (the schema has no
    l_commitdate/l_receiptdate, so "late line" is shipdate>orderdate).
    The EXISTS decorrelates to a LEFT SEMI hash join on orderkey with
    the date comparison as a join conjunct — the quarter filter prunes
    the orders scan before the shuffle, and the group-by carries 5
    priority groups."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    tags=("tpch", "filter", "agg", "pushdown"),
    oracle=f"""
        SELECT {o_dsum('l_extendedprice * l_discount')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan→filter→agg.
    All four predicates push down to the parquet scan (shipdate range,
    discount band, quantity cap reach PushedFilters), the projection
    prunes to three columns, and the single global aggregate is one
    map-side partial per partition + a 1-row final — the minimal
    possible data movement for this query at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q7_volume_shipping",
    tags=("tpch", "join", "agg"),
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two trading nations):
    revenue flowing NATION_1↔NATION_2, grouped by direction and ship
    year. Both dimension paths are restricted to the two nations
    BEFORE touching facts (supplier and customer each shrink ~2/25;
    AQE broadcasts the shrunken sides at shipped SFs and falls back to
    shuffle joins at scale), the order↔lineitem join shuffles on
    orderkey, and the
    asymmetric-pair predicate is a residual on the tiny joined row —
    group-by carries 2 directions × ~7 years."""
    two = ["NATION_1", "NATION_2"]
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(two))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "q8_market_share",
    tags=("tpch", "join", "agg", "conditional"),
    oracle=f"""
        WITH all_nations AS (
            SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region ON n2.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
        )
        SELECT o_year,
               ({o_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
                / {o_dsum('volume')}) AS mkt_share
        FROM all_nations GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_3's share of
    ECONOMY-part revenue sold into AMERICA-region customers per order
    year. The share is a conditional aggregate folded into the same
    partials as the denominator — one hash agg computes both sums, and
    the final share is a single IEEE division of two decimal-exact
    doubles (identical bits in both engines). All dimension paths
    (part type, supplier nation, customer→region) are filtered before
    their joins and AQE-sized — broadcast while small, shuffle at
    scale; the only forced fact shuffle is lineitem⋈orders."""
    america_nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(america_nations),
        F.col("c_nationkey") == F.col("n_nationkey"),
        "left_semi",
    ).select("c_custkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("supp_nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                dsum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        F.lit(0)
                    )
                )
                / dsum(volume)
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    tags=("tpch", "join", "agg"),
    oracle=f"""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               {o_dsum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity')}
                   AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on 'red' parts by
    supplier nation and order year. The schema has no ps_supplycost, so
    cost = p_retailprice × quantity — same expression topology
    (revenue minus a part-priced cost term). Part-name filter and the
    supplier→nation path is pre-filtered and AQE-sized (broadcast while
    small); lineitem⋈orders shuffles once on orderkey; the profit
    expression folds into decimal partials."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    tags=("tpch", "join", "agg", "topn"),
    oracle=f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in a quarter. The returnflag and date filters push
    into both fact scans before the orderkey shuffle; customer and
    nation broadcast into the aggregate's output; the top-20 plans as
    TakeOrderedAndProject (per-partition heaps, never a global sort).
    Revenue is decimal-exact so the ORDER BY sees identical doubles in
    both engines; c_custkey breaks ties deterministically."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.select("c_custkey", "c_name", "c_acctbal", "n_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q11_important_stock",
    tags=("tpch", "agg", "subquery", "having"),
    oracle="""
        WITH eur_li AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE')
        ),
        pp AS (
            SELECT l_partkey AS p_partkey,
                   CAST(SUM(CAST(val AS DECIMAL(30,10))) AS DECIMAL(38,10))
                       AS vdec
            FROM eur_li GROUP BY 1
        ),
        tot AS (
            SELECT CAST(CAST(SUM(vdec) AS VARCHAR) AS DOUBLE) AS tv
            FROM pp
        ),
        npart AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nparts FROM part
        )
        SELECT p_partkey,
               CAST(CAST(vdec AS VARCHAR) AS DOUBLE) AS value
        FROM pp CROSS JOIN tot CROSS JOIN npart
        WHERE CAST(CAST(vdec AS VARCHAR) AS DOUBLE)
              > (tv * CAST('20.0' AS DOUBLE)) / nparts
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), SPEC semantics:
    parts whose European-supplied value exceeds FRACTION of the total,
    with the spec's scale-aware FRACTION = 0.0001/SF (TPC-H 2.14 /
    4.2.3). SF is inferred FROM THE DATA rather than from a path
    param: TPC-H sizing fixes |part| = 200,000 x SF, so
    FRACTION * total = total * 0.0001 * 200000 / |part|
                     = total * 20 / |part| —
    identical in the builder and the static oracle with no SF
    templating, and correct at any SF including ones never seen
    locally. On this synthetic TPC-H-ish corpus (revenue proxy for the
    missing partsupp cost*availqty; near-uniform per-part shares) the
    spec threshold returns ZERO rows at every shipped SF — measured
    max per-part share vs threshold: sf0.001 0.0097 vs 0.1, sf0.01
    0.0016 vs 0.0101, sf0.1 0.00017 vs 0.001 — so the gate checks the
    empty multiset; the non-degenerate mean-multiple variant of this
    plan shape lives on as `agg_stock_mean_multiple` (below), which is
    NOT spec Q11 and is tagged accordingly. Exactness: per-part and
    total sums share the exact DECIMAL(38,10) accumulation; value and
    total each cross the double edge once (VARCHAR route); the
    threshold is ONE identically-parenthesized double expression, so
    the > comparison matches bit-for-bit. Both scalars (total, |part|)
    are 1-row broadcasts into the per-part filter; the EUROPE supplier
    semi join is AQE-sized (broadcast while small, shuffled at scale);
    one fact shuffle on partkey."""
    eur_keys = _eur_suppliers(spark, sf_dir).select("s_suppkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(eur_keys, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
    )
    per_part = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(F.col("val").cast("decimal(30,10)"))
        .cast("decimal(38,10)")
        .alias("vdec")
    )
    tot = per_part.agg(
        F.sum("vdec").cast("string").cast("double").alias("tv"),
    )
    npart = (
        load_table(spark, sf_dir, "part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nparts"))
    )
    value = F.col("vdec").cast("string").cast("double")
    return (
        per_part.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(npart))
        .filter(
            value
            > (F.col("tv") * F.expr("CAST('20.0' AS DOUBLE)"))
            / F.col("nparts").cast("double")
        )
        .select("p_partkey", value.alias("value"))
    )


@register(
    "agg_stock_mean_multiple",
    tags=("agg", "subquery", "having"),
    oracle="""
        WITH eur_li AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
            FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE')
        ),
        pp AS (
            SELECT l_partkey AS p_partkey,
                   CAST(SUM(CAST(val AS DECIMAL(30,10))) AS DECIMAL(38,10))
                       AS vdec
            FROM eur_li GROUP BY 1
        ),
        tot AS (
            SELECT CAST(CAST(SUM(vdec) AS VARCHAR) AS DOUBLE) AS tv,
                   CAST(COUNT(*) AS BIGINT) AS np
            FROM pp
        )
        SELECT p_partkey,
               CAST(CAST(vdec AS VARCHAR) AS DOUBLE) AS value
        FROM pp CROSS JOIN tot
        WHERE CAST(CAST(vdec AS VARCHAR) AS DOUBLE)
              > (CAST('1.5' AS DOUBLE) * tv) / np
    """,
)
def agg_stock_mean_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-multiple stock concentration (NOT TPC-H Q11 — the spec
    form lives at `q11_important_stock`): parts whose European-
    supplied value exceeds 1.5x the MEAN per-part value — the
    group-HAVING-greater-than-global-scalar pattern with a
    scale-invariant predicate, so the qualifying set stays a stable,
    non-empty slice of parts at every SF (unlike the spec fraction,
    which is empty on this near-uniform synthetic corpus). Exactness:
    per-part and total sums are the same exact DECIMAL(38,10)
    accumulation; the value, total, and count each cross the double
    edge once (VARCHAR route) and the threshold is ONE identically-
    parenthesized double expression, so the > comparison matches
    bit-for-bit. The scalar is a 1-row broadcast into the per-part
    filter (never a second scan per group); the EUROPE supplier semi
    join is AQE-sized; one fact shuffle on partkey."""
    eur_keys = _eur_suppliers(spark, sf_dir).select("s_suppkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(eur_keys, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
        )
    )
    per_part = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(F.col("val").cast("decimal(30,10)"))
        .cast("decimal(38,10)")
        .alias("vdec")
    )
    tot = per_part.agg(
        F.sum("vdec").cast("string").cast("double").alias("tv"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    value = F.col("vdec").cast("string").cast("double")
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(
            value
            > (F.expr("CAST('1.5' AS DOUBLE)") * F.col("tv"))
            / F.col("np").cast("double")
        )
        .select("p_partkey", value.alias("value"))
    )


@register(
    "q12_shipping_lateness",
    tags=("tpch", "join", "agg", "conditional"),
    oracle="""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                    THEN 'late' ELSE 'ontime' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1
    """,
)
def q12_shipping_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): lines shipped in
    1996 bucketed by lateness (>90 days after order — the schema has
    no shipmode or commit/receipt dates), counting high- vs
    low-priority orders per bucket. Both conditional counts fold into
    one hash aggregate's partials; the date filter pushes into the
    lineitem scan; one orderkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.when(late, "late").otherwise("ontime").alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    tags=("tpch", "join", "agg", "outer-join"),
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON o_custkey = c_custkey
                            AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer
    order counts INCLUDING zero-order customers — the left outer join
    with a join-side predicate (priority <> 5-LOW filters orders
    without dropping customers, which a WHERE clause would get wrong).
    Two chained aggregations: the first shuffles on custkey, the
    second on the tiny count domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q15_top_supplier",
    tags=("tpch", "agg", "subquery"),
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier, the "view + scalar max" query): the
    quarterly revenue view is computed ONCE (one suppkey shuffle); the
    scalar MAX over it is a 1-row broadcast compared by equality —
    exact, because revenues are decimal-derived doubles and MAX is
    order-independent, so ties (all maximal suppliers) surface
    identically in both engines."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    tags=("tpch", "agg", "subquery", "correlated"),
    oracle=f"""
        WITH brand_li AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_brand = 'Brand#1')
        ), part_avg AS (
            SELECT l_partkey,
                   0.2 * ({o_dsum('l_quantity')} / COUNT(*)) AS qty_cap
            FROM brand_li GROUP BY 1
        )
        SELECT ({o_dsum('l_extendedprice')} / 7.0) AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_small
        FROM brand_li JOIN part_avg USING (l_partkey)
        WHERE l_quantity < qty_cap
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity
    is below 20% of their part's average — the correlated per-group
    average, decorrelated to one aggregate over the brand-filtered
    lines re-joined on partkey (the agg and the join share the same
    partkey partitioning: one shuffle, reused). The 0.2×avg cap is
    (decimal sum → double)/count then one multiply — IEEE-identical in
    both engines, so boundary rows classify the same way."""
    pk = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(pk, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    cap = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * (dsum("l_quantity") / F.count(F.lit(1)))).alias("qty_cap")
    )
    return (
        li.join(cap, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    tags=("tpch", "join", "filter", "pushdown"),
    oracle=f"""
        SELECT {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, the OR-of-conjunctions query):
    three (brand, size, quantity) bands OR'd together. The optimizer
    extracts the common join key so this stays a single broadcast hash
    join on partkey with the disjunction as a residual — not three
    unioned scans, not a nested loop. Common-factor extraction also
    lets the quantity bounds (1..30 overall) push to the lineitem
    scan."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q20_part_promotion",
    tags=("tpch", "semi-join", "agg", "having"),
    oracle=f"""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%blue%')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING {o_dsum('l_quantity')} > 50.0
        )
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    more than 50 units of some 'blue' part in 1996 — nested semi joins
    with an aggregate HAVING threshold in the inner query (the schema
    has no partsupp/availqty, so the threshold is absolute rather than
    0.5×availqty). The part-key semi join prunes the lineitem scan
    (AQE-sized); the (suppkey, partkey) agg shuffles once; the outer IN
    decorrelates to a semi join against the 100-row supplier table."""
    pk = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    movers = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(pk, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50.0)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


_Q21_SQL = """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
"""


@register(
    "q21_waiting_suppliers",
    tags=("tpch", "subquery", "exists", "anti-join"),
    oracle=_Q21_SQL,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): for
    finished multi-supplier orders, the supplier whose line shipped
    last AND more than 60 days after the order date (shipdate stands
    in for the missing commit/receipt dates). The EXISTS and NOT
    EXISTS on the same fact table decorrelate to a left-semi and a
    left-anti hash join on orderkey — three orderkey-partitioned joins
    that AQE stacks on one exchange, never a per-row re-scan."""
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_SQL)


_Q22_SPARK_SQL = """
    SELECT CAST(c_custkey % 7 AS BIGINT) AS cohort,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-07-01')
    GROUP BY 1
"""


@register(
    "q22_dormant_customers",
    tags=("tpch", "subquery", "anti-join", "scalar"),
    oracle=f"""
        SELECT CAST(c_custkey % 7 AS BIGINT) AS cohort,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               {o_dsum('c_acctbal')} AS totacctbal
        FROM customer
        WHERE c_acctbal > (
                SELECT {o_dsum('c_acctbal')} / COUNT(*)
                FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-07-01')
        GROUP BY 1
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers dormant for over a year, grouped into cohorts (custkey mod 7
    stands in for the phone country code the schema lacks). The scalar
    average is decimal-routed on BOTH engines so the > threshold is
    bit-identical; NOT EXISTS decorrelates to a left-anti hash join
    against orders, and the scalar broadcasts — customer is scanned
    twice but shuffled never."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22_SPARK_SQL)
