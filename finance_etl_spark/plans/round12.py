"""Round-12 operator wave: concordance/association statistics,
stratified 2x2 meta-analysis, uniformity EDF tests, robust two-way
decomposition, variance-ratio / EWMA market diagnostics, portfolio
attribution, integer-exact learning primitives, blocking-based fuzzy
matching, corpus governance filters, and two distributed-graph
projections — every query hash-oracled on arrival (the round-10/11
directive: additions <= the driver sampling rate, oracle-checked from
day one, each with an independent numpy/pure-Python reference test in
tests/test_round12_ops.py).

House rules applied throughout (see plans/registry.py docstring):
exact integer/decimal accumulation with doubles only at the
presentation edge; order-pinned folds (array_sort + aggregate vs
list(... ORDER BY) + list_reduce) wherever >1 double term is summed;
string-routed shared constants; NULL-guarded degenerate divisions
identical on both engines; bucket+carry instead of unpartitioned
corpus windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.finance import _SEG_DAILY_SQL, _seg_daily
from finance_etl_spark.plans.registry import register


def _as_d(c):
    """Decimal -> double via the VARCHAR route (cross-engine exact)."""
    return c.cast("string").cast("double")


def _ordered_fold_sum(order_col, term_col):
    """Pinned-order double sum: collect (order, term) structs, sort by
    the order field, fold — byte-identical on both engines because the
    addition order is data-defined, not partition-defined. DuckDB twin:
    list_reduce(list(term ORDER BY order_col), (a, x) -> a + x)."""
    return F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(order_col.alias("o"), term_col.alias("t")))
        ),
        F.lit(0.0),
        lambda acc, s: acc + s["t"],
    )


# ---------------------------------------------------------------------------
# stat_kendall_w — concordance of the 5 segments' month rankings


_MONTH_GRID_SQL = """
        months AS (
            SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m
            FROM orders
        ),
        segs AS (SELECT DISTINCT c_mktsegment AS segment FROM customer),
        msum AS (
            SELECT c.c_mktsegment AS segment,
                   strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS m,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS x
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        grid AS (
            SELECT months.m, segs.segment,
                   COALESCE(msum.x, CAST(0 AS DECIMAL(18,2))) AS x0
            FROM months CROSS JOIN segs
            LEFT JOIN msum ON msum.m = months.m
                          AND msum.segment = segs.segment
        )
"""


def _month_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m, segment, x0): month x segment revenue grid with absent
    cells as exact 0 — every judge ranks every object."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    months = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("m")
    ).distinct()
    segs = c.select(F.col("c_mktsegment").alias("segment")).distinct()
    msum = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("decimal(18,2)").alias("x"))
    )
    return (
        months.crossJoin(F.broadcast(segs))
        .join(F.broadcast(msum), ["m", "segment"], "left")
        .select(
            "m",
            "segment",
            F.coalesce(F.col("x"), F.lit(0).cast("decimal(18,2)")).alias("x0"),
        )
    )


@register(
    "stat_kendall_w",
    tags=("stats", "window", "agg"),
    oracle=f"""
        WITH {_MONTH_GRID_SQL},
        ranked AS (
            SELECT m, segment, x0,
                   RANK() OVER (PARTITION BY segment ORDER BY x0) AS rk,
                   COUNT(*) OVER (PARTITION BY segment, x0) AS teq
            FROM grid
        ),
        rsum AS (
            SELECT m, CAST(SUM(2 * rk + teq - 1) AS BIGINT) AS r2
            FROM ranked GROUP BY m
        ),
        dims AS (
            SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT segment) AS BIGINT) AS mj
            FROM grid
        ),
        ties AS (
            SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
            FROM (SELECT segment, x0, CAST(COUNT(*) AS BIGINT) AS t
                  FROM grid GROUP BY segment, x0)
        ),
        s4 AS (
            SELECT CAST(SUM((r2 - mj * (n + 1)) * (r2 - mj * (n + 1)))
                        AS BIGINT) AS s4
            FROM rsum CROSS JOIN dims
        )
        SELECT dims.n AS n_months, dims.mj AS m_judges, s4.s4 AS s_numer,
               ties.tsum AS tie_term,
               CASE WHEN dims.mj * dims.mj * (dims.n * dims.n * dims.n - dims.n)
                         - dims.mj * ties.tsum > 0 THEN
                 CAST(3 * s4.s4 AS DOUBLE)
                   / CAST(dims.mj * dims.mj
                            * (dims.n * dims.n * dims.n - dims.n)
                          - dims.mj * ties.tsum AS DOUBLE)
               END AS w
        FROM dims CROSS JOIN ties CROSS JOIN s4
    """,
)
def stat_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's coefficient of concordance W across the five market
    segments' rankings of calendar months by revenue: do the segments
    agree on which months are strong? W = 12S / (m^2(n^3-n) - m*sum T)
    with the standard tie correction (Kendall & Babington Smith 1939).
    Judges rank the FULL month grid (absent cells enter as exact
    decimal 0 — the fin_active_share grid lesson), so every judge
    ranks every object and midranks handle the zero ties. Exactness:
    doubled midranks 2r_ij = 2*rank + t_eq - 1 are integers, per-month
    rank sums R2_j and the centered square sum S4 = sum (R2_j -
    m(n+1))^2 = 4S stay in BIGINT (n~85 months, m=5 — S4 < 1e9), the
    tie term sum(t^3-t) is integer, and W = 3*S4 / (m^2(n^3-n) - m*T)
    is ONE double division at the edge. Degenerate all-tied grids zero
    the denominator -> NULL identically on both engines. Scale: corpus
    work is the month x segment aggregation; ranking runs on the
    |months| x |segments| grid relation."""
    grid = _month_grid(spark, sf_dir)
    wrk = Window.partitionBy("segment").orderBy("x0")
    ranked = grid.select(
        "m",
        "segment",
        "x0",
        F.rank().over(wrk).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("segment", "x0"))
        .alias("teq"),
    )
    rsum = ranked.groupBy("m").agg(
        F.sum(2 * F.col("rk") + F.col("teq") - 1).cast("bigint").alias("r2")
    )
    dims = grid.agg(
        F.countDistinct("m").cast("bigint").alias("n"),
        F.countDistinct("segment").cast("bigint").alias("mj"),
    )
    ties = (
        grid.groupBy("segment", "x0")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).cast("bigint").alias("tsum")
        )
    )
    s4 = (
        rsum.crossJoin(F.broadcast(dims))
        .select(
            (
                (F.col("r2") - F.col("mj") * (F.col("n") + 1))
                * (F.col("r2") - F.col("mj") * (F.col("n") + 1))
            ).alias("sq")
        )
        .agg(F.sum("sq").cast("bigint").alias("s4"))
    )
    den = (
        F.col("mj") * F.col("mj")
        * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        - F.col("mj") * F.col("tsum")
    )
    return (
        dims.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(s4))
        .select(
            F.col("n").alias("n_months"),
            F.col("mj").alias("m_judges"),
            F.col("s4").alias("s_numer"),
            F.col("tsum").alias("tie_term"),
            F.when(
                den > 0,
                (3 * F.col("s4")).cast("double") / den.cast("double"),
            ).alias("w"),
        )
    )


# ---------------------------------------------------------------------------
# stat_gk_gamma — ordinal association priority x price quintile


@register(
    "stat_gk_gamma",
    tags=("stats", "agg"),
    oracle="""
        WITH rng AS (
            SELECT MIN(o_totalprice) AS pmin, MAX(o_totalprice) AS pmax
            FROM orders
        ),
        coded AS (
            SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS r,
                   CASE WHEN pmax = pmin THEN 0
                        ELSE LEAST(4, CAST(FLOOR(
                       (CAST(o_totalprice AS DOUBLE)
                        - CAST(pmin AS DOUBLE))
                       / ((CAST(pmax AS DOUBLE) - CAST(pmin AS DOUBLE))
                          / CAST(5 AS DOUBLE))) AS INT)) END AS b
            FROM orders CROSS JOIN rng
        ),
        cells AS (
            SELECT r, b, CAST(COUNT(*) AS BIGINT) AS n
            FROM coded GROUP BY r, b
        ),
        pairs AS (
            SELECT CAST(SUM(CASE WHEN c2.r > c1.r AND c2.b > c1.b
                                 THEN c1.n * c2.n ELSE 0 END) AS BIGINT)
                       AS c_pairs,
                   CAST(SUM(CASE WHEN c2.r > c1.r AND c2.b < c1.b
                                 THEN c1.n * c2.n ELSE 0 END) AS BIGINT)
                       AS d_pairs
            FROM cells c1 CROSS JOIN cells c2
        )
        SELECT c_pairs, d_pairs,
               CASE WHEN c_pairs + d_pairs > 0 THEN
                 CAST(c_pairs - d_pairs AS DOUBLE)
                   / CAST(c_pairs + d_pairs AS DOUBLE)
               END AS gamma
        FROM pairs
    """,
)
def stat_gk_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal gamma between order priority (ordinal 1..5) and
    order-value quintile bin: gamma = (C - D)/(C + D) over concordant/
    discordant pairs — the tie-ignoring ordinal association measure
    (Goodman & Kruskal 1954). The pair enumeration runs on the 5x5
    CELL grid (each ordered cell pair contributes n1*n2), never on row
    pairs — the stat_kendall_tau cell-pair precedent. Bins come from
    the exact decimal min/max with the same double bin arithmetic as
    ml_bagging_oob's histogram (deterministic IEEE ops, identical
    expressions). C and D are exact BIGINTs (cell products ~n^2/4:
    ceiling ~sf2000 before C nears 2^63 — documented); gamma is ONE
    double division. Degenerate all-tied tables (C+D=0) NULL
    identically. Corpus work: one scan + one 25-cell agg."""
    o = load_table(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_totalprice").alias("pmin"), F.max("o_totalprice").alias("pmax")
    )
    coded = o.crossJoin(F.broadcast(rng)).select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("r"),
        F.when(F.col("pmax") == F.col("pmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(4),
                F.floor(
                    (F.col("o_totalprice").cast("double")
                     - F.col("pmin").cast("double"))
                    / ((F.col("pmax").cast("double")
                        - F.col("pmin").cast("double")) / F.lit(5.0))
                ).cast("int"),
            )
        ).alias("b"),
    )
    cells = coded.groupBy("r", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    c1 = cells.select(
        F.col("r").alias("r1"), F.col("b").alias("b1"), F.col("n").alias("n1")
    )
    c2 = cells.select(
        F.col("r").alias("r2"), F.col("b").alias("b2"), F.col("n").alias("n2")
    )
    pairs = c1.crossJoin(F.broadcast(c2)).agg(
        F.sum(
            F.when(
                (F.col("r2") > F.col("r1")) & (F.col("b2") > F.col("b1")),
                F.col("n1") * F.col("n2"),
            ).otherwise(0)
        ).cast("bigint").alias("c_pairs"),
        F.sum(
            F.when(
                (F.col("r2") > F.col("r1")) & (F.col("b2") < F.col("b1")),
                F.col("n1") * F.col("n2"),
            ).otherwise(0)
        ).cast("bigint").alias("d_pairs"),
    )
    tot = F.col("c_pairs") + F.col("d_pairs")
    return pairs.select(
        "c_pairs",
        "d_pairs",
        F.when(
            tot > 0,
            (F.col("c_pairs") - F.col("d_pairs")).cast("double")
            / tot.cast("double"),
        ).alias("gamma"),
    )


# ---------------------------------------------------------------------------
# stat_mantel_haenszel — stratified 2x2 common odds ratio + CMH test


@register(
    "stat_mantel_haenszel",
    tags=("stats", "agg"),
    oracle="""
        WITH coded AS (
            SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS y,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS expo,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS outc
            FROM orders
        ),
        strata AS (
            SELECT y,
                   CAST(SUM(expo * outc) AS BIGINT) AS a,
                   CAST(SUM(expo * (1 - outc)) AS BIGINT) AS b,
                   CAST(SUM((1 - expo) * outc) AS BIGINT) AS c,
                   CAST(SUM((1 - expo) * (1 - outc)) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM coded GROUP BY y
        ),
        folded AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(a) AS BIGINT) AS sum_a,
                   list_reduce(list(CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE)
                                    ORDER BY y), (acc, x) -> acc + x) AS s_ad,
                   list_reduce(list(CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE)
                                    ORDER BY y), (acc, x) -> acc + x) AS s_bc,
                   list_reduce(list(CAST((a + b) * (a + c) AS DOUBLE)
                                      / CAST(n AS DOUBLE)
                                    ORDER BY y), (acc, x) -> acc + x) AS s_e,
                   list_reduce(list(
                       (CAST((a + b) * (c + d) AS DOUBLE)
                        * CAST((a + c) * (b + d) AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE)))
                       ORDER BY y), (acc, x) -> acc + x) AS s_v
            FROM strata WHERE n > 1
        )
        SELECT n_strata, sum_a,
               CASE WHEN s_bc > 0 THEN s_ad / s_bc END AS or_mh,
               CASE WHEN s_v > 0 THEN
                 (CAST(sum_a AS DOUBLE) - s_e)
                   * (CAST(sum_a AS DOUBLE) - s_e) / s_v
               END AS cmh_chi2
        FROM folded
    """,
)
def stat_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel common odds ratio and Cochran-Mantel-Haenszel
    chi-square across year strata for the 2x2 of (high order priority)
    x (order fulfilled): does the priority-fulfilment association hold
    pooling over years? OR_MH = sum(a_i d_i/n_i)/sum(b_i c_i/n_i);
    CMH = (sum a - sum E)^2 / sum V with E = (a+b)(a+c)/n and
    V = (a+b)(c+d)(a+c)(b+d) / (n^2(n-1)), no continuity correction
    (documented convention, matched by the reference test). Exactness:
    per-stratum cells are conditional-sum integers; each stratum's
    four double terms are single fixed-parenthesization expressions
    (products stay in BIGINT before ONE cast each); the four
    across-strata sums are ORDER-PINNED folds by year (sorted
    collect_list fold here, ordered list_reduce there) — never a
    partition-ordered float sum. Zero denominators (no discordant
    pairs / single-row strata) NULL identically; strata with n<=1 are
    excluded on both engines. Corpus work: one scan, one |years|-row
    agg."""
    o = load_table(spark, sf_dir, "orders")
    coded = o.select(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("expo"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("outc"),
    )
    strata = (
        coded.groupBy("y")
        .agg(
            F.sum(F.col("expo") * F.col("outc")).cast("bigint").alias("a"),
            F.sum(F.col("expo") * (1 - F.col("outc"))).cast("bigint").alias("b"),
            F.sum((1 - F.col("expo")) * F.col("outc")).cast("bigint").alias("c"),
            F.sum((1 - F.col("expo")) * (1 - F.col("outc")))
            .cast("bigint")
            .alias("d"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .filter(F.col("n") > 1)
    )
    n_d = F.col("n").cast("double")
    t_ad = (F.col("a") * F.col("d")).cast("double") / n_d
    t_bc = (F.col("b") * F.col("c")).cast("double") / n_d
    t_e = ((F.col("a") + F.col("b")) * (F.col("a") + F.col("c"))).cast(
        "double"
    ) / n_d
    t_v = (
        ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d"))).cast("double")
        * ((F.col("a") + F.col("c")) * (F.col("b") + F.col("d"))).cast("double")
    ) / (n_d * n_d * (n_d - F.lit(1.0)))
    folded = strata.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("sum_a"),
        _ordered_fold_sum(F.col("y"), t_ad).alias("s_ad"),
        _ordered_fold_sum(F.col("y"), t_bc).alias("s_bc"),
        _ordered_fold_sum(F.col("y"), t_e).alias("s_e"),
        _ordered_fold_sum(F.col("y"), t_v).alias("s_v"),
    )
    dev = F.col("sum_a").cast("double") - F.col("s_e")
    return folded.select(
        "n_strata",
        "sum_a",
        F.when(F.col("s_bc") > 0, F.col("s_ad") / F.col("s_bc")).alias("or_mh"),
        F.when(F.col("s_v") > 0, dev * dev / F.col("s_v")).alias("cmh_chi2"),
    )


# ---------------------------------------------------------------------------
# stat_ks_uniform / stat_kuiper_uniform — one-sample EDF tests of the
# md5 ladder against U(0,1)


_UNIF_EDF_SQL = """
        uni AS (
            SELECT o_orderkey AS key,
                   CAST('0x' || SUBSTRING(
                       md5(CAST(o_orderkey AS VARCHAR)), 1, 6) AS BIGINT) AS k
            FROM orders
        ),
        pos AS (
            SELECT k,
                   CAST(ROW_NUMBER() OVER (ORDER BY k, key) AS BIGINT) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM uni
        ),
        edf AS (
            SELECT MAX(n) AS n,
                   CAST(MAX(i * 16777216 - n * k) AS BIGINT) AS dp_s,
                   CAST(MAX(n * k - (i - 1) * 16777216) AS BIGINT) AS dm_s
            FROM pos
        )
"""


def _unif_edf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n, dp_s, dm_s): scaled one-sample EDF deviations of the
    md5-uniformized order keys vs U(0,1). u_i = k_i / 2^24 with k the
    first 24 md5 bits — an exact rational, so D+ = max(i/n - u_(i))
    and D- = max(u_(i) - (i-1)/n) scale to INTEGER maxima
    dp_s = max(i*2^24 - n*k_i), dm_s = max(n*k_i - (i-1)*2^24).
    The Spark rank avoids a global sort: 256 buckets on the top 8
    bits, per-bucket ROW_NUMBER, plus a bucket-offset carry (the
    stat_ks_two_sample bucket+carry shape); the oracle uses a plain
    global ROW_NUMBER — same i because both order by (k, key).
    i*2^24 <= 1.7e16 at sf1000 (ceiling ~sf4e5)."""
    o = load_table(spark, sf_dir, "orders")
    uni = o.select(
        F.col("o_orderkey").alias("key"),
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6), 16, 10
        ).cast("bigint").alias("k"),
    )
    bucketed = uni.select("key", "k", F.shiftright("k", 16).alias("bkt"))
    sizes = bucketed.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 256-row relation: bounded
    offs = sizes.select(
        "bkt",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).cast("bigint").alias("off"),
    )
    tot = sizes.agg(F.sum("cnt").cast("bigint").alias("n"))
    wrn = Window.partitionBy("bkt").orderBy("k", "key")
    pos = (
        bucketed.join(F.broadcast(offs), "bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n",
            (F.col("off") + F.row_number().over(wrn)).cast("bigint").alias("i"),
        )
    )
    return pos.agg(
        F.max("n").alias("n"),
        F.max(F.col("i") * F.lit(16777216) - F.col("n") * F.col("k"))
        .cast("bigint")
        .alias("dp_s"),
        F.max(F.col("n") * F.col("k") - (F.col("i") - 1) * F.lit(16777216))
        .cast("bigint")
        .alias("dm_s"),
    )


@register(
    "stat_ks_uniform",
    tags=("stats", "window", "agg"),
    oracle=f"""
        WITH {_UNIF_EDF_SQL}
        SELECT n,
               CAST(dp_s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(16777216 AS DOUBLE)) AS d_plus,
               CAST(dm_s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(16777216 AS DOUBLE)) AS d_minus,
               GREATEST(
                 CAST(dp_s AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(16777216 AS DOUBLE)),
                 CAST(dm_s AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(16777216 AS DOUBLE)))
                   AS d_stat
        FROM edf
    """,
)
def stat_ks_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Kolmogorov-Smirnov test of the engine's md5 key
    ladder against U(0,1): u = (first 24 md5 bits of the order key) /
    2^24, D = max(D+, D-) over the empirical distribution function —
    the uniformity audit behind every md5-lottery operator in this
    engine (cur_rejection_sample_md5, the bagging weights, the
    deterministic splits): if the ladder drifted from uniform, D blows
    past the ~1.36/sqrt(n) band. EDF deviations are computed as exact
    INTEGER maxima (see _unif_edf: D+ * n * 2^24 = max(i*2^24 - n*k))
    and cross to double in ONE division each; the Spark side ranks via
    256-bucket bucket+carry (no global sort at corpus scale), the
    oracle via plain ROW_NUMBER — identical i by (k, key) ordering.
    Degenerate n=0 cannot occur (orders is non-empty by schema
    contract)."""
    edf = _unif_edf(spark, sf_dir)
    scale = F.col("n").cast("double") * F.lit(16777216.0)
    dp = F.col("dp_s").cast("double") / scale
    dm = F.col("dm_s").cast("double") / scale
    return edf.select(
        "n",
        dp.alias("d_plus"),
        dm.alias("d_minus"),
        F.greatest(dp, dm).alias("d_stat"),
    )


@register(
    "stat_kuiper_uniform",
    tags=("stats", "window", "agg"),
    oracle=f"""
        WITH {_UNIF_EDF_SQL}
        SELECT n,
               (CAST(dp_s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(16777216 AS DOUBLE)))
               + (CAST(dm_s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(16777216 AS DOUBLE)))
                   AS v_stat
        FROM edf
    """,
)
def stat_kuiper_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper's V = D+ + D- on the same md5-uniformized EDF as
    stat_ks_uniform — the rotation-invariant variant that keeps equal
    sensitivity at the distribution's tails (Kuiper 1960), the right
    screen for cyclic drift in a hash ladder. Same exact-integer EDF
    machinery; V is the sum of the two single-division doubles, one
    fixed-order addition on both engines."""
    edf = _unif_edf(spark, sf_dir)
    scale = F.col("n").cast("double") * F.lit(16777216.0)
    return edf.select(
        "n",
        (
            F.col("dp_s").cast("double") / scale
            + F.col("dm_s").cast("double") / scale
        ).alias("v_stat"),
    )


# ---------------------------------------------------------------------------
# stat_median_polish — Tukey two-way decomposition of the year x
# segment revenue grid


_YEARSEG_CENTS_SQL = f"""
        daily AS ({_SEG_DAILY_SQL}),
        cell AS (
            SELECT EXTRACT(year FROM d) AS y, segment,
                   CAST(CAST(SUM(x) AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
            FROM daily GROUP BY 1, 2
        ),
        yrs AS (SELECT DISTINCT y FROM cell),
        sgs AS (SELECT DISTINCT segment FROM cell),
        grid AS (
            SELECT yrs.y, sgs.segment, COALESCE(cell.v, 0) AS v
            FROM yrs CROSS JOIN sgs
            LEFT JOIN cell ON cell.y = yrs.y AND cell.segment = sgs.segment
        )
"""

# lower-median (the (n+1)//2-th order statistic): integer-exact for
# ANY count parity — the convention this operator pins (a mean-of-
# middles median would leave integers for the odd 7x5 fixture grid but
# break exactness if a year or segment ever dropped out)
_LOMED_ROW = """
            SELECT *,
                   CAST(MAX({med}) OVER (PARTITION BY {part}) AS BIGINT) AS med
            FROM (
                SELECT *,
                       CASE WHEN ROW_NUMBER() OVER (
                                PARTITION BY {part} ORDER BY {val}, {tie})
                            = (COUNT(*) OVER (PARTITION BY {part}) + 1) / 2
                            THEN {val} END AS {med}
                FROM {src}
            )
"""


def _lomed(df: DataFrame, part: str, val: str, tie: str) -> DataFrame:
    """Attach the lower median of ``val`` within ``part`` as `med`."""
    wrn = Window.partitionBy(part).orderBy(val, tie)
    wall = Window.partitionBy(part)
    picked = df.withColumn(
        "_pick",
        F.when(
            F.row_number().over(wrn)
            == (F.count(F.lit(1)).over(wall) + 1) / 2,
            F.col(val),
        ),
    )
    return picked.withColumn(
        "med", F.max("_pick").over(wall).cast("bigint")
    ).drop("_pick")


@register(
    "stat_median_polish",
    tags=("stats", "window"),
    oracle=f"""
        WITH {_YEARSEG_CENTS_SQL},
        r1 AS (
            SELECT y, segment, v - med AS v, med AS ay FROM (
                {_LOMED_ROW.format(src="grid", part="y", val="v",
                                   tie="segment", med="m1")}
            )
        ),
        r2 AS (
            SELECT y, segment, v - med AS v, ay, med AS bs FROM (
                {_LOMED_ROW.format(src="r1", part="segment", val="v",
                                   tie="y", med="m2")}
            )
        ),
        r3 AS (
            SELECT y, segment, v - med AS v, ay + med AS ay, bs FROM (
                {_LOMED_ROW.format(src="r2", part="y", val="v",
                                   tie="segment", med="m3")}
            )
        ),
        r4 AS (
            SELECT y, segment, v - med AS v, ay, bs + med AS bs FROM (
                {_LOMED_ROW.format(src="r3", part="segment", val="v",
                                   tie="y", med="m4")}
            )
        ),
        ma AS (
            SELECT CAST(MAX(CASE WHEN rn = (cnt + 1) / 2 THEN ay END)
                        AS BIGINT) AS med_a
            FROM (SELECT ay,
                         ROW_NUMBER() OVER (ORDER BY ay, y) AS rn,
                         COUNT(*) OVER () AS cnt
                  FROM (SELECT DISTINCT y, ay FROM r4))
        ),
        mb AS (
            SELECT CAST(MAX(CASE WHEN rn = (cnt + 1) / 2 THEN bs END)
                        AS BIGINT) AS med_b
            FROM (SELECT bs,
                         ROW_NUMBER() OVER (ORDER BY bs, segment) AS rn,
                         COUNT(*) OVER () AS cnt
                  FROM (SELECT DISTINCT segment, bs FROM r4))
        )
        SELECT CAST(r4.y AS BIGINT) AS year, r4.segment,
               CAST(r4.v AS DOUBLE) / CAST(100 AS DOUBLE) AS residual,
               CAST(r4.ay - ma.med_a AS DOUBLE) / CAST(100 AS DOUBLE)
                   AS row_effect,
               CAST(r4.bs - mb.med_b AS DOUBLE) / CAST(100 AS DOUBLE)
                   AS col_effect,
               CAST(ma.med_a + mb.med_b AS DOUBLE) / CAST(100 AS DOUBLE)
                   AS overall
        FROM r4 CROSS JOIN ma CROSS JOIN mb
        ORDER BY year, segment
    """,
)
def stat_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the year x segment revenue grid — the
    robust two-way decomposition v = overall + row + col + residual
    (Tukey 1977, EDA ch. 11), TWO full row-then-column sweeps with
    effects re-centered by their own medians at the end. Convention
    pinned for exactness: every median is the LOWER median (the
    (n+1)//2-th order statistic, deterministic tie-break by the entity
    key), so the whole decomposition stays in INTEGER cents end-to-end
    for any grid parity — each cell crosses to double exactly once at
    presentation (/100 in double, identical both engines). Absent
    cells enter as exact 0 via the full grid (the fin_active_share
    lesson). Scale: corpus work is the shared daily agg; all four
    sweeps and the effect re-centering run on the |years| x |segments|
    grid relation (35 rows) with bounded windows."""
    daily = _seg_daily(spark, sf_dir)
    cell = daily.groupBy(
        F.year("d").alias("y"), "segment"
    ).agg(
        (F.sum("x").cast("decimal(18,2)") * 100).cast("bigint").alias("v")
    )
    yrs = cell.select("y").distinct()
    sgs = cell.select("segment").distinct()
    grid = (
        yrs.crossJoin(F.broadcast(sgs))
        .join(F.broadcast(cell), ["y", "segment"], "left")
        .select(
            "y", "segment", F.coalesce(F.col("v"), F.lit(0)).alias("v")
        )
    )
    r1 = _lomed(grid, "y", "v", "segment").select(
        "y", "segment", (F.col("v") - F.col("med")).alias("v"),
        F.col("med").alias("ay"),
    )
    r2 = _lomed(r1, "segment", "v", "y").select(
        "y", "segment", (F.col("v") - F.col("med")).alias("v"),
        "ay", F.col("med").alias("bs"),
    )
    r3 = _lomed(r2, "y", "v", "segment").select(
        "y", "segment", (F.col("v") - F.col("med")).alias("v"),
        (F.col("ay") + F.col("med")).alias("ay"), "bs",
    )
    r4 = _lomed(r3, "segment", "v", "y").select(
        "y", "segment", (F.col("v") - F.col("med")).alias("v"),
        "ay", (F.col("bs") + F.col("med")).alias("bs"),
    )

    def _global_lomed(df, val, tie, out):
        wrn = Window.orderBy(val, tie)  # effect-sized relation only
        wall = Window.partitionBy(F.lit(1))
        return (
            df.withColumn(
                "_pick",
                F.when(
                    F.row_number().over(wrn)
                    == (F.count(F.lit(1)).over(wall) + 1) / 2,
                    F.col(val),
                ),
            )
            .agg(F.max("_pick").cast("bigint").alias(out))
        )

    ma = _global_lomed(r4.select("y", "ay").distinct(), "ay", "y", "med_a")
    mb = _global_lomed(
        r4.select("segment", "bs").distinct(), "bs", "segment", "med_b"
    )
    return (
        r4.crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
        .select(
            F.col("y").cast("bigint").alias("year"),
            "segment",
            (F.col("v").cast("double") / F.lit(100.0)).alias("residual"),
            ((F.col("ay") - F.col("med_a")).cast("double") / F.lit(100.0))
            .alias("row_effect"),
            ((F.col("bs") - F.col("med_b")).cast("double") / F.lit(100.0))
            .alias("col_effect"),
            ((F.col("med_a") + F.col("med_b")).cast("double") / F.lit(100.0))
            .alias("overall"),
        )
        .orderBy("year", "segment")
    )


# ---------------------------------------------------------------------------
# Shared quantized daily returns (the fin_capture_ratios recipe):
# segment and whole-market daily revenue returns floored to integer
# ninths (q9) — exact BIGINTs from single VARCHAR-routed divisions.


_MKT_RET_SQL = f"""
        daily AS ({_SEG_DAILY_SQL}),
        mkt AS (
            SELECT d, CAST(SUM(x) AS DECIMAL(18,2)) AS xm
            FROM daily GROUP BY d
        ),
        rm AS (
            SELECT d,
                   CAST(FLOOR((CAST(CAST(xm AS VARCHAR) AS DOUBLE)
                               / CAST(CAST(xmp AS VARCHAR) AS DOUBLE)
                               - CAST(1 AS DOUBLE)) * CAST(1e9 AS DOUBLE))
                        AS BIGINT) AS m
            FROM (SELECT d, xm, LAG(xm) OVER (ORDER BY d) AS xmp FROM mkt)
            WHERE xmp IS NOT NULL
        )
"""

_SEG_RET_SQL = """
        rs AS (
            SELECT segment, d,
                   CAST(FLOOR((CAST(CAST(x AS VARCHAR) AS DOUBLE)
                               / CAST(CAST(xp AS VARCHAR) AS DOUBLE)
                               - CAST(1 AS DOUBLE)) * CAST(1e9 AS DOUBLE))
                        AS BIGINT) AS r
            FROM (SELECT segment, d, x,
                         LAG(x) OVER (PARTITION BY segment ORDER BY d) AS xp
                  FROM daily)
            WHERE xp IS NOT NULL
        )
"""


def _mkt_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, m): whole-market daily revenue returns, q9-quantized."""
    daily = _seg_daily(spark, sf_dir)
    mkt = daily.groupBy("d").agg(F.sum("x").cast("decimal(18,2)").alias("xm"))
    wm = Window.orderBy("d")  # calendar-bounded
    return (
        mkt.withColumn("xmp", F.lag("xm").over(wm))
        .filter(F.col("xmp").isNotNull())
        .select(
            "d",
            F.floor(
                (_as_d(F.col("xm")) / _as_d(F.col("xmp")) - F.lit(1.0))
                * F.lit(1e9)
            ).cast("bigint").alias("m"),
        )
    )


def _seg_returns(daily: DataFrame) -> DataFrame:
    """(segment, d, r): per-segment daily returns, q9-quantized."""
    ws = Window.partitionBy("segment").orderBy("d")
    return (
        daily.withColumn("xp", F.lag("x").over(ws))
        .filter(F.col("xp").isNotNull())
        .select(
            "segment",
            "d",
            F.floor(
                (_as_d(F.col("x")) / _as_d(F.col("xp")) - F.lit(1.0))
                * F.lit(1e9)
            ).cast("bigint").alias("r"),
        )
    )


# ---------------------------------------------------------------------------
# ts_variance_ratio — Lo-MacKinlay random-walk diagnostic


@register(
    "ts_variance_ratio",
    tags=("timeseries", "window", "stats"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        seq AS (
            SELECT m,
                   ROW_NUMBER() OVER (ORDER BY d) AS t,
                   SUM(m) OVER (ORDER BY d
                       ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS y2,
                   SUM(m) OVER (ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS y4,
                   SUM(m) OVER (ORDER BY d
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS y8
            FROM rm
        ),
        base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n1,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS s1,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0)) * m) AS VARCHAR)
                        AS DOUBLE) AS s2
            FROM seq
        ),
        qs AS (
            SELECT 2 AS q, CAST(COUNT(*) AS BIGINT) AS nq,
                   CAST(CAST(SUM(CAST(y2 AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(y2 AS DECIMAL(19,0)) * y2) AS VARCHAR)
                        AS DOUBLE) AS sy2
            FROM seq WHERE t >= 2
            UNION ALL
            SELECT 4, CAST(COUNT(*) AS BIGINT),
                   CAST(CAST(SUM(CAST(y4 AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE),
                   CAST(CAST(SUM(CAST(y4 AS DECIMAL(19,0)) * y4) AS VARCHAR)
                        AS DOUBLE)
            FROM seq WHERE t >= 4
            UNION ALL
            SELECT 8, CAST(COUNT(*) AS BIGINT),
                   CAST(CAST(SUM(CAST(y8 AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE),
                   CAST(CAST(SUM(CAST(y8 AS DECIMAL(19,0)) * y8) AS VARCHAR)
                        AS DOUBLE)
            FROM seq WHERE t >= 8
        )
        SELECT CAST(q AS INT) AS q, nq AS n_periods,
               CASE WHEN n1 > 1 AND nq > 1
                         AND (CAST(n1 AS DOUBLE) * s2 - s1 * s1) > 0 THEN
                 ((CAST(nq AS DOUBLE) * sy2 - sy * sy)
                  * (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1)))
                 / ((CAST(q AS DOUBLE)
                     * (CAST(nq AS DOUBLE) * (CAST(nq AS DOUBLE) - 1)))
                    * (CAST(n1 AS DOUBLE) * s2 - s1 * s1))
               END AS vr
        FROM qs CROSS JOIN base
        ORDER BY q
    """,
)
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance ratio VR(q) for q = 2, 4, 8 on the
    whole-market daily revenue return: Var(q-period overlapping sums) /
    (q * Var(1-period)) — ~1 under a random walk, <1 under mean
    reversion, >1 under trending (Lo & MacKinlay 1988; plain ratio of
    unbiased sample variances, no heteroskedasticity correction —
    convention pinned and matched by the reference test). Exactness:
    returns are the shared q9-quantized integers; the overlapping
    q-sums are integer window sums over the calendar-bounded series;
    all four power sums accumulate in DECIMAL and cross to double once
    via VARCHAR; each VR is ONE fixed-parenthesization double
    expression. Degenerate zero variance NULLs identically. Scale:
    corpus work is the shared daily agg; everything downstream rides
    the O(days) return relation."""
    rm = _mkt_returns(spark, sf_dir)
    wt = Window.orderBy("d")  # calendar-bounded
    seq = rm.select(
        "m",
        F.row_number().over(wt).alias("t"),
        F.sum("m").over(wt.rowsBetween(-1, 0)).alias("y2"),
        F.sum("m").over(wt.rowsBetween(-3, 0)).alias("y4"),
        F.sum("m").over(wt.rowsBetween(-7, 0)).alias("y8"),
    )
    base = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        _as_d(F.sum(F.col("m").cast("decimal(19,0)"))).alias("s1"),
        _as_d(F.sum(F.col("m").cast("decimal(19,0)") * F.col("m"))).alias("s2"),
    )
    parts = []
    for q, ycol in ((2, "y2"), (4, "y4"), (8, "y8")):
        parts.append(
            seq.filter(F.col("t") >= q).agg(
                F.lit(q).alias("q"),
                F.count(F.lit(1)).cast("bigint").alias("nq"),
                _as_d(F.sum(F.col(ycol).cast("decimal(19,0)"))).alias("sy"),
                _as_d(
                    F.sum(F.col(ycol).cast("decimal(19,0)") * F.col(ycol))
                ).alias("sy2"),
            )
        )
    qs = parts[0].unionByName(parts[1]).unionByName(parts[2])
    n1_d = F.col("n1").cast("double")
    nq_d = F.col("nq").cast("double")
    q_d = F.col("q").cast("double")
    var1_num = n1_d * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        qs.crossJoin(F.broadcast(base))
        .select(
            F.col("q").cast("int").alias("q"),
            F.col("nq").alias("n_periods"),
            F.when(
                (F.col("n1") > 1) & (F.col("nq") > 1) & (var1_num > 0),
                (
                    (nq_d * F.col("sy2") - F.col("sy") * F.col("sy"))
                    * (n1_d * (n1_d - 1))
                )
                / ((q_d * (nq_d * (nq_d - 1))) * var1_num),
            ).alias("vr"),
        )
        .orderBy("q")
    )


# ---------------------------------------------------------------------------
# ts_ewma_volatility — RiskMetrics decay-weighted vol per segment


_EWMA_LAMBDA = 0.94
_EWMA_K = 20
_EWMA_WEIGHTS = [
    (1.0 - _EWMA_LAMBDA) * _EWMA_LAMBDA**k for k in range(_EWMA_K)
]
_EWMA_W_SQL = ", ".join(
    f"({k}, CAST('{w!r}' AS DOUBLE))" for k, w in enumerate(_EWMA_WEIGHTS)
)


@register(
    "ts_ewma_volatility",
    tags=("timeseries", "window", "finance"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        {_SEG_RET_SQL},
        tail AS (
            SELECT segment, r,
                   ROW_NUMBER() OVER (PARTITION BY segment ORDER BY d DESC)
                       - 1 AS k,
                   COUNT(*) OVER (PARTITION BY segment) AS n_all
            FROM rs
        ),
        wts (k, w) AS (VALUES {_EWMA_W_SQL}),
        terms AS (
            SELECT t.segment, t.n_all, t.k,
                   w.w * CAST(CAST(CAST(t.r AS DECIMAL(19,0)) * t.r
                                   AS VARCHAR) AS DOUBLE) AS term
            FROM tail t JOIN wts w ON w.k = t.k
            WHERE t.k < {_EWMA_K} AND t.n_all >= {_EWMA_K}
        ),
        folded AS (
            SELECT segment, CAST(MAX(n_all) AS BIGINT) AS n_days,
                   list_reduce(list(term ORDER BY k),
                               (acc, x) -> acc + x) AS var_q18
            FROM terms GROUP BY segment
        )
        SELECT segment, n_days,
               var_q18 / CAST(1e18 AS DOUBLE) AS ewma_var,
               sqrt(var_q18 / CAST(1e18 AS DOUBLE)) AS ewma_vol
        FROM folded ORDER BY segment
    """,
)
def ts_ewma_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RiskMetrics EWMA volatility per segment: sigma^2 = (1-lambda) *
    sum_k lambda^k r_{t-k}^2 over the last K=20 daily returns with
    lambda = 0.94 (J.P. Morgan RiskMetrics 1996), truncated — the
    finite-window form every intraday risk feed actually computes.
    Exactness: the 20 decay weights are EXACT double literals computed
    once in Python and string-routed into BOTH engines; r^2 is an
    exact DECIMAL product crossing to double once per row; the 20-term
    weighted sum is an ORDER-PINNED fold by lag k (sorted collect_list
    fold vs ordered list_reduce), and the q18 de-scaling + sqrt are
    single deterministic expressions. Segments with fewer than K
    returns are excluded on both engines (none at shipped SFs — the
    reference test asserts all 5 present). Scale: corpus work is the
    shared daily agg; the tail ranking partitions by segment over the
    calendar-bounded return relation."""
    daily = _seg_daily(spark, sf_dir)
    rs = _seg_returns(daily)
    wdesc = Window.partitionBy("segment").orderBy(F.col("d").desc())
    wall = Window.partitionBy("segment")
    tail = rs.select(
        "segment",
        "r",
        (F.row_number().over(wdesc) - 1).alias("k"),
        F.count(F.lit(1)).over(wall).alias("n_all"),
    ).filter((F.col("k") < _EWMA_K) & (F.col("n_all") >= _EWMA_K))
    wts = F.array(
        *[F.expr(f"CAST('{w!r}' AS DOUBLE)") for w in _EWMA_WEIGHTS]
    )
    terms = tail.select(
        "segment",
        "n_all",
        "k",
        (
            wts[F.col("k")]
            * _as_d(F.col("r").cast("decimal(19,0)") * F.col("r"))
        ).alias("term"),
    )
    folded = terms.groupBy("segment").agg(
        F.max("n_all").cast("bigint").alias("n_days"),
        _ordered_fold_sum(F.col("k"), F.col("term")).alias("var_q18"),
    )
    v = F.col("var_q18") / F.expr("CAST(1e18 AS DOUBLE)")
    return folded.select(
        "segment", "n_days", v.alias("ewma_var"), F.sqrt(v).alias("ewma_vol")
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# fin_information_ratio — active-return consistency per segment


@register(
    "fin_information_ratio",
    tags=("finance", "window", "stats"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        {_SEG_RET_SQL},
        act AS (
            SELECT rs.segment, rs.r - rm.m AS a
            FROM rs JOIN rm ON rm.d = rs.d
        ),
        s AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(CAST(a AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS s1,
                   CAST(CAST(SUM(CAST(a AS DECIMAL(19,0)) * a) AS VARCHAR)
                        AS DOUBLE) AS s2
            FROM act GROUP BY segment
        )
        SELECT segment, n AS n_days,
               CASE WHEN n > 1
                         AND (CAST(n AS DOUBLE) * s2 - s1 * s1) > 0 THEN
                 (s1 / CAST(n AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
               END AS ir_daily
        FROM s ORDER BY segment
    """,
)
def fin_information_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily information ratio per segment against the whole-market
    book: IR = mean(active return) / sd(active return), the
    consistency-of-outperformance number that complements
    fin_tracking_error (which reports only the denominator). Active
    returns are DIFFERENCES of the shared q9-quantized integers (exact
    BIGINTs); mean and sample sd come from two decimal power sums
    crossing to double once each; IR is ONE guarded expression. Zero
    active variance NULLs identically. Corpus work is the shared daily
    agg; the join and moments ride the calendar-bounded return
    relation."""
    daily = _seg_daily(spark, sf_dir)
    rs = _seg_returns(daily)
    rm = _mkt_returns(spark, sf_dir)
    act = rs.join(F.broadcast(rm), "d").select(
        "segment", (F.col("r") - F.col("m")).alias("a")
    )
    s = act.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _as_d(F.sum(F.col("a").cast("decimal(19,0)"))).alias("s1"),
        _as_d(F.sum(F.col("a").cast("decimal(19,0)") * F.col("a"))).alias("s2"),
    )
    n_d = F.col("n").cast("double")
    var_num = n_d * F.col("s2") - F.col("s1") * F.col("s1")
    return s.select(
        "segment",
        F.col("n").alias("n_days"),
        F.when(
            (F.col("n") > 1) & (var_num > 0),
            (F.col("s1") / n_d) / F.sqrt(var_num / (n_d * (n_d - 1))),
        ).alias("ir_daily"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# fin_m2_modigliani — risk-adjusted return on the market's vol scale


@register(
    "fin_m2_modigliani",
    tags=("finance", "stats"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        {_SEG_RET_SQL},
        segm AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(CAST(r AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS s1,
                   CAST(CAST(SUM(CAST(r AS DECIMAL(19,0)) * r) AS VARCHAR)
                        AS DOUBLE) AS s2
            FROM rs GROUP BY segment
        ),
        mm AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nm,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS m1,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0)) * m) AS VARCHAR)
                        AS DOUBLE) AS m2s
            FROM rm
        )
        SELECT segment, n AS n_days,
               CASE WHEN n > 1
                         AND (CAST(n AS DOUBLE) * s2 - s1 * s1) > 0 THEN
                 (s1 / CAST(n AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
               END AS sharpe_daily,
               CASE WHEN n > 1 AND nm > 1
                         AND (CAST(n AS DOUBLE) * s2 - s1 * s1) > 0 THEN
                 ((s1 / CAST(n AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))))
                 * sqrt((CAST(nm AS DOUBLE) * m2s - m1 * m1)
                        / (CAST(nm AS DOUBLE) * (CAST(nm AS DOUBLE) - 1)))
               END AS m2_daily
        FROM segm CROSS JOIN mm
        ORDER BY segment
    """,
)
def fin_m2_modigliani(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modigliani-Modigliani risk-adjusted performance per segment
    (rf = 0, documented): M2 = Sharpe_segment * sd_market — what the
    segment would have returned if levered to the market's volatility,
    directly comparable across segments in return units (Modigliani &
    Modigliani 1997). Same integer power-sum machinery as
    fin_information_ratio (q9 returns, decimal sums, single VARCHAR
    crossings); sharpe and m2 are each ONE guarded expression whose
    sub-terms repeat VERBATIM on both engines so the float paths are
    identical. Zero segment variance NULLs both outputs identically."""
    daily = _seg_daily(spark, sf_dir)
    rs = _seg_returns(daily)
    rm = _mkt_returns(spark, sf_dir)
    segm = rs.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _as_d(F.sum(F.col("r").cast("decimal(19,0)"))).alias("s1"),
        _as_d(F.sum(F.col("r").cast("decimal(19,0)") * F.col("r"))).alias("s2"),
    )
    mm = rm.agg(
        F.count(F.lit(1)).cast("bigint").alias("nm"),
        _as_d(F.sum(F.col("m").cast("decimal(19,0)"))).alias("m1"),
        _as_d(F.sum(F.col("m").cast("decimal(19,0)") * F.col("m"))).alias("m2s"),
    )
    n_d = F.col("n").cast("double")
    nm_d = F.col("nm").cast("double")
    var_num = n_d * F.col("s2") - F.col("s1") * F.col("s1")
    sharpe = (F.col("s1") / n_d) / F.sqrt(var_num / (n_d * (n_d - 1)))
    sd_mkt = F.sqrt(
        (nm_d * F.col("m2s") - F.col("m1") * F.col("m1"))
        / (nm_d * (nm_d - 1))
    )
    return (
        segm.crossJoin(F.broadcast(mm))
        .select(
            "segment",
            F.col("n").alias("n_days"),
            F.when((F.col("n") > 1) & (var_num > 0), sharpe).alias(
                "sharpe_daily"
            ),
            F.when(
                (F.col("n") > 1) & (F.col("nm") > 1) & (var_num > 0),
                sharpe * sd_mkt,
            ).alias("m2_daily"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# fin_portfolio_turnover — year-over-year mix churn


@register(
    "fin_portfolio_turnover",
    tags=("finance", "agg"),
    oracle=f"""
        WITH daily AS ({_SEG_DAILY_SQL}),
        ys AS (
            SELECT EXTRACT(year FROM d) AS y, segment,
                   CAST(SUM(x) AS DECIMAL(18,2)) AS xs
            FROM daily GROUP BY 1, 2
        ),
        yrs AS (SELECT DISTINCT y FROM ys),
        sgs AS (SELECT DISTINCT segment FROM ys),
        grid AS (
            SELECT yrs.y, sgs.segment,
                   COALESCE(ys.xs, CAST(0 AS DECIMAL(18,2))) AS xs
            FROM yrs CROSS JOIN sgs
            LEFT JOIN ys ON ys.y = yrs.y AND ys.segment = sgs.segment
        ),
        yt AS (
            SELECT y, CAST(SUM(xs) AS DECIMAL(18,2)) AS xy
            FROM grid GROUP BY y
        ),
        terms AS (
            SELECT g.y, yt.xy, ytp.xy AS xyp,
                   ABS(CAST(g.xs AS DECIMAL(19,2))
                         * CAST(ytp.xy AS DECIMAL(19,2))
                       - CAST(gp.xs AS DECIMAL(19,2))
                         * CAST(yt.xy AS DECIMAL(19,2))) AS num,
                   CASE WHEN g.xs > 0 THEN 1 ELSE 0 END AS present
            FROM grid g
            JOIN grid gp ON gp.y = g.y - 1 AND gp.segment = g.segment
            JOIN yt ON yt.y = g.y
            JOIN yt ytp ON ytp.y = g.y - 1
            WHERE yt.xy > 0 AND ytp.xy > 0
        )
        SELECT CAST(y AS BIGINT) AS year,
               CAST(SUM(present) AS BIGINT) AS n_segments,
               CAST(CAST(SUM(num) AS VARCHAR) AS DOUBLE)
                 / (CAST(2 AS DOUBLE)
                    * CAST(CAST(xy AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(xyp AS VARCHAR) AS DOUBLE)) AS turnover
        FROM terms GROUP BY y, xy, xyp ORDER BY year
    """,
)
def fin_portfolio_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year portfolio turnover of the segment revenue mix:
    T_y = 1/2 * sum_s |w_{y,s} - w_{y-1,s}| — the one-period churn
    sibling of fin_active_share (same common-exact-denominator
    algebra: |x_ys * X_{y-1} - x_{y-1,s} * X_y| summed as exact
    DECIMAL(38,4), ONE double division by 2*X_y*X_{y-1} at the edge),
    over the FULL segment grid so a segment entering or leaving the
    book contributes its whole weight. n_segments counts segments with
    revenue in year y. Years with a zero-revenue side are excluded by
    an exact decimal guard (cannot occur at shipped SFs; documented).
    Corpus work is the shared daily agg; the grid/lag joins ride the
    |years| x |segments| relation."""
    daily = _seg_daily(spark, sf_dir)
    ys = daily.groupBy(F.year("d").alias("y"), "segment").agg(
        F.sum("x").cast("decimal(18,2)").alias("xs")
    )
    yrs = ys.select("y").distinct()
    sgs = ys.select("segment").distinct()
    grid = (
        yrs.crossJoin(F.broadcast(sgs))
        .join(F.broadcast(ys), ["y", "segment"], "left")
        .select(
            "y",
            "segment",
            F.coalesce(F.col("xs"), F.lit(0).cast("decimal(18,2)")).alias("xs"),
        )
    )
    yt = grid.groupBy("y").agg(F.sum("xs").cast("decimal(18,2)").alias("xy"))
    gp = grid.select(
        (F.col("y") + 1).alias("y"),
        "segment",
        F.col("xs").alias("xsp"),
    )
    ytp = yt.select((F.col("y") + 1).alias("y"), F.col("xy").alias("xyp"))
    terms = (
        grid.join(F.broadcast(gp), ["y", "segment"])
        .join(F.broadcast(yt), "y")
        .join(F.broadcast(ytp), "y")
        .filter((F.col("xy") > 0) & (F.col("xyp") > 0))
        .select(
            "y",
            "xy",
            "xyp",
            F.abs(
                F.col("xs").cast("decimal(19,2)")
                * F.col("xyp").cast("decimal(19,2)")
                - F.col("xsp").cast("decimal(19,2)")
                * F.col("xy").cast("decimal(19,2)")
            ).alias("num"),
            F.when(F.col("xs") > 0, 1).otherwise(0).alias("present"),
        )
    )
    return (
        terms.groupBy("y", "xy", "xyp")
        .agg(
            F.sum("present").cast("bigint").alias("n_segments"),
            (
                _as_d(F.sum("num"))
                / (F.lit(2.0) * _as_d(F.col("xy")) * _as_d(F.col("xyp")))
            ).alias("turnover"),
        )
        .select(
            F.col("y").cast("bigint").alias("year"), "n_segments", "turnover"
        )
        .orderBy("year")
    )


# ---------------------------------------------------------------------------
# fin_brinson_attribution — allocation / selection / interaction


@register(
    "fin_brinson_attribution",
    tags=("finance", "agg"),
    oracle=f"""
        WITH daily AS ({_SEG_DAILY_SQL}),
        pdaily AS (
            SELECT c.c_mktsegment AS segment,
                   EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS y,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS xp
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            GROUP BY 1, 2
        ),
        bys AS (
            SELECT EXTRACT(year FROM d) AS y, segment,
                   CAST(SUM(x) AS DECIMAL(18,2)) AS xb
            FROM daily GROUP BY 1, 2
        ),
        yrs AS (SELECT DISTINCT y FROM bys),
        sgs AS (SELECT DISTINCT segment FROM bys),
        grid AS (
            SELECT yrs.y, sgs.segment,
                   COALESCE(bys.xb, CAST(0 AS DECIMAL(18,2))) AS xb,
                   COALESCE(pdaily.xp, CAST(0 AS DECIMAL(18,2))) AS xp
            FROM yrs CROSS JOIN sgs
            LEFT JOIN bys ON bys.y = yrs.y AND bys.segment = sgs.segment
            LEFT JOIN pdaily ON pdaily.y = yrs.y
                            AND pdaily.segment = sgs.segment
        ),
        tots AS (
            SELECT y, CAST(SUM(xb) AS DECIMAL(18,2)) AS tb,
                   CAST(SUM(xp) AS DECIMAL(18,2)) AS tp
            FROM grid GROUP BY y
        ),
        j AS (
            SELECT g.y, g.segment,
                   CAST(CAST(g.xb AS VARCHAR) AS DOUBLE) AS xb,
                   CAST(CAST(g.xp AS VARCHAR) AS DOUBLE) AS xp,
                   CAST(CAST(gp.xb AS VARCHAR) AS DOUBLE) AS xbp,
                   CAST(CAST(gp.xp AS VARCHAR) AS DOUBLE) AS xpp,
                   CAST(CAST(t.tb AS VARCHAR) AS DOUBLE) AS tb,
                   CAST(CAST(tp2.tb AS VARCHAR) AS DOUBLE) AS tbp,
                   CAST(CAST(t.tp AS VARCHAR) AS DOUBLE) AS tpv,
                   CAST(CAST(tp2.tp AS VARCHAR) AS DOUBLE) AS tpp
            FROM grid g
            JOIN grid gp ON gp.y = g.y - 1 AND gp.segment = g.segment
            JOIN tots t ON t.y = g.y
            JOIN tots tp2 ON tp2.y = g.y - 1
        )
        SELECT CAST(y AS BIGINT) AS year, segment,
               CASE WHEN xbp > 0 AND xpp > 0 AND tbp > 0 AND tpp > 0 THEN
                 (xpp / tpp - xbp / tbp) * ((xb / xbp - 1) - (tb / tbp - 1))
               END AS allocation,
               CASE WHEN xbp > 0 AND xpp > 0 AND tbp > 0 AND tpp > 0 THEN
                 (xbp / tbp) * ((xp / xpp - 1) - (xb / xbp - 1))
               END AS selection,
               CASE WHEN xbp > 0 AND xpp > 0 AND tbp > 0 AND tpp > 0 THEN
                 (xpp / tpp - xbp / tbp) * ((xp / xpp - 1) - (xb / xbp - 1))
               END AS interaction
        FROM j ORDER BY year, segment
    """,
)
def fin_brinson_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brinson-Hood-Beebower performance attribution of the
    HIGH-PRIORITY order book (the 'portfolio': priorities 1-2) against
    the whole book (the 'benchmark'), categories = market segments,
    periods = years, weights = PRIOR-year value shares, returns =
    year-over-year revenue growth per category: allocation =
    (w_p - w_b)(r_b,s - r_b), selection = w_b (r_p,s - r_b,s),
    interaction = (w_p - w_b)(r_p,s - r_b,s) (Brinson, Hood & Beebower
    1986). Exactness: every input crosses decimal->double ONCE
    (VARCHAR route), each effect is ONE fixed-parenthesization
    expression with sub-terms repeated verbatim on both engines — no
    multi-term float sums. A zero prior-year value on any of the four
    sides NULLs all three effects identically (the r_b total-return
    term uses the same guard set; documented — at shipped SFs every
    year/segment has revenue on both sides). Corpus work: two
    broadcast-dim aggs; the attribution rides the year x segment
    grid."""
    daily = _seg_daily(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pdaily = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("decimal(18,2)").alias("xp"))
    )
    bys = daily.groupBy(F.year("d").alias("y"), "segment").agg(
        F.sum("x").cast("decimal(18,2)").alias("xb")
    )
    yrs = bys.select("y").distinct()
    sgs = bys.select("segment").distinct()
    zero = F.lit(0).cast("decimal(18,2)")
    grid = (
        yrs.crossJoin(F.broadcast(sgs))
        .join(F.broadcast(bys), ["y", "segment"], "left")
        .join(F.broadcast(pdaily), ["y", "segment"], "left")
        .select(
            "y",
            "segment",
            F.coalesce(F.col("xb"), zero).alias("xb"),
            F.coalesce(F.col("xp"), zero).alias("xp"),
        )
    )
    tots = grid.groupBy("y").agg(
        F.sum("xb").cast("decimal(18,2)").alias("tb"),
        F.sum("xp").cast("decimal(18,2)").alias("tp"),
    )
    gp = grid.select(
        (F.col("y") + 1).alias("y"),
        "segment",
        F.col("xb").alias("xbp_d"),
        F.col("xp").alias("xpp_d"),
    )
    totp = tots.select(
        (F.col("y") + 1).alias("y"),
        F.col("tb").alias("tbp_d"),
        F.col("tp").alias("tpp_d"),
    )
    j = (
        grid.join(F.broadcast(gp), ["y", "segment"])
        .join(F.broadcast(tots), "y")
        .join(F.broadcast(totp), "y")
        .select(
            "y",
            "segment",
            _as_d(F.col("xb")).alias("xb"),
            _as_d(F.col("xp")).alias("xp"),
            _as_d(F.col("xbp_d")).alias("xbp"),
            _as_d(F.col("xpp_d")).alias("xpp"),
            _as_d(F.col("tb")).alias("tb"),
            _as_d(F.col("tbp_d")).alias("tbp"),
            _as_d(F.col("tp")).alias("tpv"),
            _as_d(F.col("tpp_d")).alias("tpp"),
        )
    )
    ok = (
        (F.col("xbp") > 0)
        & (F.col("xpp") > 0)
        & (F.col("tbp") > 0)
        & (F.col("tpp") > 0)
    )
    wp = F.col("xpp") / F.col("tpp")
    wb = F.col("xbp") / F.col("tbp")
    rbs = F.col("xb") / F.col("xbp") - 1
    rps = F.col("xp") / F.col("xpp") - 1
    rb = F.col("tb") / F.col("tbp") - 1
    return j.select(
        F.col("y").cast("bigint").alias("year"),
        "segment",
        F.when(ok, (wp - wb) * (rbs - rb)).alias("allocation"),
        F.when(ok, wb * (rps - rbs)).alias("selection"),
        F.when(ok, (wp - wb) * (rps - rbs)).alias("interaction"),
    ).orderBy("year", "segment")


# ---------------------------------------------------------------------------
# fin_burke_ratio — drawdown-depth-penalized performance


@register(
    "fin_burke_ratio",
    tags=("finance", "window"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        pk AS (
            SELECT d, xm,
                   MAX(xm) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak
            FROM mkt
        ),
        flagged AS (
            SELECT d, xm, peak,
                   CASE WHEN xm < peak THEN 1 ELSE 0 END AS below,
                   ROW_NUMBER() OVER (ORDER BY d) AS rn
            FROM pk
        ),
        isl AS (
            SELECT *,
                   rn - ROW_NUMBER() OVER (PARTITION BY below ORDER BY d)
                       AS grp
            FROM flagged
        ),
        eps AS (
            SELECT grp,
                   CAST(FLOOR(MAX(
                       CAST(CAST(peak - xm AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(peak AS VARCHAR) AS DOUBLE))
                       * CAST(1e9 AS DOUBLE)) AS BIGINT) AS q
            FROM isl WHERE below = 1 GROUP BY grp
        ),
        dd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_episodes,
                   CAST(CAST(SUM(CAST(q AS DECIMAL(19,0)) * q) AS VARCHAR)
                        AS DOUBLE) AS sq2
            FROM eps
        ),
        mu AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS s1
            FROM rm
        )
        SELECT mu.n_days, dd.n_episodes,
               dd.sq2 / CAST(1e18 AS DOUBLE) AS sum_dd2,
               CASE WHEN dd.sq2 > 0 AND mu.n_days > 0 THEN
                 ((mu.s1 / CAST(1e9 AS DOUBLE)) / CAST(mu.n_days AS DOUBLE))
                 / sqrt(dd.sq2 / CAST(1e18 AS DOUBLE))
               END AS burke_daily
        FROM mu CROSS JOIN dd
    """,
)
def fin_burke_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burke ratio of the whole-market daily revenue series: mean
    daily return divided by sqrt(sum of squared drawdown depths) over
    below-peak EPISODES (Burke 1994) — penalizes many deep drawdowns
    harder than max-drawdown-based Calmar (fin_calmar_ratio). The
    running peak is an exact decimal window max; each day's drawdown
    fraction is one VARCHAR-routed division; episodes come from the
    standard gaps-and-islands double row_number; each episode's MAX
    depth is a deterministic double max, q9-FLOOR-quantized to BIGINT
    so the across-episodes sum of squares is an exact DECIMAL — the
    only unbounded-count float sum is thereby integerized. Burke is
    ONE guarded expression. No drawdowns (sq2 = 0) NULLs identically.
    The running-peak window is calendar-bounded (O(days))."""
    daily = _seg_daily(spark, sf_dir)
    mkt = daily.groupBy("d").agg(F.sum("x").cast("decimal(18,2)").alias("xm"))
    wd = Window.orderBy("d")  # calendar-bounded
    pk = mkt.select(
        "d",
        "xm",
        F.max("xm").over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("peak"),
    )
    flagged = pk.select(
        "d",
        "xm",
        "peak",
        F.when(F.col("xm") < F.col("peak"), 1).otherwise(0).alias("below"),
        F.row_number().over(wd).alias("rn"),
    )
    isl = flagged.withColumn(
        "grp",
        F.col("rn")
        - F.row_number().over(Window.partitionBy("below").orderBy("d")),
    )
    eps = (
        isl.filter(F.col("below") == 1)
        .groupBy("grp")
        .agg(
            F.floor(
                F.max(
                    _as_d(F.col("peak") - F.col("xm")) / _as_d(F.col("peak"))
                )
                * F.lit(1e9)
            ).cast("bigint").alias("q")
        )
    )
    dd = eps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_episodes"),
        _as_d(F.sum(F.col("q").cast("decimal(19,0)") * F.col("q"))).alias(
            "sq2"
        ),
    )
    rm = _mkt_returns(spark, sf_dir)
    mu = rm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _as_d(F.sum(F.col("m").cast("decimal(19,0)"))).alias("s1"),
    )
    sum_dd2 = F.col("sq2") / F.expr("CAST(1e18 AS DOUBLE)")
    return (
        mu.crossJoin(F.broadcast(dd))
        .select(
            "n_days",
            "n_episodes",
            sum_dd2.alias("sum_dd2"),
            F.when(
                (F.col("sq2") > 0) & (F.col("n_days") > 0),
                (
                    (F.col("s1") / F.expr("CAST(1e9 AS DOUBLE)"))
                    / F.col("n_days").cast("double")
                )
                / F.sqrt(sum_dd2),
            ).alias("burke_daily"),
        )
    )


# ---------------------------------------------------------------------------
# Integer-exact learning primitives on the embedding fixture: the
# first 4 dims quantized to micro-units (q = floor(e * 1e6), exact —
# float->double widening is lossless and floor is IEEE), label
# y = [q0 + q1 >= 0] — the linearly-separable _logreg_features recipe
# with every input integerized so training is rational end-to-end.


_ML_FEATS_SQL = """
        feats AS (
            SELECT vec_id,
                   CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)
                       AS q0,
                   CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT)
                       AS q1,
                   CAST(FLOOR(CAST(embedding[3] AS DOUBLE) * 1e6) AS BIGINT)
                       AS q2,
                   CAST(FLOOR(CAST(embedding[4] AS DOUBLE) * 1e6) AS BIGINT)
                       AS q3
            FROM embeddings
        ),
        lab AS (
            SELECT vec_id, q0, q1, q2, q3,
                   CASE WHEN q0 + q1 >= 0 THEN 1 ELSE -1 END AS y
            FROM feats
        )
"""


def _ml_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    cols = [
        F.floor(F.col("embedding")[i].cast("double") * F.lit(1e6))
        .cast("bigint")
        .alias(f"q{i}")
        for i in range(4)
    ]
    feats = e.select("vec_id", *cols)
    return feats.withColumn(
        "y",
        F.when(F.col("q0") + F.col("q1") >= 0, 1).otherwise(-1),
    )


@register(
    "ml_perceptron_2round",
    tags=("ml", "iterative", "agg"),
    oracle=f"""
        WITH {_ML_FEATS_SQL},
        w1 AS (
            SELECT CAST(SUM(CAST(y AS DECIMAL(20,0)))      AS BIGINT) AS w0,
                   CAST(SUM(CAST(y AS DECIMAL(20,0)) * q0) AS BIGINT) AS wa,
                   CAST(SUM(CAST(y AS DECIMAL(20,0)) * q1) AS BIGINT) AS wb,
                   CAST(SUM(CAST(y AS DECIMAL(20,0)) * q2) AS BIGINT) AS wc,
                   CAST(SUM(CAST(y AS DECIMAL(20,0)) * q3) AS BIGINT) AS wd
            FROM lab
        ),
        m2 AS (
            SELECT l.*,
                   CAST(l.y AS DECIMAL(38,0))
                   * (CAST(w1.w0 AS DECIMAL(25,0))
                      + CAST(w1.wa AS DECIMAL(25,0)) * l.q0
                      + CAST(w1.wb AS DECIMAL(25,0)) * l.q1
                      + CAST(w1.wc AS DECIMAL(25,0)) * l.q2
                      + CAST(w1.wd AS DECIMAL(25,0)) * l.q3) AS margin
            FROM lab l CROSS JOIN w1
        ),
        w2 AS (
            SELECT CAST(MAX(w1.w0) + SUM(CASE WHEN m2.margin <= 0
                            THEN m2.y ELSE 0 END) AS BIGINT) AS w0,
                   CAST(MAX(w1.wa) + SUM(CASE WHEN m2.margin <= 0
                            THEN m2.y * m2.q0 ELSE 0 END) AS BIGINT) AS wa,
                   CAST(MAX(w1.wb) + SUM(CASE WHEN m2.margin <= 0
                            THEN m2.y * m2.q1 ELSE 0 END) AS BIGINT) AS wb,
                   CAST(MAX(w1.wc) + SUM(CASE WHEN m2.margin <= 0
                            THEN m2.y * m2.q2 ELSE 0 END) AS BIGINT) AS wc,
                   CAST(MAX(w1.wd) + SUM(CASE WHEN m2.margin <= 0
                            THEN m2.y * m2.q3 ELSE 0 END) AS BIGINT) AS wd,
                   CAST(SUM(CASE WHEN m2.margin <= 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_updates
            FROM m2 CROSS JOIN w1
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lab) AS n,
               w2.w0, w2.wa AS w_q0, w2.wb AS w_q1, w2.wc AS w_q2,
               w2.wd AS w_q3, w2.n_updates,
               (SELECT CAST(SUM(CASE WHEN
                    CAST(l.y AS DECIMAL(38,0))
                    * (CAST(w2.w0 AS DECIMAL(25,0))
                       + CAST(w2.wa AS DECIMAL(25,0)) * l.q0
                       + CAST(w2.wb AS DECIMAL(25,0)) * l.q1
                       + CAST(w2.wc AS DECIMAL(25,0)) * l.q2
                       + CAST(w2.wd AS DECIMAL(25,0)) * l.q3) <= 0
                    THEN 1 ELSE 0 END) AS BIGINT) FROM lab l) AS err_after
        FROM w2
    """,
)
def ml_perceptron_2round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round BATCH perceptron on the quantized embedding features
    (Rosenblatt update, learning rate 1): w0 = 0 makes round 1's
    update the exact class-difference sum w1 = sum y*x (every margin
    is 0, hence 'misclassified'); round 2 adds sum y*x over rows w1
    still gets wrong; err_after counts w2's mistakes — the fixed-round
    unrolled-iteration pattern (ml_gbdt/vec_kmeans_unrolled2
    precedent) applied to the classic mistake-driven learner.
    EVERYTHING is integer: micro-unit features, +-1 labels, weight
    sums in DECIMAL(20,0), per-row margins as exact DECIMAL products
    (|w|*|q| < 1e21 at sf1000 — inside DECIMAL(38,0) to ~sf1e12). No
    float exists anywhere in this query. Scale: each round is one
    map-side-combining aggregate + a 1-row broadcast — the textbook
    distributed batch-GD shape with per-round lineage cut by the
    1-row weight relations."""
    lab = _ml_feats(spark, sf_dir)
    y_d = F.col("y").cast("decimal(20,0)")
    w1 = lab.agg(
        F.sum(y_d).cast("bigint").alias("w0"),
        F.sum(y_d * F.col("q0")).cast("bigint").alias("wa"),
        F.sum(y_d * F.col("q1")).cast("bigint").alias("wb"),
        F.sum(y_d * F.col("q2")).cast("bigint").alias("wc"),
        F.sum(y_d * F.col("q3")).cast("bigint").alias("wd"),
    )

    def margin(wp: str):
        return F.col("y").cast("decimal(38,0)") * (
            F.col(f"{wp}w0").cast("decimal(25,0)")
            + F.col(f"{wp}wa").cast("decimal(25,0)") * F.col("q0")
            + F.col(f"{wp}wb").cast("decimal(25,0)") * F.col("q1")
            + F.col(f"{wp}wc").cast("decimal(25,0)") * F.col("q2")
            + F.col(f"{wp}wd").cast("decimal(25,0)") * F.col("q3")
        )

    m2 = lab.crossJoin(F.broadcast(w1)).withColumn("margin", margin(""))
    mis = F.col("margin") <= 0
    w2 = m2.agg(
        (F.max("w0") + F.sum(F.when(mis, F.col("y")).otherwise(0)))
        .cast("bigint").alias("v0"),
        (F.max("wa") + F.sum(F.when(mis, F.col("y") * F.col("q0")).otherwise(0)))
        .cast("bigint").alias("va"),
        (F.max("wb") + F.sum(F.when(mis, F.col("y") * F.col("q1")).otherwise(0)))
        .cast("bigint").alias("vb"),
        (F.max("wc") + F.sum(F.when(mis, F.col("y") * F.col("q2")).otherwise(0)))
        .cast("bigint").alias("vc"),
        (F.max("wd") + F.sum(F.when(mis, F.col("y") * F.col("q3")).otherwise(0)))
        .cast("bigint").alias("vd"),
        F.sum(F.when(mis, 1).otherwise(0)).cast("bigint").alias("n_updates"),
    )
    w2r = w2.select(
        F.col("v0").alias("w2w0"),
        F.col("va").alias("w2wa"),
        F.col("vb").alias("w2wb"),
        F.col("vc").alias("w2wc"),
        F.col("vd").alias("w2wd"),
        "n_updates",
    )
    scored = lab.crossJoin(F.broadcast(w2r)).withColumn("m", margin("w2"))
    out = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("w2w0").alias("w0"),
        F.max("w2wa").alias("w_q0"),
        F.max("w2wb").alias("w_q1"),
        F.max("w2wc").alias("w_q2"),
        F.max("w2wd").alias("w_q3"),
        F.max("n_updates").alias("n_updates"),
        F.sum(F.when(F.col("m") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("err_after"),
    )
    return out.select(
        "n", "w0", "w_q0", "w_q1", "w_q2", "w_q3", "n_updates", "err_after"
    )


# ---------------------------------------------------------------------------
# ml_gini_feature_split — CART-style split scoring, fully integer bins


@register(
    "ml_gini_feature_split",
    tags=("ml", "agg", "window"),
    oracle=f"""
        WITH {_ML_FEATS_SQL},
        long AS (
            SELECT 0 AS f, q0 AS q, CASE WHEN y = 1 THEN 1 ELSE 0 END AS pos
            FROM lab
            UNION ALL SELECT 1, q1, CASE WHEN y = 1 THEN 1 ELSE 0 END FROM lab
            UNION ALL SELECT 2, q2, CASE WHEN y = 1 THEN 1 ELSE 0 END FROM lab
            UNION ALL SELECT 3, q3, CASE WHEN y = 1 THEN 1 ELSE 0 END FROM lab
        ),
        rngs AS (
            SELECT f, MIN(q) AS qmin, MAX(q) AS qmax FROM long GROUP BY f
        ),
        binned AS (
            SELECT long.f,
                   CAST(((long.q - rngs.qmin) * 8)
                        // (rngs.qmax - rngs.qmin + 1) AS BIGINT) AS bin,
                   long.pos
            FROM long JOIN rngs ON rngs.f = long.f
        ),
        cells AS (
            SELECT f, bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(pos) AS BIGINT) AS p
            FROM binned GROUP BY f, bin
        ),
        cum AS (
            SELECT f, bin,
                   CAST(SUM(n) OVER (PARTITION BY f ORDER BY bin) AS BIGINT)
                       AS nl,
                   CAST(SUM(p) OVER (PARTITION BY f ORDER BY bin) AS BIGINT)
                       AS pl,
                   CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS nt,
                   CAST(SUM(p) OVER (PARTITION BY f) AS BIGINT) AS pt
            FROM cells
        ),
        scored AS (
            SELECT f, bin, nl, nt - nl AS nr,
                   (CAST(nt AS DOUBLE)
                    - (CAST(pt * pt AS DOUBLE)
                       + CAST((nt - pt) * (nt - pt) AS DOUBLE))
                      / CAST(nt AS DOUBLE))
                   - ((CAST(nl AS DOUBLE)
                       - (CAST(pl * pl AS DOUBLE)
                          + CAST((nl - pl) * (nl - pl) AS DOUBLE))
                         / CAST(nl AS DOUBLE))
                      + (CAST(nt - nl AS DOUBLE)
                         - (CAST((pt - pl) * (pt - pl) AS DOUBLE)
                            + CAST(((nt - nl) - (pt - pl))
                                   * ((nt - nl) - (pt - pl)) AS DOUBLE))
                           / CAST(nt - nl AS DOUBLE))) AS dec_abs
            FROM cum WHERE nl > 0 AND nt - nl > 0
        ),
        best AS (
            SELECT f, bin, nl, nr, dec_abs,
                   ROW_NUMBER() OVER (PARTITION BY f
                       ORDER BY dec_abs DESC, bin) AS rk
            FROM scored
        )
        SELECT CAST(f AS INT) AS feature, CAST(bin AS INT) AS best_bin,
               nl AS n_left, nr AS n_right,
               dec_abs / CAST((SELECT MAX(nt) FROM cum) AS DOUBLE)
                   AS gini_decrease
        FROM best WHERE rk = 1 ORDER BY feature
    """,
)
def ml_gini_feature_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART split scoring: for each of the 4 quantized embedding
    features, the 8-bin threshold maximizing the Gini impurity
    decrease n*G(parent) - [nL*G(L) + nR*G(R)] (reported per-sample) —
    the feature-ranking half of decision-tree induction, complementing
    ml_chi2_feature_select with the impurity criterion trees actually
    split on. Bins are PURE INTEGER arithmetic ((q - min) * 8 //
    (max - min + 1) — BIGINT div, no float bin edges); count
    squares stay in BIGINT (ceiling ~sf4e3 on p^2*...; products cast
    to double ONCE each); the decrease is one fixed-parenthesization
    double expression and the per-feature argmax tie-breaks on bin.
    Degenerate single-side splits are excluded exactly (nl/nr > 0).
    Scale: one scan into a 4x8-cell agg; everything downstream is
    grid-sized."""
    lab = _ml_feats(spark, sf_dir)
    parts = []
    for f in range(4):
        parts.append(
            lab.select(
                F.lit(f).alias("f"),
                F.col(f"q{f}").alias("q"),
                F.when(F.col("y") == 1, 1).otherwise(0).alias("pos"),
            )
        )
    long = parts[0].unionByName(parts[1]).unionByName(parts[2]).unionByName(
        parts[3]
    )
    rngs = long.groupBy("f").agg(
        F.min("q").alias("qmin"), F.max("q").alias("qmax")
    )
    binned = long.join(F.broadcast(rngs), "f").select(
        "f",
        F.expr("CAST(((q - qmin) * 8) div (qmax - qmin + 1) AS BIGINT)")
        .alias("bin"),
        "pos",
    )
    cells = binned.groupBy("f", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    wcum = Window.partitionBy("f").orderBy("bin")
    wall = Window.partitionBy("f")
    cum = cells.select(
        "f",
        "bin",
        F.sum("n").over(wcum).cast("bigint").alias("nl"),
        F.sum("p").over(wcum).cast("bigint").alias("pl"),
        F.sum("n").over(wall).cast("bigint").alias("nt"),
        F.sum("p").over(wall).cast("bigint").alias("pt"),
    )
    nl, pl = F.col("nl"), F.col("pl")
    nt, pt = F.col("nt"), F.col("pt")
    nr, pr = nt - nl, pt - pl

    def gini_term(nn, pp):
        return nn.cast("double") - (
            (pp * pp).cast("double") + ((nn - pp) * (nn - pp)).cast("double")
        ) / nn.cast("double")

    scored = cum.filter((nl > 0) & (nr > 0)).select(
        "f",
        "bin",
        "nl",
        nr.alias("nr"),
        "nt",
        (gini_term(nt, pt) - (gini_term(nl, pl) + gini_term(nr, pr))).alias(
            "dec_abs"
        ),
    )
    wbest = Window.partitionBy("f").orderBy(F.col("dec_abs").desc(), "bin")
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            F.col("f").cast("int").alias("feature"),
            F.col("bin").cast("int").alias("best_bin"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            (F.col("dec_abs") / F.col("nt").cast("double")).alias(
                "gini_decrease"
            ),
        )
        .orderBy("feature")
    )


# ---------------------------------------------------------------------------
# ml_macro_f1 — multiclass macro-averaged F1 of a bin-majority model


@register(
    "ml_macro_f1",
    tags=("ml", "eval", "agg"),
    oracle="""
        WITH rng AS (
            SELECT MIN(o_totalprice) AS pmin, MAX(o_totalprice) AS pmax
            FROM orders
        ),
        coded AS (
            SELECT o_orderpriority AS actual,
                   CASE WHEN pmax = pmin THEN 0
                        ELSE LEAST(7, CAST(FLOOR(
                       (CAST(o_totalprice AS DOUBLE)
                        - CAST(pmin AS DOUBLE))
                       / ((CAST(pmax AS DOUBLE) - CAST(pmin AS DOUBLE))
                          / CAST(8 AS DOUBLE))) AS INT)) END AS bin
            FROM orders CROSS JOIN rng
        ),
        binmaj AS (
            SELECT bin, MAX({'cnt': cnt, 'cl': actual}).cl AS pred
            FROM (SELECT bin, actual, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM coded GROUP BY bin, actual)
            GROUP BY bin
        ),
        conf AS (
            SELECT c.actual, b.pred, CAST(COUNT(*) AS BIGINT) AS n
            FROM coded c JOIN binmaj b ON b.bin = c.bin
            GROUP BY c.actual, b.pred
        ),
        cls AS (SELECT DISTINCT actual AS cl FROM coded),
        perclass AS (
            SELECT cls.cl,
                   CAST(COALESCE(SUM(CASE WHEN conf.actual = cls.cl
                                           AND conf.pred = cls.cl
                                     THEN conf.n END), 0) AS BIGINT) AS tp,
                   CAST(COALESCE(SUM(CASE WHEN conf.pred = cls.cl
                                           AND conf.actual <> cls.cl
                                     THEN conf.n END), 0) AS BIGINT) AS fp,
                   CAST(COALESCE(SUM(CASE WHEN conf.actual = cls.cl
                                           AND conf.pred <> cls.cl
                                     THEN conf.n END), 0) AS BIGINT) AS fn
            FROM cls LEFT JOIN conf ON TRUE
            GROUP BY cls.cl
        ),
        scored AS (
            SELECT cl, tp, fp, fn,
                   CASE WHEN 2 * tp + fp + fn > 0 THEN
                     CAST(2 * tp AS DOUBLE)
                       / CAST(2 * tp + fp + fn AS DOUBLE)
                   ELSE CAST(0 AS DOUBLE) END AS f1
            FROM perclass
        ),
        mac AS (
            SELECT list_reduce(list(f1 ORDER BY cl), (a, x) -> a + x)
                     / CAST(COUNT(*) AS DOUBLE) AS macro_f1
            FROM scored
        )
        SELECT s.cl AS class, s.tp, s.fp, s.fn, s.f1, m.macro_f1
        FROM scored s CROSS JOIN mac m
        ORDER BY class
    """,
)
def ml_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macro-averaged F1 of the bin-majority classifier that predicts
    order PRIORITY from the order-value octile (train = score =
    resubstitution, documented): per-class F1 = 2TP/(2TP+FP+FN) — the
    multiclass counterpart of ml_fbeta_grid's binary scores and the
    number reported by every imbalanced-multiclass eval. The majority
    label per bin is an exact integer argmax (max (count, class)
    struct — ties break to the lexicographically LARGEST class,
    identical in both engines' struct/ROW ordering); the confusion
    marginals are integer sums; each F1 is one guarded division
    (convention: no-support classes score 0, not NULL); the macro
    average is an ORDER-PINNED fold over the class list divided by the
    class count. Scale: two scans + grid-sized joins; the class
    relation is 5 rows."""
    o = load_table(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_totalprice").alias("pmin"), F.max("o_totalprice").alias("pmax")
    )
    coded = o.crossJoin(F.broadcast(rng)).select(
        F.col("o_orderpriority").alias("actual"),
        F.when(F.col("pmax") == F.col("pmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(7),
                F.floor(
                    (F.col("o_totalprice").cast("double")
                     - F.col("pmin").cast("double"))
                    / ((F.col("pmax").cast("double")
                        - F.col("pmin").cast("double")) / F.lit(8.0))
                ).cast("int"),
            )
        ).alias("bin"),
    )
    binmaj = (
        coded.groupBy("bin", "actual")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .groupBy("bin")
        .agg(F.max(F.struct("cnt", "actual")).alias("best"))
        .select("bin", F.col("best.actual").alias("pred"))
    )
    conf = (
        coded.join(F.broadcast(binmaj), "bin")
        .groupBy("actual", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    cls = coded.select(F.col("actual").alias("cl")).distinct()
    perclass = (
        cls.crossJoin(F.broadcast(conf))
        .groupBy("cl")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("actual") == F.col("cl"))
                        & (F.col("pred") == F.col("cl")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("tp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("pred") == F.col("cl"))
                        & (F.col("actual") != F.col("cl")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("fp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("actual") == F.col("cl"))
                        & (F.col("pred") != F.col("cl")),
                        F.col("n"),
                    )
                ),
                F.lit(0),
            ).cast("bigint").alias("fn"),
        )
    )
    den = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    scored = perclass.select(
        "cl",
        "tp",
        "fp",
        "fn",
        F.when(den > 0, (2 * F.col("tp")).cast("double") / den.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )
    mac = scored.agg(
        (
            _ordered_fold_sum(F.col("cl"), F.col("f1"))
            / F.count(F.lit(1)).cast("double")
        ).alias("macro_f1")
    )
    return (
        scored.crossJoin(F.broadcast(mac))
        .select(
            F.col("cl").alias("class"), "tp", "fp", "fn", "f1", "macro_f1"
        )
        .orderBy("class")
    )


# ---------------------------------------------------------------------------
# ml_average_precision_at_k — retrieval AP@10 on the cosine ranking


@register(
    "ml_average_precision_at_k",
    tags=("ml", "eval", "vector"),
    oracle="""
        WITH q AS (
            SELECT embedding AS qe, label AS ql FROM embeddings
            WHERE vec_id = 0
        ),
        scored AS (
            SELECT e.vec_id,
                   CASE WHEN e.label = q.ql THEN 1 ELSE 0 END AS rel,
                   list_sum(list_transform(list_zip(q.qe, e.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(q.qe,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                       AS cos_sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> 0
        ),
        ranked AS (
            SELECT rel,
                   ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rk,
                   SUM(rel) OVER (ORDER BY cos_sim DESC, vec_id) AS cum_rel
            FROM scored
        ),
        rtot AS (
            SELECT CAST(SUM(rel) AS BIGINT) AS n_relevant FROM scored
        ),
        ap AS (
            SELECT list_reduce(
                       list(CAST(rel AS DOUBLE) * (CAST(cum_rel AS DOUBLE)
                                / CAST(rk AS DOUBLE)) ORDER BY rk),
                       (a, x) -> a + x) AS num
            FROM ranked WHERE rk <= 10
        )
        SELECT rtot.n_relevant,
               CASE WHEN LEAST(rtot.n_relevant, 10) > 0 THEN
                 ap.num / CAST(LEAST(rtot.n_relevant, 10) AS DOUBLE)
               END AS ap_at_10
        FROM rtot CROSS JOIN ap
    """,
)
def ml_average_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision at k=10 for the retrieval task 'find vectors
    sharing query 0's label' ranked by exact cosine: AP@10 =
    sum_{k<=10} rel_k * P@k / min(R, 10) — the single-query building
    block of MAP, the ranking-quality number IR evals report alongside
    recall (vec_recall_curve). The ranking reuses the proven exact
    cosine machinery (sequential-fold dot product, deterministic
    (sim, id) tie-break); rel and cum_rel are integers; the 10
    precision terms are single divisions folded in ORDER-PINNED rank
    order; the normalizer min(R, 10) is exact. R = 0 NULLs identically
    (cannot occur at shipped SFs — labels repeat; asserted by the
    reference test). Scale: one broadcast-query scan + a top-10
    window."""
    from finance_etl_spark.functions.vectors import cosine

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("label").alias("ql")
    )
    scored = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.when(F.col("label") == F.col("ql"), 1).otherwise(0).alias("rel"),
        cosine("qe", "embedding").alias("cos_sim"),
    )
    wrk = Window.orderBy(F.col("cos_sim").desc(), "vec_id")
    ranked = scored.select(
        "rel",
        F.row_number().over(wrk).alias("rk"),
        F.sum("rel").over(wrk).alias("cum_rel"),
    )
    rtot = scored.agg(F.sum("rel").cast("bigint").alias("n_relevant"))
    ap = ranked.filter(F.col("rk") <= 10).agg(
        _ordered_fold_sum(
            F.col("rk"),
            F.col("rel").cast("double")
            * (F.col("cum_rel").cast("double") / F.col("rk").cast("double")),
        ).alias("num")
    )
    kk = F.least(F.col("n_relevant"), F.lit(10))
    return (
        rtot.crossJoin(F.broadcast(ap))
        .select(
            "n_relevant",
            F.when(kk > 0, F.col("num") / kk.cast("double")).alias("ap_at_10"),
        )
    )


# ---------------------------------------------------------------------------
# ml_split_balance_audit — md5 train/test split stratification check


@register(
    "ml_split_balance_audit",
    tags=("ml", "dq", "agg"),
    oracle="""
        WITH gated AS (
            SELECT o_orderpriority AS class,
                   CASE WHEN CAST('0x' || SUBSTRING(
                            md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS BIGINT)
                        < 52429 THEN 1 ELSE 0 END AS is_train
            FROM orders
        ),
        per AS (
            SELECT class,
                   CAST(SUM(is_train) AS BIGINT) AS n_train,
                   CAST(SUM(1 - is_train) AS BIGINT) AS n_test
            FROM gated GROUP BY class
        ),
        gtot AS (
            SELECT CAST(SUM(n_train) AS BIGINT) AS gt,
                   CAST(SUM(n_train + n_test) AS BIGINT) AS gn
            FROM per
        )
        SELECT class, n_train, n_test,
               CAST(n_train AS DOUBLE) / CAST(n_train + n_test AS DOUBLE)
                   AS train_frac,
               CAST(n_train AS DOUBLE) / CAST(n_train + n_test AS DOUBLE)
                 - CAST(gt AS DOUBLE) / CAST(gn AS DOUBLE) AS dev_from_global
        FROM per CROSS JOIN gtot
        ORDER BY class
    """,
)
def ml_split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification audit of the deterministic md5 80/20 train/test
    split (16-bit gate < 52429 = floor(0.8*65536), the
    cur_stratified_sample recipe): per priority class, the realized
    train fraction and its deviation from the global split rate —
    the pre-training balance check every pipeline should run before
    trusting a hash split (a skewed class here means the key
    correlates with the hash, i.e. a broken ladder). Counts are
    conditional-sum integers; fractions are single divisions; the
    deviation subtracts two identically-computed doubles. Every class
    is non-empty by the fixture schema (priority is NOT NULL). One
    scan, one 5-row agg."""
    o = load_table(spark, sf_dir, "orders")
    gate = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    gated = o.select(
        F.col("o_orderpriority").alias("class"),
        F.when(gate < 52429, 1).otherwise(0).alias("is_train"),
    )
    per = gated.groupBy("class").agg(
        F.sum("is_train").cast("bigint").alias("n_train"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("n_test"),
    )
    glob = per.agg(
        F.sum("n_train").cast("bigint").alias("gt"),
        F.sum(F.col("n_train") + F.col("n_test")).cast("bigint").alias("gn"),
    )
    frac = F.col("n_train").cast("double") / (
        F.col("n_train") + F.col("n_test")
    ).cast("double")
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            "class",
            "n_train",
            "n_test",
            frac.alias("train_frac"),
            (frac - F.col("gt").cast("double") / F.col("gn").cast("double"))
            .alias("dev_from_global"),
        )
        .orderBy("class")
    )


# ---------------------------------------------------------------------------
# text_levenshtein_profile — bucketed edit-distance audit


@register(
    "text_levenshtein_profile",
    tags=("text", "dedup", "join"),
    oracle="""
        WITH pairs AS (
            SELECT a1.p_partkey // 16 AS bkt,
                   levenshtein(a1.p_name, a2.p_name) AS lev
            FROM part a1
            JOIN part a2 ON a1.p_partkey // 16 = a2.p_partkey // 16
                        AND a1.p_partkey < a2.p_partkey
        )
        SELECT CAST(lev // 5 AS INT) AS lev_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(lev) AS BIGINT) AS min_lev,
               CAST(MAX(lev) AS BIGINT) AS max_lev,
               CAST(SUM(CAST(lev AS BIGINT)) AS BIGINT) AS sum_lev
        FROM pairs
        GROUP BY 1 ORDER BY lev_bucket
    """,
)
def text_levenshtein_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance profile of part names over CONSTANT-SIZE key
    buckets (p_partkey div 16, 120 pairs per bucket): the histogram of
    Levenshtein distances (5-wide bins) across all within-bucket
    pairs — the character-level name-collision audit of the dedup
    family (minhash covers token similarity; this covers typo-scale
    similarity), with a near-duplicate signal showing up as mass in
    the low bins. Constant bucket size is the scale contract a fixed
    PREFIX block cannot give (block population grows linearly with
    the corpus until every block trips a size cap and the operator
    goes dark — measured at sf0.01 with 5-char blocks): here total
    pair cost is exactly 7.5 pairs per part at EVERY SF and the pair
    join shuffles on the bucket key. Levenshtein is an integer metric
    both engines implement identically (pinned against a pure-Python
    DP in the reference test); the histogram is exact integer
    aggregation."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    a1 = p.select(
        F.expr("p_partkey div 16").alias("bkt"),
        F.col("p_partkey").alias("k1"),
        F.col("p_name").alias("name1"),
    )
    a2 = p.select(
        F.expr("p_partkey div 16").alias("bkt"),
        F.col("p_partkey").alias("k2"),
        F.col("p_name").alias("name2"),
    )
    pairs = a1.join(a2, "bkt").filter(F.col("k1") < F.col("k2")).select(
        F.levenshtein("name1", "name2").alias("lev")
    )
    return (
        pairs.groupBy(F.expr("lev div 5").cast("int").alias("lev_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("lev").cast("bigint").alias("min_lev"),
            F.max("lev").cast("bigint").alias("max_lev"),
            F.sum(F.col("lev").cast("bigint")).cast("bigint").alias("sum_lev"),
        )
        .orderBy("lev_bucket")
    )


# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# text_sentence_stats — sentence segmentation profile per source


@register(
    "text_sentence_stats",
    tags=("text", "agg"),
    oracle="""
        WITH per_doc AS (
            SELECT source,
                   CAST(len(list_filter(
                       regexp_split_to_array(text, '[.!?]+'),
                       s -> len(trim(s)) > 0)) AS BIGINT) AS n_sent,
                   CAST(len(list_filter(
                       regexp_split_to_array(text, '[ \t\n\r]+'),
                       w -> len(w) > 0)) AS BIGINT) AS n_words
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_sent) AS BIGINT) AS total_sentences,
               CAST(SUM(n_words) AS BIGINT) AS total_words,
               CAST(SUM(n_sent) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS sentences_per_doc,
               CASE WHEN SUM(n_sent) > 0 THEN
                 CAST(SUM(n_words) AS DOUBLE) / CAST(SUM(n_sent) AS DOUBLE)
               END AS words_per_sentence
        FROM per_doc GROUP BY source ORDER BY source
    """,
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation profile per document source: sentence
    count (split on [.!?]+ runs, empty/whitespace fragments dropped),
    whitespace token count, and the derived sentences-per-doc /
    words-per-sentence averages — the structural half of text quality
    scoring (text_readability_fk consumes exactly these counts; this
    operator exposes them as an auditable aggregate). The split
    patterns use only regex constructs java.util.regex and RE2
    interpret identically (character classes + '+', the cur_pii_redact
    rule); counts are integers, the two averages single guarded
    divisions. Sources with only unpunctuated docs NULL
    words_per_sentence identically. One scan, one |sources|-row
    agg."""
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(
        F.split(F.col("text"), "[.!?]+"),
        lambda s: F.length(F.trim(s)) > 0,
    )
    words = F.filter(
        F.split(F.col("text"), "[ \t\n\r]+"), lambda w: F.length(w) > 0
    )
    per_doc = d.select(
        "source",
        F.size(sents).cast("bigint").alias("n_sent"),
        F.size(words).cast("bigint").alias("n_words"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_sent").cast("bigint").alias("total_sentences"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .select(
            "source",
            "n_docs",
            "total_sentences",
            "total_words",
            (
                F.col("total_sentences").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("sentences_per_doc"),
            F.when(
                F.col("total_sentences") > 0,
                F.col("total_words").cast("double")
                / F.col("total_sentences").cast("double"),
            ).alias("words_per_sentence"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text_hapax_ratio — vocabulary-tail health per source


@register(
    "text_hapax_ratio",
    tags=("text", "agg"),
    oracle="""
        WITH toks AS (
            SELECT source, UNNEST(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z]+'),
                       t -> len(t) > 0)) AS tok
            FROM documents
        ),
        counts AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY source, tok
        )
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS hapax_ratio
        FROM counts GROUP BY source ORDER BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena share of each source's vocabulary: the fraction
    of distinct tokens occurring exactly once — the vocabulary-tail
    health number that complements text_heaps_curve (growth) and
    text_type_token_ratio (breadth): natural prose runs ~0.4-0.6
    hapax; templated or looped text collapses it. Lower-cased alpha
    tokenization with the cross-engine-safe regex subset; counts are
    exact integers aggregated on the (source, token) key — shuffle is
    on the token space, and a df-style skew cap is unnecessary because
    the reduction is a plain count. Ratio is one division (vocab > 0
    whenever a source has any alpha text; empty-vocab sources drop
    from the group-by identically)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            "n_hapax",
            (
                F.col("n_hapax").cast("double") / F.col("vocab").cast("double")
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# graph_lpa_majority_2round — synchronous label propagation


from finance_etl_spark.plans.curation import (  # noqa: E402
    _GRAPH_EDGE_CTE,
    _trade_edges_undirected,
)


@register(
    "graph_lpa_majority_2round",
    tags=("graph", "iterative", "window"),
    oracle=f"""
        WITH {_GRAPH_EDGE_CTE},
        l1 AS (
            SELECT v, lbl AS l1 FROM (
                SELECT nbr.v, nbr.n AS lbl,
                       ROW_NUMBER() OVER (PARTITION BY nbr.v
                           ORDER BY COUNT(*) DESC, nbr.n) AS rk
                FROM nbr GROUP BY nbr.v, nbr.n
            ) WHERE rk = 1
        ),
        l2 AS (
            SELECT v, lbl AS l2 FROM (
                SELECT nbr.v, l1.l1 AS lbl,
                       ROW_NUMBER() OVER (PARTITION BY nbr.v
                           ORDER BY COUNT(*) DESC, l1.l1) AS rk
                FROM nbr JOIN l1 ON l1.v = nbr.n
                GROUP BY nbr.v, l1.l1
            ) WHERE rk = 1
        )
        SELECT CAST(l1.v AS BIGINT) AS nationkey,
               CAST(l1.l1 AS BIGINT) AS label_r1,
               CAST(l2.l2 AS BIGINT) AS label_r2
        FROM l1 JOIN l2 ON l2.v = l1.v
        ORDER BY nationkey
    """,
)
def graph_lpa_majority_2round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous rounds of majority label propagation on the
    strong-trade nation graph (labels initialized to node ids, each
    round every node adopts the most frequent label among its
    neighbors, ties to the SMALLEST label — the deterministic
    synchronous variant of Raghavan et al. 2007's LPA, fixed-round
    unrolled like vec_kmeans_unrolled2): after two rounds dense trade
    cliques share a label — the cheap community seed used before
    heavier modularity optimization (graph_modularity_score scores
    such partitions). Each round is one neighbor join + an integer
    count argmax with an exact (count desc, label asc) tie-break —
    no floats anywhere. Scale: per round one shuffle on the node key
    of the neighbor relation; state between rounds is the |V|-row
    label relation."""
    ku = _trade_edges_undirected(spark, sf_dir)
    nbr = ku.select(F.col("a").alias("v"), F.col("b").alias("n")).unionAll(
        ku.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )

    def majority(labeled: DataFrame, lbl_col: str) -> DataFrame:
        wrk = Window.partitionBy("v").orderBy(
            F.col("cnt").desc(), F.col("lbl")
        )
        return (
            labeled.groupBy("v", F.col(lbl_col).alias("lbl"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rk", F.row_number().over(wrk))
            .filter(F.col("rk") == 1)
            .select("v", "lbl")
        )

    l1 = majority(nbr.withColumnRenamed("n", "lbl0"), "lbl0")
    nbr_l1 = nbr.join(
        l1.select(F.col("v").alias("n"), F.col("lbl").alias("nl")), "n"
    )
    l2 = majority(nbr_l1, "nl")
    return (
        l1.select("v", F.col("lbl").alias("label_r1"))
        .join(l2.select("v", F.col("lbl").alias("label_r2")), "v")
        .select(
            F.col("v").cast("bigint").alias("nationkey"),
            F.col("label_r1").cast("bigint"),
            F.col("label_r2").cast("bigint"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# graph_bipartite_projection — co-purchase projection with df cap


@register(
    "graph_bipartite_projection",
    tags=("graph", "join"),
    oracle="""
        WITH cp AS (
            SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        pdeg AS (
            SELECT p FROM cp GROUP BY p HAVING COUNT(*) <= 40
        ),
        capped AS (SELECT cp.c, cp.p FROM cp JOIN pdeg ON pdeg.p = cp.p),
        proj AS (
            SELECT a.c AS c1, b.c AS c2, CAST(COUNT(*) AS BIGINT) AS w
            FROM capped a JOIN capped b ON a.p = b.p AND a.c < b.c
            GROUP BY a.c, b.c
        )
        SELECT CAST(w AS BIGINT) AS weight,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(c1) AS BIGINT) AS min_c1,
               CAST(MAX(c2) AS BIGINT) AS max_c2
        FROM proj GROUP BY w ORDER BY weight
    """,
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection of the customer-part purchase graph onto
    customers: co-purchase pairs weighted by common parts, reported as
    the weight histogram (pair count + id envelope per weight) — the
    standard recommender / entity-linking primitive. The projection is
    generated through the part side with a DEGREE CAP (parts bought by
    more than 40 distinct customers are excluded — the df-capped
    inverted-index contract of operators/dedup.py): projection cost is
    sum over parts of deg^2 <= 40*|edges|, LINEAR in the corpus, never
    |customers|^2, and the pair join shuffles on the part key. The cap
    is sized to the fixture's CONSTANT part degree (~30 buyers/part at
    every SF by TPC-H sizing: lineitem and part both scale with SF),
    so it binds only pathological hot parts; a 10-cap drops the entire
    corpus — measured, the same every-block-trips-the-cap failure the
    levenshtein profile documents. All counts are exact integers; the
    histogram output is bounded by the cap. Popular-part recall loss
    is the documented trade-off (same as minhash's banding)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    pdeg = cp.groupBy("p").agg(F.count(F.lit(1)).alias("dp")).filter(
        F.col("dp") <= 40
    )
    capped = cp.join(pdeg.select("p"), "p")
    a = capped.select("p", F.col("c").alias("c1"))
    b = capped.select("p", F.col("c").alias("c2"))
    proj = (
        a.join(b, "p")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return (
        proj.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("c1").cast("bigint").alias("min_c1"),
            F.max("c2").cast("bigint").alias("max_c2"),
        )
        .select(
            F.col("w").cast("bigint").alias("weight"), "n_pairs", "min_c1",
            "max_c2",
        )
        .orderBy("weight")
    )


# ---------------------------------------------------------------------------
# cur_license_detect — license keyword audit over documents


_LICENSES = (
    ("mit", "mit license"),
    ("apache", "apache license"),
    ("gpl", "general public license"),
    ("bsd", "bsd license"),
    ("cc", "creative commons"),
)


@register(
    "cur_license_detect",
    tags=("curation", "text", "agg"),
    oracle=f"""
        WITH lic (license, pat) AS (VALUES
            {", ".join(f"('{k}', '{p}')" for k, p in _LICENSES)}),
        srcs AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        hits AS (
            SELECT d.source, lic.license,
                   CAST(SUM(CASE WHEN strpos(lower(d.text), lic.pat) > 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
            FROM documents d CROSS JOIN lic
            GROUP BY d.source, lic.license
        )
        SELECT srcs.source AS source, hits.license, srcs.n_docs,
               hits.n_hits,
               CAST(hits.n_hits AS DOUBLE) / CAST(srcs.n_docs AS DOUBLE)
                   AS hit_rate
        FROM srcs JOIN hits ON hits.source = srcs.source
        ORDER BY srcs.source, hits.license
    """,
)
def cur_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """License keyword audit per document source: for each of five
    license phrase markers (MIT / Apache / GPL / BSD / Creative
    Commons), how many docs in each source mention it — the
    provenance-governance gate a training-data pipeline runs before
    mixing a crawl source in (license-restricted text must be routed,
    not silently ingested). Matching is case-folded LITERAL substring
    (strpos/instr — identical semantics, no regex dialect risk); the
    full source x license grid is emitted so zero-hit cells are
    visible (grid join, not present-only — the fin_active_share
    lesson). Counts integer, rate one division; n_docs > 0 by the
    group-by. One scan x 5 literals, |sources| x 5 output."""
    d = load_table(spark, sf_dir, "documents")
    srcs = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    lic = d.sparkSession.createDataFrame(
        list(_LICENSES), "license string, pat string"
    )
    hits = (
        d.crossJoin(F.broadcast(lic))
        .groupBy("source", "license")
        .agg(
            F.sum(
                F.when(
                    F.instr(F.lower(F.col("text")), F.col("pat")) > 0, 1
                ).otherwise(0)
            ).cast("bigint").alias("n_hits")
        )
    )
    return (
        srcs.join(hits, "source")
        .select(
            "source",
            "license",
            "n_docs",
            "n_hits",
            (
                F.col("n_hits").cast("double") / F.col("n_docs").cast("double")
            ).alias("hit_rate"),
        )
        .orderBy("source", "license")
    )


# ---------------------------------------------------------------------------
# cur_blocklist_filter — spam-term gate per source


_BLOCKTERMS = ("casino", "lottery", "jackpot", "winner takes")


@register(
    "cur_blocklist_filter",
    tags=("curation", "text", "agg"),
    oracle=f"""
        WITH flagged AS (
            SELECT source,
                   CASE WHEN {" OR ".join(
                       f"strpos(lower(text), '{t}') > 0" for t in _BLOCKTERMS
                   )} THEN 1 ELSE 0 END AS hit
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(hit) AS BIGINT) AS n_flagged,
               CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_passed,
               CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS flag_rate
        FROM flagged GROUP BY source ORDER BY source
    """,
)
def cur_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist gate per document source: docs containing any of the
    spam marker terms are flagged and the per-source pass/flag split
    reported — the wordlist-filter stage of a training-data curation
    pipeline (the real list is thousands of terms; the mechanism —
    case-folded literal substring OR-chain, map-side, no shuffle
    before the agg — is what this pins; swap the literal list for a
    broadcast lookup at production size). Zero-hit sources still
    report their full row (counts integer, rate one division). One
    scan, one |sources|-row agg."""
    d = load_table(spark, sf_dir, "documents")
    hit = F.lit(False)
    for t in _BLOCKTERMS:
        hit = hit | (F.instr(F.lower(F.col("text")), F.lit(t)) > 0)
    flagged = d.select(
        "source", F.when(hit, 1).otherwise(0).alias("hit")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("hit").cast("bigint").alias("n_flagged"),
            (F.count(F.lit(1)) - F.sum("hit")).cast("bigint").alias("n_passed"),
            (
                F.sum("hit").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("flag_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# fin_cornish_fisher_var — higher-moment VaR correction


@register(
    "fin_cornish_fisher_var",
    tags=("finance", "stats"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        r6 AS (
            SELECT CAST(FLOOR(CAST(m AS DOUBLE) / CAST(1e3 AS DOUBLE))
                        AS BIGINT) AS v
            FROM rm
        ),
        split AS (
            SELECT v, v // 10000 AS a, v % 10000 AS b FROM r6
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS s1,
                   CAST(CAST(SUM(CAST(v AS DECIMAL(15,0)) * v) AS VARCHAR)
                        AS DOUBLE) AS s2,
                   CAST(CAST(SUM(CAST(CAST(v AS DECIMAL(15,0)) * v
                                      AS DECIMAL(23,0)) * v) AS VARCHAR)
                        AS DOUBLE) AS s3,
                   CAST(1e16 AS DOUBLE)
                     * CAST(CAST(SUM(CAST(a*a*a*a AS DECIMAL(28,0)))
                                 AS VARCHAR) AS DOUBLE)
                   + CAST(4e12 AS DOUBLE)
                     * CAST(CAST(SUM(CAST(a*a*a*b AS DECIMAL(28,0)))
                                 AS VARCHAR) AS DOUBLE)
                   + CAST(6e8 AS DOUBLE)
                     * CAST(CAST(SUM(CAST((a*b)*(a*b) AS DECIMAL(28,0)))
                                 AS VARCHAR) AS DOUBLE)
                   + CAST(4e4 AS DOUBLE)
                     * CAST(CAST(SUM(CAST(a*b*b*b AS DECIMAL(28,0)))
                                 AS VARCHAR) AS DOUBLE)
                   + CAST(CAST(SUM(CAST((b*b)*(b*b) AS DECIMAL(28,0)))
                               AS VARCHAR) AS DOUBLE) AS s4
            FROM split
        ),
        m AS (
            SELECT n,
                   s1 / n AS mu,
                   s2 / n - (s1 / n) * (s1 / n) AS m2,
                   s3 / n - 3 * (s1 / n) * (s2 / n)
                     + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
                   s4 / n - 4 * (s1 / n) * (s3 / n)
                     + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                     - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
            FROM s
        ),
        zc AS (SELECT CAST('2.3263478740408408' AS DOUBLE) AS z)
        SELECT n,
               mu / CAST(1e6 AS DOUBLE) AS mean_r,
               CASE WHEN m2 > 0 THEN sqrt(m2) / CAST(1e6 AS DOUBLE) END
                   AS sd_r,
               CASE WHEN m2 > 0 THEN
                 m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) END AS skewness,
               CASE WHEN m2 > 0 THEN m4 / (m2 * m2) END AS kurtosis,
               CASE WHEN m2 > 0 THEN
                 -((mu / CAST(1e6 AS DOUBLE))
                   + (sqrt(m2) / CAST(1e6 AS DOUBLE))
                     * (z
                        + (z * z - 1)
                          * (m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))) / 6
                        + (z * z * z - 3 * z)
                          * (m4 / (m2 * m2) - 3) / 24
                        - (2 * z * z * z - 5 * z)
                          * (m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)))
                          * (m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))) / 36))
               END AS var_99_cf
        FROM m CROSS JOIN zc
    """,
)
def fin_cornish_fisher_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cornish-Fisher 99% VaR of the whole-market daily revenue
    return: the four-moment quantile correction z_cf = z + (z^2-1)S/6
    + (z^3-3z)(K-3)/24 - (2z^3-5z)S^2/36, VaR = -(mu + sigma*z_cf)
    (Cornish & Fisher 1938; the parametric-VaR upgrade every fat-tail
    desk runs next to fin_var_parametric's normal). Returns are
    re-quantized to q6 (micro-units) so the fourth power sum fits the
    jarque-bera five-binomial-sum machinery with SIGNED a/b (both
    engines' integer div/mod truncate toward zero identically, so
    v = 1e4*a + b holds exactly for negatives); the 99% normal
    quantile is a string-routed literal; every moment/statistic is ONE
    identically-parenthesized double expression with sqrt(m2)^3 (not
    libm pow). Zero variance NULLs all risk outputs identically. One
    scan, one 8-number agg."""
    rm = _mkt_returns(spark, sf_dir)
    r6 = rm.select(
        F.floor(F.col("m").cast("double") / F.expr("CAST(1e3 AS DOUBLE)"))
        .cast("bigint")
        .alias("v")
    )
    base = r6.select(
        "v",
        F.expr("v div 10000").alias("a"),
        (F.col("v") % 10000).alias("b"),
    )
    v15 = F.col("v").cast("decimal(15,0)")
    a, b = F.col("a"), F.col("b")
    d28 = "decimal(28,0)"
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _as_d(F.sum(F.col("v").cast("decimal(19,0)"))).alias("s1"),
        _as_d(F.sum(v15 * F.col("v"))).alias("s2"),
        _as_d(
            F.sum((v15 * F.col("v")).cast("decimal(23,0)") * F.col("v"))
        ).alias("s3"),
        _as_d(F.sum((a * a * a * a).cast(d28))).alias("sa4"),
        _as_d(F.sum((a * a * a * b).cast(d28))).alias("sa3b"),
        _as_d(F.sum(((a * b) * (a * b)).cast(d28))).alias("sa2b2"),
        _as_d(F.sum((a * b * b * b).cast(d28))).alias("sab3"),
        _as_d(F.sum(((b * b) * (b * b)).cast(d28))).alias("sb4"),
    ).select(
        "n",
        "s1",
        "s2",
        "s3",
        (
            F.expr("CAST(1e16 AS DOUBLE)") * F.col("sa4")
            + F.expr("CAST(4e12 AS DOUBLE)") * F.col("sa3b")
            + F.expr("CAST(6e8 AS DOUBLE)") * F.col("sa2b2")
            + F.expr("CAST(4e4 AS DOUBLE)") * F.col("sab3")
            + F.col("sb4")
        ).alias("s4"),
    )
    n_d = F.col("n").cast("double")
    mu = F.col("s1") / n_d
    m2 = F.col("s2") / n_d - mu * mu
    m3 = F.col("s3") / n_d - 3 * mu * (F.col("s2") / n_d) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n_d
        - 4 * mu * (F.col("s3") / n_d)
        + 6 * mu * mu * (F.col("s2") / n_d)
        - 3 * mu * mu * mu * mu
    )
    sk = m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2))
    ku = m4 / (m2 * m2)
    z = F.expr("CAST('2.3263478740408408' AS DOUBLE)")
    e6 = F.expr("CAST(1e6 AS DOUBLE)")
    zcf = (
        z
        + (z * z - 1) * sk / 6
        + (z * z * z - 3 * z) * (ku - 3) / 24
        - (2 * z * z * z - 5 * z) * sk * sk / 36
    )
    return s.select(
        "n",
        (mu / e6).alias("mean_r"),
        F.when(m2 > 0, F.sqrt(m2) / e6).alias("sd_r"),
        F.when(m2 > 0, sk).alias("skewness"),
        F.when(m2 > 0, ku).alias("kurtosis"),
        F.when(m2 > 0, -((mu / e6) + (F.sqrt(m2) / e6) * zcf)).alias(
            "var_99_cf"
        ),
    )


# ---------------------------------------------------------------------------
# fin_sterling_ratio — mean return over AVERAGE drawdown depth


@register(
    "fin_sterling_ratio",
    tags=("finance", "window"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        pk AS (
            SELECT d, xm,
                   MAX(xm) OVER (ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak
            FROM mkt
        ),
        flagged AS (
            SELECT d, xm, peak,
                   CASE WHEN xm < peak THEN 1 ELSE 0 END AS below,
                   ROW_NUMBER() OVER (ORDER BY d) AS rn
            FROM pk
        ),
        isl AS (
            SELECT *,
                   rn - ROW_NUMBER() OVER (PARTITION BY below ORDER BY d)
                       AS grp
            FROM flagged
        ),
        eps AS (
            SELECT grp,
                   CAST(FLOOR(MAX(
                       CAST(CAST(peak - xm AS VARCHAR) AS DOUBLE)
                       / CAST(CAST(peak AS VARCHAR) AS DOUBLE))
                       * CAST(1e9 AS DOUBLE)) AS BIGINT) AS q
            FROM isl WHERE below = 1 GROUP BY grp
        ),
        dd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_episodes,
                   CAST(SUM(q) AS BIGINT) AS sq
            FROM eps
        ),
        mu AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS s1
            FROM rm
        )
        SELECT mu.n_days, dd.n_episodes,
               CASE WHEN dd.n_episodes > 0 THEN
                 CAST(dd.sq AS DOUBLE)
                   / (CAST(dd.n_episodes AS DOUBLE) * CAST(1e9 AS DOUBLE))
               END AS avg_drawdown,
               CASE WHEN dd.sq > 0 AND mu.n_days > 0 THEN
                 ((mu.s1 / CAST(1e9 AS DOUBLE)) / CAST(mu.n_days AS DOUBLE))
                 / (CAST(dd.sq AS DOUBLE)
                    / (CAST(dd.n_episodes AS DOUBLE) * CAST(1e9 AS DOUBLE)))
               END AS sterling_daily
        FROM mu CROSS JOIN dd
    """,
)
def fin_sterling_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sterling ratio (average-drawdown flavor, convention pinned: no
    10% haircut, all episodes weighted equally): mean daily return
    divided by the AVERAGE below-peak episode depth — the linear-
    penalty sibling of fin_burke_ratio's quadratic penalty, same
    gaps-and-islands episode machinery, q9-integerized episode depths
    so the across-episodes average is a ratio of exact integers. Zero
    drawdown NULLs identically. Running-peak window is O(days)."""
    daily = _seg_daily(spark, sf_dir)
    mkt = daily.groupBy("d").agg(F.sum("x").cast("decimal(18,2)").alias("xm"))
    wd = Window.orderBy("d")  # calendar-bounded
    pk = mkt.select(
        "d",
        "xm",
        F.max("xm").over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("peak"),
    )
    flagged = pk.select(
        "d",
        "xm",
        "peak",
        F.when(F.col("xm") < F.col("peak"), 1).otherwise(0).alias("below"),
        F.row_number().over(wd).alias("rn"),
    )
    isl = flagged.withColumn(
        "grp",
        F.col("rn")
        - F.row_number().over(Window.partitionBy("below").orderBy("d")),
    )
    eps = (
        isl.filter(F.col("below") == 1)
        .groupBy("grp")
        .agg(
            F.floor(
                F.max(
                    _as_d(F.col("peak") - F.col("xm")) / _as_d(F.col("peak"))
                )
                * F.lit(1e9)
            ).cast("bigint").alias("q")
        )
    )
    dd = eps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_episodes"),
        F.sum("q").cast("bigint").alias("sq"),
    )
    rm = _mkt_returns(spark, sf_dir)
    mu = rm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _as_d(F.sum(F.col("m").cast("decimal(19,0)"))).alias("s1"),
    )
    e9 = F.expr("CAST(1e9 AS DOUBLE)")
    avg_dd = F.col("sq").cast("double") / (
        F.col("n_episodes").cast("double") * e9
    )
    return (
        mu.crossJoin(F.broadcast(dd))
        .select(
            "n_days",
            "n_episodes",
            F.when(F.col("n_episodes") > 0, avg_dd).alias("avg_drawdown"),
            F.when(
                (F.col("sq") > 0) & (F.col("n_days") > 0),
                ((F.col("s1") / e9) / F.col("n_days").cast("double"))
                / avg_dd,
            ).alias("sterling_daily"),
        )
    )


# ---------------------------------------------------------------------------
# fin_upside_potential_ratio — partial-moment performance


@register(
    "fin_upside_potential_ratio",
    tags=("finance", "stats"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        {_SEG_RET_SQL},
        s AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN r > 0 THEN r ELSE 0 END) AS BIGINT)
                       AS up1,
                   CAST(CAST(SUM(CASE WHEN r < 0
                                 THEN CAST(r AS DECIMAL(19,0)) * r
                                 ELSE 0 END) AS VARCHAR) AS DOUBLE) AS dn2
            FROM rs GROUP BY segment
        )
        SELECT segment, n AS n_days,
               CAST(up1 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(1e9 AS DOUBLE))
                   AS upside_potential,
               CASE WHEN dn2 > 0 THEN
                 sqrt(dn2 / CAST(n AS DOUBLE)) / CAST(1e9 AS DOUBLE)
               END AS downside_deviation,
               CASE WHEN dn2 > 0 THEN
                 (CAST(up1 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(1e9 AS DOUBLE)))
                 / (sqrt(dn2 / CAST(n AS DOUBLE)) / CAST(1e9 AS DOUBLE))
               END AS upr
        FROM s ORDER BY segment
    """,
)
def fin_upside_potential_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upside potential ratio per segment at threshold 0 (Sortino &
    van der Meer 1991): E[max(r,0)] / sqrt(E[min(r,0)^2]) — rewards
    upside while penalizing only downside dispersion, the partial-
    moment refinement of fin_sharpe_sortino (which shares the
    denominator but uses MEAN excess in the numerator). The upside sum
    is a conditional BIGINT sum of q9 returns; the downside second
    partial moment is a conditional DECIMAL sum crossing to double
    once; both population moments (/n, convention pinned) and the
    ratio are fixed single expressions. No negative days -> NULL
    identically. One scan on the shared return relation."""
    daily = _seg_daily(spark, sf_dir)
    rs = _seg_returns(daily)
    s = rs.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("r") > 0, F.col("r")).otherwise(0))
        .cast("bigint")
        .alias("up1"),
        _as_d(
            F.sum(
                F.when(
                    F.col("r") < 0,
                    F.col("r").cast("decimal(19,0)") * F.col("r"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            )
        ).alias("dn2"),
    )
    n_d = F.col("n").cast("double")
    e9 = F.expr("CAST(1e9 AS DOUBLE)")
    upp = F.col("up1").cast("double") / (n_d * e9)
    ddev = F.sqrt(F.col("dn2") / n_d) / e9
    return s.select(
        "segment",
        F.col("n").alias("n_days"),
        upp.alias("upside_potential"),
        F.when(F.col("dn2") > 0, ddev).alias("downside_deviation"),
        F.when(F.col("dn2") > 0, upp / ddev).alias("upr"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# stat_trimmed_mean / stat_bowley_skew — bucket+carry order statistics


_CENTS_CUM_SQL = """
        cents AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS v
            FROM orders
        ),
        vals AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM cents GROUP BY v
        ),
        cum AS (
            SELECT v, cnt,
                   CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS c,
                   CAST(SUM(cnt) OVER () AS BIGINT) AS n
            FROM vals
        )
"""


def _cents_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, cnt, c, n): distinct order-total cents with cumulative and
    total counts — the bucket+carry rank relation shared by the exact
    order-statistic operators. The Spark cumulative runs over the
    DISTINCT-VALUE relation (value-domain-bounded), not corpus rows;
    the oracle's plain window is equivalent on the same relation."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v")
    )
    vals = cents.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wv = Window.orderBy("v")  # distinct-value relation: domain-bounded
    return vals.select(
        "v",
        "cnt",
        F.sum("cnt").over(wv).cast("bigint").alias("c"),
        F.sum("cnt").over(Window.partitionBy(F.lit(1)))
        .cast("bigint")
        .alias("n"),
    )


@register(
    "stat_trimmed_mean",
    tags=("stats", "window", "agg"),
    oracle=f"""
        WITH {_CENTS_CUM_SQL},
        parts AS (
            SELECT n, n // 20 AS k,
                   CAST(SUM(CAST(v AS DECIMAL(19,0)) * cnt) AS DECIMAL(38,0))
                       AS total,
                   CAST(SUM(CAST(v AS DECIMAL(19,0))
                            * LEAST(cnt, GREATEST(
                                CAST(0 AS BIGINT), n // 20 - (c - cnt))))
                        AS DECIMAL(38,0)) AS bot,
                   CAST(SUM(CAST(v AS DECIMAL(19,0))
                            * LEAST(cnt, GREATEST(
                                CAST(0 AS BIGINT), c - (n - n // 20))))
                        AS DECIMAL(38,0)) AS top
            FROM cum GROUP BY n
        )
        SELECT n, CAST(k AS BIGINT) AS k_each_side,
               CASE WHEN n - 2 * k > 0 THEN
                 CAST(CAST(total - bot - top AS VARCHAR) AS DOUBLE)
                   / (CAST(n - 2 * k AS DOUBLE) * CAST(100 AS DOUBLE))
               END AS trimmed_mean
        FROM parts
    """,
)
def stat_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-each-side trimmed mean of order value: drop the k = n div 20
    smallest and largest observations (integer k, convention pinned)
    and average the middle — the robust location estimate that pairs
    with stat_median_polish's robust decomposition. NO global sort:
    the bottom-k and top-k sums come from the distinct-value
    bucket+carry relation (each value contributes
    clamp(k - rank_before, 0, cnt) tail members — exact integer
    clamps), all three sums accumulate in DECIMAL, one VARCHAR-routed
    division at the edge. Degenerate n <= 2k NULLs identically. Corpus
    work: one value-histogram agg; the cumulative rides the
    domain-bounded distinct-value relation."""
    cum = _cents_cum(spark, sf_dir)
    k = F.expr("n div 20")
    vdec = F.col("v").cast("decimal(19,0)")
    bot_take = F.least(
        F.col("cnt"),
        F.greatest(F.lit(0).cast("bigint"), k - (F.col("c") - F.col("cnt"))),
    )
    top_take = F.least(
        F.col("cnt"),
        F.greatest(
            F.lit(0).cast("bigint"), F.col("c") - (F.col("n") - k)
        ),
    )
    parts = cum.groupBy("n").agg(
        _as_d(
            F.sum(vdec * F.col("cnt")).cast("decimal(38,0)")
            - F.sum(vdec * bot_take).cast("decimal(38,0)")
            - F.sum(vdec * top_take).cast("decimal(38,0)")
        ).alias("mid"),
    )
    kk = F.expr("n div 20")
    return parts.select(
        "n",
        kk.cast("bigint").alias("k_each_side"),
        F.when(
            F.col("n") - 2 * kk > 0,
            F.col("mid")
            / ((F.col("n") - 2 * kk).cast("double") * F.lit(100.0)),
        ).alias("trimmed_mean"),
    )


@register(
    "stat_bowley_skew",
    tags=("stats", "window"),
    oracle=f"""
        WITH {_CENTS_CUM_SQL},
        qs AS (
            SELECT
                MAX(CASE WHEN c - cnt < (n + 3) // 4
                          AND c >= (n + 3) // 4 THEN v END) AS q1,
                MAX(CASE WHEN c - cnt < (n + 1) // 2
                          AND c >= (n + 1) // 2 THEN v END) AS q2,
                MAX(CASE WHEN c - cnt < (3 * n + 1) // 4
                          AND c >= (3 * n + 1) // 4 THEN v END) AS q3,
                MAX(n) AS n
            FROM cum
        )
        SELECT n, CAST(q1 AS BIGINT) AS q1_cents,
               CAST(q2 AS BIGINT) AS q2_cents,
               CAST(q3 AS BIGINT) AS q3_cents,
               CASE WHEN q3 > q1 THEN
                 CAST(q3 + q1 - 2 * q2 AS DOUBLE) / CAST(q3 - q1 AS DOUBLE)
               END AS bowley_skew
        FROM qs
    """,
)
def stat_bowley_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley (quartile) skewness of order value: (Q3 + Q1 - 2*Q2) /
    (Q3 - Q1) — the outlier-immune skew that complements the moment
    skew in stat_jarque_bera / agg_skew_kurtosis_exact. Quartiles are
    PINNED exact order statistics (ranks ceil(n/4), ceil(n/2),
    ceil(3n/4) — integer rank arithmetic, no engine interpolation
    convention), located on the distinct-value bucket+carry cumulative
    (the value whose rank range covers the target — one conditional
    max, no global sort). Numerator/denominator are exact integers;
    one guarded division. IQR = 0 NULLs identically."""
    cum = _cents_cum(spark, sf_dir)

    def order_stat(rank_expr):
        return F.max(
            F.when(
                (F.col("c") - F.col("cnt") < rank_expr)
                & (F.col("c") >= rank_expr),
                F.col("v"),
            )
        )

    r1 = F.expr("(n + 3) div 4")
    r2 = F.expr("(n + 1) div 2")
    r3 = F.expr("(3 * n + 1) div 4")
    qs = cum.agg(
        order_stat(r1).alias("q1"),
        order_stat(r2).alias("q2"),
        order_stat(r3).alias("q3"),
        F.max("n").alias("n"),
    )
    return qs.select(
        "n",
        F.col("q1").cast("bigint").alias("q1_cents"),
        F.col("q2").cast("bigint").alias("q2_cents"),
        F.col("q3").cast("bigint").alias("q3_cents"),
        F.when(
            F.col("q3") > F.col("q1"),
            (F.col("q3") + F.col("q1") - 2 * F.col("q2")).cast("double")
            / (F.col("q3") - F.col("q1")).cast("double"),
        ).alias("bowley_skew"),
    )


# ---------------------------------------------------------------------------
# ml_topk_accuracy — top-1 / top-2 accuracy of the bin-majority model


@register(
    "ml_topk_accuracy",
    tags=("ml", "eval", "agg"),
    oracle="""
        WITH rng AS (
            SELECT MIN(o_totalprice) AS pmin, MAX(o_totalprice) AS pmax
            FROM orders
        ),
        coded AS (
            SELECT o_orderpriority AS actual,
                   CASE WHEN pmax = pmin THEN 0
                        ELSE LEAST(7, CAST(FLOOR(
                       (CAST(o_totalprice AS DOUBLE)
                        - CAST(pmin AS DOUBLE))
                       / ((CAST(pmax AS DOUBLE) - CAST(pmin AS DOUBLE))
                          / CAST(8 AS DOUBLE))) AS INT)) END AS bin
            FROM orders CROSS JOIN rng
        ),
        ranked AS (
            SELECT bin, actual AS cl,
                   ROW_NUMBER() OVER (PARTITION BY bin
                       ORDER BY COUNT(*) DESC, actual) AS rk
            FROM coded GROUP BY bin, actual
        ),
        hits AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN r.rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS top1,
                   CAST(SUM(CASE WHEN r.rk <= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS top2
            FROM coded c
            LEFT JOIN ranked r ON r.bin = c.bin AND r.cl = c.actual
        )
        SELECT n, top1 AS top1_correct, top2 AS top2_correct,
               CAST(top1 AS DOUBLE) / CAST(n AS DOUBLE) AS top1_acc,
               CAST(top2 AS DOUBLE) / CAST(n AS DOUBLE) AS top2_acc
        FROM hits
    """,
)
def ml_topk_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 / top-2 accuracy of the bin-majority priority classifier
    (the ml_macro_f1 model viewed as a RANKING over classes per bin,
    count-desc with class-asc tie-break): a row scores at k if its
    actual class ranks within the bin's top k — the eval that matters
    when the consumer takes the model's top-k candidates rather than
    its argmax. Rankings are integer counts with a deterministic
    tie-break; hits are integer conditional sums (actual classes
    absent from a bin rank NULL and miss exactly — LEFT join keeps the
    row in n); accuracies are single divisions. One scan + one
    grid-sized window."""
    o = load_table(spark, sf_dir, "orders")
    rng = o.agg(
        F.min("o_totalprice").alias("pmin"), F.max("o_totalprice").alias("pmax")
    )
    coded = o.crossJoin(F.broadcast(rng)).select(
        F.col("o_orderpriority").alias("actual"),
        F.when(F.col("pmax") == F.col("pmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(7),
                F.floor(
                    (F.col("o_totalprice").cast("double")
                     - F.col("pmin").cast("double"))
                    / ((F.col("pmax").cast("double")
                        - F.col("pmin").cast("double")) / F.lit(8.0))
                ).cast("int"),
            )
        ).alias("bin"),
    )
    wrk = Window.partitionBy("bin").orderBy(
        F.col("cnt").desc(), F.col("cl")
    )
    ranked = (
        coded.groupBy("bin", F.col("actual").alias("cl"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(wrk))
        .select("bin", "cl", "rk")
    )
    hits = (
        coded.join(
            F.broadcast(ranked),
            (coded.bin == ranked.bin) & (coded.actual == ranked.cl),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("top1"),
            F.sum(F.when(F.col("rk") <= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("top2"),
        )
    )
    return hits.select(
        "n",
        F.col("top1").alias("top1_correct"),
        F.col("top2").alias("top2_correct"),
        (F.col("top1").cast("double") / F.col("n").cast("double")).alias(
            "top1_acc"
        ),
        (F.col("top2").cast("double") / F.col("n").cast("double")).alias(
            "top2_acc"
        ),
    )


# ---------------------------------------------------------------------------
# array_hof_stats — higher-order array function surface


@register(
    "array_hof_stats",
    tags=("array", "agg"),
    oracle="""
        WITH arrs AS (
            SELECT l.l_orderkey,
                   list(CAST(l.l_quantity AS BIGINT)
                        ORDER BY l.l_linenumber) AS qs
            FROM lineitem l GROUP BY l.l_orderkey
        ),
        hof AS (
            SELECT a.l_orderkey,
                   len(a.qs) AS n_lines,
                   list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(
                               list_filter(a.qs, q -> q > 25),
                               q -> q * 2)),
                       (acc, x) -> acc + x) AS hi_doubled
            FROM arrs a
        )
        SELECT o.o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(h.n_lines) AS BIGINT) AS total_lines,
               CAST(SUM(h.hi_doubled) AS BIGINT) AS total_hi_doubled,
               CAST(MAX(h.n_lines) AS BIGINT) AS max_lines
        FROM hof h JOIN orders o ON o.o_orderkey = h.l_orderkey
        GROUP BY o.o_orderpriority ORDER BY priority
    """,
)
def array_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface in one verifiable pipeline:
    per order, the line quantities are collected in LINE ORDER
    (array_sort over (linenumber, qty) structs vs list(... ORDER BY) —
    the pinned-order collect recipe), then filter (> 25) -> transform
    (x2) -> aggregate (sum) runs entirely inside the array — the
    transform/filter/aggregate trio Spark executes in whole-stage
    codegen (no UDF, no explode round-trip; compare
    array_explode_outer's row-fan-out shape). Quantities are exact
    integers so every HOF output is integer; the per-priority rollup
    is exact sums. Scale: one orderkey shuffle to build arrays (basket
    size is scale-free), one AQE-sized orders join, one 5-row agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    arrs = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("l_linenumber", "q"))),
            lambda s: s["q"],
        ).alias("qs")
    )
    hof = arrs.select(
        "l_orderkey",
        F.size("qs").cast("bigint").alias("n_lines"),
        F.aggregate(
            F.transform(
                F.filter(F.col("qs"), lambda q: q > 25),
                lambda q: q * 2,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("hi_doubled"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return (
        hof.join(o, hof.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("n_lines").cast("bigint").alias("total_lines"),
            F.sum("hi_doubled").cast("bigint").alias("total_hi_doubled"),
            F.max("n_lines").cast("bigint").alias("max_lines"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# sql_quantified_rewrite — ALL-predicate emulation


@register(
    "sql_quantified_rewrite",
    tags=("sql", "subquery"),
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_dominating,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
               CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2)))
                    AS VARCHAR) AS DOUBLE) AS max_price
        FROM orders
        WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1998
          AND o_totalprice > ALL (
              SELECT o_totalprice FROM orders
              WHERE EXTRACT(year FROM CAST(o_orderdate AS DATE)) = 1992)
    """,
)
def sql_quantified_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison predicate (> ALL) — a surface Spark SQL
    does NOT parse — rewritten to its scalar-aggregate equivalent:
    x > ALL(S) == x > (SELECT MAX(S)) when S is non-empty, with the
    empty-S edge (ALL over empty is TRUE; MAX over empty is NULL,
    which would wrongly drop every row) guarded by an explicit
    IS-empty branch. Here: 1998 orders whose value dominates EVERY
    1992 order. The oracle runs DuckDB's native > ALL, so the rewrite
    is verified against a real quantified-predicate implementation,
    not against itself. The MAX subquery is a 1-row broadcast; the
    probe side is a pushed-down year filter scan. The empty edge is
    not theoretical: the sf0.001 fixture has NO 1992 orders, so the
    guard branch is exercised (and agrees with DuckDB's native ALL)
    at every round's triple-SF sweep."""
    o = load_table(spark, sf_dir, "orders")
    y92 = o.filter(F.year("o_orderdate") == 1992).agg(
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n92"),
    )
    y98 = o.filter(F.year("o_orderdate") == 1998)
    dominating = y98.crossJoin(F.broadcast(y92)).filter(
        (F.col("n92") == 0) | (F.col("o_totalprice") > F.col("mx"))
    )
    return dominating.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dominating"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("string")
        .cast("double")
        .alias("max_price"),
    )


# ---------------------------------------------------------------------------
# ts_arch_lm_screen — Ljung-Box on squared returns (ARCH effect)


@register(
    "ts_arch_lm_screen",
    tags=("timeseries", "stats", "finance"),
    oracle=f"""
        WITH {_MKT_RET_SQL},
        z AS (
            SELECT d,
                   CAST(FLOOR(CAST(m AS DOUBLE) / CAST(1e3 AS DOUBLE))
                        AS BIGINT) AS v
            FROM rm
        ),
        zz AS (SELECT d, v * v AS q FROM z),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM zz),
        lag_suff AS (
            SELECT lg.k,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(CAST(SUM(CAST(a.q AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS sx,
                   CAST(CAST(SUM(CAST(b.q AS DECIMAL(19,0))) AS VARCHAR)
                        AS DOUBLE) AS sy,
                   CAST(CAST(SUM(CAST(a.q AS DECIMAL(19,0)) * b.q) AS VARCHAR)
                        AS DOUBLE) AS sxy,
                   CAST(CAST(SUM(CAST(a.q AS DECIMAL(19,0)) * a.q) AS VARCHAR)
                        AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(b.q AS DECIMAL(19,0)) * b.q) AS VARCHAR)
                        AS DOUBLE) AS syy
            FROM (VALUES (1), (2), (3), (4)) lg(k)
            JOIN zz a ON TRUE
            JOIN zz b ON b.d = a.d - to_days(lg.k)
            GROUP BY lg.k
        ),
        rs2 AS (
            SELECT k, nk,
                   CASE WHEN (CAST(nk AS DOUBLE) * sxx - sx * sx) > 0
                             AND (CAST(nk AS DOUBLE) * syy - sy * sy) > 0 THEN
                     (CAST(nk AS DOUBLE) * sxy - sx * sy)
                     / (sqrt(CAST(nk AS DOUBLE) * sxx - sx * sx)
                        * sqrt(CAST(nk AS DOUBLE) * syy - sy * sy))
                   END AS r
            FROM lag_suff
        ),
        wide AS (
            SELECT MAX(CASE WHEN k = 1 THEN r END) AS r1,
                   MAX(CASE WHEN k = 2 THEN r END) AS r2,
                   MAX(CASE WHEN k = 3 THEN r END) AS r3,
                   MAX(CASE WHEN k = 4 THEN r END) AS r4
            FROM rs2
        )
        SELECT nn.n, wide.r1, wide.r2, wide.r3, wide.r4,
               CASE WHEN wide.r1 IS NOT NULL AND wide.r2 IS NOT NULL
                         AND wide.r3 IS NOT NULL AND wide.r4 IS NOT NULL
                         AND nn.n > 4 THEN
                 CAST(nn.n AS DOUBLE) * (CAST(nn.n AS DOUBLE) + 2)
                 * (wide.r1 * wide.r1 / (CAST(nn.n AS DOUBLE) - 1)
                    + wide.r2 * wide.r2 / (CAST(nn.n AS DOUBLE) - 2)
                    + wide.r3 * wide.r3 / (CAST(nn.n AS DOUBLE) - 3)
                    + wide.r4 * wide.r4 / (CAST(nn.n AS DOUBLE) - 4))
               END AS lb_stat
        FROM nn CROSS JOIN wide
    """,
)
def ts_arch_lm_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARCH-effect screen: Ljung-Box portmanteau on SQUARED market
    returns at lags 1-4 — volatility clustering shows up as
    autocorrelation of squares even when returns themselves are white
    (Engle 1982's LM test in its practitioners' portmanteau form;
    ts_ljung_box covers the level series, this covers the second
    moment). Returns are q6-quantized so z = v^2 is an exact BIGINT;
    per-lag sufficient sums use the ts_cross_correlation recipe
    (computed-key calendar equi-join b.d = a.d - k days — missing
    calendar days drop pairs on both engines identically); each lag
    correlation is one guarded fixed expression, and the LB statistic
    is ONE expression with a static 4-term sum (fixed source order,
    no fold needed). Degenerate zero-variance lags NULL the statistic
    identically. Corpus work is the shared daily agg; the 4-lag join
    rides the calendar-bounded return relation x a broadcast 4-row
    spine."""
    rm = _mkt_returns(spark, sf_dir)
    zz = rm.select(
        "d",
        (
            F.floor(F.col("m").cast("double") / F.expr("CAST(1e3 AS DOUBLE)"))
            .cast("bigint")
        ).alias("v"),
    ).select("d", (F.col("v") * F.col("v")).alias("q"))
    nn = zz.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    lags = zz.sparkSession.createDataFrame([(1,), (2,), (3,), (4,)], "k int")
    a = zz.select(F.col("d").alias("da"), F.col("q").alias("qa"))
    b = zz.select(F.col("d").alias("db"), F.col("q").alias("qb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("db") == F.date_sub(F.col("da"), F.col("k")),
        )
    )
    qa_dec = F.col("qa").cast("decimal(19,0)")
    qb_dec = F.col("qb").cast("decimal(19,0)")
    suff = pairs.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        _as_d(F.sum(qa_dec)).alias("sx"),
        _as_d(F.sum(qb_dec)).alias("sy"),
        _as_d(F.sum(qa_dec * F.col("qb"))).alias("sxy"),
        _as_d(F.sum(qa_dec * F.col("qa"))).alias("sxx"),
        _as_d(F.sum(qb_dec * F.col("qb"))).alias("syy"),
    )
    nk_d = F.col("nk").cast("double")
    vx = nk_d * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = nk_d * F.col("syy") - F.col("sy") * F.col("sy")
    rs2 = suff.select(
        "k",
        F.when(
            (vx > 0) & (vy > 0),
            (nk_d * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.sqrt(vx) * F.sqrt(vy)),
        ).alias("r"),
    )
    wide = rs2.agg(
        *[
            F.max(F.when(F.col("k") == k, F.col("r"))).alias(f"r{k}")
            for k in (1, 2, 3, 4)
        ]
    )
    n_d = F.col("n").cast("double")
    lb = (
        n_d
        * (n_d + 2)
        * (
            F.col("r1") * F.col("r1") / (n_d - 1)
            + F.col("r2") * F.col("r2") / (n_d - 2)
            + F.col("r3") * F.col("r3") / (n_d - 3)
            + F.col("r4") * F.col("r4") / (n_d - 4)
        )
    )
    return (
        nn.crossJoin(F.broadcast(wide))
        .select(
            "n",
            "r1",
            "r2",
            "r3",
            "r4",
            F.when(
                F.col("r1").isNotNull()
                & F.col("r2").isNotNull()
                & F.col("r3").isNotNull()
                & F.col("r4").isNotNull()
                & (F.col("n") > 4),
                lb,
            ).alias("lb_stat"),
        )
    )
