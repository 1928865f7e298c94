"""Round-15 operator wave: median-based k-sample location test
(Mood), rank von Neumann serial-randomness ratio (Bartels), paired
half-series trend detection (Cox-Stuart), spectral entropy, inequality
indices, Martin/gain-to-pain/Jensen performance ratios, SMOG + ARI
readability, adjacent-token PMI collocations, common-neighbor link
prediction, second-digit Benford audit, balanced accuracy — every
query hash-oracled on arrival with an independent numpy / pure-Python
reference test in tests/test_round15_ops.py (the round-10..14
discipline).

House rules applied throughout (see plans/registry.py docstring):
exact integer/decimal accumulation with doubles only at the
presentation edge; pinned order statistics (never engine percentile
functions) for quantile picks; quantized-ln DECIMAL(12,6) terms per
the text_ngram_entropy precedent for entropies/MI; string-routed or
CAST(int AS DOUBLE) constants (never a bare decimal literal that must
match); NULL-guarded degenerate divisions with IDENTICAL predicates
on both engines; DuckDB `//` twinning Spark `DIV` for every integer
rank/threshold formula; broadcast hints ONLY on content-bounded
relations (value-distinct cells, bounded group lists, 1-row scalars)
— never on an SF-scaling side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.registry import register
from finance_etl_spark.plans.round14 import _DAILY_Q6_SQL, _daily_q6


def _as_d(c):
    """Decimal -> double via the VARCHAR route (cross-engine exact)."""
    return c.cast("string").cast("double")


# ---------------------------------------------------------------------------
# stat_moods_median — Mood's median test across order priorities


@register(
    "stat_moods_median",
    tags=("stats", "window"),
    oracle="""
        WITH lab AS MATERIALIZED (
            SELECT o_orderpriority AS g,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS xc
            FROM orders
        ),
        per_val AS (
            SELECT xc, CAST(COUNT(*) AS BIGINT) AS c,
                   xc // 1000000 AS bkt
            FROM lab GROUP BY xc
        ),
        within AS (
            SELECT bkt, xc, c,
                   CAST(SUM(c) OVER (PARTITION BY bkt ORDER BY xc
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS wc
            FROM per_val
        ),
        carry AS (
            SELECT bkt,
                   CAST(COALESCE(SUM(tb) OVER (ORDER BY bkt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS cb
            FROM (SELECT bkt, SUM(c) AS tb FROM per_val GROUP BY bkt)
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per_val),
        med AS (
            SELECT CAST(MIN(CASE WHEN w.wc + ca.cb >= (t.n + 1) // 2
                                 THEN w.xc END) AS BIGINT) AS med
            FROM within w JOIN carry ca ON ca.bkt = w.bkt CROSS JOIN tot t
        ),
        per AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(CASE WHEN l.xc > m.med THEN 1 ELSE 0 END)
                        AS BIGINT) AS ag
            FROM lab l CROSS JOIN med m
            GROUP BY g
        ),
        pool AS (
            SELECT CAST(SUM(ng) AS BIGINT) AS n,
                   CAST(SUM(ag) AS BIGINT) AS a
            FROM per
        ),
        terms AS (
            SELECT g, ng, ag,
                   CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE) AS eg,
                   (CAST(ag AS DOUBLE)
                      - CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(ag AS DOUBLE)
                      - CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE))
                   / (CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE))
                   + (CAST(ng - ag AS DOUBLE)
                      - (CAST(ng AS DOUBLE)
                         - CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE)))
                   * (CAST(ng - ag AS DOUBLE)
                      - (CAST(ng AS DOUBLE)
                         - CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE)))
                   / (CAST(ng AS DOUBLE)
                      - CAST(ng * a AS DOUBLE) / CAST(n AS DOUBLE)) AS t
            FROM per CROSS JOIN pool
        ),
        chi AS (
            SELECT list_reduce(list(t ORDER BY g), (a, x) -> a + x) AS chi2
            FROM terms
        )
        SELECT tm.g, tm.ng AS n_g, tm.ag AS n_above, tm.eg AS exp_above,
               c.chi2
        FROM terms tm CROSS JOIN chi c
    """,
)
def stat_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test — do the order-priority cohorts share one
    median order value? Counts above/below the POOLED median form a
    k x 2 table; chi-square against the independence expectation.
    Exactness: the pooled median is a pinned order statistic over
    exact integer cents (per-distinct-value counts, value-bucket
    cumulative window + O(buckets) carry — the _midranks2
    decomposition, never a global row sort; threshold (n+1) DIV 2
    twins DuckDB `//`); the k x 2 table is exact BIGINTs; each
    group's chi-square term is one double expression parenthesized
    identically on both engines and the k-term fold runs in sorted
    group order (the ANOVA recipe). Distributed shape: one
    distinct-value agg + one broadcast-median count pass — two
    map-side-combining corpus scans, group state k-bounded."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_orderpriority").alias("g"),
        (F.col("o_totalprice").cast("decimal(12,2)") * F.lit(100))
        .cast("bigint")
        .alias("xc"),
    ).persist()  # scanned for the median AND the k x 2 counts
    per_val = (
        lab.groupBy("xc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("bkt", F.expr("xc DIV 1000000"))
        .persist()
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("xc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = per_val.select(
        "bkt", "xc", F.col("c"), F.sum("c").over(w_in).alias("wc")
    )
    w_carry = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        per_val.groupBy("bkt")
        .agg(F.sum("c").alias("tb"))
        .select(
            "bkt",
            F.coalesce(F.sum("tb").over(w_carry), F.lit(0)).alias("cb"),
        )
    )
    tot = per_val.agg(F.sum("c").cast("bigint").alias("n"))
    med = (
        within.join(F.broadcast(carry), "bkt")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("wc") + F.col("cb")
                    >= F.expr("(n + 1) DIV 2"),
                    F.col("xc"),
                )
            )
            .cast("bigint")
            .alias("med")
        )
    )
    per = (
        lab.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.sum((F.col("xc") > F.col("med")).cast("int"))
            .cast("bigint")
            .alias("ag"),
        )
    )
    pool = per.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("ag").cast("bigint").alias("a"),
    )
    eg = (F.col("ng") * F.col("a")).cast("double") / F.col("n").cast("double")
    ad = F.col("ag").cast("double")
    bd = (F.col("ng") - F.col("ag")).cast("double")
    ebg = F.col("ng").cast("double") - eg
    term = (ad - eg) * (ad - eg) / eg + (bd - ebg) * (bd - ebg) / ebg
    terms = per.crossJoin(F.broadcast(pool)).select(
        "g", "ng", "ag", eg.alias("eg"), term.alias("t")
    )
    chi = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("g"), F.col("t")))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("chi2")
    )
    return terms.crossJoin(F.broadcast(chi)).select(
        "g",
        F.col("ng").alias("n_g"),
        F.col("ag").alias("n_above"),
        F.col("eg").alias("exp_above"),
        "chi2",
    )


# ---------------------------------------------------------------------------
# stat_bartels_rank_vn — Bartels' rank von Neumann randomness test


@register(
    "stat_bartels_rank_vn",
    tags=("stats", "timeseries", "window"),
    oracle=f"""
        WITH daily AS ({_DAILY_Q6_SQL}),
        ranked AS (
            SELECT event_type, d,
                   2 * RANK() OVER (PARTITION BY event_type ORDER BY v)
                     + COUNT(*) OVER (PARTITION BY event_type, v) - 1 AS r2
            FROM daily
        ),
        seq AS (
            SELECT event_type, r2,
                   LEAD(r2) OVER (PARTITION BY event_type ORDER BY d)
                       AS r2n,
                   COUNT(*) OVER (PARTITION BY event_type) AS nt
            FROM ranked
        ),
        per AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN r2n IS NOT NULL
                        THEN (r2 - r2n) * (r2 - r2n) ELSE 0 END)
                        AS BIGINT) AS num4,
                   CAST(SUM((r2 - (nt + 1)) * (r2 - (nt + 1)))
                        AS BIGINT) AS den4
            FROM seq
            GROUP BY event_type
        )
        SELECT event_type, n, num4, den4,
               CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) AS rvn,
               (CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE)
                  - CAST(2 AS DOUBLE))
               / sqrt(CAST(4 * (n - 2) * (5 * n * n - 2 * n - 9)
                           AS DOUBLE)
                      / CAST(5 * n * (n + 1) * (n - 1) * (n - 1)
                             AS DOUBLE)) AS z
        FROM per
    """,
)
def stat_bartels_rank_vn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartels' rank von Neumann ratio per event type — the
    nonparametric serial-randomness test: RVN = sum (r_i - r_{i+1})^2
    / sum (r_i - rbar)^2 over the time-ordered ranks of the daily
    totals; ~2 under randomness, <2 under positive autocorrelation.
    Exactness: DOUBLED midranks (2*RANK + tiecount - 1) keep ties in
    integer arithmetic; sum of doubled midranks is n(n+1) exactly, so
    rbar2 = n + 1 is an exact integer and BOTH the successive-
    difference and deviation sums are exact BIGINTs whose x4 scale
    factors cancel in the ratio; RVN and its large-sample z are each
    one double expression over integers. Distributed shape: windows
    partition per event type over CALENDAR-bounded daily rows (the
    Hampel/Friedman contract — days grow with time, not SF; the
    corpus-scaled work is the one daily pre-agg in _daily_q6)."""
    daily = _daily_q6(spark, sf_dir)
    r2 = (
        F.lit(2)
        * F.rank().over(Window.partitionBy("event_type").orderBy("v"))
        + F.count(F.lit(1)).over(Window.partitionBy("event_type", "v"))
        - F.lit(1)
    )
    ranked = daily.select("event_type", "d", r2.alias("r2"))
    w_t = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    seq = ranked.select(
        "event_type",
        "r2",
        F.lead("r2").over(w_t).alias("r2n"),
        F.count(F.lit(1)).over(w_all).alias("nt"),
    )
    per = seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.col("r2n").isNotNull(),
                (F.col("r2") - F.col("r2n")) * (F.col("r2") - F.col("r2n")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("num4"),
        F.sum(
            (F.col("r2") - (F.col("nt") + 1))
            * (F.col("r2") - (F.col("nt") + 1))
        )
        .cast("bigint")
        .alias("den4"),
    )
    nd = F.col("n")
    rvn = F.col("num4").cast("double") / F.col("den4").cast("double")
    z = (rvn - F.lit(2).cast("double")) / F.sqrt(
        (4 * (nd - 2) * (5 * nd * nd - 2 * nd - 9)).cast("double")
        / (5 * nd * (nd + 1) * (nd - 1) * (nd - 1)).cast("double")
    )
    return per.select(
        "event_type", "n", "num4", "den4", rvn.alias("rvn"), z.alias("z")
    )


# ---------------------------------------------------------------------------
# ts_cox_stuart — Cox-Stuart paired-halves trend test


@register(
    "ts_cox_stuart",
    tags=("timeseries", "stats"),
    oracle=f"""
        WITH daily AS ({_DAILY_Q6_SQL}),
        idxed AS (
            SELECT event_type, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY d) AS i,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM daily
        ),
        pairs AS (
            SELECT a.event_type,
                   CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS pos,
                   CASE WHEN b.v < a.v THEN 1 ELSE 0 END AS neg
            FROM idxed a
            JOIN idxed b ON b.event_type = a.event_type
                        AND b.i = a.i + (a.n - a.n // 2)
            WHERE a.i <= a.n // 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(pos) AS BIGINT) AS n_up,
               CAST(SUM(neg) AS BIGINT) AS n_down,
               CASE WHEN SUM(pos) + SUM(neg) > 0 THEN
                   (CAST(SUM(pos) AS DOUBLE)
                      - CAST(SUM(pos) + SUM(neg) AS DOUBLE)
                        / CAST(2 AS DOUBLE))
                   / sqrt(CAST(SUM(pos) + SUM(neg) AS DOUBLE)
                          / CAST(4 AS DOUBLE)) END AS z
        FROM pairs GROUP BY event_type
    """,
)
def ts_cox_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox-Stuart trend test per event type: pair day i of the first
    half with day i + ceil(n/2) of the second half and sign-test the
    differences — the assumption-free 'is this series drifting'
    screen. Exactness: pairing index i + (n - n DIV 2) is integer
    arithmetic (DuckDB `//` twin), daily values are exact q6 BIGINTs
    so the up/down signs are exact, ties drop from the effective
    sample on both engines, and the binomial z is one double
    expression NULL-guarded by the identical n_up + n_down > 0
    predicate. Distributed shape: per-type row_number windows over
    calendar-bounded daily rows; the half-offset pairing is an
    equi-join on (event_type, index) — never a cross pairing."""
    daily = _daily_q6(spark, sf_dir)
    w_t = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    idxed = daily.select(
        "event_type",
        "v",
        F.row_number().over(w_t).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).persist()
    a = idxed.filter(F.col("i") <= F.expr("n DIV 2")).select(
        "event_type",
        (F.col("i") + (F.col("n") - F.expr("n DIV 2"))).alias("j"),
        F.col("v").alias("va"),
    )
    b = idxed.select(
        "event_type", F.col("i").alias("j"), F.col("v").alias("vb")
    )
    pairs = a.join(b, ["event_type", "j"]).select(
        "event_type",
        (F.col("vb") > F.col("va")).cast("int").alias("pos"),
        (F.col("vb") < F.col("va")).cast("int").alias("neg"),
    )
    spos = F.sum("pos")
    sneg = F.sum("neg")
    nt = (spos + sneg).cast("double")
    z = F.when(
        spos + sneg > 0,
        (spos.cast("double") - nt / F.lit(2).cast("double"))
        / F.sqrt(nt / F.lit(4).cast("double")),
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        spos.cast("bigint").alias("n_up"),
        sneg.cast("bigint").alias("n_down"),
        z.alias("z"),
    )


# ---------------------------------------------------------------------------
# fin trio: Martin ratio, gain-to-pain, Jensen's alpha
# (reuses finance.py's _seg_daily spine + the q9 return / q6 drawdown
# quantization recipes of fin_capm_beta / fin_ulcer_index)

from finance_etl_spark.plans.finance import _SEG_DAILY_SQL, _seg_daily  # noqa: E402


def _seg_q9_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, d, r): day-over-day segment revenue returns floor-
    quantized to q9 BIGINTs — the fin_capm_beta spine, shared."""
    daily = _seg_daily(spark, sf_dir)
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
            )
            .cast("bigint")
            .alias("r"),
        )
    )


_SEG_Q9_SQL = f"""
            SELECT segment, d,
                   CAST(FLOOR((CAST(CAST(x AS VARCHAR) AS DOUBLE)
                               / CAST(CAST(xp AS VARCHAR) AS DOUBLE)
                               - CAST(1 AS DOUBLE)) * CAST(1e9 AS DOUBLE))
                        AS BIGINT) AS r
            FROM (SELECT segment, d, x,
                         LAG(x) OVER (PARTITION BY segment ORDER BY d) AS xp
                  FROM daily)
            WHERE xp IS NOT NULL
"""


@register(
    "fin_gain_to_pain",
    tags=("finance", "risk"),
    oracle=f"""
        WITH daily AS ({_SEG_DAILY_SQL}),
        rs AS ({_SEG_Q9_SQL})
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r) AS BIGINT) AS sum_r_q9,
               CAST(SUM(CASE WHEN r < 0 THEN -r ELSE 0 END) AS BIGINT)
                   AS pain_q9,
               CASE WHEN SUM(CASE WHEN r < 0 THEN -r ELSE 0 END) > 0 THEN
                   CAST(SUM(r) AS DOUBLE)
                   / CAST(SUM(CASE WHEN r < 0 THEN -r ELSE 0 END)
                          AS DOUBLE) END AS gain_to_pain
        FROM rs GROUP BY segment
    """,
)
def fin_gain_to_pain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gain-to-pain ratio per market segment: sum of all daily returns
    over the absolute sum of losing-day returns — Schwager's
    consistency number (>1 means gains outweigh aggregate pain).
    Exactness: returns are the shared q9 BIGINT spine, so both the
    numerator and the pain denominator are exact integer sums and the
    ratio is ONE guarded double division (identical pain > 0
    predicate NULLs both engines on an all-up segment). Distributed
    shape: one broadcast-join daily agg (corpus work) + per-segment
    lag windows on calendar-bounded rows + one k-segment hash agg."""
    rs = _seg_q9_returns(spark, sf_dir)
    pain = F.sum(F.when(F.col("r") < 0, -F.col("r")).otherwise(0))
    return rs.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("sum_r_q9"),
        pain.cast("bigint").alias("pain_q9"),
        F.when(
            pain > 0, F.sum("r").cast("double") / pain.cast("double")
        ).alias("gain_to_pain"),
    )


@register(
    "fin_jensen_alpha",
    tags=("finance", "stats"),
    oracle=f"""
        WITH daily AS ({_SEG_DAILY_SQL}),
        mkt AS (
            SELECT d, CAST(SUM(x) AS DECIMAL(18,2)) AS xm
            FROM daily GROUP BY d
        ),
        rs AS ({_SEG_Q9_SQL}),
        rm AS (
            SELECT d,
                   CAST(FLOOR((CAST(CAST(xm AS VARCHAR) AS DOUBLE)
                               / CAST(CAST(xmp AS VARCHAR) AS DOUBLE)
                               - CAST(1 AS DOUBLE)) * CAST(1e9 AS DOUBLE))
                        AS BIGINT) AS m
            FROM (SELECT d, xm, LAG(xm) OVER (ORDER BY d) AS xmp FROM mkt)
            WHERE xmp IS NOT NULL
        ),
        j AS (SELECT rs.segment, rs.r, rm.m FROM rs JOIN rm ON rm.d = rs.d),
        s AS (
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(r) AS BIGINT) AS sr,
                   CAST(SUM(m) AS BIGINT) AS sm,
                   CAST(CAST(SUM(CAST(r AS DECIMAL(19,0)) * m) AS VARCHAR)
                        AS DOUBLE) AS srm,
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,0)) * m) AS VARCHAR)
                        AS DOUBLE) AS smm
            FROM j GROUP BY segment
        )
        SELECT segment, n,
               CASE WHEN CAST(n AS DOUBLE) * smm
                         - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) > 0 THEN
                 ((CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)
                     / CAST(1e9 AS DOUBLE)
                   - CAST('8.219178082191781e-05' AS DOUBLE))
                  - (CAST(n AS DOUBLE) * srm
                     - CAST(sr AS DOUBLE) * CAST(sm AS DOUBLE))
                    / (CAST(n AS DOUBLE) * smm
                       - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                    * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)
                         / CAST(1e9 AS DOUBLE)
                       - CAST('8.219178082191781e-05' AS DOUBLE)))
                 * CAST(365 AS DOUBLE)
               END AS jensen_alpha_annual
        FROM s ORDER BY segment
    """,
)
def fin_jensen_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen's alpha per segment, annualized, against a 3%-annual
    risk-free rate: alpha_J = (mean_r - rf) - beta * (mean_m - rf),
    x365 — the excess-over-CAPM performance number (differs from
    fin_capm_beta's regression intercept by pricing the risk-free
    leg). Exactness: the five sufficient sums are the exact
    integer/DECIMAL CAPM sums on the shared q9 spine; rf/365 enters
    as a Python-generated double LITERAL shared verbatim by both
    dialects (the fin_npv_rate_grid recipe — no division at query
    time), and alpha assembles in one guarded double expression
    (zero market variance NULLs both engines). Distributed shape
    identical to fin_capm_beta: corpus work is the daily agg; all
    windows on calendar-bounded rows; market series broadcast."""
    rf_d = 0.03 / 365  # 8.219178082191781e-05, literal-twinned above
    daily = _seg_daily(spark, sf_dir).persist()
    ws = Window.partitionBy("segment").orderBy("d")
    rs = (
        daily.withColumn("xp", F.lag("x").over(ws))
        .filter(F.col("xp").isNotNull())
        .select(
            "segment",
            "d",
            F.floor(
                (_as_d(F.col("x")) / _as_d(F.col("xp")) - F.lit(1.0))
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("r"),
        )
    )
    mkt = daily.groupBy("d").agg(
        F.sum("x").cast("decimal(18,2)").alias("xm")
    )
    wm = Window.orderBy("d")
    rm = (
        mkt.withColumn("xmp", F.lag("xm").over(wm))
        .filter(F.col("xmp").isNotNull())
        .select(
            "d",
            F.floor(
                (_as_d(F.col("xm")) / _as_d(F.col("xmp")) - F.lit(1.0))
                * F.lit(1e9)
            )
            .cast("bigint")
            .alias("m"),
        )
    )
    j = rs.join(F.broadcast(rm), "d").select("segment", "r", "m")
    s = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("sr"),
        F.sum("m").cast("bigint").alias("sm"),
        _as_d(
            F.sum(F.col("r").cast("decimal(19,0)") * F.col("m"))
        ).alias("srm"),
        _as_d(
            F.sum(F.col("m").cast("decimal(19,0)") * F.col("m"))
        ).alias("smm"),
    )
    n_d = F.col("n").cast("double")
    sr_d = F.col("sr").cast("double")
    sm_d = F.col("sm").cast("double")
    var_m = n_d * F.col("smm") - sm_d * sm_d
    beta = (n_d * F.col("srm") - sr_d * sm_d) / var_m
    rf = F.lit(rf_d)
    alpha = (
        (sr_d / n_d / F.lit(1e9) - rf)
        - beta * (sm_d / n_d / F.lit(1e9) - rf)
    ) * F.lit(365).cast("double")
    return s.select(
        "segment",
        "n",
        F.when(var_m > 0, alpha).alias("jensen_alpha_annual"),
    ).orderBy("segment")


@register(
    "fin_martin_ratio",
    tags=("finance", "window", "risk"),
    oracle=f"""
        WITH daily AS ({_SEG_DAILY_SQL}),
        dd AS (
            SELECT segment, d, x,
                   CAST(FLOOR((CAST(CAST(mx AS VARCHAR) AS DOUBLE)
                               - CAST(CAST(x AS VARCHAR) AS DOUBLE))
                              / CAST(CAST(mx AS VARCHAR) AS DOUBLE)
                              * CAST(100 AS DOUBLE) * CAST(1e6 AS DOUBLE))
                        AS BIGINT) AS ddq
            FROM (
                SELECT segment, d, x,
                       MAX(x) OVER (PARTITION BY segment ORDER BY d
                                    ROWS UNBOUNDED PRECEDING) AS mx
                FROM daily
            )
        ),
        per AS (
            SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_days,
                   sqrt(CAST(CAST(SUM(CAST(ddq AS DECIMAL(19,0)) * ddq)
                              AS VARCHAR) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) / 1e6 AS ulcer,
                   (CAST(CAST(arg_max(x, d) AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(arg_min(x, d) AS VARCHAR) AS DOUBLE)
                    - CAST(1 AS DOUBLE)) * CAST(100 AS DOUBLE)
                       AS total_ret_pct
            FROM dd GROUP BY segment
        )
        SELECT segment, n_days, total_ret_pct, ulcer,
               CASE WHEN ulcer > 0 THEN total_ret_pct / ulcer END
                   AS martin_ratio
        FROM per ORDER BY segment
    """,
)
def fin_martin_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Martin ratio (Ulcer performance index) per segment: the period
    total return over the ulcer index — return per unit of
    depth-AND-duration drawdown pain, the risk-adjusted number that
    punishes long slumps where Sharpe's volatility denominator
    doesn't. Exactness: drawdowns are the fin_ulcer_index q6 BIGINT
    recipe (quantize BEFORE squaring, exact DECIMAL square sums, one
    sqrt edge); the period return takes first/last daily revenue via
    arg_min/arg_max on the unique date key (Spark min_by/max_by twin
    — deterministic, no order-dependent pick); the ratio is one
    guarded double division (ulcer > 0 identical predicate — an
    all-peak segment NULLs both engines). Distributed shape: the
    fin_ulcer_index plan plus two arg-extremes in the same
    per-segment agg — windows on calendar-bounded rows only."""
    daily = _seg_daily(spark, sf_dir)
    w = Window.partitionBy("segment").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dd = daily.select(
        "segment",
        "d",
        "x",
        F.floor(
            (_as_d(F.max("x").over(w)) - _as_d(F.col("x")))
            / _as_d(F.max("x").over(w))
            * F.lit(100.0)
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("ddq"),
    )
    ulcer = (
        F.sqrt(
            _as_d(
                F.sum(F.col("ddq").cast("decimal(19,0)") * F.col("ddq"))
                .cast("decimal(38,0)")
            )
            / F.count(F.lit(1)).cast("double")
        )
        / F.lit(1e6)
    )
    tot_ret = (
        _as_d(F.max_by("x", "d")) / _as_d(F.min_by("x", "d"))
        - F.lit(1).cast("double")
    ) * F.lit(100).cast("double")
    per = dd.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        ulcer.alias("ulcer"),
        tot_ret.alias("total_ret_pct"),
    )
    return per.select(
        "segment",
        "n_days",
        "total_ret_pct",
        "ulcer",
        F.when(F.col("ulcer") > 0, F.col("total_ret_pct") / F.col("ulcer"))
        .alias("martin_ratio"),
    ).orderBy("segment")
