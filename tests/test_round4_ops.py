"""Round-4 rows-only operators, pinned against independent driver-side
references: LTTB downsampling, per-order IRR, WordPiece encoding.

Each reference below is a deliberately naive re-implementation (plain
Python loops, DuckDB for the input aggregation) so a bug in the
operator's numpy/pandas path cannot hide in a shared helper.
"""

import math

import duckdb
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


# ---------------------------------------------------------------------------
# LTTB


def _ref_lttb(xs, ys, n_out):
    """Naive loop LTTB (Steinarsson fig. 4): first/last kept, interior
    buckets pick the max-triangle-area point vs previous pick and next
    bucket's average."""
    n = len(xs)
    if n <= n_out:
        return list(range(n))
    bounds = [1 + int(i * (n - 2) / (n_out - 2)) for i in range(n_out - 1)]
    keep = [0]
    a = 0
    for b in range(n_out - 2):
        lo, hi = bounds[b], bounds[b + 1]
        if b == n_out - 3:
            nlo, nhi = n - 1, n
        else:
            nlo, nhi = bounds[b + 1], bounds[b + 2] + 1 if b + 2 < len(bounds) else n
        avg_x = sum(xs[nlo:nhi]) / (nhi - nlo)
        avg_y = sum(ys[nlo:nhi]) / (nhi - nlo)
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs(
                (xs[a] - avg_x) * (ys[i] - ys[a])
                - (xs[a] - xs[i]) * (avg_y - ys[a])
            )
            if area > best_area:
                best, best_area = i, area
        keep.append(best)
        a = best
    keep.append(n - 1)
    return keep


def _daily_series(con):
    rows = con.execute(
        """
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(CAST(SUM(CAST(value AS DECIMAL(30,10))) AS VARCHAR)
                    AS DOUBLE) AS y
        FROM events GROUP BY 1, 2 ORDER BY event_type, d
        """
    ).fetchall()
    series = {}
    for et, d, y in rows:
        series.setdefault(et, []).append((d, y))
    return series


def test_lttb_matches_reference(spark):
    out = plans.get("ts_downsample_lttb").build(spark, SF).collect()
    got = {}
    for r in out:
        got.setdefault(r.event_type, []).append((r.point_idx, r.d, r.y))
    series = _daily_series(_duck())
    assert set(got) == set(series)
    for et, pts in series.items():
        xs = [d.toordinal() for d, _ in pts]
        ys = [y for _, y in pts]
        keep = _ref_lttb(xs, ys, 10)
        expected = [(i, pts[k][0], pts[k][1]) for i, k in enumerate(keep)]
        actual = sorted(got[et])
        assert [(i, d) for i, d, _ in expected] == [
            (i, d) for i, d, _ in actual
        ], et
        for (_, _, ye), (_, _, ya) in zip(expected, actual):
            assert ya == pytest.approx(ye, abs=1e-9)


def test_lttb_invariants(spark):
    out = plans.get("ts_downsample_lttb").build(spark, SF).collect()
    series = _daily_series(_duck())
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rows in by_type.items():
        rows.sort(key=lambda r: r.point_idx)
        days = [d for d, _ in series[et]]
        assert rows[0].d == days[0]
        assert rows[-1].d == days[-1]
        assert len(rows) == min(10, len(days))
        ds = [r.d for r in rows]
        assert ds == sorted(ds)


# ---------------------------------------------------------------------------
# IRR


def _ref_npv(flows, r):
    return sum(cf / (1.0 + r) ** (day / 365.0) for day, cf in flows)


def _ref_irr(flows):
    lo, hi = -0.95, 10.0
    f_lo, f_hi = _ref_npv(flows, lo), _ref_npv(flows, hi)
    if f_lo == 0.0:
        return lo
    if f_hi == 0.0:
        return hi
    if (f_lo > 0) == (f_hi > 0):
        return None
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        f_mid = _ref_npv(flows, mid)
        if f_mid == 0.0:
            return mid
        if (f_mid > 0) == (f_lo > 0):
            lo, f_lo = mid, f_mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _order_flows(con):
    rows = con.execute(
        """
        SELECT o.o_orderkey, 0 AS day, -o.o_totalprice AS cf
        FROM orders o WHERE o.o_orderkey % 199 = 0
        UNION ALL
        SELECT o.o_orderkey,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS day,
               l.l_extendedprice AS cf
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey % 199 = 0
        """
    ).fetchall()
    flows = {}
    for k, day, cf in rows:
        flows.setdefault(k, []).append((day, cf))
    return flows


def test_irr_matches_reference_and_npv_zero(spark):
    out = {
        r.o_orderkey: r
        for r in plans.get("fin_irr_per_order").build(spark, SF).collect()
    }
    flows = _order_flows(_duck())
    assert set(out) == set(flows)
    n_solved = 0
    for k, fl in flows.items():
        ref = _ref_irr(fl)
        got = out[k].irr
        assert out[k].n_flows == len(fl)
        if ref is None:
            assert got is None
        else:
            # the operator emits the DECIMAL(12,6)-quantized root
            assert got == pytest.approx(ref, abs=1.1e-6)
            # the bracketed root really zeroes the NPV — evaluated at
            # the 1e-6-quantized root, so the residual bound is
            # |npv'|·5e-7, not the raw-root 1e-6·scale
            scale = sum(abs(cf) for _, cf in fl)
            assert abs(_ref_npv(fl, got)) < 1e-5 * scale
            n_solved += 1
    assert n_solved > 0  # the fixture must actually exercise the solver


# ---------------------------------------------------------------------------
# WordPiece


def _ref_wordpiece(word, vocab):
    pieces, i, first = [], 0, True
    while i < len(word):
        match = None
        for j in range(len(word), i, -1):  # longest first
            cand = word[i:j] if first else "##" + word[i:j]
            if cand in vocab:
                match, nxt = cand, j
                break
        if match is None:
            pieces.append("[UNK]")
            nxt = i + 1
        else:
            pieces.append(match)
        i = nxt
        first = False
    return pieces


def test_wordpiece_matches_reference(spark):
    out = plans.get("text_wordpiece_encode").build(spark, SF).collect()
    con = _duck()
    wf = con.execute(
        """
        SELECT tok AS word, COUNT(*) AS freq FROM (
            SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9'']+'))
                   AS tok
            FROM documents
        ) GROUP BY tok
        """
    ).fetchall()
    top20 = [
        w for w, _ in sorted(wf, key=lambda r: (-r[1], r[0]))[:20]
    ]
    chars = sorted({c for w, _ in wf for c in w})
    vocab = set(top20) | set(chars) | {"##" + c for c in chars}
    counts = {}
    for w, f in wf:
        for p in _ref_wordpiece(w, vocab):
            n, t = counts.get(p, (0, 0))
            counts[p] = (n + 1, t + f)
    expected = sorted(
        ((p, n, t) for p, (n, t) in counts.items()),
        key=lambda r: (-r[2], r[0]),
    )[:30]
    actual = [
        (r.piece, r.n_distinct_words, r.total_occurrences) for r in out
    ]
    assert actual == expected


# ---------------------------------------------------------------------------
# Holt-Winters


def _ref_holt_winters(y, period=7, alpha=0.3, beta=0.1, gamma=0.2, h=7):
    n = len(y)
    if n < 2 * period:
        return []
    level = sum(y[:period]) / period
    trend = (sum(y[period:2 * period]) / period - level) / period
    season = [y[i] - level for i in range(period)]
    for t in range(n):
        s = season[t % period]
        old = level
        level = alpha * (y[t] - s) + (1 - alpha) * (level + trend)
        trend = beta * (level - old) + (1 - beta) * trend
        season[t % period] = gamma * (y[t] - level) + (1 - gamma) * s
    return [level + (k + 1) * trend + season[(n + k) % period] for k in range(h)]


def test_holt_winters_matches_reference(spark):
    out = plans.get("ts_holt_winters").build(spark, SF).collect()
    series = _daily_series(_duck())
    got = {}
    for r in out:
        got.setdefault(r.event_type, {})[r.horizon] = r.forecast
    for et, pts in series.items():
        ys = [y for _, y in pts]
        ref = _ref_holt_winters(ys)
        if not ref:
            assert et not in got
            continue
        assert sorted(got[et]) == list(range(1, 8))
        for h, fc in enumerate(ref, start=1):
            assert got[et][h] == pytest.approx(fc, rel=1e-12)


def test_holt_winters_constant_series_fixed_point(spark):
    # a constant series must forecast the constant at every horizon
    from finance_etl_spark.plans.timeseries import holt_winters_additive

    fc = holt_winters_additive([5.0] * 30)
    assert len(fc) == 7
    for v in fc:
        assert v == pytest.approx(5.0, abs=1e-9)
