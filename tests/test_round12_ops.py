"""Round-12: independent references for this round's changes. Each
test re-derives the expected answer from the raw sf0.001 parquet with
an INDEPENDENT formulation (numpy / plain-Python, no shared SQL
fragments) so a formula bug shared between the Spark build and the
DuckDB oracle cannot hide."""

import duckdb
import numpy as np
import pytest

from finance_etl_spark import plans

SF = "/root/testdata/sf0.001"


def _fetch(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _eur_per_part():
    """Per-part European-supplied revenue + total part count, computed
    with plain pandas-free aggregation (independent of both twins)."""
    rows = _fetch(
        "SELECT l.l_partkey, l.l_extendedprice, l.l_discount, l.l_suppkey"
        f" FROM read_parquet('{SF}/lineitem.parquet') l"
    )
    eur = {
        r[0]
        for r in _fetch(
            "SELECT s.s_suppkey"
            f" FROM read_parquet('{SF}/supplier.parquet') s"
            f" JOIN read_parquet('{SF}/nation.parquet') n ON s.s_nationkey = n.n_nationkey"
            f" JOIN read_parquet('{SF}/region.parquet') r ON n.n_regionkey = r.r_regionkey"
            " WHERE r.r_name = 'EUROPE'"
        )
    }
    per_part: dict[int, float] = {}
    for pk, price, disc, sk in rows:
        if sk in eur:
            per_part[pk] = per_part.get(pk, 0.0) + float(price) * (1 - float(disc))
    nparts = _fetch(f"SELECT COUNT(*) FROM read_parquet('{SF}/part.parquet')")[0][0]
    return per_part, nparts


class TestQ11SpecFraction:
    """q11_important_stock now implements SPEC TPC-H Q11 semantics:
    FRACTION = 0.0001/SF with SF inferred from |part|/200000, i.e.
    threshold = total * 20 / |part|. On this near-uniform synthetic
    corpus that is provably empty — these tests pin BOTH facts
    independently, so the check.py empty-allowance for q11 cannot
    mask an all-zeros-by-bug regression."""

    def test_spec_threshold_empty_and_lower_fraction_nonempty(self):
        per_part, nparts = _eur_per_part()
        total = sum(per_part.values())
        spec_thresh = total * 20.0 / nparts
        qualifying = [pk for pk, v in per_part.items() if v > spec_thresh]
        assert qualifying == [], "spec threshold unexpectedly non-empty"
        # teeth: a 20x-lower fraction (threshold = mean share) MUST be
        # non-empty, so the pipeline demonstrably can produce rows
        lower = [pk for pk, v in per_part.items() if v > total / nparts]
        assert len(lower) > 0

    def test_spark_q11_matches_independent_reference(self, spark):
        got = plans.get("q11_important_stock").build(spark, SF).collect()
        per_part, nparts = _eur_per_part()
        total = sum(per_part.values())
        expect = {pk for pk, v in per_part.items() if v > total * 20.0 / nparts}
        assert {r.p_partkey for r in got} == expect == set()

    def test_mean_multiple_variant_matches_independent_reference(self, spark):
        got = plans.get("agg_stock_mean_multiple").build(spark, SF).collect()
        per_part, _ = _eur_per_part()
        total = sum(per_part.values())
        np_ = len(per_part)
        expect = {pk for pk, v in per_part.items() if v > 1.5 * total / np_}
        assert len(expect) > 0
        got_keys = {r.p_partkey for r in got}
        # float-vs-decimal edge rows may differ by at most the ulp set;
        # demand exact agreement (decimal accumulation on the Spark
        # side is exact, the reference is float64 — tolerate boundary
        # rows whose value is within 1e-6 of the threshold)
        thresh = 1.5 * total / np_
        boundary = {pk for pk, v in per_part.items() if abs(v - thresh) < 1e-6}
        assert got_keys - boundary == expect - boundary
