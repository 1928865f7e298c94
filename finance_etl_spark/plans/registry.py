"""Registry of named queries with optional DuckDB oracles.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an equivalent DuckDB SQL string used
as a differential-testing oracle (row count + schema + order-insensitive
value hash at sf0.01).

Cross-engine float determinism contract (validated empirically in
tools/float_experiment.py):
- Order-dependent reductions over doubles (sum/avg) are computed in
  DECIMAL(30,10) — exact, order- and partition-independent — and cast
  to double for presentation. On the DuckDB side the final cast routes
  through VARCHAR because DuckDB's int128→double conversion differs
  from a correctly-rounded decimal→double by 1 ulp.
- Per-row arithmetic (+,-,*,/, round, abs, sqrt) is IEEE-deterministic
  and needs no special handling. Transcendental functions (ln, exp,
  pow) are libm-dependent and are kept out of oracle-checked outputs.

Divergence classes found by the cross-SF sweeps (sf0.001/0.01/0.1) and
their fixes — check new queries against all three:
1. WINDOW sums over doubles (`SUM(dbl) OVER ...`) are order-dependent
   like any float reduction — route through DECIMAL exactly like
   grouped sums (window_pct_of_total).
2. Re-quantizing a COMPUTED double back into decimal
   (`CAST(double_result AS DECIMAL)`) can differ 1e-10 between
   engines: Java casts via the double's shortest decimal string,
   DuckDB rounds the binary expansion. Keep money DECIMAL end-to-end;
   cast to double ONCE at the presentation edge (cur_rfm_deciles).
3. round() on a float PRODUCT can land exactly on a .005 boundary
   where the engines' rounding of the binary value disagrees — round
   an exact DECIMAL product instead (scalar_math_funcs).
4. Integer SUM widens to HUGEINT in DuckDB (grouped AND window forms;
   Arrow renders it decimal128(38,0)), while Spark's sum(int/bigint)
   stays bigint — the driver's type-aware value hash then mismatches
   even though every value is identical. Rule: ANY integer SUM that
   reaches an oracle's final SELECT must be `CAST(... AS BIGINT)`
   (round-3 driver fails text_vocab_coverage / text_bpe_pair_counts).
   COUNT(*) / COUNT(DISTINCT) are plain BIGINT in DuckDB and are safe
   uncast. tools/check.py fetches oracle results via Arrow so this
   class now fails locally too.
5. DEGENERATE-DIVISION EDGES (round-9 advisor found three in one PR:
   kappa pe=1, NDCG idcg=0, PSI zero-bin): any statistic with a
   denominator that a lawful-but-extreme input drives to 0 (or a
   log/ratio whose argument can hit 0) must NULL-guard the edge ON
   BOTH ENGINES with the same NULLIF/CASE — Spark returns NULL for
   x/0 while DuckDB raises or returns inf depending on types, so an
   unguarded edge is a latent driver red even when the test fixture
   never trips it. Checklist for every new query: enumerate each
   division/log/sqrt, name the input that degenerates it, and either
   prove the fixture+schema can't produce it (say so in the docstring)
   or guard it identically in builder and oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from finance_etl_spark.session import configure


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            build=wrapped,
            oracle=oracle,
            headline=headline,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in _REGISTRY.items() if spec.headline}


def front_queries(names: list[str]) -> None:
    """Reorder the registry so ``names`` come first (in the given
    order), everything else keeping its registration order. The round
    driver's per-round correctness sample checks the first ~50
    registered queries, so plans/__init__.py fronts the queries whose
    driver evidence this round should produce. Unknown names raise —
    a stale rotation list should fail loudly at import."""
    missing = [n for n in names if n not in _REGISTRY]
    if missing:
        raise KeyError(f"front_queries: unknown queries {missing}")
    fronted = {n: _REGISTRY[n] for n in names}
    rest = {n: s for n, s in _REGISTRY.items() if n not in fronted}
    _REGISTRY.clear()
    _REGISTRY.update(fronted)
    _REGISTRY.update(rest)


# ---------------------------------------------------------------------------
# Cross-engine exact float helpers (see module docstring).

DEC = "decimal(30,10)"


def o_dsum(expr: str) -> str:
    """DuckDB SQL for an order-independent, Spark-bit-identical double sum."""
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"


def o_davg(expr: str) -> str:
    """DuckDB SQL matching Spark's decimal-sum/count average."""
    return f"({o_dsum(expr)} / COUNT({expr}))"


def o_fsum(expr: str, scale: int = 6) -> str:
    """DuckDB SQL for an ENGINE-AGNOSTIC double sum: floor(x·10^s)
    summed as DECIMAL(38,0), divided back at the edge. Unlike o_dsum's
    double→DECIMAL cast — whose rounding path measurably differs three
    ways between Spark (shortest-repr HALF_UP), DuckDB's direct cast
    (exact binary expansion), and DuckDB's VARCHAR route (17-digit
    formatting; see operators/pagerank.py) — floor, exact integer
    summation, and the VARCHAR-routed decimal→double presentation are
    identical everywhere. Spark twin: F.sum(F.floor(col *
    lit(10.0**s)).cast('decimal(38,0)')).cast(...)  — see
    plans/ml.py::_fsum. Quantization error is ≤ rows·10^-s, so pick s
    against the magnitude you present."""
    return (
        f"CAST(CAST(SUM(CAST(FLOOR(({expr}) * 1e{scale})"
        f" AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / 1e{scale}"
    )
