"""Query plan library: every operator the engine supports, declared as a
named (Spark builder, DuckDB oracle SQL) pair and collected in a registry.

Importing this package registers all queries.
"""

from finance_etl_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_oracles,
    all_queries,
    get,
    headline_queries,
    register,
)

# Import for registration side effects. Modules land incrementally;
# a missing module must never take down the whole registry.
import importlib

for _mod in (
    "relational",
    "tpch",
    "scalars",
    "timeseries",
    "ingest_parity",
    "text",
    "vectors",
    "curation",
    "multimodal",
    "jdbc_queries",
    "streaming_queries",
    "udf_queries",
):
    try:
        importlib.import_module(f"finance_etl_spark.plans.{_mod}")
    except ModuleNotFoundError as e:  # only "not yet written" is tolerated
        if e.name != f"finance_etl_spark.plans.{_mod}":
            raise
