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

# Import for registration side effects.
from finance_etl_spark.plans import relational  # noqa: F401, E402
from finance_etl_spark.plans import scalars  # noqa: F401, E402
from finance_etl_spark.plans import timeseries  # noqa: F401, E402
from finance_etl_spark.plans import ingest_parity  # noqa: F401, E402
from finance_etl_spark.plans import text  # noqa: F401, E402
from finance_etl_spark.plans import vectors  # noqa: F401, E402
from finance_etl_spark.plans import streaming_queries  # noqa: F401, E402
