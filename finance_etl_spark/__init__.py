"""finance_etl_spark — a PySpark-native analytics engine.

A from-scratch Spark-first re-expression of the capabilities of the
reference ETL system (ibqp/finance-etl: config-driven CSV ingest,
surrogate-key dedup, incremental relational load), extended with the
relational/streaming/LLM-pipeline query surface a 100 TB analytics
deployment needs.

Design principles (see SURVEY.md):
- DataFrame/SQL first: declare lazy plans, let Catalyst optimize.
- No driver-side materialization in any operator.
- Decimal-exact money aggregation (the reference used float64 in flight).
- Every operator oracle-checked against DuckDB at small scale factors.
"""

__version__ = "0.1.0"

from finance_etl_spark.session import get_spark  # noqa: F401
