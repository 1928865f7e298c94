from finance_etl_spark.functions.money import davg, dsum  # noqa: F401
from finance_etl_spark.functions.keys import surrogate_key  # noqa: F401
from finance_etl_spark.functions.datetime import strftime_to_java  # noqa: F401
