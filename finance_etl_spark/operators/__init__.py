from finance_etl_spark.operators.joins import asof_join, range_join  # noqa: F401
from finance_etl_spark.operators.sessionize import sessionize  # noqa: F401
from finance_etl_spark.operators.incremental import incremental_new_records  # noqa: F401
from finance_etl_spark.operators.ranks import global_row_number  # noqa: F401
