from finance_etl_spark.io.readers import TABLES, load_table, load_tables, register_views  # noqa: F401
