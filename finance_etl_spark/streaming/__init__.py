from finance_etl_spark.streaming.runner import (  # noqa: F401
    events_stream,
    run_stream_to_memory,
    idempotent_append_batch,
)
