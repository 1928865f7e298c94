from finance_etl_spark.ingest.config import (  # noqa: F401
    FileGroupConfig,
    IngestConfig,
    load_config,
)
from finance_etl_spark.ingest.pipeline import (  # noqa: F401
    quarantine_split,
    read_group,
    read_group_permissive,
    run_ingest,
    transform_group,
)
