from etl_finance_pipeline_spark.sources.readers import (  # noqa: F401
    detect_file_type,
    load_directory,
    read_csv,
    read_parquet,
)
from etl_finance_pipeline_spark.sources.exporter import (  # noqa: F401
    append_export_log,
    validate_for_export,
    write_parquet_with_metadata,
)
