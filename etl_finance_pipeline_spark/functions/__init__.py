from etl_finance_pipeline_spark.functions.scalar import (  # noqa: F401
    offset_alias_to_duration,
    portable_hash64,
    universal_hash31,
)
