from etl_finance_pipeline_spark.operators.normalize import (  # noqa: F401
    build_rename_map,
    enforce_dtypes,
    normalize_columns,
    normalize_datetime,
    normalize_df,
    remove_duplicates,
    validate_required_columns,
)
from etl_finance_pipeline_spark.operators.resample import resample_ohlc  # noqa: F401
from etl_finance_pipeline_spark.operators.gaps import (  # noqa: F401
    classify_gap_expr,
    detect_gaps,
    expected_grid,
    gap_islands,
    interpolate_linear,
    reindex_to_grid,
    repair_gaps,
)
from etl_finance_pipeline_spark.operators.report import data_quality_report  # noqa: F401
