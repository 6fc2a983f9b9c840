from etl_finance_pipeline_spark.streaming.candles import (  # noqa: F401
    stream_candles,
    stream_dedupe,
    stream_gap_monitor,
)
