"""etl_finance_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (Ares-Infenus/
etl-finance-pipeline): canonical-schema normalization, timezone policy,
keep-first dedupe, time-series gap detection/repair, OHLCV resampling,
data-quality reporting, validated partitioned Parquet export — plus the
large-scale training-data operators a 100 TB pipeline needs
(exact/near deduplication, similarity search, text analysis,
multimodal column plumbing).

Design stance (see SURVEY.md §7):
 * One DataFrame holds ALL symbols; every per-file loop in the
   reference becomes ``groupBy``/``Window.partitionBy`` on the key.
 * Operators are lazy ``DataFrame -> DataFrame`` functions; Catalyst
   owns the physical plan (pushdown, pruning, AQE, broadcast).
 * Order-sensitive aggregates use ``min_by``/``max_by`` — never
   ``first``/``last`` after a shuffle.
 * Reports are explicit single-pass aggregation DataFrames collected
   on the driver, replacing the reference's ``df.attrs`` side-channel.
"""

__version__ = "0.1.0"

from etl_finance_pipeline_spark.session import get_spark  # noqa: F401
from etl_finance_pipeline_spark.sources.tables import (  # noqa: F401
    load_sf_tables,
    load_table,
    register_views,
)
from etl_finance_pipeline_spark.sources.table_format import (  # noqa: F401
    compact,
    delete_where,
    history,
    merge_table,
    read_changes,
    read_table,
    snapshot,
    vacuum,
    write_table,
)
from etl_finance_pipeline_spark.sources.incremental import (  # noqa: F401
    read_aggregate,
    refresh_aggregate,
)
