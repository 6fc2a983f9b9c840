"""Incremental aggregate maintenance over the table format's change
feed — materialized-view refresh without rescanning the base table.

A grouped SUM/COUNT aggregate is self-maintainable: inserts add to the
group, deletes subtract. ``refresh_aggregate`` consumes
``read_changes(base, from_version)``, folds each changed row in with a
±1 sign, and MERGEs the per-key deltas into the materialized state
table — per refresh the work is O(changed files), not O(base table).
At 100 TB that is the difference between an hourly dashboard rollup
costing one microbatch and costing a full scan.

AVG rides for free as sum/count at read time. MIN/MAX do NOT — they
are not self-maintainable under deletes (dropping the current min
needs the base table to find the next one); refusing them is the
correct semantics, same line Materialize/Flink draw for retractable
aggregates.

The refresh is transactional end-to-end: state rides the same commit
log as data, and the state manifest records the base version it
reflects (``base_version``), so a crashed refresh resumes from the
recorded high-water mark — at-least-once delivery of the feed plus
last-committed-version dedupe = exactly-once state.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.sources.table_format import (
    Snapshot,
    VacuumedRangeError,
    _list_versions,
    _manifest_path,
    read_changes,
    read_table,
    snapshot,
    write_table,
)


def aggregate_state_version(state_table: str) -> int | None:
    """The base-table version the materialized state currently
    reflects (its refresh high-water mark), or None if no state."""
    versions = _list_versions(state_table)
    if not versions:
        return None
    for v in reversed(versions):
        with open(_manifest_path(state_table, v)) as fh:
            m = json.load(fh)
        if m.get("base_version") is not None:
            return int(m["base_version"])
    return None


def refresh_aggregate(
    spark: SparkSession,
    base_table: str,
    state_table: str,
    key_cols: list[str],
    sum_cols: list[str],
) -> Snapshot | None:
    """Bring the materialized grouped aggregate in *state_table* up to
    date with *base_table*. State schema: key_cols + ``<c>_sum`` per
    sum column + ``row_count``.

    First call (no state yet) runs the one full aggregation and stamps
    the base version. Subsequent calls read ONLY the change feed past
    the recorded high-water mark, fold inserts as +x/+1 and deletes as
    −x/−1, combine with the current state, and commit the merged rows
    as the next state version (groups whose count reaches 0 are
    dropped). Returns the new state snapshot, or None if already
    current.
    """
    base_version = snapshot(base_table).version
    seen = aggregate_state_version(state_table)

    sums = [
        F.sum(F.col(c).cast("double")).alias(f"{c}_sum") for c in sum_cols
    ]
    if seen is None:
        # Pin the scan to the version captured above: reading the
        # unpinned latest would fold a concurrent commit into the
        # state while stamping the earlier base_version, and the next
        # refresh's change feed would then replay (double-count) it.
        agg = (
            read_table(spark, base_table, version=base_version)
            .groupBy(*key_cols)
            .agg(*sums, F.count("*").alias("row_count"))
        )
        return write_table(
            agg,
            state_table,
            mode="overwrite",
            extra_metadata={"base_version": base_version},
        )
    if seen >= base_version:
        return None

    try:
        changes = read_changes(
            spark, base_table, from_version=seen, to_version=base_version
        )
    except VacuumedRangeError:
        # Part of the feed past our high-water mark was vacuumed — the
        # deltas are unrecoverable, so recompute the aggregate from the
        # base snapshot instead of silently losing them. Pinned to the
        # version captured at entry for the same replay-race reason as
        # the initial build above.
        agg = (
            read_table(spark, base_table, version=base_version)
            .groupBy(*key_cols)
            .agg(*sums, F.count("*").alias("row_count"))
        )
        return write_table(
            agg,
            state_table,
            mode="overwrite",
            extra_metadata={"base_version": base_version},
        )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        changes.withColumn("_sign", sign)
        .groupBy(*key_cols)
        .agg(
            *[
                F.sum(F.col(c).cast("double") * F.col("_sign")).alias(f"{c}_sum")
                for c in sum_cols
            ],
            F.sum("_sign").alias("row_count"),
        )
    )
    state = read_table(spark, state_table)
    merged = (
        state.unionByName(delta)
        .groupBy(*key_cols)
        .agg(
            *[F.sum(f"{c}_sum").alias(f"{c}_sum") for c in sum_cols],
            F.sum("row_count").alias("row_count"),
        )
        .filter(F.col("row_count") > 0)
    )
    return write_table(
        merged,
        state_table,
        mode="overwrite",
        extra_metadata={"base_version": base_version},
    )


def read_aggregate(
    spark: SparkSession, state_table: str, avg_for: list[str] | None = None
) -> DataFrame:
    """Read the materialized aggregate; *avg_for* derives ``<c>_avg``
    columns from the maintained sum/count pairs."""
    out = read_table(spark, state_table)
    for c in avg_for or []:
        out = out.withColumn(f"{c}_avg", F.col(f"{c}_sum") / F.col("row_count"))
    return out
