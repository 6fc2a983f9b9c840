"""fan_out partition-layout tests: the helper must widen degenerate
single-partition inputs and be a structural no-op on already-wide
ones (the 100 TB case, where inputs arrive with >= cores partitions)."""

from __future__ import annotations

from etl_finance_pipeline_spark.functions.layout import fan_out


def test_fan_out_widens_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # Round-robin must preserve the rows exactly.
    assert wide.count() == 1000
    assert wide.agg({"id": "sum"}).first()[0] == 999 * 1000 // 2


def test_fan_out_noop_when_already_wide(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 2)
    wide = fan_out(df)
    # No narrowing, and no new shuffle inserted: same plan object back.
    assert wide is df


def test_fan_out_min_factor_scales_target(spark):
    df = spark.range(100).coalesce(1)
    wide = fan_out(df, min_factor=2)
    assert (
        wide.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism
    )
