"""fan_out partition-layout tests: the helper must widen degenerate
small-file inputs (the single-row-group test corpus case) and be a
structural no-op on already-wide ones (the 100 TB case, where inputs
arrive with >= cores input files). The width probe is the plan's leaf
input-file count — file listing only, never a plan->RDD translation —
so non-file plans (in-memory ranges, shuffles) pass through untouched.
"""

from __future__ import annotations

from etl_finance_pipeline_spark.functions.layout import fan_out


def _single_file_parquet(spark, tmp_path, n=1000):
    p = str(tmp_path / "narrow")
    spark.range(n).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    # one data file -> the degenerate narrow-scan case
    assert len(df.inputFiles()) == 1
    return df


def test_fan_out_widens_single_file_scan(spark, tmp_path):
    df = _single_file_parquet(spark, tmp_path)
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # Round-robin must preserve the rows exactly.
    assert wide.count() == 1000
    assert wide.agg({"id": "sum"}).first()[0] == 999 * 1000 // 2


def test_fan_out_noop_when_already_wide(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "wide")
    spark.range(1000).repartition(target + 2).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= target
    wide = fan_out(df)
    # No narrowing, and no new shuffle inserted: same plan object back.
    assert wide is df


def test_fan_out_noop_on_non_file_plan(spark):
    # No file-backed leaves -> width unknown -> pass through unchanged
    # rather than inserting a speculative shuffle.
    df = spark.range(1000).coalesce(1)
    assert fan_out(df) is df


def test_fan_out_min_factor_scales_target(spark, tmp_path):
    df = _single_file_parquet(spark, tmp_path, n=100)
    wide = fan_out(df, min_factor=2)
    assert (
        wide.rdd.getNumPartitions() == 2 * spark.sparkContext.defaultParallelism
    )


def test_dynamic_partition_pruning_on_exported_layout(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must carry a
    DynamicPruningExpression on the fact scan — at 100 TB this is the
    difference between scanning 3 months and scanning all of history
    when the month list comes from a runtime subquery."""
    from pyspark.sql import functions as F

    fact = spark.range(100_000).select(
        (F.col("id") % 24).alias("MONTH_ID"), F.col("id").alias("v")
    )
    fact.write.partitionBy("MONTH_ID").parquet(str(tmp_path / "fact"))
    dim = spark.range(24).select(
        F.col("id").alias("MONTH_ID"), (F.col("id") % 4).alias("quarter")
    )
    dim.write.parquet(str(tmp_path / "dim"))
    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("quarter") == 1)
    out = f.join(d, "MONTH_ID").agg(F.sum("v").alias("s"))
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # correctness alongside the plan shape: quarter 1 = months 1,5,...,21
    want = sum(v for v in range(100_000) if (v % 24) % 4 == 1)
    assert rows[0]["s"] == want
