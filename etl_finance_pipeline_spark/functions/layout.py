"""Partition-layout helpers.

The dedup/similarity/fingerprint operators run expression-heavy
projections (per-shingle md5, per-pair cosine) whose cost is orders of
magnitude above the scan itself. Their parallelism is capped by the
INPUT partition count — and a small parquet file (one row group, e.g.
the 5k-doc test corpus) arrives as ONE partition, serializing the
whole hash pipeline onto a single core while 31 idle.

``fan_out`` widens such inputs to the cluster's default parallelism
with one small round-robin shuffle of the raw rows. At real scale the
input already has ≥ cores partitions (100 TB of parquet is tens of
thousands of row groups) and the helper is a structural no-op — it
only fires on the degenerate small-file case, which is exactly when
the shuffle it inserts is trivially cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition *df* up to ``defaultParallelism × min_factor``
    partitions if (and only if) it currently has fewer. Use directly
    before a CPU-bound projection; never after a layout-sensitive op
    (window/sorted write) — round-robin destroys ordering."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
