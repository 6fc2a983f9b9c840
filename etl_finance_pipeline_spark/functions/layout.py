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
    partitions when its file-backed input is narrower. Use directly
    before a CPU-bound projection; never after a layout-sensitive op
    (window/sorted write) — round-robin destroys ordering.

    The width probe counts the plan's leaf input files
    (``df.inputFiles()`` — file listing only, no job) rather than
    converting to an RDD: ``df.rdd.getNumPartitions()`` forces a full
    analysis + RDD translation of the plan that is then thrown away.
    File count upper-bounds the scan's partition count for small files
    (Spark packs small files together), so ``n_files < target`` is
    exactly the degenerate case the helper exists for; non-file plans
    (0 files) and already-wide inputs pass through untouched."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    n_files = len(df.inputFiles())
    if n_files == 0 or n_files >= target:
        return df
    return df.repartition(target)


def zvalue(x, y, bits: int = 8):
    """Morton/Z-order interleave of two pre-quantized non-negative
    int columns (each in [0, 2^bits)): bit i of x lands at position
    2i, bit i of y at 2i+1. Pure bigint shift/mask arithmetic —
    portable to any SQL engine for oracle checks, and cheap enough to
    run inline during a write.

    Z-ordering is the lakehouse data-layout trick (Delta/Iceberg
    `OPTIMIZE ZORDER BY`): sorting or range-bucketing files by the
    interleaved value clusters BOTH dimensions at once, so min/max
    file statistics prune scans for predicates on either column —
    a multi-column generalization of partition pruning.
    """
    from pyspark.sql import functions as F

    xi = x.cast("bigint")
    yi = y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xi, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(yi, i) % 2, 2 * i + 1)
        )
    return z


def quantize(col, lo, hi, bits: int = 8):
    """Linear-scale ``col`` into [0, 2^bits) given (lo, hi) bound
    columns (typically a broadcast 1-row min/max agg). Values at hi
    map to the top cell; degenerate lo==hi maps to 0."""
    from pyspark.sql import functions as F

    cells = (1 << bits) - 1
    span = (hi - lo).cast("double")
    scaled = F.when(
        span == 0, F.lit(0)
    ).otherwise(
        F.floor((col - lo).cast("double") / span * cells)
    )
    return F.least(scaled.cast("bigint"), F.lit(cells).cast("bigint"))
