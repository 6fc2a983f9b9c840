"""Temporal join operators Spark lacks natively: as-of join and
event sessionization.

The reference engine has no joins at all (SURVEY §2.8); these are the
charter's "custom operator" extensions, built as compositions of
existing DataFrame ops — no UDFs, no driver-side data.

As-of join — the canonical finance lookup (each trade gets the most
recent quote at or before its timestamp) — is implemented with the
union-and-carry-forward technique:

  1. tag left/right rows, union on (keys, ts),
  2. one per-key ordered window carries the latest right-side payload
     forward (growing frame — O(n) incremental),
  3. keep left rows, unpack the carried payload.

Cost: ONE shuffle of |L|+|R| rows on the by-keys + a per-key sort —
the same cost profile as a sort-merge join, with no range-condition
fan-out (a naive ``l.ts >= r.ts`` theta join explodes to O(|L|·|R|)
pairs per key before picking the max). This is how production asof
joins are done on Spark at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_finance_pipeline_spark.functions.scalar import offset_alias_to_duration


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by_cols: list[str],
    ts_col: str = "TIMESTAMP",
    right_value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    right_suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the nearest right row per *by_cols*
    with ``right.ts <= left.ts`` (backward, inclusive — DuckDB/pandas
    ``merge_asof`` default) or ``>=`` (forward). Unmatched → NULLs;
    with *tolerance_seconds*, matches farther than the tolerance are
    NULLed.

    Output: all left columns + ``<right_col><suffix>`` for each right
    value column + ``<ts_col><suffix>`` (the matched right timestamp).
    """
    rcols = right_value_cols or [
        c for c in right.columns if c not in {*by_cols, ts_col}
    ]
    payload = F.struct(
        F.col(ts_col).alias("_rts"), *[F.col(c).alias(c) for c in rcols]
    )
    r2 = right.select(*by_cols, F.col(ts_col), F.lit(0).alias("_side"), payload.alias("_rv"))
    l2 = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_rv"].dataType).alias("_rv"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left at equal ts → same-ts match allowed
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        raise ValueError(f"unsupported direction: {direction!r}")

    carried = u.withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)

    matched = F.col("_match")
    if tolerance_seconds is not None:
        dist = F.abs(
            F.unix_timestamp(ts_col) - F.unix_timestamp(matched["_rts"])
        )
        matched = F.when(dist <= tolerance_seconds, F.col("_match"))

    return out.select(
        *[c for c in left.columns],
        matched["_rts"].alias(f"{ts_col}{right_suffix}"),
        *[matched[c].alias(f"{c}{right_suffix}") for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by_cols: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    with ``right_start <= left.ts <= right_end`` per *by_cols*.

    A naive theta join forces Spark into a per-key nested loop
    (O(|L|·|R|) comparisons per key). This uses the standard time-bin
    trick: intervals explode to the bins they cover, points map to
    their single bin, and the join becomes an EQUALITY join on
    (keys, bin) refined by the exact range predicate — shuffle-
    partitioned, AQE-skew-splittable. Each point falls in exactly one
    bin, so no post-join dedup is needed. Choose *bin_seconds* near
    the typical interval length: too small explodes long intervals
    into many bins, too large widens candidate sets.
    """
    lbin = F.floor(F.unix_timestamp(F.col(left_ts)) / bin_seconds).cast("long")
    rbins = F.sequence(
        F.floor(F.unix_timestamp(F.col(right_start)) / bin_seconds).cast("long"),
        F.floor(F.unix_timestamp(F.col(right_end)) / bin_seconds).cast("long"),
    )
    l2 = left.withColumn("_bin", lbin)
    r2 = right.withColumn("_bin", F.explode(rbins))
    return (
        l2.join(r2, on=[*by_cols, "_bin"])
        .filter(
            (F.col(left_ts) >= F.col(right_start))
            & (F.col(left_ts) <= F.col(right_end))
        )
        .drop("_bin")
    )


def sessionize(
    df: DataFrame,
    gap: str,
    key_cols: list[str],
    ts_col: str = "TIMESTAMP",
    aggs: list | None = None,
) -> DataFrame:
    """Group events into sessions: a session extends while successive
    events per key arrive within *gap* (pandas offset alias or Spark
    duration) of the previous event — ``F.session_window``, Spark's
    native merging session windows (state-store-backed when streaming).

    Output: keys + session_start + session_end_last (= last event ts,
    NOT start+gap — portable across engines) + n_events + the extra
    *aggs*.
    """
    try:
        duration = offset_alias_to_duration(gap)
    except ValueError:
        duration = gap
    extra = aggs or []
    return (
        df.groupBy(*key_cols, F.session_window(ts_col, duration).alias("_sw"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end_last"),
            F.count("*").alias("n_events"),
            *extra,
        )
        .drop("_sw")
    )
