"""OHLCV time-bucket resampling — the engine's core aggregation.

Capability parity with /root/reference/src/etl/transform/resample.py
(A1-A3, P7): OPEN=first / HIGH=max / LOW=min / CLOSE=last / volume
columns summed / SYMBOL preserved / extra numeric columns mean-or-sum
/ optional drop of incomplete (no-CLOSE) buckets.

Spark-first translation decisions:
 * Buckets via ``F.window(ts, duration)`` — left-closed, left-labeled,
   exactly matching pandas ``resample`` default semantics (verified in
   SURVEY.md §2.6). Label = window.start.
 * first/last are TIME-ordered in pandas by construction; after a
   Spark shuffle ``F.first/F.last`` are nondeterministic, so we use
   ``min_by``/``max_by(value, ts)`` — order-deterministic and still a
   single-pass hash aggregate (partial + final, map-side combine).
   NULL values are excluded from first/last (pandas groupby skipna
   semantics) by nulling the ordering key.
 * pandas ``resample`` materializes EMPTY buckets (all-NaN rows)
   between min and max; a Spark groupBy does not. With
   ``drop_incomplete=True`` (the default path) the two coincide; with
   ``drop_incomplete=False`` we left-join the aggregate onto the full
   per-key bucket grid to reproduce the empty rows.

Scale: one shuffle on (keys, bucket) with map-side partial agg; AQE
coalesces the output partitions. No windows, no UDFs, no driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.scalar import (
    offset_alias_to_duration,
    offset_alias_to_seconds,
)

VOLUME_COLUMNS = ("VOLUME", "TICKVOL", "VOL")

#: Calendar buckets (variable length — not expressible as a fixed
#: ``F.window`` duration): pandas-style start-anchored aliases →
#: date_trunc unit. Left-closed, left-labeled at the period start,
#: matching pandas 'MS'/'QS'/'YS' resampling.
_CALENDAR_UNITS = {"1MS": "month", "MS": "month", "1QS": "quarter", "QS": "quarter", "1YS": "year", "YS": "year"}


def candles_from_ticks(
    df: DataFrame,
    rule: str,
    key_cols: list[str],
    ts_col: str = "TIMESTAMP",
    value_col: str = "value",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Build OHLCV candles from tick-level observations (one value per
    event) — the engine's flagship aggregation and the tick→candle
    entry path the reference handles upstream of its pipeline.

    OPEN/CLOSE are the first/last tick BY TIME (``min_by``/``max_by``
    over (ts, tiebreaks...) — deterministic under shuffles), HIGH/LOW
    are max/min, VOLUME is the value sum, N_TICKS the count. One
    shuffle on (keys, bucket), map-side combinable.
    """
    duration = offset_alias_to_duration(rule)
    order_key = (
        F.struct(F.col(ts_col), *[F.col(c) for c in (order_cols or [])])
        if order_cols
        else F.col(ts_col)
    )
    v = F.col(value_col)
    return (
        df.groupBy(*key_cols, F.window(ts_col, duration).alias("_w"))
        .agg(
            F.min_by(v, order_key).alias("OPEN"),
            F.max(v).alias("HIGH"),
            F.min(v).alias("LOW"),
            F.max_by(v, order_key).alias("CLOSE"),
            F.sum(v).alias("VOLUME"),
            F.count("*").alias("N_TICKS"),
        )
        .withColumn(ts_col, F.col("_w.start"))
        .drop("_w")
        .select(*key_cols, ts_col, "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME", "N_TICKS")
    )
_NUMERIC_TYPES = {"double", "float", "int", "bigint", "smallint", "tinyint", "decimal"}


def _first_by_time(col: str, ts_col: str):
    """First non-null value by time: min_by with NULL-masked ordering
    key (min_by ignores rows whose ordering key is NULL)."""
    return F.min_by(col, F.when(F.col(col).isNotNull(), F.col(ts_col)))


def _last_by_time(col: str, ts_col: str):
    return F.max_by(col, F.when(F.col(col).isNotNull(), F.col(ts_col)))


def resample_ohlc(
    df: DataFrame,
    rule: str,
    key_cols: list[str] | None = None,
    ts_col: str = "TIMESTAMP",
    drop_incomplete: bool = True,
    extra_numeric_policy: str = "mean",
) -> DataFrame:
    """Resample an OHLC-like frame to *rule* (pandas offset alias:
    '1T', '5T', '1H', '1D', ...), per key.

    Output: (keys..., TIMESTAMP=bucket start, OPEN, HIGH, LOW, CLOSE,
    volume cols, extra numeric cols). Column set mirrors the input's
    available columns, like the reference's dynamic agg map
    (resample.py:13-36).
    """
    keys = key_cols or (["SYMBOL"] if "SYMBOL" in df.columns else [])
    calendar_unit = _CALENDAR_UNITS.get(rule.strip().upper())
    duration = None if calendar_unit else offset_alias_to_duration(rule)
    cols = set(df.columns)

    aggs = []
    mapped = {ts_col, *keys}
    if "OPEN" in cols:
        aggs.append(_first_by_time("OPEN", ts_col).alias("OPEN"))
        mapped.add("OPEN")
    if "HIGH" in cols:
        aggs.append(F.max("HIGH").alias("HIGH"))
        mapped.add("HIGH")
    if "LOW" in cols:
        aggs.append(F.min("LOW").alias("LOW"))
        mapped.add("LOW")
    if "CLOSE" in cols:
        aggs.append(_last_by_time("CLOSE", ts_col).alias("CLOSE"))
        mapped.add("CLOSE")
    for vol in VOLUME_COLUMNS:
        if vol in cols:
            aggs.append(F.sum(vol).alias(vol))
            mapped.add(vol)
    if "SYMBOL" in cols and "SYMBOL" not in keys:
        aggs.append(_last_by_time("SYMBOL", ts_col).alias("SYMBOL"))
        mapped.add("SYMBOL")

    # Extra numeric columns: mean (default) or sum (resample.py:74-84).
    extra_fn = F.sum if extra_numeric_policy == "sum" else F.avg
    for name, dtype in df.dtypes:
        if name not in mapped and dtype.split("(")[0] in _NUMERIC_TYPES:
            aggs.append(extra_fn(name).alias(name))

    if not aggs:
        return df

    if calendar_unit:
        bucket = F.date_trunc(calendar_unit, F.col(ts_col))
        res = df.groupBy(*keys, bucket.alias("_w")).agg(*aggs).withColumnRenamed(
            "_w", ts_col
        )
    else:
        res = (
            df.groupBy(*keys, F.window(ts_col, duration).alias("_w"))
            .agg(*aggs)
            .withColumn(ts_col, F.col("_w.start"))
            .drop("_w")
        )
    # stable column order: keys, ts, aggregates
    out_cols =[*keys, ts_col] + [c for c in res.columns if c not in (*keys, ts_col)]
    res = res.select(*out_cols)

    if drop_incomplete:
        if "CLOSE" in res.columns:
            res = res.filter(F.col("CLOSE").isNotNull())
        return res

    # Reproduce pandas' empty buckets: left-join onto the full bucket grid.
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_min_ts"), F.max(ts_col).alias("_max_ts")
    )
    if calendar_unit:
        grid = bounds.select(
            *keys,
            F.explode(
                F.sequence(
                    F.date_trunc(calendar_unit, F.col("_min_ts")),
                    F.date_trunc(calendar_unit, F.col("_max_ts")),
                    F.expr(f"INTERVAL 1 {calendar_unit.upper()}"),
                )
            ).alias(ts_col),
        )
    else:
        step = offset_alias_to_seconds(rule)
        grid = bounds.select(
            *keys,
            F.explode(
                F.sequence(
                    F.timestamp_seconds(
                        (F.unix_timestamp("_min_ts") / step).cast("long") * step
                    ),
                    F.timestamp_seconds(
                        (F.unix_timestamp("_max_ts") / step).cast("long") * step
                    ),
                    F.expr(f"INTERVAL {step} SECOND"),
                )
            ).alias(ts_col),
        )
    join_keys = [*keys, ts_col]
    return grid.join(res, on=join_keys, how="left").select(*out_cols)
