"""Structured Streaming operators: streaming OHLCV candles, streaming
dedupe, and a stateful gap monitor.

The reference is batch-only (SURVEY §2.10) — this module is the
forward-compatible streaming surface the charter asks for: the SAME
aggregation semantics as operators.resample, expressed over an
unbounded stream with event-time watermarks.

Scale notes:
 * Watermark + window aggregation is incremental state in the state
   store, keyed by (keys, window) — RocksDB-backed at scale
   (``spark.sql.streaming.stateStore.providerClass``); state is purged
   past the watermark, so memory is bounded by (symbols × lateness).
 * ``dropDuplicatesWithinWatermark`` keeps only in-watermark keys in
   state — the streaming twin of the batch keep-first dedupe (O1).
 * The gap monitor uses ``applyInPandasWithState`` (per-key user
   state): state = last seen timestamp per symbol; emits a row per
   detected gap. State size = O(#symbols).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_finance_pipeline_spark.functions.scalar import (
    offset_alias_to_duration,
    offset_alias_to_seconds,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def stream_candles(
    events: DataFrame,
    rule: str,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming OHLCV candles: event-time tumbling windows with a
    watermark for late data.

    Same agg semantics as the batch path (min_by/max_by by event time,
    sum, count) — windows are left-closed/left-labeled, label =
    window.start. Late rows beyond *watermark* are dropped; in append
    output mode a candle is emitted once its window is past the
    watermark (finalized).
    """
    duration = offset_alias_to_duration(rule)
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, duration).alias("_w"))
        .agg(
            F.min_by(v, F.col(ts_col)).alias("OPEN"),
            F.max(v).alias("HIGH"),
            F.min(v).alias("LOW"),
            F.max_by(v, F.col(ts_col)).alias("CLOSE"),
            F.sum(v).alias("VOLUME"),
            F.count("*").alias("N_TICKS"),
        )
        .withColumn("TIMESTAMP", F.col("_w.start"))
        .drop("_w")
    )


def stream_sessions(
    events: DataFrame,
    key_cols: list[str],
    gap: str = "5 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization via the native ``session_window``:
    per key, events closer than *gap* merge into one session whose
    window is [first event, last event + gap). State is pruned past
    the watermark; in append mode a session is emitted once the
    watermark passes its end (finalized — no partial sessions ever
    reach the sink). The batch twin is the islands-based
    :func:`~..operators.temporal.sessionize`; this is the operator a
    clickstream pipeline runs continuously."""
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.session_window(F.col(ts_col), gap).alias("_w"))
        .agg(
            F.count("*").alias("N_EVENTS"),
            F.sum(v).alias("TOTAL_VALUE"),
            F.min(F.col(ts_col)).alias("FIRST_TS"),
            F.max(F.col(ts_col)).alias("LAST_TS"),
        )
        .withColumn("SESSION_START", F.col("_w.start"))
        .withColumn("SESSION_END", F.col("_w.end"))
        .drop("_w")
    )


def stream_dedupe(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming duplicate removal within the watermark horizon — the
    streaming twin of the batch keep-first dedupe (state pruned past
    the watermark, unlike plain dropDuplicates whose state grows
    forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [*keys]
    )


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Any,
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    live stream. Stateless — no watermark, no state store: each
    microbatch joins against the CURRENT static plan (the dim is
    re-resolved per batch, so a dimension table updated between
    batches is picked up automatically). The dim side is broadcast:
    at 100 TB/day of events a dimension in the MBs must never shuffle
    the stream. Append-safe by construction (inner/left joins emit
    each stream row at most ``|dim match|`` times, immediately)."""
    return stream.join(F.broadcast(dim), on, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    condition: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream INNER join with an event-time interval condition
    (e.g. ``"user_id = click_user AND click_ts >= view_ts AND click_ts
    <= view_ts + interval 5 minutes"``).

    Both sides are watermarked on their event-time columns; the range
    predicate lets Spark bound join state — each side retains only rows
    whose event time can still match a future row within
    watermark + interval, so state is O(rate × horizon), not O(stream).
    Without the time bound a stream-stream join must keep EVERYTHING
    forever. Inner-join matches are emitted as soon as both rows have
    arrived (no watermark wait, unlike append-mode aggregation).
    """
    return left.withWatermark(left_ts, watermark).join(
        right.withWatermark(right_ts, watermark), F.expr(condition), "inner"
    )


GAP_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("gap_start", T.TimestampType()),
        T.StructField("gap_end", T.TimestampType()),
        T.StructField("gap_seconds", T.DoubleType()),
    ]
)

_GAP_STATE_SCHEMA = "last_ts double"


def stream_gap_monitor(
    events: DataFrame,
    rule: str,
    key_col: str = "symbol",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming gap detector via ``applyInPandasWithState``:
    per-symbol state holds the last seen event time; whenever the
    next event arrives more than one *rule* interval later, a gap row
    (symbol, gap_start, gap_end, gap_seconds) is emitted.

    This is the streaming counterpart of the batch gap engine
    (operators.gaps G1-G3): batch finds gaps by grid anti-join;
    a stream can't materialize the grid, so it tracks per-key
    continuity in user state instead. State = one float per symbol.
    """
    # integer MICROSECONDS throughout (stored in the double state slot
    # — integer-valued up to 2^53, exact): float epoch-seconds round-
    # trips micro-precision timestamps with ~0.4 µs error, enough to
    # wobble emitted gap bounds off the exact event times
    step_us = int(offset_alias_to_seconds(rule)) * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (symbol,) = key
        last_us = int(state.get[0]) if state.exists else None
        out = []
        for pdf in pdfs:
            for t in sorted(pdf[ts_col]):
                cur = t.value // 1000  # ns -> µs, exact
                if last_us is not None and cur - last_us > step_us:
                    out.append(
                        {
                            "symbol": symbol,
                            "gap_start": pd.Timestamp(last_us * 1000),
                            "gap_end": pd.Timestamp(cur * 1000),
                            "gap_seconds": (cur - last_us) / 1e6,
                        }
                    )
                last_us = cur
        if last_us is not None:
            state.update((float(last_us),))
        yield pd.DataFrame(out, columns=["symbol", "gap_start", "gap_end", "gap_seconds"])

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=GAP_EVENT_SCHEMA,
            stateStructType=_GAP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
