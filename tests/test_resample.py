"""Resample tests — reference semantics from
/root/reference/tests/test_phase9_resample.py: OPEN=first, HIGH=max,
LOW=min, CLOSE=last, VOLUME=sum; left-closed left-labeled buckets;
drop_incomplete; extra-numeric mean/sum policy; empty-bucket
materialization when drop_incomplete=False.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.resample import (
    candles_from_ticks,
    resample_ohlc,
)

T0 = datetime(2024, 1, 2, 9, 0)


def _ohlcv(spark):
    # 6 one-minute candles spanning two 5-minute buckets
    rows = []
    for m in range(6):
        t = T0 + timedelta(minutes=m)
        rows.append(("X", t, 10.0 + m, 20.0 + m, 5.0 + m, 15.0 + m, 100.0))
    return spark.createDataFrame(
        rows, ["SYMBOL", "TIMESTAMP", "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME"]
    )


def test_resample_5m_semantics(spark):
    out = resample_ohlc(_ohlcv(spark), "5T", ["SYMBOL"]).orderBy("TIMESTAMP")
    rows = out.collect()
    assert len(rows) == 2
    b0, b1 = rows
    # left-closed, left-labeled
    assert b0["TIMESTAMP"] == T0
    assert b1["TIMESTAMP"] == T0 + timedelta(minutes=5)
    # bucket 0 = minutes 0..4
    assert b0["OPEN"] == 10.0  # first by time
    assert b0["HIGH"] == 24.0  # max of 20..24
    assert b0["LOW"] == 5.0  # min of 5..9
    assert b0["CLOSE"] == 19.0  # last by time
    assert b0["VOLUME"] == 500.0  # sum
    # bucket 1 = minute 5 only
    assert b1["OPEN"] == 15.0 and b1["CLOSE"] == 20.0 and b1["VOLUME"] == 100.0


def test_resample_drop_incomplete(spark):
    df = _ohlcv(spark).withColumn(
        "CLOSE",
        F.when(F.col("TIMESTAMP") >= T0 + timedelta(minutes=5), None).otherwise(
            F.col("CLOSE")
        ),
    )
    out = resample_ohlc(df, "5T", ["SYMBOL"], drop_incomplete=True)
    assert out.filter(F.col("CLOSE").isNull()).count() == 0
    assert out.count() == 1


def test_resample_empty_buckets_materialized(spark):
    # observations at minute 0 and minute 11 -> bucket 5-10 is empty
    rows = [
        ("X", T0, 1.0, 1.0, 1.0, 1.0, 1.0),
        ("X", T0 + timedelta(minutes=11), 2.0, 2.0, 2.0, 2.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, ["SYMBOL", "TIMESTAMP", "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME"]
    )
    out = resample_ohlc(df, "5T", ["SYMBOL"], drop_incomplete=False).orderBy(
        "TIMESTAMP"
    )
    got = out.collect()
    assert len(got) == 3  # buckets 0, 5, 10 — pandas-style empty bucket kept
    assert got[1]["CLOSE"] is None


def test_resample_extra_numeric_policy(spark):
    df = _ohlcv(spark).withColumn("SPREAD_PTS", F.lit(2.0))
    mean_out = resample_ohlc(df, "5T", ["SYMBOL"], extra_numeric_policy="mean")
    sum_out = resample_ohlc(df, "5T", ["SYMBOL"], extra_numeric_policy="sum")
    m = mean_out.orderBy("TIMESTAMP").collect()[0]
    s = sum_out.orderBy("TIMESTAMP").collect()[0]
    assert m["SPREAD_PTS"] == 2.0
    assert s["SPREAD_PTS"] == 10.0  # 5 rows in bucket 0


def test_resample_preserves_symbol_when_not_key(spark):
    df = _ohlcv(spark)
    out = resample_ohlc(df, "5T", key_cols=[])
    assert "SYMBOL" in out.columns
    assert out.select("SYMBOL").distinct().collect()[0][0] == "X"


def test_candles_from_ticks(spark):
    ticks = [
        ("X", T0 + timedelta(seconds=s), float(v))
        for s, v in [(0, 5.0), (30, 9.0), (60, 3.0), (301, 7.0)]
    ]
    df = spark.createDataFrame(ticks, ["SYMBOL", "TIMESTAMP", "value"])
    out = candles_from_ticks(df, "5T", ["SYMBOL"]).orderBy("TIMESTAMP")
    rows = out.collect()
    assert len(rows) == 2
    b0 = rows[0]
    assert (b0["OPEN"], b0["HIGH"], b0["LOW"], b0["CLOSE"]) == (5.0, 9.0, 3.0, 3.0)
    assert b0["VOLUME"] == 17.0 and b0["N_TICKS"] == 3


def test_resample_monthly_calendar(spark):
    # candles across three months incl. an empty middle month
    rows = [
        ("X", datetime(2024, 1, 10), 1.0, 2.0, 0.5, 1.5, 10.0),
        ("X", datetime(2024, 1, 20), 2.0, 3.0, 1.5, 2.5, 20.0),
        ("X", datetime(2024, 3, 5), 5.0, 6.0, 4.5, 5.5, 50.0),
    ]
    df = spark.createDataFrame(
        rows, ["SYMBOL", "TIMESTAMP", "OPEN", "HIGH", "LOW", "CLOSE", "VOLUME"]
    )
    out = resample_ohlc(df, "1MS", ["SYMBOL"]).orderBy("TIMESTAMP").collect()
    assert [r["TIMESTAMP"] for r in out] == [datetime(2024, 1, 1), datetime(2024, 3, 1)]
    jan = out[0]
    assert (jan["OPEN"], jan["HIGH"], jan["LOW"], jan["CLOSE"], jan["VOLUME"]) == (
        1.0, 3.0, 0.5, 2.5, 30.0,
    )
    # empty-bucket materialization spans February
    full = resample_ohlc(df, "1MS", ["SYMBOL"], drop_incomplete=False).orderBy(
        "TIMESTAMP"
    ).collect()
    assert [r["TIMESTAMP"] for r in full] == [
        datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1),
    ]
    assert full[1]["CLOSE"] is None


def test_resample_empty_frame(spark):
    df = spark.createDataFrame(
        [], "SYMBOL string, TIMESTAMP timestamp, OPEN double, HIGH double, LOW double, CLOSE double, VOLUME double"
    )
    assert resample_ohlc(df, "5T", ["SYMBOL"]).count() == 0
    assert resample_ohlc(df, "1MS", ["SYMBOL"], drop_incomplete=False).count() == 0
