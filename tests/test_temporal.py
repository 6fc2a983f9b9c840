"""As-of join and sessionization tests."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.temporal import asof_join, sessionize

T0 = datetime(2024, 1, 2, 9, 0)


def _m(minutes):
    return T0 + timedelta(minutes=minutes)


def _trades(spark):
    return spark.createDataFrame(
        [
            ("A", _m(5), 100.0),
            ("A", _m(10), 101.0),
            ("A", _m(0), 99.0),  # before any quote
            ("B", _m(7), 200.0),
        ],
        ["sym", "TIMESTAMP", "price"],
    )


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _m(1), 98.5),
            ("A", _m(5), 99.5),   # same-ts as trade -> inclusive match
            ("A", _m(8), 100.5),
            ("B", _m(2), 199.0),
        ],
        ["sym", "TIMESTAMP", "quote"],
    )


def test_asof_backward(spark):
    out = asof_join(_trades(spark), _quotes(spark), ["sym"])
    got = {(r["sym"], r["TIMESTAMP"]): r for r in out.collect()}
    assert got[("A", _m(5))]["quote_right"] == 99.5  # inclusive same-ts
    assert got[("A", _m(10))]["quote_right"] == 100.5
    assert got[("A", _m(0))]["quote_right"] is None  # no earlier quote
    assert got[("A", _m(0))]["TIMESTAMP_right"] is None
    assert got[("B", _m(7))]["quote_right"] == 199.0
    assert out.count() == 4  # left-preserving


def test_asof_forward(spark):
    out = asof_join(_trades(spark), _quotes(spark), ["sym"], direction="forward")
    got = {(r["sym"], r["TIMESTAMP"]): r for r in out.collect()}
    assert got[("A", _m(0))]["quote_right"] == 98.5  # next quote at min 1
    assert got[("A", _m(10))]["quote_right"] is None  # nothing after
    assert got[("A", _m(5))]["quote_right"] == 99.5  # inclusive


def test_asof_tolerance(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), ["sym"], tolerance_seconds=120
    )
    got = {(r["sym"], r["TIMESTAMP"]): r for r in out.collect()}
    assert got[("A", _m(5))]["quote_right"] == 99.5  # 0s away
    assert got[("A", _m(10))]["quote_right"] == 100.5  # 120s away, inside
    assert got[("B", _m(7))]["quote_right"] is None  # 300s away -> nulled


def test_sessionize(spark):
    rows = [
        (1, _m(0), 1.0),
        (1, _m(10), 2.0),
        (1, _m(55), 3.0),  # 45min gap -> new session
        (2, _m(0), 4.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "TIMESTAMP", "value"])
    out = sessionize(
        df, "30T", ["user_id"], aggs=[F.sum("value").alias("sum_value")]
    )
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in out.collect()
    )
    assert got == [
        (1, _m(0), 2, 3.0),
        (1, _m(55), 1, 3.0),
        (2, _m(0), 1, 4.0),
    ]


def test_range_join(spark):
    from etl_finance_pipeline_spark.operators.temporal import range_join

    points = spark.createDataFrame(
        [(1, _m(5)), (1, _m(45)), (2, _m(5)), (1, _m(200))],
        ["uid", "TIMESTAMP"],
    )
    intervals = spark.createDataFrame(
        [(1, _m(0), _m(30), "s1"), (1, _m(40), _m(60), "s2"), (2, _m(0), _m(10), "s3")],
        ["uid", "start", "end", "name"],
    )
    out = range_join(
        points, intervals, ["uid"], "TIMESTAMP", "start", "end", bin_seconds=600
    )
    got = sorted((r["uid"], r["TIMESTAMP"], r["name"]) for r in out.collect())
    assert got == [
        (1, _m(5), "s1"),
        (1, _m(45), "s2"),
        (2, _m(5), "s3"),
    ]  # point at minute 200 matches nothing
