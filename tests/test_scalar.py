"""Unit tests for portable scalar helpers."""

from __future__ import annotations

import duckdb
import pytest

from etl_finance_pipeline_spark.functions.scalar import (
    offset_alias_to_duration,
    offset_alias_to_seconds,
    portable_hash64,
    portable_round,
)


@pytest.mark.parametrize(
    "alias,duration,seconds",
    [
        ("1T", "1 minute", 60),
        ("5T", "5 minutes", 300),
        ("15min", "15 minutes", 900),
        ("1H", "1 hour", 3600),
        ("1D", "1 day", 86400),
        ("2W", "2 weeks", 1209600),
        ("30S", "30 seconds", 30),
    ],
)
def test_offset_alias(alias, duration, seconds):
    assert offset_alias_to_duration(alias) == duration
    assert offset_alias_to_seconds(alias) == seconds


def test_offset_alias_invalid():
    with pytest.raises(ValueError):
        offset_alias_to_duration("1X")
    with pytest.raises(ValueError):
        offset_alias_to_seconds("monthly")


def test_portable_round_matches_duckdb(spark):
    vals = [0.1234565, 0.1234575, 1.5e-7, 2.5, -1.23456749, 123456.789]
    sdf = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = [r[0] for r in sdf.select(portable_round("x", 6)).collect()]
    want = [
        r[0]
        for v in vals
        for r in duckdb.sql(f"SELECT floor({v!r} * 1e6 + 0.5) / 1e6").fetchall()
    ]
    assert got == want


def test_portable_hash64_matches_duckdb(spark):
    words = ["alpha", "beta", "gamma delta", "", "ünïcode"]
    sdf = spark.createDataFrame([(w,) for w in words], ["s"])
    got = {r[0]: r[1] for r in sdf.select("s", portable_hash64("s")).collect()}
    for w in words:
        want = duckdb.sql(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", params=[w]
        ).fetchone()[0]
        assert got[w] == want, w
