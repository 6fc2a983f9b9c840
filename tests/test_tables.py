"""Nanos-aware table loader tests: TIMESTAMP(NANOS) parquet restored
to TimestampType on ANY session (the external driver hands us
sessions without our configs)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from etl_finance_pipeline_spark.sources.tables import load_table, load_sf_tables

_SF_DIR = "/root/testdata/sf0.001"


def _needs_testdata(fn):
    import os

    import pytest

    return pytest.mark.skipif(
        not os.path.isdir(_SF_DIR), reason="driver testdata not present"
    )(fn)


def test_load_table_restores_nanos(spark, tmp_path):
    p = str(tmp_path / "nanos.parquet")
    pdf = pd.DataFrame(
        {
            "id": [1, 2],
            "ts": [
                pd.Timestamp("2024-03-01 12:00:00.123456789"),
                pd.Timestamp("2024-03-02 00:00:00"),
            ],
        }
    )
    assert str(pdf["ts"].dtype) == "datetime64[ns]"
    pdf.to_parquet(p, engine="pyarrow")
    df = load_table(spark, p)
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"] for r in df.collect())
    # nanos floor to micros
    assert got[0] == datetime(2024, 3, 1, 12, 0, 0, 123456)
    assert got[1] == datetime(2024, 3, 2, 0, 0, 0)


def test_load_table_plain_micros_untouched(spark, tmp_path):
    p = str(tmp_path / "micros.parquet")
    spark.createDataFrame(
        [(1, datetime(2024, 3, 1, 12, 0))], "id int, ts timestamp"
    ).write.parquet(p)
    df = load_table(spark, p)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.collect()[0]["ts"] == datetime(2024, 3, 1, 12, 0)


@_needs_testdata
def test_load_sf_tables(spark):
    tables = load_sf_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"


@_needs_testdata
def test_register_views_sql_gateway(spark):
    from etl_finance_pipeline_spark.sources.tables import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "events" in names
    # plain SQL over the registered views, with pushdown intact
    out = spark.sql(
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        WHERE l_quantity < 10
        GROUP BY l_returnflag
        """
    )
    rows = {r["l_returnflag"]: r["n"] for r in out.collect()}
    assert set(rows) <= {"A", "N", "R"} and sum(rows.values()) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(l_quantity,10" in plan
    # a view joins against another view
    j = spark.sql(
        "SELECT count(*) AS n FROM events e JOIN customer c ON e.user_id = c.c_custkey"
    ).collect()[0]["n"]
    assert j > 0
