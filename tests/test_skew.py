"""Salted aggregation / join equivalence tests on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.skew import salted_agg, salted_join


def _skewed(spark):
    # key "hot" has 900 rows, others 10 each
    rows = [("hot", float(i % 7), i) for i in range(900)]
    rows += [(f"k{j}", float(j), 1000 + j) for j in range(10)]
    return spark.createDataFrame(rows, ["k", "v", "seq"])


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("m"),
        )
        .collect()
    }
    salted = {
        r["k"]: r
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("count", "*"),
                "s": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
                "m": ("avg", "v"),
            },
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k]["n"] == plain[k]["n"]
        assert salted[k]["s"] == pytest.approx(plain[k]["s"])
        assert salted[k]["lo"] == plain[k]["lo"]
        assert salted[k]["hi"] == plain[k]["hi"]
        assert salted[k]["m"] == pytest.approx(plain[k]["m"])


def test_salted_agg_rejects_holistic(spark):
    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(_skewed(spark), ["k"], {"bad": ("median", "v")})


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", "H"), ("k3", "T")], ["k", "tag"]
    )
    plain = sorted(
        (r["k"], r["seq"], r["tag"])
        for r in left.join(right, on="k").collect()
    )
    salted = sorted(
        (r["k"], r["seq"], r["tag"])
        for r in salted_join(left, right, on=["k"]).collect()
    )
    assert salted == plain
    assert len(plain) == 901  # 900 hot rows + 1 k3 row
