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


def test_aqe_skew_join_split(spark):
    """AQE's runtime skew-join handling — the complement to the
    explicit salting operators: a shuffle join whose hot key owns
    ~60% of the left side gets its oversized partition SPLIT by
    OptimizeSkewedJoin, visible in the final adaptive plan as
    ``SortMergeJoin(skew=true)`` / a ``skewed`` AQEShuffleRead.
    Thresholds are lowered so sf-test-scale bytes qualify; confs are
    scoped to a session clone, never the shared test session."""
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
    )
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB")
    # force a shuffle join: a broadcast join has no shuffle to split
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "4")

    from pyspark.sql import functions as SF

    left = s.range(400_000).select(
        SF.when(SF.col("id") % 10 < 6, SF.lit(0))
        .otherwise(SF.col("id"))
        .alias("k"),
        SF.col("id").alias("payload"),
    )
    right = s.range(0, 400_000, 7).select(
        SF.col("id").alias("k"), (SF.col("id") * 2).alias("tag")
    )
    joined = left.join(right, "k")
    # collect() finalizes THIS DataFrame's adaptive plan (a count()
    # would execute a separate QueryExecution and leave joined's
    # executedPlan un-finalized)
    n = len(joined.collect())
    # correctness: hot key 0 matches (240k rows), plus every non-hot
    # left id divisible by 7
    assert n == 240_000 + sum(
        1 for i in range(400_000) if i % 10 >= 6 and i % 7 == 0
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"no skew split in final plan:\n{plan[:2000]}"


def test_hotkey_join_equals_plain_join_inner_and_left(spark):
    """Hot-lane ∪ cold-lane must equal the plain join exactly, for
    both supported join types, including unmatched-left rows."""
    from etl_finance_pipeline_spark.functions.skew import hotkey_join

    left = spark.createDataFrame(
        [(1, i) for i in range(100)]  # hot key 1
        + [(2, 0), (3, 1), (9, 2)],   # cold keys; 9 has no match
        "k long, payload long",
    )
    right = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, tag string"
    )
    for how in ("inner", "left"):
        got = hotkey_join(left, right, ["k"], how=how, hot_threshold=50)
        want = left.join(right, ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), how


def test_hotkey_join_splits_lanes(spark):
    """The hot lane is genuinely a broadcast join and the cold lane a
    plain join: plan contains both a BroadcastHashJoin on the split
    and the unsplit join."""
    import pytest as _pytest

    from etl_finance_pipeline_spark.functions.skew import hotkey_join

    left = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k long, payload long"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b")], "k long, tag string")
    out = hotkey_join(left, right, ["k"], hot_threshold=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with _pytest.raises(ValueError, match="inner and left"):
        hotkey_join(left, right, ["k"], how="full")
