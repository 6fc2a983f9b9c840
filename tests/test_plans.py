"""Physical-plan regression guards: the flagship queries' executed
(post-AQE) plans must keep their shuffle/broadcast/pushdown shape —
a regression here is a scale bug even when results stay correct.

Counts come from tools.audit_plans.audit over the FINAL adaptive plan
(same code path as PLANS.md)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.audit_plans import audit  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# driver-generated parquet; absent on external CI runners
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _executed_audit(spark, name):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, SF_DIR)
    df.collect()
    return audit(df._jdf.queryExecution().executedPlan().toString())


def test_text_queries_are_exchange_free(spark):
    for name in ("lang_id", "token_counts", "quality_score"):
        a = _executed_audit(spark, name)
        assert a["exchanges"] == 0, (name, a)


def test_star_join_broadcasts_all_dims(spark):
    a = _executed_audit(spark, "nation_revenue")
    # one fact aggregation shuffle; every dimension join broadcast
    assert a["exchanges"] == 1, a
    assert a["broadcasts"] >= 3, a


def test_candles_pushdown_and_shape(spark):
    a = _executed_audit(spark, "candles_5m")
    # dedupe window + candle agg = 2 exchanges, filters reach the scan
    assert a["exchanges"] <= 2, a
    assert any("IsNotNull" in p for p in a["pushed"]), a


def test_scans_prune_columns(spark):
    a = _executed_audit(spark, "pricing_summary")
    # the Q1 analog reads a handful of lineitem columns, never the table
    assert a["scans"], a
    for cols in a["scans"]:
        assert len([c for c in cols.split(",") if c.strip()]) <= 8, a


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["top_customers"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]
