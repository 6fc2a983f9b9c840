"""Physical-plan regression guards: the flagship queries' executed
(post-AQE) plans must keep their shuffle/broadcast/pushdown shape —
a regression here is a scale bug even when results stay correct.

Counts come from tools.audit_plans.audit_executions over the SQL
status store (same code path as PLANS.md): every execution the query
triggers is aggregated, so localCheckpoint lineage truncation cannot
hide a shuffle from these guards."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.audit_plans import _max_exec_id, audit_executions  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# driver-generated parquet; absent on external CI runners
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _executed_audit(spark, name):
    import __spark_entry__ as entrymod

    store = spark._jsparkSession.sharedState().statusStore()
    last = _max_exec_id(store)
    df = entrymod.queries()[name](spark, SF_DIR)
    df.collect()
    agg, _ = audit_executions(store, last)
    return agg


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
    for ncols in a["scans"]:
        assert 0 < ncols <= 8, a


def test_iterative_audit_sees_through_checkpoints(spark):
    # pagerank localCheckpoints per round: the final frame's own plan
    # starts at a Scan ExistingRDD, but the aggregated audit must
    # still report the real per-round shuffles and parquet scans —
    # this is the round-6 verdict's audit blind spot, pinned here.
    a = _executed_audit(spark, "pagerank")
    assert a["execs"] > 1, a
    assert a["exchanges"] >= 3, a
    assert a["scans"], a


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["top_customers"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]


def test_corpus_build_e2e_plan_shape(spark):
    """The e2e corpus-build composition must not introduce a
    scale-killer any per-stage audit would have missed: the data-path
    shuffle count stays bounded (funnel joins + LSH bands +
    components + the pack groupBy — never corpus-quadratic), the
    canonical/winner joins broadcast, and single-partition exchanges
    stay in the control-plane band (the DoReMi one-row EG fold and
    scalar stage counts), not on the corpus path."""
    a = _executed_audit(spark, "corpus_build_e2e")
    assert 3 <= a["exchanges"] <= 40, a
    assert a["broadcasts"] >= 2, a
    # control-plane only: the EG fold + scalar aggregates; a corpus
    # path through one partition would add tens more
    assert a["single_part"] <= 12, a


def test_warc_extract_is_narrow_after_blob_agg(spark):
    """Stage −1 parse+extract is ONE blob aggregate (the synthetic
    envelope build — blobs ARE the input at deployment) plus a narrow
    per-record chain: at most the group-concat's exchange pair, no
    single-partition funnel."""
    a = _executed_audit(spark, "warc_extract")
    assert a["exchanges"] <= 2, a
    assert a["single_part"] == 0, a
