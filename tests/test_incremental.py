"""Incremental aggregate maintenance: the materialized state after a
chain of appends/merges/deletes must equal a full recompute, with each
refresh reading only the change feed."""

from __future__ import annotations

import pytest

from etl_finance_pipeline_spark.sources.incremental import (
    aggregate_state_version,
    read_aggregate,
    refresh_aggregate,
)
from etl_finance_pipeline_spark.sources.table_format import (
    VacuumedRangeError,
    delete_where,
    merge_table,
    read_changes,
    read_table,
    vacuum,
    write_table,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key long, SYMBOL string, CLOSE double")


def _full(spark, base):
    got = (
        read_table(spark, base)
        .groupBy("SYMBOL")
        .agg({"CLOSE": "sum", "*": "count"})
        .collect()
    )
    return {r["SYMBOL"]: (r["sum(CLOSE)"], r["count(1)"]) for r in got}


def _state(spark, state):
    got = read_aggregate(spark, state).collect()
    return {r["SYMBOL"]: (r["CLOSE_sum"], r["row_count"]) for r in got}


def test_refresh_tracks_appends_merges_deletes(spark, tmp_path):
    base, state = str(tmp_path / "base"), str(tmp_path / "state")
    write_table(_df(spark, [(1, "EUR", 1.0), (2, "EUR", 2.0), (3, "GBP", 5.0)]), base)

    # initial refresh = full aggregation, stamped with base version
    refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"])
    assert _state(spark, state) == _full(spark, base)
    assert aggregate_state_version(state) == 0

    # already current -> no-op
    assert refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"]) is None

    # append + upsert + delete, then one incremental refresh
    write_table(_df(spark, [(4, "GBP", 7.0)]), base)
    merge_table(spark, base, _df(spark, [(2, "EUR", 20.0)]), ["key"])
    delete_where(spark, base, "key = 3")
    refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"])
    assert _state(spark, state) == _full(spark, base)
    assert aggregate_state_version(state) == 3

    # a group deleted to zero rows disappears from the state
    delete_where(spark, base, "SYMBOL = 'GBP'")
    refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"])
    st = _state(spark, state)
    assert "GBP" not in st and st == _full(spark, base)


def test_read_changes_raises_on_vacuumed_range(spark, tmp_path):
    base = str(tmp_path / "base_vac")
    write_table(_df(spark, [(1, "EUR", 1.0)]), base)       # v0
    write_table(_df(spark, [(2, "EUR", 2.0)]), base)       # v1
    write_table(_df(spark, [(3, "GBP", 5.0)]), base)       # v2
    vacuum(base, keep_versions=1)  # manifests for v0, v1 gone

    # A consumer parked before the cutoff must get an error, not a
    # silent skip of the vacuumed commits' rows.
    with pytest.raises(VacuumedRangeError) as exc:
        read_changes(spark, base, from_version=0)
    assert exc.value.missing == [1]

    # The surviving suffix is still readable.
    assert read_changes(spark, base, from_version=1).count() == 1


def test_refresh_aggregate_recomputes_after_vacuum(spark, tmp_path):
    base, state = str(tmp_path / "base_vac2"), str(tmp_path / "state_vac2")
    write_table(_df(spark, [(1, "EUR", 1.0), (2, "GBP", 5.0)]), base)  # v0
    refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"])
    assert aggregate_state_version(state) == 0

    write_table(_df(spark, [(3, "EUR", 2.0)]), base)       # v1
    delete_where(spark, base, "SYMBOL = 'GBP'")            # v2
    write_table(_df(spark, [(4, "JPY", 9.0)]), base)       # v3
    vacuum(base, keep_versions=1)  # feed past v0 is unrecoverable

    # Refresh falls back to a full recompute instead of losing deltas.
    refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"])
    assert _state(spark, state) == _full(spark, base)
    assert aggregate_state_version(state) == 3


def test_read_aggregate_derives_avg(spark, tmp_path):
    base, state = str(tmp_path / "base2"), str(tmp_path / "state2")
    write_table(_df(spark, [(1, "EUR", 1.0), (2, "EUR", 3.0)]), base)
    refresh_aggregate(spark, base, state, ["SYMBOL"], ["CLOSE"])
    row = read_aggregate(spark, state, avg_for=["CLOSE"]).collect()[0]
    assert row["CLOSE_avg"] == pytest.approx(2.0)


def test_streaming_ingest_feeds_incremental_refresh(spark, tmp_path):
    """The full lakehouse loop: file stream -> exactly-once commit-log
    sink -> change-feed incremental aggregate refresh. After each
    ingest wave the materialized state equals a full recompute, and
    the refresh reads only the new commits (change feed, not a
    rescan)."""
    from etl_finance_pipeline_spark.streaming.sink import stream_to_table

    src = tmp_path / "src"
    src.mkdir()
    table, state = str(tmp_path / "facts"), str(tmp_path / "mv")

    def ingest(name, rows):
        spark.createDataFrame(rows, "key long, SYMBOL string, CLOSE double") \
            .coalesce(1).write.parquet(str(src / name))
        q = stream_to_table(
            spark.readStream.schema("key long, SYMBOL string, CLOSE double")
            .parquet(str(src / "*")),
            table,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    ingest("w1", [(1, "EUR", 1.0), (2, "GBP", 5.0)])
    refresh_aggregate(spark, table, state, ["SYMBOL"], ["CLOSE"])
    assert _state(spark, state) == _full(spark, table)
    first_seen = aggregate_state_version(state)

    ingest("w2", [(3, "EUR", 2.0), (4, "JPY", 9.0)])
    refresh_aggregate(spark, table, state, ["SYMBOL"], ["CLOSE"])
    assert _state(spark, state) == _full(spark, table)
    # the second refresh advanced the high-water mark past wave 1
    assert aggregate_state_version(state) > first_seen


# --------------------------------------------------------------------
# incremental link-graph authority (refresh_authority)
# --------------------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _ranks(spark, state):
    return {
        r["id"]: r["rank"] for r in read_table(spark, state).collect()
    }


def _full_rank(spark, base):
    from etl_finance_pipeline_spark.operators.graph import pagerank

    e = read_table(spark, base).select("src", "dst")
    return {r["id"]: r["rank"] for r in pagerank(e, iters=3).collect()}


def test_refresh_authority_multi_commit_protocol(spark, tmp_path):
    """Re-rank only past the edge-delta threshold, carry the standing
    rank otherwise, recover from vacuumed feed ranges, and read only
    the change feed (O(changed files), asserted on inputFiles)."""
    from etl_finance_pipeline_spark.sources.incremental import (
        aggregate_state_version,
        refresh_authority,
    )
    from etl_finance_pipeline_spark.sources.table_format import snapshot

    base, state = str(tmp_path / "edges"), str(tmp_path / "rank")
    write_table(
        _edges(
            spark,
            [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        ),
        base,
    )

    # initial refresh: full rank, stamped with the base version
    assert refresh_authority(spark, base, state) is not None
    assert _ranks(spark, state) == _full_rank(spark, base)
    assert aggregate_state_version(state) == 0

    # already current -> carried
    assert refresh_authority(spark, base, state) is None

    # a 1-edge append on a 5-edge graph is under the 0.5 threshold:
    # the standing rank is CARRIED (stale by design) and the
    # high-water mark does not advance
    write_table(_edges(spark, [("d", "b")]), base)
    before = _ranks(spark, state)
    assert (
        refresh_authority(spark, base, state, edge_delta_threshold=0.5)
        is None
    )
    assert _ranks(spark, state) == before
    assert aggregate_state_version(state) == 0

    # O(changed files): the feed past the mark plans only the new
    # commit's files, none of the version-0 files
    v0files = set(read_table(spark, base, version=0).inputFiles())
    feed = read_changes(spark, base, from_version=0)
    scanned = set(feed.inputFiles())
    assert scanned and scanned.isdisjoint(v0files)

    # pile on edges past the threshold -> re-rank catches up to the
    # CURRENT snapshot and matches a full recompute
    write_table(
        _edges(spark, [("e", "a"), ("e", "b"), ("c", "e")]), base
    )
    assert (
        refresh_authority(spark, base, state, edge_delta_threshold=0.5)
        is not None
    )
    assert _ranks(spark, state) == _full_rank(spark, base)
    assert aggregate_state_version(state) == snapshot(base).version

    # vacuumed feed range degrades to a pinned full re-rank
    write_table(_edges(spark, [("f", "a")]), base)
    write_table(_edges(spark, [("f", "b")]), base)
    vacuum(base, keep_versions=1)
    assert (
        refresh_authority(spark, base, state, edge_delta_threshold=0.0)
        is not None
    )
    assert _ranks(spark, state) == _full_rank(spark, base)
