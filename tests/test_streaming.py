"""Structured Streaming tests: file-source streams driven to
completion with availableNow + memory sink."""

from __future__ import annotations

import shutil
import uuid
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_finance_pipeline_spark.streaming.candles import (
    stream_candles,
    stream_dedupe,
    stream_gap_monitor,
)

T0 = datetime(2024, 1, 2, 9, 0)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_stream_source(spark, tmp_path, rows):
    src = str(tmp_path / f"stream-src-{uuid.uuid4().hex[:8]}")
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(src)


def _run_to_memory(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_candles(spark, tmp_path):
    rows = [
        ("X", T0 + timedelta(minutes=m), float(v))
        for m, v in [(0, 5.0), (1, 9.0), (2, 3.0), (6, 7.0), (60, 1.0)]
    ]
    stream = _write_stream_source(spark, tmp_path, rows)
    candles = stream_candles(stream, "5T", ["symbol"], watermark="1 minute")
    _run_to_memory(candles, "t_candles")
    got = {
        r["TIMESTAMP"]: r
        for r in spark.sql("SELECT * FROM t_candles").collect()
    }
    # append mode: only windows finalized past the watermark are
    # emitted — the last event (min 60) finalizes buckets 0 and 5.
    b0 = got[T0]
    assert (b0["OPEN"], b0["HIGH"], b0["LOW"], b0["CLOSE"]) == (5.0, 9.0, 3.0, 3.0)
    assert b0["VOLUME"] == 17.0 and b0["N_TICKS"] == 3
    b5 = got[T0 + timedelta(minutes=5)]
    assert b5["OPEN"] == b5["CLOSE"] == 7.0
    assert T0 + timedelta(minutes=60) not in got  # not yet finalized


def test_stream_sessions(spark, tmp_path):
    """Native session_window sessionization: events within the gap
    merge (extending the window), an event at exactly the session end
    still merges (gap is inclusive — pins the oracle's break
    condition), and only sessions past the watermark are emitted."""
    from etl_finance_pipeline_spark.streaming.candles import stream_sessions

    rows = [
        ("U1", T0, 1.0),
        ("U1", T0 + timedelta(minutes=2), 2.0),     # merges (2 < 3 gap)
        ("U1", T0 + timedelta(minutes=5), 4.0),     # exactly at end -> merges
        ("U1", T0 + timedelta(minutes=9), 6.0),     # past new end -> NEW session
        ("U2", T0 + timedelta(minutes=1), 8.0),
        ("U1", T0 + timedelta(minutes=60), 9.0),    # advances watermark only
    ]
    stream = _write_stream_source(spark, tmp_path, rows)
    sessions = stream_sessions(
        stream, ["symbol"], gap="3 minutes", watermark="1 minute"
    )
    _run_to_memory(sessions, "t_sessions")
    got = {
        (r["symbol"], r["SESSION_START"]): r
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    s1 = got[("U1", T0)]
    assert s1["N_EVENTS"] == 3 and s1["TOTAL_VALUE"] == 7.0
    assert s1["SESSION_END"] == T0 + timedelta(minutes=8)  # last event + gap
    s2 = got[("U1", T0 + timedelta(minutes=9))]
    assert s2["N_EVENTS"] == 1 and s2["TOTAL_VALUE"] == 6.0
    assert ("U2", T0 + timedelta(minutes=1)) in got
    # the minute-60 session is not past the watermark -> not emitted
    assert ("U1", T0 + timedelta(minutes=60)) not in got


def test_stream_dedupe(spark, tmp_path):
    rows = [
        ("X", T0, 1.0),
        ("X", T0, 2.0),  # duplicate key within watermark
        ("X", T0 + timedelta(minutes=1), 3.0),
    ]
    stream = _write_stream_source(spark, tmp_path, rows)
    out = stream_dedupe(stream, ["symbol", "ts"], watermark="5 minutes")
    _run_to_memory(out, "t_dedupe")
    got = spark.sql("SELECT * FROM t_dedupe").collect()
    assert len(got) == 2
    assert {r["ts"] for r in got} == {T0, T0 + timedelta(minutes=1)}


def test_stream_gap_monitor(spark, tmp_path):
    rows = [
        ("X", T0 + timedelta(minutes=m), 1.0) for m in [0, 1, 2, 7, 8, 30]
    ] + [("Y", T0 + timedelta(minutes=m), 1.0) for m in [0, 5]]
    stream = _write_stream_source(spark, tmp_path, rows)
    gaps = stream_gap_monitor(stream, "1T", watermark="1 minute")
    _run_to_memory(gaps, "t_gaps")
    got = sorted(
        (r["symbol"], r["gap_seconds"])
        for r in spark.sql("SELECT * FROM t_gaps").collect()
    )
    # X: 2->7 (300s) and 8->30 (1320s); Y: 0->5 (300s)
    assert got == [("X", 300.0), ("X", 1320.0), ("Y", 300.0)]


def test_stream_candles_to_parquet_sink(spark, tmp_path):
    """Full streaming pipeline: file source -> watermarked candle agg
    -> parquet sink with checkpoint (exactly-once file sink)."""
    rows = [
        ("X", T0 + timedelta(minutes=m), float(v))
        for m, v in [(0, 5.0), (1, 9.0), (6, 7.0), (60, 1.0)]
    ]
    stream = _write_stream_source(spark, tmp_path, rows)
    candles = stream_candles(stream, "5T", ["symbol"], watermark="1 minute")
    out = str(tmp_path / "candle-sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        candles.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    got = {r["TIMESTAMP"]: r for r in back.collect()}
    assert got[T0]["OPEN"] == 5.0 and got[T0]["CLOSE"] == 9.0
    assert got[T0 + timedelta(minutes=5)]["VOLUME"] == 7.0


def test_stream_to_transactional_table(spark, tmp_path):
    """File stream → foreachBatch → commit-log table: contents equal
    the batch read, epochs are recorded, and a redelivered epoch is a
    no-op (effectively exactly-once)."""
    from etl_finance_pipeline_spark.sources.table_format import history, read_table
    from etl_finance_pipeline_spark.streaming.sink import (
        stream_to_table,
        write_batch_idempotent,
    )

    src = tmp_path / "src"
    src.mkdir()
    df = spark.createDataFrame(
        [(i, f"SYM{i % 3}", float(i)) for i in range(30)],
        "event_id long, SYMBOL string, CLOSE double",
    )
    df.write.parquet(str(src / "a"))
    table = str(tmp_path / "tbl")
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    q = stream_to_table(stream, table, str(tmp_path / "ckpt"), partition_by=["SYMBOL"])
    q.awaitTermination(120)
    got = {r["event_id"] for r in read_table(spark, table).collect()}
    assert got == set(range(30))
    h = history(table)
    assert len(h) >= 1 and all(m["source_batch_id"] is not None for m in h)
    # simulate the at-least-once redelivery of an already-committed epoch
    dup = spark.createDataFrame([(99, "SYMX", 9.9)], df.schema)
    assert write_batch_idempotent(dup, h[0]["source_batch_id"], table) is False
    assert read_table(spark, table).count() == 30
    # a NEW epoch still lands
    assert write_batch_idempotent(dup, 10_000, table) is True
    assert read_table(spark, table).count() == 31


def test_deduped_stream_ingest_e2e(spark, tmp_path):
    """Deduped streaming ingest, end to end: file stream →
    dropDuplicatesWithinWatermark → foreachBatch commit-log sink.
    The duplicate key arrives in a LATER microbatch than the original
    (maxFilesPerTrigger=1 forces two epochs), so dropping it proves
    dedupe state carries across epochs into the table."""
    from etl_finance_pipeline_spark.sources.table_format import history, read_table
    from etl_finance_pipeline_spark.streaming.sink import stream_to_table

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [("X", T0, 1.0), ("Y", T0 + timedelta(minutes=1), 2.0)]
    rows2 = [
        ("X", T0, 99.0),  # cross-batch duplicate of (symbol, ts)
        ("Z", T0 + timedelta(minutes=2), 3.0),
    ]
    spark.createDataFrame(rows1, EVENTS_SCHEMA).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows2, EVENTS_SCHEMA).coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    deduped = stream_dedupe(stream, ["symbol", "ts"], watermark="10 minutes")
    table = str(tmp_path / "tbl")
    q = stream_to_table(deduped, table, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {(r["symbol"], r["value"]) for r in read_table(spark, table).collect()}
    assert got == {("X", 1.0), ("Y", 2.0), ("Z", 3.0)}
    # two source files → (at least) two committed epochs in the log
    assert len(history(table)) >= 2


def test_epoch_dedupe_survives_vacuum(spark, tmp_path):
    """The sink's idempotence watermark rides checkpoints: after a
    vacuum deletes the manifests carrying source_batch_id, a restarted
    query redelivering an old epoch must still be a no-op."""
    from etl_finance_pipeline_spark.sources.table_format import read_table, vacuum
    from etl_finance_pipeline_spark.streaming.sink import write_batch_idempotent

    table = str(tmp_path / "tbl_vac")

    def batch(i):
        return spark.createDataFrame([(i, float(i))], "event_id long, CLOSE double")

    for e in range(3):
        assert write_batch_idempotent(batch(e), e, table) is True
    vacuum(table, keep_versions=1)  # manifests for epochs 0, 1 gone

    # post-vacuum restart redelivers an already-committed epoch → no-op
    assert write_batch_idempotent(batch(1), 1, table) is False
    assert read_table(spark, table).count() == 3
    # a genuinely new epoch still lands
    assert write_batch_idempotent(batch(3), 3, table) is True
    assert read_table(spark, table).count() == 4


def test_epoch_watermark_rides_checkpoints(spark, tmp_path):
    """last_committed_epoch reads one checkpoint plus the manifest
    suffix — the interval checkpoint must record the high-water mark so
    the lookup never needs the full log."""
    import json

    from etl_finance_pipeline_spark.sources.table_format import (
        _CHECKPOINT_INTERVAL,
        _checkpoint_path,
        _list_checkpoints,
        last_committed_epoch,
    )
    from etl_finance_pipeline_spark.streaming.sink import write_batch_idempotent

    table = str(tmp_path / "tbl_ckpt")
    for e in range(_CHECKPOINT_INTERVAL + 2):
        write_batch_idempotent(
            spark.createDataFrame([(e, float(e))], "event_id long, CLOSE double"),
            e,
            table,
        )
    cps = _list_checkpoints(table)
    assert cps, "interval checkpoint expected"
    with open(_checkpoint_path(table, cps[-1])) as fh:
        ckpt = json.load(fh)
    assert ckpt["max_source_batch_id"] == cps[-1]
    assert last_committed_epoch(table) == _CHECKPOINT_INTERVAL + 1


def test_stream_enrich_static_dim(spark, tmp_path):
    from etl_finance_pipeline_spark.streaming.candles import stream_enrich

    rows = [
        ("X", T0, 1.0),
        ("Y", T0 + timedelta(minutes=1), 2.0),
        ("Z", T0 + timedelta(minutes=2), 3.0),  # no dim match
    ]
    stream = _write_stream_source(spark, tmp_path, rows)
    dim = spark.createDataFrame(
        [("X", "alpha"), ("Y", "beta")], ["sym", "desk"]
    )
    out = stream_enrich(stream, dim, F.col("symbol") == F.col("sym"))
    _run_to_memory(out, "t_enrich")
    got = {r["symbol"]: r["desk"] for r in spark.sql("SELECT * FROM t_enrich").collect()}
    assert got == {"X": "alpha", "Y": "beta"}  # inner join drops Z


def test_stream_upsert_to_table(spark, tmp_path):
    """Streaming CDC apply: each microbatch MERGEs on the key — the
    table converges to latest-state-per-key, and a redelivered epoch
    is a no-op."""
    from etl_finance_pipeline_spark.sources.table_format import read_table
    from etl_finance_pipeline_spark.streaming.sink import (
        stream_upsert_to_table,
        upsert_batch_idempotent,
    )

    src = tmp_path / "usrc"
    src.mkdir()
    schema = "key long, SYMBOL string, CLOSE double"
    spark.createDataFrame(
        [(1, "EURUSD", 1.0), (2, "GBPUSD", 2.0)], schema
    ).write.parquet(str(src / "a"))
    table = str(tmp_path / "utbl")
    stream = spark.readStream.schema(
        spark.read.parquet(str(src / "a")).schema
    ).parquet(str(src / "*"))
    q = stream_upsert_to_table(stream, table, str(tmp_path / "uckpt"), ["key"])
    q.awaitTermination(120)
    assert read_table(spark, table).count() == 2

    # second epoch: update key 2, insert key 3
    spark.createDataFrame(
        [(2, "GBPUSD", 9.0), (3, "USDJPY", 3.0)], schema
    ).write.parquet(str(src / "b"))
    q = stream_upsert_to_table(stream, table, str(tmp_path / "uckpt"), ["key"])
    q.awaitTermination(120)
    got = {r["key"]: r["CLOSE"] for r in read_table(spark, table).collect()}
    assert got == {1: 1.0, 2: 9.0, 3: 3.0}

    # redelivery of an already-applied epoch: no-op
    dup = spark.createDataFrame([(2, "GBPUSD", 777.0)], schema)
    assert upsert_batch_idempotent(dup, 1, table, ["key"]) is False
    got = {r["key"]: r["CLOSE"] for r in read_table(spark, table).collect()}
    assert got[2] == 9.0


def test_stream_to_table_auto_compact(spark, tmp_path):
    """auto_compact_every collapses streaming small files; the
    compaction commit is data_change=false so the change feed stays
    quiet about it."""
    from etl_finance_pipeline_spark.sources.table_format import (
        history,
        read_changes,
        read_table,
        snapshot,
    )
    from etl_finance_pipeline_spark.streaming.sink import stream_to_table

    src = tmp_path / "acsrc"
    src.mkdir()
    schema = "key long, SYMBOL string, CLOSE double"
    table = str(tmp_path / "actbl")
    # two epochs, each its own run (fresh availableNow per file)
    for i, sub in enumerate(("a", "b")):
        spark.createDataFrame([(i, "EUR", float(i))], schema).write.parquet(
            str(src / sub)
        )
        q = stream_to_table(
            spark.readStream.schema(
                spark.read.parquet(str(src / "a")).schema
            ).parquet(str(src / "*")),
            table,
            str(tmp_path / "acckpt"),
            auto_compact_every=2,
        )
        q.awaitTermination(120)
    h = history(table)
    # 2 ingest commits + 1 compaction triggered at the 2nd epoch
    assert [m["action"] for m in h] == ["append", "append", "overwrite"]
    assert len(snapshot(table).files) == 1
    assert read_table(spark, table).count() == 2
    # the feed shows the ingests, not the compaction
    types = {r["_commit_version"] for r in read_changes(spark, table, -1).collect()}
    assert types == {0, 1}


def test_epoch_dedupe_scoped_by_txn_app(spark, tmp_path):
    """Two streaming queries feeding ONE table must not gate each
    other's epochs: the high-water mark is scoped per txn app id
    (Delta's txnAppId pattern). Unscoped, query B's epoch 0 would be
    skipped as 'already committed' because query A reached epoch 2 —
    silent data loss."""
    from etl_finance_pipeline_spark.sources.table_format import (
        last_committed_epoch,
        read_table,
    )
    from etl_finance_pipeline_spark.streaming.sink import write_batch_idempotent

    table = str(tmp_path / "tbl_two_writers")

    def batch(e):
        return spark.createDataFrame([(e, float(e))], "event_id long, CLOSE double")

    # query A commits epochs 0..2
    for e in range(3):
        assert write_batch_idempotent(batch(e), e, table, txn_app_id="qa") is True
    # query B starts at its own epoch 0 — must land, not be skipped
    assert write_batch_idempotent(batch(100), 0, table, txn_app_id="qb") is True
    assert read_table(spark, table).count() == 4
    # redelivery within each scope still dedupes
    assert write_batch_idempotent(batch(1), 1, table, txn_app_id="qa") is False
    assert write_batch_idempotent(batch(100), 0, table, txn_app_id="qb") is False
    # marks are independent; the unscoped view stays the global max
    assert last_committed_epoch(table, txn_app_id="qa") == 2
    assert last_committed_epoch(table, txn_app_id="qb") == 0
    assert last_committed_epoch(table) == 2
    # a relocated/reset checkpoint = a fresh app id: epoch 0 lands
    # even though another writer is far past it
    assert write_batch_idempotent(batch(200), 0, table, txn_app_id="qc") is True
    assert read_table(spark, table).count() == 5


def test_epoch_marks_ride_checkpoints_per_app(spark, tmp_path):
    """The interval checkpoint records the per-app mark dict, so
    app-scoped dedupe survives vacuum truncating the manifests."""
    from etl_finance_pipeline_spark.sources.table_format import (
        _CHECKPOINT_INTERVAL,
        last_committed_epoch,
        vacuum,
    )
    from etl_finance_pipeline_spark.streaming.sink import write_batch_idempotent

    table = str(tmp_path / "tbl_app_ckpt")

    def batch(e):
        return spark.createDataFrame([(e, float(e))], "event_id long, CLOSE double")

    for e in range(_CHECKPOINT_INTERVAL + 2):
        write_batch_idempotent(batch(e), e, table, txn_app_id="qa")
    vacuum(table, keep_versions=1)
    assert last_committed_epoch(table, txn_app_id="qa") == _CHECKPOINT_INTERVAL + 1
    assert write_batch_idempotent(batch(1), 1, table, txn_app_id="qa") is False
    assert last_committed_epoch(table, txn_app_id="other") is None


def test_stream_near_dup_matches_batch_operator(spark, tmp_path):
    """foreachBatch near-dup stage: streamed docs LSH-checked against
    a standing transactional-table corpus produce exactly the batch
    operator's candidate pairs, appended exactly-once."""
    from etl_finance_pipeline_spark.operators.dedup import incremental_lsh_pairs
    from etl_finance_pipeline_spark.sources.table_format import (
        read_table,
        write_table,
    )
    from etl_finance_pipeline_spark.streaming.neardup import (
        stream_near_dup_against_corpus,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "an entirely different document about spark streams"),
        (3, "the quick brown fox jumps over the lazy cat"),
    ]
    batch_rows = [
        (100, "the quick brown fox jumps over the lazy dog"),  # near-dup of 1/3
        (101, "completely unrelated text with no overlap at all"),
    ]
    corpus_table = str(tmp_path / "corpus")
    out_table = str(tmp_path / "pairs")
    write_table(
        spark.createDataFrame(corpus_rows, "doc_id long, text string"),
        corpus_table,
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(batch_rows, "doc_id long, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_near_dup_against_corpus(
        stream, corpus_table, out_table, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = {
        (r["batch_id"], r["corpus_id"]): r["est_jaccard"]
        for r in read_table(spark, out_table).collect()
    }
    expected = {
        (r["batch_id"], r["corpus_id"]): r["est_jaccard"]
        for r in incremental_lsh_pairs(
            spark.createDataFrame(batch_rows, "doc_id long, text string"),
            spark.createDataFrame(corpus_rows, "doc_id long, text string"),
        ).collect()
    }
    assert got == expected
    assert (100, 1) in got and got[(100, 1)] == 1.0  # exact text match
    assert all(b == 100 for b, _ in got)  # doc 101 matched nothing


def test_stream_near_dup_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    """Crash-recovery end-to-end: run the foreachBatch near-dup stage,
    then simulate the worst-case crash window — the sink committed its
    writes but the streaming checkpoint never recorded the epoch (we
    delete the checkpoint's commits/ marker while keeping offsets/).
    On restart Spark REDELIVERS that epoch before processing new
    files; the idempotent sink must skip the replay so every candidate
    pair appears exactly once."""
    import glob
    import os

    from etl_finance_pipeline_spark.sources.table_format import (
        read_table,
        write_table,
    )
    from etl_finance_pipeline_spark.streaming.neardup import (
        stream_near_dup_against_corpus,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "an entirely different document about spark streams"),
    ]
    corpus_table = str(tmp_path / "corpus")
    out_table = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    write_table(
        spark.createDataFrame(corpus_rows, "doc_id long, text string"),
        corpus_table,
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    ).write.parquet(os.path.join(src, "f1"))

    stream = spark.readStream.schema("doc_id long, text string").parquet(
        src + "/*"
    )
    q = stream_near_dup_against_corpus(
        stream, corpus_table, out_table, checkpoint_dir=ckpt
    )
    q.awaitTermination(120)
    q.stop()
    first = [
        (r["batch_id"], r["corpus_id"])
        for r in read_table(spark, out_table).collect()
    ]
    assert (100, 1) in first
    n_first = len(first)

    # crash window: offsets/N exists, sink wrote, commits/N lost
    commits = sorted(glob.glob(os.path.join(ckpt, "commits", "*")))
    assert commits, "expected a committed epoch in the checkpoint"
    os.remove(commits[-1])
    # the local FS keeps a hidden checksum twin; it must go too or the
    # restarted query's commit rename hits FileAlreadyExistsException
    crc = os.path.join(
        os.path.dirname(commits[-1]), "." + os.path.basename(commits[-1]) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    # more data arrives while "down"
    spark.createDataFrame(
        [(200, "an entirely different document about spark streams")],
        "doc_id long, text string",
    ).write.parquet(os.path.join(src, "f2"))

    stream2 = spark.readStream.schema("doc_id long, text string").parquet(
        src + "/*"
    )
    q2 = stream_near_dup_against_corpus(
        stream2, corpus_table, out_table, checkpoint_dir=ckpt
    )
    q2.awaitTermination(120)
    q2.stop()

    got = [
        (r["batch_id"], r["corpus_id"])
        for r in read_table(spark, out_table).collect()
    ]
    # epoch 0 was redelivered and skipped; epoch 1 appended once
    assert len(got) == len(set(got)), f"duplicate pairs after restart: {got}"
    assert set(got) == set(first) | {(200, 2)}
    assert got.count((100, 1)) == 1
    assert len(got) == n_first + 1
