"""Streaming near-duplicate detection: each microbatch of incoming
documents is LSH-checked against a STANDING CORPUS held in the
transactional table format, and the candidate pairs append
exactly-once to an output table.

Why this lane exists: ``dropDuplicatesWithinWatermark`` covers EXACT
dupes only (state = seen keys inside the watermark horizon). Near-dup
detection needs corpus-wide signatures, which no per-key streaming
state can hold — so the streaming shape is ``foreachBatch`` around
the batch operator :func:`...dedup.incremental_lsh_pairs`: the
microbatch's banded signatures broadcast, the corpus streams through
a broadcast-hash join once per epoch, and the corpus is NEVER
shuffled. At 100 TB the corpus table would carry precomputed
signatures (they are deterministic per document — compute once at
ingest) so each epoch pays O(|batch| + corpus scan), with the table
format's file skipping cutting the scan when band keys cluster.

Exactly-once: results go through
:func:`...streaming.sink.write_batch_idempotent` — each epoch commits
once under (txn_app_id, epoch_id); redelivered epochs after a sink
failure are skipped from the commit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_finance_pipeline_spark.streaming.sink import (
    _default_txn_app,
    write_batch_idempotent,
)


def stream_near_dup_against_corpus(
    stream_df: DataFrame,
    corpus_table: str,
    out_table: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    txn_app_id: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
):
    """Start the streaming near-dup stage: for every microbatch of
    *stream_df*, compute LSH candidate pairs against the transactional
    table *corpus_table* and append (batch_id, corpus_id,
    est_jaccard) to *out_table* exactly once per epoch.

    Returns the StreamingQuery handle.
    """
    from etl_finance_pipeline_spark.operators.dedup import (
        incremental_lsh_pairs,
    )
    from etl_finance_pipeline_spark.sources.table_format import read_table

    app = txn_app_id or (
        _default_txn_app(checkpoint_dir) if checkpoint_dir else None
    )

    def _stage(batch_df: DataFrame, epoch_id: int) -> None:
        corpus = read_table(batch_df.sparkSession, corpus_table).select(
            id_col, text_col
        )
        pairs = incremental_lsh_pairs(
            batch_df,
            corpus,
            id_col=id_col,
            text_col=text_col,
            shingle_k=shingle_k,
            num_hashes=num_hashes,
            bands=bands,
        )
        write_batch_idempotent(pairs, epoch_id, out_table, txn_app_id=app)

    writer = stream_df.writeStream.foreachBatch(_stage)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_substring_dedup_against_corpus(
    stream_df: DataFrame,
    corpus_table: str,
    out_table: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    txn_app_id: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
):
    """Streaming substring-level dedup: for every microbatch of
    incoming documents, find the maximal spans duplicating content in
    the standing transactional-table corpus (or repeated within the
    batch) and append (id, span_start, span_end, span_tokens) to
    *out_table* exactly once per epoch.

    Same foreachBatch shape as :func:`stream_near_dup_against_corpus`
    and for the same reason: the match needs corpus-wide gram
    frequencies, which no per-key streaming state can hold. Per epoch
    the batch's gram vocabulary broadcasts onto one corpus pass
    (operators.dedup.incremental_duplicate_spans — the corpus is
    never shuffled); at 100 TB the corpus gram frequencies are
    precomputed at ingest and the per-epoch cost is O(|batch| + one
    index probe).

    Returns the StreamingQuery handle.
    """
    from etl_finance_pipeline_spark.operators.dedup import (
        incremental_duplicate_spans,
    )
    from etl_finance_pipeline_spark.sources.table_format import read_table

    app = txn_app_id or (
        _default_txn_app(checkpoint_dir) if checkpoint_dir else None
    )

    def _stage(batch_df: DataFrame, epoch_id: int) -> None:
        corpus = read_table(batch_df.sparkSession, corpus_table).select(
            id_col, text_col
        )
        spans = incremental_duplicate_spans(
            batch_df, corpus, id_col=id_col, text_col=text_col, k=k
        )
        write_batch_idempotent(spans, epoch_id, out_table, txn_app_id=app)

    writer = stream_df.writeStream.foreachBatch(_stage)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
