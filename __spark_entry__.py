"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: canonical-schema
    rename → keep-first dedupe → 5-minute OHLCV candles per symbol."""
    from etl_finance_pipeline_spark.plans.queries import q_candles_5m

    return q_candles_5m(spark, "/root/testdata/sf0.001")


#: Queries hoisted to the front of the registry so a capped
#: correctness artifact (the driver records the first N entries) still
#: spans every operator family: streaming, MinHash/SimHash/embedding
#: dedup, ANN + retrieval, skew helpers, corpus ops, multimodal,
#: temporal joins, connected components. All registered queries are
#: oracle-backed either way; this only chooses the documented subset.
_SHOWCASE_FIRST = (
    # round-7 new capability families (need driver recording this round)
    "kn_bigram_lm",  # interpolated Kneser-Ney bigram LM train (round 7)
    "kn_perplexity",  # CCNet-style LM perplexity scoring (round 7)
    "ccnet_buckets",  # head/middle/tail perplexity terciles (round 7)
    "gopher_quality",  # Rae et al. quality-rule set (round 7)
    "c4_clean",  # Raffel et al. line + doc filters (round 7)
    "line_dedup",  # cross-doc boilerplate removal (round 7)
    "line_dedup_keep_first",  # keep-one-copy lane (round 7)
    "stream_quality_filter",  # Gopher rules under a file stream (round 7)
    "dsir_weights",  # DSIR importance weights, Xie et al. (round 7)
    "dsir_select",  # deterministic top-k selection (round 7)
    "stream_dsir",  # standing model scoring an ingest stream (round 7)
    "embedding_covariance",  # the one corpus-scale PCA aggregate (round 7)
    "pca_top_component",  # lockstep power iteration (round 7)
    "pca_project",  # broadcast-literal projection (round 7)
    "pca_reduce2",  # Hotelling-deflated 2-D reduction (round 7)
    "embed_standardize",  # per-dim z-scoring (round 7)
    "probe_auc",  # exact Mann-Whitney ROC-AUC (round 7)
    "hard_negatives",  # contrastive hard-negative mining (round 7)
    "source_overlap",  # pairwise source Jaccard matrix (round 7)
    "normalize_text",  # unicode canonicalization chain (round 7)
    "rag_retrieve",  # chunk -> hashed features -> sparse cosine (round 7)
    "containment_pairs",  # Broder asymmetric containment (round 7)
    "incremental_line_dedup",  # batch vs standing-corpus lines (round 7)
    "curation_funnel",  # exact/near-dup/quality stage-survival report (round 7)
    "token_budget",  # capped mixture allocation (round 7)
    "pq_topk",  # PQ ANN end-to-end; round 7: numpy encode lane + faster train
    "unigram_train",  # Unigram-LM (SentencePiece-style) Viterbi-EM (round 7)
    "unigram_segment",  # corpus segmentation with the trained vocab (round 7)
    "unigram_train_pruned",  # SentencePiece-style vocab shrink + re-norm (round 7)
    "wordpiece_train",  # BERT-vocab likelihood-ranked merges (round 7)
    "ann_ivfpq_topk",  # IVF-PQ composed ANN: cells + residual codes (round 7)
    "image_stats_jpeg_mixed",  # PROGRESSIVE (SOF2) + baseline mixed corpus (round 7)
    "media_decode_audit",  # per-variant quarantine accounting, corrupt third (round 7)
    "phash_near_dup",  # lossless banded Hamming now uncapped (round 7 fix)
    "video_near_dup",  # same lossless-contract fix (round 7)
    "simhash_pairs",  # same lossless-contract fix (round 7)
    "k_core",  # oracle unroll-depth pin via max_iter (round 7 fix)
    # family-spanning classics (reference parity + heavy hitters)
    "candles_5m",
    "dedupe_keep_first",
    "missing_minutes",
    "interpolate_linear",
    "dq_profile",
    "bm25_search",
    "near_dup_clusters",
    "audio_stats_wav",  # real WAV codec path (stdlib wave round-trip)
    "image_stats_png",  # real compressed codec path (zlib round-trip)
    "stream_view_click",
    "pagerank",
    "triangles",
    "asof_last_click",
    # rotated out after rounds 1-6 driver recordings (all still
    # registered + full-artifact-verified every round):
    # salted_event_stats, exact_dedup_docs, ann_ivf_trained, lang_id,
    # pack_sequences, user_sessions, stream_gaps, hll_distinct_users,
    # heavy_hitters_cms, assoc_rules, bloom_semi_orders, zorder_stats,
    # source_drift, funnel_conversion, kmv_distinct_users, bfs_reach,
    # minhash_lsh_pairs, bpe_train, embed_near_dup, stream_candles,
    # clustering_coeff, image_resize_ppm, hist_quantiles,
    # order_quartiles, weighted_sample, rsi, cusum, cuped_experiment,
    # markov_transitions, hotkey_purchase_join, communities_lpa,
    # set_similarity_exact, stream_near_dup, market_share,
    # revenue_rollup, tfidf_top_terms, video_frames_avi,
    # image_stats_jpeg_color, substring_dedup, substring_dedup_clean,
    # video_frames_real, scene_cuts_real, image_stats_jpeg,
    # decontaminate_spans
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from etl_finance_pipeline_spark.plans.queries import QUERIES

    ordered = {k: QUERIES[k] for k in _SHOWCASE_FIRST if k in QUERIES}
    ordered.update(QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    from etl_finance_pipeline_spark.plans.queries import ORACLES

    ordered = {k: ORACLES[k] for k in _SHOWCASE_FIRST if k in ORACLES}
    ordered.update(ORACLES)
    return ordered
