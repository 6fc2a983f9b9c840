"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how target-like its
hashed n-gram profile is, so a pre-training pipeline can resample raw
web data toward a high-quality target domain.

The published recipe, re-expressed Spark-first:
 1. Features: word unigrams + bigrams, hashed into B buckets
    (the paper's "hashed n-gram" generative features).
 2. Fit two bag-of-buckets models: p (target corpus) and q (raw /
    proposal corpus), Laplace-smoothed: (count_b + 1) / (total + B).
 3. Importance weight per document: log w(x) = sum over the doc's
    grams of [ln p(bucket) - ln q(bucket)].
Resampling itself (Gumbel top-k) is randomized in the paper; the
deterministic surface here is the weight (callers rank by
(logw, doc_id) for a reproducible selection — see dsir_select).

Scale shape (100 TB): the two model fits are ONE aggregate each over
the exploded grams, keyed by bucket (B keys — tiny, map-side
combinable so the hot buckets collapse per-task before the 64-row
shuffle). Scoring joins the exploded corpus to the BROADCAST 64-row
log-ratio table and sums per doc (doc-keyed, map-side combinable).
The corpus is never shuffled on a data-sized key.

All arithmetic is exact-integer counts through the Laplace ratio, so
both engines form identical doubles; only the per-doc sum order
differs (absorbed by 6-dp portable rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.scalar import (
    portable_hash64,
    portable_round,
)
from etl_finance_pipeline_spark.functions.text import tokens

DSIR_BUCKETS = 64


def _doc_gram_buckets(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """Explode each doc into hashed (unigram + bigram) feature-bucket
    ids. Token array materialized once (no CSE inside HOFs)."""
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    # bigrams via zip_with over the array and its own 1-shifted slice
    # (one native op; the per-index element_at transform in
    # word_shingles is ~2.4× slower interpreted — same construction
    # as ngram_lm._doc_bigrams, producing identical strings)
    n = F.size(F.col("_toks"))
    length = F.greatest(n - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(F.col("_toks"), 1, length),
        F.slice(F.col("_toks"), 2, length),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = F.concat(F.col("_toks"), bigrams)
    exploded = toked.select(F.col(id_col), F.explode(grams).alias("gram"))
    return exploded.select(
        id_col, (portable_hash64(F.col("gram")) % n_buckets).alias("bucket")
    )


def dsir_log_ratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The fitted model itself: (bucket, _logratio) with one row per
    feature bucket — ln p_target(b) − ln q_raw(b), Laplace-smoothed.
    B rows; broadcast it onto scoring passes (batch or streaming)."""
    spark = raw.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))

    def _model(df: DataFrame, prob_col: str) -> DataFrame:
        counts = (
            _doc_gram_buckets(df, id_col, text_col, n_buckets)
            .groupBy("bucket")
            .agg(F.count("*").alias("_c"))
        )
        filled = buckets.join(counts, "bucket", "left").select(
            "bucket", F.coalesce("_c", F.lit(0)).alias("_c")
        )
        total = filled.agg(F.sum("_c").alias("_n"))
        return filled.crossJoin(F.broadcast(total)).select(
            "bucket",
            (
                (F.col("_c") + 1).cast("double")
                / (F.col("_n") + n_buckets).cast("double")
            ).alias(prob_col),
        )

    return (
        _model(target, "_p")
        .join(_model(raw, "_q"), "bucket")
        .select(
            "bucket", (F.log("_p") - F.log("_q")).alias("_logratio")
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight of *raw* toward
    *target*. Output: (id, n_grams, logw). Higher = more target-like.
    """
    ratio = dsir_log_ratio(raw, target, id_col, text_col, n_buckets)
    scored = _doc_gram_buckets(raw, id_col, text_col, n_buckets).join(
        F.broadcast(ratio), "bucket"
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        portable_round(F.sum("_logratio"), 6).alias("logw"),
    )


def dsir_select(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic selection: top-k documents by (logw DESC, id ASC)
    — the reproducible stand-in for the paper's Gumbel resampling.
    Planned as TakeOrderedAndProject (a per-partition heap + single
    k-row merge), never a global sort."""
    return weights.orderBy(
        F.col("logw").desc(), F.col(id_col).asc()
    ).limit(k)
