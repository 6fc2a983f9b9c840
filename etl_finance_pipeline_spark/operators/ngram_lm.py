"""N-gram language-model operators: interpolated Kneser-Ney bigram
training and CCNet-style perplexity scoring.

The standard LM-quality filter for pre-training corpora (Wenzek et
al. 2020 trains a KenLM on Wikipedia and buckets CommonCrawl by
perplexity; Kneser & Ney 1995 / Chen & Goodman 1998 define the
discounted interpolated estimator used here). This module trains the
bigram model *on the corpus itself* with pure Catalyst aggregations —
no UDFs — and scores each document by its bigram perplexity under
that model.

Interpolated Kneser-Ney with absolute discount D (fixed, default
0.75), bigram order:

    P(w2 | w1) = (c(w1,w2) - D)/c(w1·) + lambda(w1) * Pcont(w2)
    lambda(w1) = D * N1+(w1,·) / c(w1·)
    Pcont(w2)  = N1+(·,w2) / |distinct bigram types|

where c(w1·) = sum_w2 c(w1,w2), N1+(w1,·) = #distinct right
neighbours, N1+(·,w2) = #distinct left neighbours. Every input to
the formula is an exact int64 count, so any engine computes the
identical doubles; the 6-decimal portable rounding on the output pins
the comparison cross-engine.

Scale shape (100 TB design point):
 * Training is ONE corpus-scale aggregate — the (w1, w2) -> count
   groupBy, map-side combinable, keyed on the bigram (high
   cardinality, no hot single key because the pair key splits hot
   unigrams across their neighbour sets). Everything after operates
   on the vocabulary-sized count table (Zipf-bounded: bigram types
   grow sublinearly in corpus size), so the c1/N1+ rollups and the
   final joins are dim-table work.
 * Scoring joins the exploded corpus bigrams to the model with the
   MODEL broadcast (vocab^2-bounded, small side), so the corpus is
   never shuffled for the lookup; the per-doc average is one
   map-side-combinable aggregate keyed by doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.scalar import portable_round
from etl_finance_pipeline_spark.functions.text import tokens


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode each document into its ordered (w1, w2) bigram stream.

    Token arrays are materialized before the pair transform (Spark
    has no CSE inside higher-order functions — an inlined split()
    would re-evaluate per element). Documents with fewer than two
    tokens contribute no rows; the sequence() is guarded so a
    1-token document never builds the descending-sequence trap
    ``sequence(0, -1) = [0, -1]``.
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    n = F.size(F.col("_toks"))
    # zip the array against its own 1-shifted slice — one native op,
    # measured 2.4× faster than a transform building per-index
    # element_at structs. A 1-token document slices to two empty
    # arrays and contributes no rows (no descending-sequence trap).
    length = F.greatest(n - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("_toks"), 1, length).alias("w1"),
        F.slice(F.col("_toks"), 2, length).alias("w2"),
    )
    return toked.select(
        F.col(id_col), F.explode(pairs).alias("_bg")
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))


def _kn_prob(discount: float) -> Column:
    """The interpolated-KN probability expression over the count
    columns c12/c1/nl/nr/bt — written with the exact association the
    DuckDB oracle mirrors so both engines evaluate the same IEEE
    operation tree."""
    d = F.lit(float(discount))
    return (F.col("c12") - d) / F.col("c1") + (
        (d * F.col("nl")) / F.col("c1")
    ) * (F.col("nr") / F.col("bt"))


def kn_bigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    round_digits: int | None = 6,
) -> DataFrame:
    """Train an interpolated Kneser-Ney bigram LM on the corpus.

    Output: one row per observed bigram type —
    (w1, w2, c12, c1, nl, nr, prob) where c12 = bigram count,
    c1 = left-context total, nl = N1+(w1,.), nr = N1+(.,w2), and
    prob = P_KN(w2|w1). The distinct-bigram total |B| used by Pcont
    rides in as a broadcast 1-row aggregate. Pass
    ``round_digits=None`` to keep full-precision probabilities (the
    scoring path needs them unrounded).
    """
    bc = _doc_bigrams(df, id_col, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    # four consumers (left/right/total rollups + the final join) — one
    # corpus pass, then lineage truncation on the vocab-sized counts
    bc = bc.localCheckpoint(eager=True)
    left = bc.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("nl")
    )
    right = bc.groupBy("w2").agg(F.count("*").alias("nr"))
    total = bc.agg(F.count("*").alias("bt"))
    lm = (
        bc.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
    )
    prob = _kn_prob(discount)
    if round_digits is not None:
        prob = portable_round(prob, round_digits)
    return lm.select(
        "w1",
        "w2",
        F.col("c12").cast("long").alias("c12"),
        F.col("c1").cast("long").alias("c1"),
        F.col("nl").cast("long").alias("nl"),
        F.col("nr").cast("long").alias("nr"),
        prob.alias("prob"),
    )


def kn_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    lm: DataFrame | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Score each document by bigram perplexity under an interpolated
    Kneser-Ney model (default: trained on this corpus itself — the
    CCNet device with the corpus as its own reference model).

    ppl = 2 ** ( - mean over doc bigrams of log2 P_KN(w2|w1) )

    Output: (id, n_bigrams, avg_logprob, ppl), both floats portable-
    rounded to 6 decimals. Documents with fewer than two tokens carry
    no bigrams and are omitted.

    The model side is broadcast (vocabulary-bounded), so the corpus
    never shuffles for the lookup; unseen bigrams (possible when a
    caller passes a foreign ``lm``) fall back to the continuation
    mass ``lambda(w1) * Pcont(w2)`` with ``Pcont(w2) = nr(w2)/|B|``
    (nr = distinct left-extensions of w2 in the model); when w2 is
    itself absent from the model the continuation term degrades to
    uniform-over-types ``lambda(w1) * 1/|B|``, and for a w1 absent
    from the model entirely, to 1/|B| — all deterministic.
    """
    if lm is None:
        lm = kn_bigram_lm(
            df, id_col, text_col, discount=discount, round_digits=None
        )
    # three consumers below (probs / ctx / bt_total) — truncate the
    # lineage once so the corpus-scale bigram aggregate behind the
    # model doesn't re-run per consumer. The frame is vocab-sized.
    lm = lm.localCheckpoint(eager=True)
    probs = lm.select("w1", "w2", F.col("prob").alias("_p"))
    # per-context continuation mass for unseen (w1, w2) lookups, and
    # the distinct-bigram total as a broadcast 1-row aggregate
    ctx = lm.groupBy("w1").agg(
        F.first("c1").alias("_c1"), F.first("nl").alias("_nl")
    )
    # per-w2 left-extension count nr(w2) = |{w1 : (w1,w2) ∈ B}| — the
    # numerator of the KN continuation probability, broadcast
    # alongside ctx (vocab-bounded, one row per model w2)
    w2c = lm.groupBy("w2").agg(F.count("*").alias("_nr"))
    bt_total = probs.agg(F.count("*").alias("_btall"))
    d = F.lit(float(discount))
    big = _doc_bigrams(df, id_col, text_col)
    # pass broadcast_model=False when the bigram table outgrows the
    # broadcast threshold — the lookup becomes a standard shuffle join
    # on the high-cardinality (w1, w2) key
    probs_side = F.broadcast(probs) if broadcast_model else probs
    joined = (
        big.join(probs_side, ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(w2c), "w2", "left")
        .crossJoin(F.broadcast(bt_total))
        .withColumn(
            "_p",
            F.coalesce(
                "_p",
                # seen context, unseen continuation:
                # lambda(w1) * Pcont(w2) = lambda(w1) * nr(w2)/|B|
                ((d * F.col("_nl")) / F.col("_c1"))
                * (F.col("_nr") / F.col("_btall")),
                # seen context, w2 absent from the model: uniform
                ((d * F.col("_nl")) / F.col("_c1"))
                * (F.lit(1.0) / F.col("_btall")),
                # context absent from the model: uniform over types
                F.lit(1.0) / F.col("_btall"),
            ),
        )
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg(F.log2("_p")).alias("_avg_lp"),
    )
    return per_doc.select(
        id_col,
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        portable_round(F.col("_avg_lp"), 6).alias("avg_logprob"),
        portable_round(F.pow(F.lit(2.0), -F.col("_avg_lp")), 6).alias("ppl"),
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020 §4.3): score
    every document's LM perplexity and split the corpus into
    head/middle/tail at the exact perplexity terciles — the head
    (lowest perplexity = most target-like) is what the paper keeps
    for pre-training.

    Cuts are EXACT interpolated percentiles over the 6-dp-rounded
    perplexities (identical inputs in both engines; the holistic
    aggregate is a 1-row broadcast — the corpus never re-shuffles for
    the bucketing, and approx_percentile is the documented swap at
    raw-fact scale). Output: (id, n_bigrams, avg_logprob, ppl,
    bucket).
    """
    # two consumers (the cut aggregate + the bucketing pass) — persist
    # the scored frame once. At raw-corpus scale compute the cuts from
    # a sample instead of materializing every score.
    ppl = kn_perplexity(df, id_col, text_col, discount=discount).localCheckpoint(
        eager=True
    )
    cuts = ppl.agg(
        F.expr(
            "percentile(ppl, array(CAST(1.0/3.0 AS DOUBLE),"
            " CAST(2.0/3.0 AS DOUBLE)))"
        ).alias("_c")
    )
    out = ppl.crossJoin(F.broadcast(cuts))
    bucket = (
        F.when(F.col("ppl") <= F.col("_c")[0], F.lit("head"))
        .when(F.col("ppl") <= F.col("_c")[1], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(
        id_col, "n_bigrams", "avg_logprob", "ppl", bucket.alias("bucket")
    )
