"""Text-analysis operators for the training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (no UDFs), all oracle-verifiable: each
operator's arithmetic has an exact DuckDB twin in plans/queries.py.

Scale notes (100 TB design point):
 * Every operator here is embarrassingly parallel per document — a
   narrow map with no shuffle at all (fingerprinting shuffles only if
   the caller aggregates the exploded hashes).
 * Expressions stay inside whole-stage codegen; the only higher-order
   functions used (transform/filter/aggregate) are evaluated JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.text import (
    LANG_PRIORITY,
    STOPWORDS,
    bpe_ish_token_count,
    digit_ratio,
    punct_ratio,
    stopword_hits,
    tokens,
)


#: classic UTF-8-decoded-as-Latin-1 artifacts: 'Ã' leads the 2-byte
#: Latin range (é→Ã©, ü→Ã¼, …), 'â€' leads the punctuation range
#: (“→â€œ, ’→â€™, –→â€"). Literal counts, no regex.
MOJIBAKE_MARKERS: tuple[str, ...] = ("Ã", "â€")

#: C0 control characters that should never appear in clean web text
#: (tab/newline/carriage-return excluded) — identical escape syntax in
#: Java regex and RE2, so one constant serves both engines.
CONTROL_CHAR_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

NON_ASCII_RE = "[^\\x00-\\x7F]"


def encoding_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-encoding sanity audit — the quarantine gate every
    web-corpus pipeline runs before trusting `text` (decode failures
    poison tokenizers and dedup alike): per document, counts of
    U+FFFD replacement characters (a decoder already gave up), C0
    control characters (binary junk declared as text), classic
    UTF-8-as-Latin-1 mojibake markers (``MOJIBAKE_MARKERS``), and the
    non-ASCII census, plus an ``enc_suspect`` flag when any corruption
    signal fires. One exchange-free codegen projection — literal
    replace-count arithmetic and two character-class regexes shared
    verbatim with the DuckDB twin.

    Output: (id, n_chars, repl_chars, ctrl_chars, moji_marks,
    non_ascii_chars, enc_suspect).
    """
    t = F.col(text_col)

    def count_sub(sub: str) -> Column:
        return (
            (F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit(""))))
            / len(sub)
        ).cast("long")

    def count_re(pat: str) -> Column:
        return (
            F.length(t) - F.length(F.regexp_replace(t, pat, ""))
        ).cast("long")

    repl = count_sub("�")
    ctrl = count_re(CONTROL_CHAR_RE)
    moji = sum(
        (count_sub(m) for m in MOJIBAKE_MARKERS[1:]),
        count_sub(MOJIBAKE_MARKERS[0]),
    )
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        repl.alias("repl_chars"),
        ctrl.alias("ctrl_chars"),
        moji.alias("moji_marks"),
        count_re(NON_ASCII_RE).alias("non_ascii_chars"),
        ((repl > 0) | (ctrl > 0) | (moji > 0)).alias("enc_suspect"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "pred_lang"
) -> DataFrame:
    """N-gram-free stopword-hit language ID heuristic.

    Scores each language by stopword hits over whitespace tokens; the
    winner is the highest score with deterministic priority-order
    tiebreak (LANG_PRIORITY); zero hits everywhere → 'und'.
    Adds ``{out}_score`` with the winning hit count.
    """
    toks = tokens(text_col)
    df = df.withColumn("_toks", toks)
    for lang in LANG_PRIORITY:
        df = df.withColumn(f"_hits_{lang}", stopword_hits(F.col("_toks"), lang))
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in LANG_PRIORITY])
    pred: Column = F.lit("und")
    # build the WHEN chain in reverse so earlier languages win ties
    for lang in reversed(LANG_PRIORITY):
        pred = F.when(
            (best > 0) & (F.col(f"_hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    out = df.withColumn(out_col, pred).withColumn(f"{out_col}_score", best)
    return out.drop("_toks", *[f"_hits_{lang}" for lang in LANG_PRIORITY])


def quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Heuristic document quality score in [0, 1] from cheap surface
    statistics — the standard pre-training corpus filters (length,
    mean word length, stopword density, symbol noise).

    score = 0.25·len_ok + 0.25·wordlen_ok + 0.3·stop_ok + 0.2·(1−noise)
      len_ok     : 1 if 50 ≤ n_chars ≤ 10000 else 0
      wordlen_ok : 1 if 3 ≤ avg_token_len ≤ 10 else 0
      stop_ok    : 1 if stopword_ratio(en) ≥ 0.05 else 0
      noise      : digit_ratio + punct_ratio (capped at 1)
    Adds metric columns n_tokens / avg_token_len / stopword_ratio /
    digit_ratio / punct_ratio alongside the score.
    """
    # materialize the token array once — several metric expressions
    # reference it, and an inlined split() would be re-evaluated per
    # reference (see dedup._doc_shingles)
    df = df.withColumn("_toks", tokens(text_col))
    toks = F.col("_toks")
    n_tokens = F.size(toks)
    avg_len = F.aggregate(
        toks, F.lit(0.0), lambda a, t: a + F.length(t)
    ) / n_tokens
    stop_ratio = stopword_hits(toks, "en") / n_tokens
    dr = digit_ratio(text_col)
    pr = punct_ratio(text_col)
    noise = F.least(dr + pr, F.lit(1.0))
    n_chars = F.length(text_col)
    score = (
        F.when((n_chars >= 50) & (n_chars <= 10000), 0.25).otherwise(0.0)
        + F.when((avg_len >= 3) & (avg_len <= 10), 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.3).otherwise(0.0)
        + (1.0 - noise) * 0.2
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", avg_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("digit_ratio", dr)
        .withColumn("punct_ratio", pr)
        .withColumn(out_col, score)
        .drop("_toks")
    )


#: Gopher's stop set (Rae et al. 2021, Table A1 heuristics): a doc
#: must contain at least two DISTINCT of these to pass rule 7. Part
#: of the deterministic contract, mirrored in the oracle SQL.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The Gopher corpus quality rules (Rae et al. 2021 §A1.1) as a
    narrow per-document map — the standard web-scale pre-filter
    applied before dedup in MassiveText-style pipelines:

      1. 50 <= word count <= 100000
      2. 3 <= mean word length <= 10
      3. symbol-to-word ratio <= 0.1       (symbols: '#', '...', U+2026)
      4. <= 90% of lines start with a bullet ('-', '*', U+2022)
      5. <= 30% of lines end with an ellipsis
      6. >= 80% of words contain an alphabetic character
      7. >= 2 distinct Gopher stopwords present

    Words are whitespace tokens of the lowercased text; lines split on
    "\\n" (a single-line document yields one line — the line rules
    then measure that line). Adds the seven metric columns, one
    boolean per rule, and ``gopher_pass`` (AND of all seven). No
    shuffle, no UDFs; every expression has an exact DuckDB twin.
    """
    df = df.withColumn("_toks", tokens(text_col)).withColumn(
        "_lines", F.split(F.col(text_col), "\n")
    )
    toks, lines = F.col("_toks"), F.col("_lines")
    text = F.col(text_col)
    n_words = F.size(toks)
    mean_wl = F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n_words
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    dots_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    uell_count = F.length(text) - F.length(
        F.replace(text, F.lit("…"), F.lit(""))
    )
    symbol_ratio = (hash_count + dots_count + uell_count) / n_words
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).rlike("^[-*•]"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).rlike("(\\.\\.\\.|…)$"),
        )
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_types = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "rule_word_count": (n_words >= 50) & (n_words <= 100000),
        "rule_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "rule_symbol_ratio": symbol_ratio <= 0.1,
        "rule_bullet_lines": bullet_lines <= 0.9 * n_lines,
        "rule_ellipsis_lines": ellipsis_lines <= 0.3 * n_lines,
        "rule_alpha_words": alpha_words >= 0.8 * n_words,
        "rule_stopwords": stop_types >= 2,
    }
    out = (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_wl)
        .withColumn("symbol_ratio", symbol_ratio)
        .withColumn("n_lines", n_lines.cast("long"))
        .withColumn("bullet_lines", bullet_lines.cast("long"))
        .withColumn("ellipsis_lines", ellipsis_lines.cast("long"))
        .withColumn("alpha_words", alpha_words.cast("long"))
        .withColumn("stop_types", stop_types.cast("long"))
    )
    gpass = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        gpass = gpass & cond
    return out.withColumn("gopher_pass", gpass).drop("_toks", "_lines")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per document."""
    return df.withColumn("ws_tokens", F.size(tokens(text_col))).withColumn(
        "bpe_ish_tokens", bpe_ish_token_count(text_col)
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every *k*-char shingle with a rolling position,
    keep the minimum hash of each sliding *window* of consecutive
    shingles, emit the distinct selected hashes.

    Guarantees any shared substring of length ≥ k+window−1 produces at
    least one shared fingerprint — the standard near-copy detector for
    code/text plagiarism and corpus contamination checks.

    Output: (id, fp_hash) one row per distinct selected fingerprint.

    Execution is array-native and SHUFFLE-FREE until the final
    distinct: the shingle-hash array and its sliding-window minima are
    computed per row with higher-order functions (each array is
    materialized in its own projection — see dedup._doc_shingles on
    lambda CSE), then only the distinct selected hashes are exploded.
    The former explode-then-window formulation shuffled every shingle
    position by document (2.5M rows at sf0.1, 4.3s); this one ships
    nothing: 4.3s → ~1s.
    """
    # fingerprint = 15-hex-char md5 prefix kept as a STRING: the hex
    # parse (conv) costs more than md5 itself (5.1s vs 2.6s per 1.45M
    # shingles) and winnowing only needs a total order — lexicographic
    # min over fixed-width hex == numeric min, identically in DuckDB.
    from etl_finance_pipeline_spark.functions.layout import fan_out

    # fan_out: ~300 md5 calls per document is pure CPU — a one-row-group
    # input file would otherwise serialize the whole corpus onto 1 core.
    hashed = fan_out(df).select(
        F.col(id_col),
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
            f"i -> substring(md5(substring({text_col}, i, {k})), 1, 15))"
        ).alias("_hashes"),
    )
    wmins = hashed.select(
        F.col(id_col),
        F.expr(
            f"transform(sequence({window}, size(_hashes)), "
            f"j -> array_min(slice(_hashes, j - {window - 1}, {window})))"
        ).alias("_wmins"),
    )
    return wmins.select(
        F.col(id_col), F.explode(F.array_distinct("_wmins")).alias("fp_hash")
    ).distinct()


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1):
    per-document fractions measuring how much of the text is the same
    thing said again — the signature of boilerplate, keyword stuffing
    and degenerate generations.

      top_word_frac   — occurrences of the most frequent token / n_tokens
      dup_word_frac   — tokens whose type occurs more than once / n_tokens
      top_bigram_frac — occurrences of the most frequent bigram / n_bigrams
      dup_bigram_frac — bigram occurrences of repeated bigram types / n_bigrams

    Output: (id, n_tokens, n_bigrams, the four fractions, repetitive)
    where ``repetitive`` applies Gopher's cut style: top_word_frac > 0.3
    or dup_bigram_frac > 0.2.

    Scale shape (100 TB): gram counting is explode → two hash
    aggregates, both map-side combinable and keyed by (doc, gram) then
    doc — no window, no per-doc quadratic array scan (a
    ``transform(array_distinct(..), count-in-array)`` formulation is
    O(L²) per document and melts on long documents). Shuffled rows are
    (id, gram) pairs — linear in corpus token count.
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    uni = base.select(id_col, F.explode("_toks").alias("gram"))
    big = base.select(
        F.col(id_col),
        F.explode(
            F.when(F.size("_toks") < 2, F.array()).otherwise(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1), "
                    "i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
                )
            )
        ).alias("gram"),
    )

    def _fracs(grams: DataFrame, prefix: str) -> DataFrame:
        counts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
        return counts.groupBy(id_col).agg(
            F.sum("c").alias(f"n_{prefix}s"),
            F.max("c").alias(f"_top_{prefix}"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                f"_dup_{prefix}"
            ),
        )
    u = _fracs(uni, "word")
    b = _fracs(big, "bigram")
    out = u.join(b, id_col, "left")
    r6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    top_w = r6(F.col("_top_word") / F.col("n_words"))
    dup_w = r6(F.col("_dup_word") / F.col("n_words"))
    top_b = r6(F.col("_top_bigram") / F.col("n_bigrams"))
    dup_b = r6(F.col("_dup_bigram") / F.col("n_bigrams"))
    return out.select(
        F.col(id_col),
        F.col("n_words").alias("n_tokens"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        top_w.alias("top_word_frac"),
        dup_w.alias("dup_word_frac"),
        F.coalesce(top_b, F.lit(0.0)).alias("top_bigram_frac"),
        F.coalesce(dup_b, F.lit(0.0)).alias("dup_bigram_frac"),
        (
            (top_w > 0.3) | (F.coalesce(dup_b, F.lit(0.0)) > 0.2)
        ).alias("repetitive"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the CCNet/Wikipedia-LM quality signal
    (Wenzek et al. 2020) with the corpus itself as the language model:
    documents full of rare or gibberish tokens score low, fluent
    documents score near the corpus mean.

      P(t) = count(t) / total_tokens        (corpus-wide)
      doc score = mean over doc tokens of ln P(t)

    Output: (id, n_tokens, avg_logprob) — avg_logprob ≤ 0, higher is
    more typical.

    Scale shape (100 TB): one corpus-wide (gram → count) aggregate
    (map-side combinable; vocabulary is Zipf-bounded), the scalar
    total via a 1-row broadcast cross join, then an equi-join of the
    exploded corpus back to the frequency table keyed on the token and
    one final per-doc average. Hot-token join skew is AQE-splittable
    because the frequency side is the small one.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("_n"))
    freq = freq.crossJoin(F.broadcast(total))
    scored = toks.join(freq, "tok").select(
        F.col(id_col), (F.log(F.col("tf") / F.col("_n"))).alias("_lp")
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.floor(F.avg("_lp") * 1e6 + F.lit(0.5)) / 1e6).alias("avg_logprob"),
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Shannon entropy of the character distribution per document —
    the cheap compressibility proxy quality pipelines use to drop
    low-entropy boilerplate (repeated padding, template dumps, key
    mashing) and flag high-entropy non-text (base64 blobs, minified
    code): H = −Σ p_c · log₂ p_c over the document's characters.

    One explode + one (doc, char) count aggregate + one per-doc
    rollup, all map-side combinable and keyed by the document —
    at corpus scale this is two cheap shuffles on high-cardinality
    keys. Probabilities are exact rationals (count/len); the log only
    touches O(1) magnitudes, so 6-decimal portable rounding pins the
    value cross-engine.

    Output: (id, n_chars, n_distinct_chars, entropy) — empty docs
    carry entropy 0.
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    chars = df.select(
        F.col(id_col),
        F.length(text_col).alias("_n"),
        F.explode(F.split(text_col, "")).alias("_c"),
    ).filter(F.col("_c") != "")
    counts = chars.groupBy(id_col, "_n", "_c").agg(
        F.count("*").alias("_k")
    )
    p = F.col("_k") / F.col("_n")
    ent = counts.groupBy(id_col, "_n").agg(
        F.count("*").cast("long").alias("n_distinct_chars"),
        portable_round(-F.sum(p * F.log2(p)), round_digits).alias("entropy"),
    )
    return (
        df.select(id_col)
        .join(ent, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce(F.col("n_distinct_chars"), F.lit(0)).alias(
                "n_distinct_chars"
            ),
            F.coalesce(F.col("entropy"), F.lit(0.0)).alias("entropy"),
        )
    )


def ngram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Gopher's within-document n-gram repetition signals (Rae et al.
    2021 Table A1, the repetition family `gopher_rules` does not
    cover): per document,

      * ``top_ngram_frac`` — the fraction of tokens claimed by the
        MOST frequent n-gram (count·n / n_tokens, clamped to 1 since
        overlapping occurrences can over-count; tie-break: count
        desc, gram asc) — Gopher's "fraction of characters in the
        most common n-gram", measured in tokens;
      * ``dup_ngram_frac`` — the fraction of token POSITIONS covered
        by any n-gram occurring more than once in the document
        (position-distinct, so overlaps never double-count) —
        Gopher's "fraction of characters in duplicate n-grams".

    Shape: one n-gram explode (corpus pass), one (doc, gram) count,
    one per-doc top-1 window, one position-explode + distinct for
    coverage — all keyed by doc, never corpus-global.

    Output: (id, n_tokens, top_ngram, top_count, top_ngram_frac,
    dup_ngram_frac).
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round
    from pyspark.sql.window import Window

    toked = df.select(F.col(id_col), tokens(text_col).alias("_t")).filter(
        F.size("_t") >= n
    )
    grams = toked.select(
        F.col(id_col),
        F.size("_t").alias("_nt"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - n + 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("_t"), i.cast("int"), n)
                ),
            )
        ).alias("_pos", "_g"),
    )
    counts = grams.groupBy(id_col, "_g").agg(
        F.count("*").alias("_c"), F.first("_nt").alias("_nt")
    )
    top_w = Window.partitionBy(id_col).orderBy(
        F.col("_c").desc(), F.col("_g")
    )
    top = (
        counts.withColumn("_r", F.row_number().over(top_w))
        .filter(F.col("_r") == 1)
        .select(
            F.col(id_col),
            F.col("_nt"),
            F.col("_g").alias("top_ngram"),
            F.col("_c").alias("top_count"),
        )
    )
    covered = (
        grams.join(
            counts.filter(F.col("_c") > 1).select(id_col, "_g"),
            [id_col, "_g"],
        )
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + n - 1)
            ).alias("_cp"),
        )
        .groupBy(id_col)
        .agg(F.countDistinct("_cp").alias("_cov"))
    )
    return (
        top.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_nt").cast("long").alias("n_tokens"),
            "top_ngram",
            F.col("top_count").cast("long").alias("top_count"),
            portable_round(
                F.least(
                    F.col("top_count") * n / F.col("_nt"), F.lit(1.0)
                ),
                round_digits,
            ).alias("top_ngram_frac"),
            portable_round(
                F.coalesce(F.col("_cov"), F.lit(0)) / F.col("_nt"),
                round_digits,
            ).alias("dup_ngram_frac"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    top_n: int | None = 100_000,
    round_digits: int = 6,
) -> DataFrame:
    """Zipf rank-frequency fit: least-squares slope/intercept of
    ln(count) against ln(rank) over the HEAD of the corpus unigram
    distribution (rank by count desc, token asc) — the corpus-health
    diagnostic (natural text sits near slope ≈ −1; template/
    boilerplate corpora flatten or steepen it).

    The raw type vocabulary of a web corpus is NOT bounded — hapax
    legomena (URLs, numbers, typos) grow with corpus size — so the
    fit frame is cut twice before any ranking: *min_count* drops the
    hapax tail with a map-side filter pushed upstream of the sort,
    and *top_n* keeps the head via an orderBy+limit that plans as
    TakeOrderedAndProject (per-partition partial top-N, never a
    global single-partition sort of the vocabulary). The ranking
    window then runs over ≤ top_n surviving rows — bounded by the
    knob, not by the corpus. Both cuts preserve the head's ranks
    exactly (every dropped type has a strictly lower count, or a
    worse (count, token) order at the boundary, than every kept one),
    and the Zipf fit only needs the head. ``top_n=None`` disables the
    head cap for vocabularies the caller KNOWS are bounded.

    Output: one row (n_fit_types, n_fit_tokens, slope, intercept) —
    the type/token mass OF THE FITTED HEAD (corpus-wide totals are
    ``vocab_coverage``'s job).
    """
    from pyspark.sql.window import Window

    from etl_finance_pipeline_spark.functions.scalar import portable_round

    if min_count < 1:
        raise ValueError(f"zipf_fit: min_count must be ≥ 1, got {min_count}")
    counts = (
        df.select(F.explode(tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= F.lit(min_count))
    )
    if top_n is not None:
        counts = counts.orderBy(F.col("_c").desc(), F.col("_w")).limit(top_n)
    w = Window.orderBy(F.col("_c").desc(), F.col("_w"))
    pts = counts.select(
        F.col("_c"),
        F.log(F.row_number().over(w).cast("double")).alias("_x"),
        F.log(F.col("_c").cast("double")).alias("_y"),
    )
    agg = pts.agg(
        F.count("*").alias("_n"),
        F.sum("_c").alias("_tok"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    # a 0- or 1-point fit frame has no defined regression: try_divide
    # yields NULL slope/intercept instead of an ANSI divide-by-zero
    slope = F.try_divide(
        F.col("_sxy") - F.col("_sx") * F.col("_sy") / F.col("_n"),
        F.col("_sxx") - F.col("_sx") * F.col("_sx") / F.col("_n"),
    )
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    return agg.select(
        F.col("_n").cast("long").alias("n_fit_types"),
        F.col("_tok").cast("long").alias("n_fit_tokens"),
        portable_round(slope, round_digits).alias("slope"),
        portable_round(intercept, round_digits).alias("intercept"),
    )


# --------------------------------------------------------------------
# Unicode-script census (multilingual routing signal)
# --------------------------------------------------------------------

#: (name, BMP codepoint range) per major script. The char classes are
#: built from the LITERAL endpoint characters (not \uXXXX escapes), so
#: one constant compiles identically under Java regex (Spark) and RE2
#: (DuckDB). BMP-only: Java `length` counts UTF-16 units and DuckDB
#: `len` counts codepoints — they agree exactly below U+10000.
SCRIPT_RANGES: tuple[tuple[str, int, int], ...] = (
    ("latin", 0x0041, 0x007A),       # A-z (census filters to letters)
    ("cyrillic", 0x0400, 0x04FF),
    ("greek", 0x0370, 0x03FF),
    ("arabic", 0x0600, 0x06FF),
    ("devanagari", 0x0900, 0x097F),
    ("cjk", 0x4E00, 0x9FFF),
    ("hangul", 0xAC00, 0xD7AF),
)


#: zero-width / invisible formatting characters (ZWSP, ZWNJ, ZWJ,
#: word joiner, BOM-as-ZWNBSP) — invisible to readers, identity-
#: bearing to hashers and tokenizers
ZERO_WIDTH_RE = "[​‌‍⁠﻿]"

#: characters NFKC rewrites (fixed flag set, the SQL-expressible half
#: of an NFKC audit): fullwidth ASCII forms, Latin ligatures,
#: super/subscripts, enclosed alphanumerics, letterlike symbols
NFKC_FLAG_RE = (
    "[！-～ﬀ-ﬆ²³¹"
    "⁰-ₜ①-⓿℀-⅏]"
)

#: the high-frequency homoglyph set (Unicode TR39's poster children):
#: Cyrillic а е о р с х у і and Greek omicron — letters that render
#: as Latin but hash differently
CONFUSABLE_RE = "[аеорсхуіο]"


def unicode_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unicode-normalization audit — the text-canonicalization gate
    that runs BEFORE hashing/dedup (two byte-different spellings of
    the same visible string split a dedup group and dodge a
    decontamination match): per document,

    * ``nfc_mismatch`` — text is not NFC-normal (true UAX #15 check:
      ``unicodedata.normalize`` in an Arrow-batched kernel; the
      DuckDB twin is ``nfc_normalize``),
    * ``n_zero_width`` — invisible formatting characters
      (``ZERO_WIDTH_RE``),
    * ``n_nfkc_flagged`` — characters NFKC would rewrite
      (``NFKC_FLAG_RE``; a fixed flag SET rather than a full NFKC
      pass — the documented SQL-expressible approximation, since no
      oracle-side NFKC exists),
    * ``n_confusable`` — Latin-lookalike homoglyphs
      (``CONFUSABLE_RE``),
    * ``uni_suspect`` — any of the above fired.

    The counts are exchange-free codegen (length-diff arithmetic,
    patterns shared verbatim with the twin); the NFC check is the one
    Python kernel, Arrow-batched per partition — at 100 TB the audit
    rides the corpus scan with zero shuffles.

    Output: (id, n_chars, nfc_mismatch, n_zero_width, n_nfkc_flagged,
    n_confusable, uni_suspect).
    """
    from pyspark.sql.functions import pandas_udf

    def _kernel(s):  # pd.Series -> pd.Series; call-form udf so the
        import unicodedata  # module never hard-imports pandas

        return s.map(
            lambda x: x is not None
            and unicodedata.normalize("NFC", x) != x
        )

    _nfc_mismatch = pandas_udf(_kernel, "boolean")

    t = F.col(text_col)
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        _nfc_mismatch(t).alias("nfc_mismatch"),
        _count_re_expr(t, ZERO_WIDTH_RE).alias("n_zero_width"),
        _count_re_expr(t, NFKC_FLAG_RE).alias("n_nfkc_flagged"),
        _count_re_expr(t, CONFUSABLE_RE).alias("n_confusable"),
    )
    return out.withColumn(
        "uni_suspect",
        F.col("nfc_mismatch")
        | (F.col("n_zero_width") > 0)
        | (F.col("n_nfkc_flagged") > 0)
        | (F.col("n_confusable") > 0),
    )


def unicode_normalize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text",
) -> DataFrame:
    """The APPLY step paired with :func:`unicode_audit` — the text
    canonicalization every hashing/dedup stage should run behind:
    strip zero-width/invisible characters (``ZERO_WIDTH_RE``), then
    NFC-normalize (true UAX #15, Arrow-batched ``unicodedata``
    kernel; the DuckDB twin is ``nfc_normalize``). NFKC rewriting and
    homoglyph folding are deliberately NOT applied — they are lossy
    (fullwidth forms and ligatures are sometimes meaning-bearing);
    the audit surfaces them for routing instead.

    The strip is exchange-free codegen; the NFC pass is the one
    Python kernel, Arrow-batched — a narrow map riding the corpus
    scan at 100 TB.

    Output: input columns with *out_col* replaced + ``norm_changed``
    (the text was rewritten at all) and ``n_norm_delta`` (signed
    code-point length change, pre − post; positive for stripped
    zero-widths and compositions, negative for the rare
    composition-excluded NFC expansions).
    """
    from pyspark.sql.functions import pandas_udf

    def _kernel(s):  # pd.Series -> pd.Series; call-form udf so the
        import unicodedata  # module never hard-imports pandas

        return s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        )

    _nfc = pandas_udf(_kernel, "string")

    stripped = F.regexp_replace(F.col(text_col), ZERO_WIDTH_RE, "")
    out = (
        df.withColumn("_pre_len", F.length(text_col))
        .withColumn("_pre_txt", F.col(text_col))
        .withColumn(out_col, _nfc(stripped))
    )
    return (
        out.withColumn(
            "norm_changed", F.col(out_col) != F.col("_pre_txt")
        )
        .withColumn(
            "n_norm_delta",
            (F.col("_pre_len") - F.length(out_col)).cast("long"),
        )
        .drop("_pre_len", "_pre_txt")
    )


def script_char_class(name: str) -> str:
    """Regex character class matching *name*'s codepoint range —
    literal endpoints, shared verbatim by both engines. Latin is
    ASCII letters only (`[A-Za-z]`), not the full 0x41–0x7A run,
    which would sweep in ``[\\]^_`` and backtick."""
    if name == "latin":
        return "[A-Za-z]"
    rng = {n: (lo, hi) for n, lo, hi in SCRIPT_RANGES}[name]
    return f"[{chr(rng[0])}-{chr(rng[1])}]"


def _count_sub_expr(t: Column, sub: str) -> Column:
    """Occurrences of literal *sub* in *t* (replace-count arithmetic,
    multi-char aware). Shared by the signal operators below."""
    return (
        (F.length(t) - F.length(F.replace(t, F.lit(sub), F.lit(""))))
        / len(sub)
    ).cast("long")


def _count_re_expr(t: Column, pat: str) -> Column:
    """Characters of *t* matching char-class *pat*."""
    return (F.length(t) - F.length(F.regexp_replace(t, pat, ""))).cast(
        "long"
    )


def _script_count_exprs(t: Column) -> dict[str, Column]:
    return {
        n: _count_re_expr(t, script_char_class(n)) for n, _, _ in SCRIPT_RANGES
    }


def _dominant_script_expr(counts: dict[str, Column]) -> Column:
    """Max-count script, earlier ``SCRIPT_RANGES`` entry wins ties,
    'und' when no script letter appears."""
    best = F.greatest(*counts.values())
    dom = F.lit("und")
    for name, _, _ in reversed(SCRIPT_RANGES):
        dom = F.when(counts[name] == best, F.lit(name)).otherwise(dom)
    return F.when(best == 0, F.lit("und")).otherwise(dom)


def _enc_suspect_expr(t: Column) -> Column:
    """encoding_audit's quarantine flag as one boolean expression."""
    repl = _count_sub_expr(t, "�")
    ctrl = _count_re_expr(t, CONTROL_CHAR_RE)
    moji = sum(
        (_count_sub_expr(t, m) for m in MOJIBAKE_MARKERS[1:]),
        _count_sub_expr(t, MOJIBAKE_MARKERS[0]),
    )
    return (repl > 0) | (ctrl > 0) | (moji > 0)


def script_census(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Unicode-script census — the routing signal a
    multilingual curation pipeline computes before language-specific
    stages (tokenizer choice, langid model family, script-specific
    quality rules): per script, the count of characters in that
    script's BMP range, plus the dominant script (max count, earlier
    ``SCRIPT_RANGES`` entry wins ties, 'und' when no script letter
    appears) and the non-Latin letter fraction in ppm fixed-point.

    One exchange-free whole-stage-codegen projection: each count is
    `length(t) - length(regexp_replace(t, class, ''))` over a shared
    literal char class — at 100 TB this is a narrow map over the
    corpus scan with zero shuffles, like `encoding_audit`.

    Output: (id, n_chars, <one count per script>, script_letters,
    non_latin_ppm, dominant_script).
    """
    t = F.col(text_col)
    counts = _script_count_exprs(t)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    non_latin = total - counts["latin"]
    dom = _dominant_script_expr(counts)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        *[counts[n].alias(n) for n, _, _ in SCRIPT_RANGES],
        total.alias("script_letters"),
        F.when(total > 0, F.floor(non_latin * 1_000_000 / total))
        .otherwise(F.lit(0)).cast("long").alias("non_latin_ppm"),
        dom.alias("dominant_script"),
    )


# --------------------------------------------------------------------
# Code-document detection (symbol-density heuristic)
# --------------------------------------------------------------------

#: structural code punctuation counted by the symbol census
CODE_SYMBOL_RE = "[{}();=<>\\[\\]]"

#: language-keyword unigrams counted as whole regex matches; the
#: trailing space anchors each to a real token boundary (and keeps
#: the pattern identical under Java regex and RE2)
CODE_KEYWORD_RE = (
    "(def |return |import |function |class |const |var |void |public )"
)


def _code_signal_exprs(t: Column) -> dict[str, Column]:
    """The code-detection signal set as named expressions (shared by
    code_signals and curation_route)."""
    braces = _count_sub_expr(t, "{") + _count_sub_expr(t, "}")
    semis = _count_sub_expr(t, ";")
    kw = F.regexp_count(t, F.lit(CODE_KEYWORD_RE)).cast("long")
    n_chars = F.length(t).cast("long")
    sym_ppm = (
        F.when(
            n_chars > 0,
            F.floor(_count_re_expr(t, CODE_SYMBOL_RE) * 1_000_000 / n_chars),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    is_code = ((kw >= 2) & ((braces + semis) >= 2)) | (sym_ppm > 30_000)
    return {
        "n_chars": n_chars,
        "braces": braces,
        "semis": semis,
        "kw_hits": kw,
        "symbol_ppm": sym_ppm,
        "is_code": is_code,
    }


def code_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document code-detection signals — the curation gate that
    routes program text away from prose-quality filters (Gopher rules
    would reject most source files) and toward code-specific dedup:
    brace/semicolon censuses, language-keyword hits
    (``CODE_KEYWORD_RE``), structural-symbol density in ppm
    (``CODE_SYMBOL_RE`` chars / total chars), and the ``is_code``
    flag: ≥2 keyword hits with ≥2 braces-or-semicolons, OR symbol
    density above 3%.

    Same scale shape as `script_census`: one exchange-free codegen
    projection — literal replace-count arithmetic plus two
    regexp_count calls, a narrow map at 100 TB.

    Output: (id, n_chars, braces, semis, kw_hits, symbol_ppm,
    is_code).
    """
    e = _code_signal_exprs(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[e[k].alias(k) for k in (
            "n_chars", "braces", "semis", "kw_hits", "symbol_ppm", "is_code"
        )],
    )


#: routing priority: corrupt bytes quarantine first (nothing
#: downstream should see them), then program text, then non-Latin
#: (script-specific pipeline), then default prose
CURATION_ROUTES = ("quarantine", "code", "nonlatin", "prose")


def curation_route(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The signal layer FUSED into one routing decision: encoding
    quarantine (``_enc_suspect_expr``), code detection
    (``_code_signal_exprs``), and dominant-script census
    (``_script_count_exprs``) evaluated together in a SINGLE
    whole-stage-codegen projection — no joins between signal
    operators, no second pass over text. At 100 TB the entire
    routing layer rides the corpus scan: zero exchanges, one read.

    Routes (priority order, ``CURATION_ROUTES``): 'quarantine' when
    any byte-corruption signal fires, else 'code' for program text,
    else 'nonlatin' when the dominant script is neither Latin nor
    'und' (script-specific downstream pipeline), else 'prose'.

    Output: (id, *keep_cols, enc_suspect, is_code, dominant_script,
    route).
    """
    t = F.col(text_col)
    enc = _enc_suspect_expr(t)
    code = _code_signal_exprs(t)["is_code"]
    dom = _dominant_script_expr(_script_count_exprs(t))
    route = (
        F.when(enc, F.lit("quarantine"))
        .when(code, F.lit("code"))
        .when(~dom.isin("latin", "und"), F.lit("nonlatin"))
        .otherwise(F.lit("prose"))
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        enc.alias("enc_suspect"),
        code.alias("is_code"),
        dom.alias("dominant_script"),
        route.alias("route"),
    )
