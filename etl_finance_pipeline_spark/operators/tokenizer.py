"""In-engine BPE tokenizer training — learn a byte-pair-encoding merge
table from the corpus itself (Sennrich et al. 2016), the vocabulary
step every LLM data pipeline runs before token counting / packing.

Vocabulary-level BPE: the corpus is touched ONCE (word-count
aggregate); every merge round then works on the distinct-word frame,
whose size is corpus-size-independent (Zipf-bounded vocabulary), so
training cost does not grow with corpus bytes after the first pass.

Determinism / oracle strategy: word symbol sequences are encoded as
"unit strings" — each symbol wrapped as ``\\x01sym\\x02`` — so one
merge round is a plain left-to-right non-overlapping string
``replace`` of ``\\x01a\\x02\\x01b\\x02`` with ``\\x01ab\\x02``.
Spark's ``replace`` and DuckDB's ``replace`` share those semantics
exactly, which lets the DuckDB oracle unroll identical rounds and
hash-match the merge table (same device as the unrolled-Lloyd kmeans
oracle). The delimiter pair cannot collide mid-symbol the way a
single separator would (a pattern starting at a symbol suffix fails
the leading ``\\x01`` check), and each unit carries its own trailing
delimiter so consecutive matches never fight over a shared boundary
character.

Scale shape (100 TB): one corpus pass (explode → map-side-combined
word count); per round one vocab-frame pair-explode + one
map-side-combinable (left, right) sum + one global top-1
(TakeOrderedAndProject — never a single-partition window); the driver
sees exactly one row per round (control flow, not a data path).
Lineage is truncated per round like the other iterative operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.text import tokens

_L = "\x01"
_R = "\x02"


def _word_units(w, byte_level: bool):
    """A word's initial unit-string: every base symbol wrapped as
    ``\\x01sym\\x02``. Char-level: one symbol per character.
    Byte-level (GPT-2 lineage, Radford et al. 2019): one symbol per
    UTF-8 BYTE, rendered as its uppercase two-hex-digit pair — a
    closed 256-symbol base alphabet, so encoding can NEVER go out of
    vocabulary (the hex rendering keeps the symbols printable and
    engine-portable; DuckDB twin: ``upper(hex(encode(w)))`` split
    into pairs)."""
    if byte_level:
        syms = F.regexp_extract_all(
            F.upper(F.hex(F.encode(w, "UTF-8"))), F.lit("(..)"), 1
        )
    else:
        syms = F.split(w, "")
    return F.array_join(
        F.transform(syms, lambda c: F.concat(F.lit(_L), c, F.lit(_R))), ""
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    merges_per_round: int = 1,
    byte_level: bool = False,
) -> DataFrame:
    """Learn *n_merges* BPE merges from the corpus.

    Per round the most frequent adjacent symbol pair (occurrences
    weighted by word frequency, counted per position) is merged in
    every word, with deterministic tiebreak (count desc, left asc,
    right asc). Stops early if no pair occurs at all.

    ``merges_per_round`` batches driver rounds for real vocab sizes:
    each round accepts up to K of the top-ranked pairs that are
    mutually NON-overlapping (no symbol of an accepted pair may equal
    a symbol — left, right, or merged — of an earlier acceptance in
    the round), then applies all K replaces in one vocab pass. A
    disjoint pair's count is invariant under the other merges of its
    round (a merge only perturbs pairs sharing one of its symbols),
    so every recorded (pair, count) is exact; what changes vs K=1 is
    only the GREEDY SCHEDULE — newly-formed symbols (ab, c) can't win
    until the next round. 30k merges then need ~30k/K corpus-vocab
    passes instead of 30k. K=1 (default) reproduces classic BPE
    exactly and is what the oracle checks.

    ``byte_level=True`` seeds the walk from UTF-8 BYTES (hex-pair
    symbols, :func:`_word_units`) instead of characters — the GPT-2
    no-OOV base alphabet; the merge mechanics are identical.

    Output: (merge_round, left_sym, right_sym, merged, pair_count) —
    one row per learned merge, ``merge_round`` starting at 1.
    """
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    units = words.select(
        _word_units(F.col("w"), byte_level).alias("s"),
        "wc",
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        k = min(merges_per_round, n_merges - len(merges))
        syms = units.select(
            F.split(
                F.expr("substring(s, 2, length(s) - 2)"), _R + _L
            ).alias("_syms"),
            "wc",
        )
        pairs = (
            syms.select(
                F.explode(
                    F.when(F.size("_syms") < 2, F.array()).otherwise(
                        F.expr(
                            "transform(sequence(1, size(_syms) - 1), i -> "
                            "struct(element_at(_syms, i) AS l, "
                            "element_at(_syms, i + 1) AS r))"
                        )
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("cnt"))
        )
        # over-fetch so the non-overlap filter can still fill K slots
        # (TakeOrderedAndProject either way — never a global sort)
        cand = pairs.orderBy(
            F.col("cnt").desc(), F.col("l"), F.col("r")
        ).limit(4 * k + 4).collect()
        if not cand:
            break
        taken: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in cand:
            if len(taken) == k:
                break
            left, right = row["l"], row["r"]
            if used & {left, right, left + right}:
                continue  # interacts with an earlier merge this round
            taken.append((left, right, int(row["cnt"])))
            used |= {left, right, left + right}
        s = F.col("s")
        for left, right, cnt in taken:
            merges.append(
                (len(merges) + 1, left, right, left + right, cnt)
            )
            s = F.replace(
                s,
                F.lit(_L + left + _R + _L + right + _R),
                F.lit(_L + left + right + _R),
            )
        units = units.withColumn("s", s).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    byte_level: bool = False,
) -> DataFrame:
    """Apply a learned merge table: tokenize each document's words
    with the trained BPE vocabulary (merges applied in training
    order) and emit the symbol array per document. A narrow,
    exchange-free map — the merge table compiles into a chain of
    ``replace`` expressions over the unit-string encoding.
    ``byte_level`` must match how the table was trained."""
    word_units = F.transform(
        tokens(text_col), lambda w: _word_units(w, byte_level)
    )
    df = df.withColumn("_units", word_units)

    def _apply_merge(pat: str, rep: str):
        return lambda u: F.replace(u, F.lit(pat), F.lit(rep))

    col = F.col("_units")
    for left, right in merges:
        pat = _L + left + _R + _L + right + _R
        rep = _L + left + right + _R
        col = F.transform(col, _apply_merge(pat, rep))
    toks_out = F.flatten(
        F.transform(
            col,
            lambda u: F.split(u.substr(F.lit(2), F.length(u) - 2), _R + _L),
        )
    )
    return df.withColumn(out_col, toks_out).drop("_units")


# ---------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer training — Kudo 2018,
# "Subword Regularization": the other mainstream vocabulary algorithm
# next to BPE. Pieces carry unigram log-probabilities; a word's
# tokenization is the max-probability segmentation (Viterbi over the
# piece lattice).
#
# This trainer runs hard-EM (Viterbi-EM) over the Zipf-bounded
# distinct-word frame, the same corpus-size-independence device as
# bpe_train: one corpus pass builds (word, count); every EM round then
# touches only the vocab frame. Determinism mirrors the unrolled-Lloyd
# kmeans contract — fixed seed vocabulary (all ≤max_piece_len
# substrings: every single char, plus the top multi-char pieces by
# (count desc, piece asc)), fixed iteration count, per-round portable
# rounding of -ln(p), DP ties broken toward the smaller split point,
# and pieces unseen in a round carrying their previous cost (the
# "empty codes keep their codeword" device) — so a DuckDB oracle can
# unroll the identical rounds positionally and hash-match the table.
# ---------------------------------------------------------------------

#: Cost of a substring absent from the vocabulary. Large enough that
#: no real path uses it (corpus costs are < ~20 nats/piece), small
#: enough that the arithmetic stays exact in any engine.
_UNI_MISS = 1.0e9


def _uni_words(df: DataFrame, text_col: str, max_word_len: int) -> DataFrame:
    """(w, wc): distinct whitespace words with corpus counts, capped
    at *max_word_len* chars (the SentencePiece-style max-length
    training filter — the positional oracle unroll is bounded by the
    same cap)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )


def _uni_dp(L: int):
    """Viterbi DP over one word against the broadcast cost map
    ``_costs``: returns an array column dp[0..n] of [cost, j] pairs —
    dp[i] = cheapest segmentation cost of the first i chars, j = the
    split point it came from. Candidates are the pieces of length
    1..min(L, i) ending at i; argmin via lexicographic array_min over
    [cost, j], so equal costs break toward the smaller j in any
    engine."""

    def inner(acc, i):
        return F.concat(
            acc,
            F.array(
                F.array_min(
                    F.transform(
                        F.sequence(F.lit(1), F.least(F.lit(L), i)),
                        lambda l: F.array(
                            F.element_at(F.element_at(acc, i - l + 1), 1)
                            + F.coalesce(
                                F.element_at(
                                    F.col("_costs"),
                                    F.col("w").substr(i - l + F.lit(1), l),
                                ),
                                F.lit(_UNI_MISS),
                            ),
                            (i - l).cast("double"),
                        ),
                    )
                )
            ),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.array(F.array(F.lit(0.0), F.lit(-1.0))),
        inner,
    )


def _uni_backtrack():
    """Walk ``_dp`` from position n back to 0, collecting the piece
    substrings of the optimal segmentation (emitted end-first; order
    is irrelevant to counting). n no-op steps once pos hits 0 — an
    aggregate cannot early-exit, and n is ≤ the word-length cap."""
    j_at = lambda pos: F.element_at(  # noqa: E731
        F.element_at(F.col("_dp"), pos + 1), 2
    ).cast("int")

    def step(acc, _i):
        j = j_at(acc["pos"])
        return F.when(acc["pos"] <= F.lit(0), acc).otherwise(
            F.struct(
                j.alias("pos"),
                F.concat(
                    acc["ps"],
                    F.array(F.col("w").substr(j + 1, acc["pos"] - j)),
                ).alias("ps"),
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length("w")),
        F.struct(
            F.length("w").cast("int").alias("pos"),
            F.expr("CAST(array() AS array<string>)").alias("ps"),
        ),
        step,
    )["ps"]


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    n_multi: int = 48,
    iters: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    round_digits: int = 6,
    prune_to: int | None = None,
) -> DataFrame:
    """Train a unigram-LM vocabulary: seed with every single char plus
    the *n_multi* most frequent multi-char substrings (length ≤
    *max_piece_len*), initialize piece costs -ln(count/total), then
    *iters* rounds of Viterbi-EM — E: segment every distinct word by
    cheapest path; M: re-estimate costs from the segmentation counts
    (word-count weighted). Single chars are always in the vocabulary,
    so every word has a finite path.

    *prune_to* adds the SentencePiece-style vocabulary shrink step:
    after the EM rounds, keep every single char plus the most-USED
    multi-char pieces (final Viterbi count desc, piece asc) up to the
    target size, then run one more EM round so the survivors'
    probabilities re-normalize over the pruned lattice. (Greedy
    usage-based pruning — the deterministic counterpart of
    SentencePiece's likelihood-loss prune, which needs soft
    alternative-segmentation mass this hard-EM trainer does not
    compute.)

    Scale shape (100 TB): one corpus pass for the word counts; per EM
    round one vocab-frame DP pass (the cost table broadcasts as a
    1-row map, so all rounds reuse one compiled plan) and one
    map-side-combinable count aggregate; the driver holds only the
    vocab-sized cost table between rounds.

    Output: (piece, cost, piece_count) — final per-piece -ln p rounded
    to *round_digits*, and the final round's Viterbi count (0 for
    pieces unused in the last segmentation, which keep their previous
    cost).
    """
    import math

    spark = df.sparkSession
    scale = 10.0 ** round_digits
    words = _uni_words(df, text_col, max_word_len).localCheckpoint(eager=True)

    # seed counts: every substring of length 1..max_piece_len, with
    # multiplicity, weighted by word count
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length("w") - i + 1)
                ),
                lambda l: F.col("w").substr(i, l),
            ),
        )
    )
    seed = (
        words.select(F.explode(spans).alias("piece"), "wc")
        .groupBy("piece")
        .agg(F.sum("wc").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    chars = seed.filter(F.length("piece") == 1).collect()
    multi = (
        seed.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(n_multi)
        .collect()
    )
    counts = {r["piece"]: int(r["cnt"]) for r in chars}
    counts.update({r["piece"]: int(r["cnt"]) for r in multi})
    total = sum(counts.values())
    costs = {
        p: math.floor(-math.log(c / total) * scale + 0.5) / scale
        for p, c in counts.items()
    }

    def _em_round(cur: dict[str, float]) -> tuple[dict[str, float], dict[str, int]]:
        cdf = spark.createDataFrame([(cur,)], "_costs map<string,double>")
        # dp materialized BEFORE the backtrack consumes it (the
        # backtrack references the dp array once per walk step)
        dpf = (
            words.crossJoin(F.broadcast(cdf))
            .select("w", "wc", _uni_dp(max_piece_len).alias("_dp"))
            .localCheckpoint(eager=True)
        )
        segs = dpf.select("wc", F.explode(_uni_backtrack()).alias("piece"))
        rows = segs.groupBy("piece").agg(F.sum("wc").alias("cnt")).collect()
        cnts = {r["piece"]: int(r["cnt"]) for r in rows}
        rtotal = sum(cnts.values())
        # M-step: seen pieces get -ln(cnt/total); unseen keep cost
        return {
            p: (
                math.floor(-math.log(cnts[p] / rtotal) * scale + 0.5) / scale
                if p in cnts
                else cur[p]
            )
            for p in cur
        }, cnts

    last_counts: dict[str, int] = {}
    for _ in range(iters):
        costs, last_counts = _em_round(costs)

    if prune_to is not None:
        n_chars = sum(1 for p in costs if len(p) == 1)
        n_keep = max(0, prune_to - n_chars)
        survivors = sorted(
            (p for p in costs if len(p) > 1),
            key=lambda p: (-last_counts.get(p, 0), p),
        )[:n_keep]
        keep = {p for p in costs if len(p) == 1} | set(survivors)
        costs = {p: c for p, c in costs.items() if p in keep}
        # survivors' probabilities re-normalize over the pruned lattice
        costs, last_counts = _em_round(costs)

    out = [
        (p, costs[p], last_counts.get(p, 0)) for p in sorted(costs)
    ]
    return spark.createDataFrame(
        out, "piece string, cost double, piece_count bigint"
    )


def unigram_segment(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    max_word_len: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """Tokenize a corpus with a trained unigram vocabulary: per
    document, Viterbi-segment each (length-capped) word and aggregate
    piece count and total cost. The DP runs once per DISTINCT word
    (vocab-frame work), then joins back to the document word list —
    the corpus never carries the lattice.

    Output: (id, n_pieces, total_cost) — total_cost portably rounded.
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    spark = df.sparkSession
    costs = {r["piece"]: float(r["cost"]) for r in vocab.collect()}
    cdf = spark.createDataFrame([(costs,)], "_costs map<string,double>")

    doc_words = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
    words = doc_words.select("w").distinct()
    dpf = (
        words.crossJoin(F.broadcast(cdf))
        .select("w", _uni_dp(max_piece_len).alias("_dp"))
        .select(
            "w",
            F.size(_uni_backtrack()).alias("_np"),
            F.element_at(F.element_at("_dp", F.length("w") + 1), 1).alias(
                "_wcost"
            ),
        )
    )
    return (
        doc_words.join(dpf, "w")
        .groupBy(id_col)
        .agg(
            F.sum("_np").cast("long").alias("n_pieces"),
            portable_round(F.sum("_wcost"), round_digits).alias("total_cost"),
        )
    )


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
) -> DataFrame:
    """WordPiece merge learning (Schuster & Nakajima 2012 — the BERT
    vocabulary algorithm): identical mechanics to :func:`bpe_train`
    (vocab-level rounds over the unit-string encoding) but each round
    merges the pair maximizing ``count(ab) / (count(a)·count(b))`` —
    the merge that most increases corpus likelihood under a unigram
    model, rather than raw pair frequency. Ties break (likelihood
    desc, left asc, right asc).

    Determinism: the score is one IEEE division of exact int64 counts
    (the product count(a)·count(b) stays integer), so any engine
    computes the identical double and the identical argmax — no
    rounding contract needed; the OUTPUT carries the three exact
    integer counts instead of the score.

    Scale shape: same as bpe_train (one corpus pass, then
    Zipf-bounded vocab-frame rounds) plus one symbol-count aggregate
    and two vocab-sized equi-joins per round.

    Output: (merge_round, left_sym, right_sym, merged, pair_count,
    left_count, right_count).
    """
    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    units = words.select(
        F.array_join(
            F.transform(
                F.split("w", ""),
                lambda c: F.concat(F.lit(_L), c, F.lit(_R)),
            ),
            "",
        ).alias("s"),
        "wc",
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int, int, int]] = []
    for _ in range(n_merges):
        syms = units.select(
            F.split(
                F.expr("substring(s, 2, length(s) - 2)"), _R + _L
            ).alias("_syms"),
            "wc",
        ).localCheckpoint(eager=True)  # feeds pair AND symbol counts
        pairs = (
            syms.select(
                F.explode(
                    F.when(F.size("_syms") < 2, F.array()).otherwise(
                        F.expr(
                            "transform(sequence(1, size(_syms) - 1), i -> "
                            "struct(element_at(_syms, i) AS l, "
                            "element_at(_syms, i + 1) AS r))"
                        )
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("cnt"))
        )
        symc = (
            syms.select(F.explode("_syms").alias("sym"), "wc")
            .groupBy("sym")
            .agg(F.sum("wc").alias("c"))
        )
        scored = (
            pairs.join(
                symc.select(F.col("sym").alias("l"), F.col("c").alias("_lc")),
                "l",
            )
            .join(
                symc.select(F.col("sym").alias("r"), F.col("c").alias("_rc")),
                "r",
            )
        )
        top = (
            scored.orderBy(
                (F.col("cnt") / (F.col("_lc") * F.col("_rc"))).desc(),
                F.col("l"),
                F.col("r"),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        left, right = row["l"], row["r"]
        merges.append(
            (
                len(merges) + 1,
                left,
                right,
                left + right,
                int(row["cnt"]),
                int(row["_lc"]),
                int(row["_rc"]),
            )
        )
        units = units.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(_L + left + _R + _L + right + _R),
                F.lit(_L + left + right + _R),
            ),
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, merged string, "
        "pair_count bigint, left_count bigint, right_count bigint",
    )


def wordpiece_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_len: int = 16,
) -> DataFrame:
    """Greedy longest-match-first WordPiece segmentation (Devlin et
    al. 2018 — BERT's tokenizer): apply a vocabulary trained by
    :func:`wordpiece_train` corpus-wide, closing the train→encode
    loop the same way ``bpe_encode_corpus`` / ``unigram_segment`` do
    for the other two tokenizers.

    Vocabulary = the ``merged`` pieces of the merge table; every
    single character is an implicit piece (identity fallback), so
    segmentation is total — no [UNK] class in this synthetic lane.
    At each position the LONGEST vocab piece that fits is consumed,
    else one character.

    The walk runs once per DISTINCT (length-capped) word as an
    unrolled ``aggregate`` against the broadcast piece map (the
    unigram_segment device), then joins back to the document word
    list — the corpus never carries the walk, and the word frame is
    Zipf-bounded, not corpus-bounded.

    Output: (id, n_words, n_pieces) — both exact int64, no rounding
    contract.
    """
    spark = df.sparkSession
    # control-plane collect: the merge table is n_merges rows
    pieces = sorted({r["merged"] for r in merges.select("merged").collect()})
    max_piece_len = max((len(p) for p in pieces), default=1)
    vdf = spark.createDataFrame(
        [({p: 1 for p in pieces},)], "_wp map<string,int>"
    )

    doc_words = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter((F.length("w") >= 1) & (F.length("w") <= max_word_len))
    words = doc_words.select("w").distinct()

    def step(acc, _i):
        rem = F.length("w") - acc["pos"] + 1
        best = F.coalesce(
            *[
                F.when(
                    (rem >= F.lit(length))
                    & F.element_at(
                        F.col("_wp"),
                        F.col("w").substr(acc["pos"], F.lit(length)),
                    ).isNotNull(),
                    F.lit(length),
                )
                for length in range(max_piece_len, 1, -1)
            ],
            F.lit(1),
        )
        return F.when(acc["pos"] > F.length("w"), acc).otherwise(
            F.struct(
                (acc["pos"] + best).alias("pos"),
                (acc["np"] + F.lit(1)).alias("np"),
            )
        )

    seg = words.crossJoin(F.broadcast(vdf)).select(
        "w",
        F.aggregate(
            F.sequence(F.lit(1), F.length("w")),
            F.struct(
                F.lit(1).cast("int").alias("pos"),
                F.lit(0).cast("int").alias("np"),
            ),
            step,
        )["np"].alias("_np"),
    )
    return (
        doc_words.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("_np").cast("long").alias("n_pieces"),
        )
    )
