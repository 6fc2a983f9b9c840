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


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 6,
    merges_per_round: int = 1,
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
        F.array_join(
            F.transform(
                F.split("w", ""),
                lambda c: F.concat(F.lit(_L), c, F.lit(_R)),
            ),
            "",
        ).alias("s"),
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
) -> DataFrame:
    """Apply a learned merge table: tokenize each document's words
    with the trained BPE vocabulary (merges applied in training
    order) and emit the symbol array per document. A narrow,
    exchange-free map — the merge table compiles into a chain of
    ``replace`` expressions over the unit-string encoding."""
    word_units = F.transform(
        tokens(text_col),
        lambda w: F.array_join(
            F.transform(
                F.split(w, ""), lambda c: F.concat(F.lit(_L), c, F.lit(_R))
            ),
            "",
        ),
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
