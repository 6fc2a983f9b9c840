"""BPE tokenizer training / encoding (operators/tokenizer.py).

Reference analogue: the reference pipeline counts tokens ahead of
training-batch assembly; BPE merge learning is the vocabulary step
that precedes that counting in an LLM data pipeline. Semantics follow
Sennrich et al. 2016 (vocabulary-level BPE).
"""

from __future__ import annotations

from etl_finance_pipeline_spark.operators.tokenizer import bpe_encode, bpe_train


def _train(spark, rows, n_merges):
    df = spark.createDataFrame([(t,) for t in rows], ["text"])
    return bpe_train(df, n_merges=n_merges).collect()


def test_bpe_learns_most_frequent_pair_first(spark):
    # "ab" occurs 3x in "abab abc" words: abab has (a,b)x2,(b,a)x1; abc (a,b)
    out = _train(spark, ["abab abc abab"], 1)
    assert len(out) == 1
    r = out[0]
    assert (r["left_sym"], r["right_sym"], r["merged"]) == ("a", "b", "ab")
    # abab contributes 2 positions x 2 occurrences, abc 1 -> 5
    assert r["pair_count"] == 5


def test_bpe_merged_symbol_participates_in_later_rounds(spark):
    # After merging (l,o)->lo, round 2 should see pair (lo, w) etc.
    out = _train(spark, ["low low low lower lowest"], 3)
    merges = [(r["left_sym"], r["right_sym"]) for r in out]
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # round 3 works on "low" as one symbol
    assert out[2]["left_sym"] == "low"


def test_bpe_non_overlapping_left_to_right(spark):
    # "aaa": pairs (a,a) at 2 positions per word; replace is
    # non-overlapping left-to-right so "aaa" -> (aa)(a), count=2
    out = _train(spark, ["aaa aaa"], 2)
    assert (out[0]["left_sym"], out[0]["right_sym"]) == ("a", "a")
    assert out[0]["pair_count"] == 4  # 2 positions x 2 occurrences
    # round 2: words are now [aa, a]; best pair (aa, a)
    assert (out[1]["left_sym"], out[1]["right_sym"]) == ("aa", "a")


def test_bpe_deterministic_tiebreak(spark):
    # "ab" and "cd" both occur once: tie broken by (l, r) ascending
    out = _train(spark, ["ab cd"], 1)
    assert (out[0]["left_sym"], out[0]["right_sym"]) == ("a", "b")


def test_bpe_stops_early_when_no_pairs(spark):
    # single-char words -> no adjacent pairs at all
    out = _train(spark, ["a b c a"], 4)
    assert out == []


def test_bpe_encode_applies_merges_in_order(spark):
    df = spark.createDataFrame([(1, "lower low l")], ["doc_id", "text"])
    out = bpe_encode(df, [("l", "o"), ("lo", "w"), ("low", "e")]).collect()[0]
    assert out["bpe_tokens"] == ["lowe", "r", "low", "l"]


def test_bpe_encode_roundtrip_with_trained_merges(spark):
    corpus = ["the cat sat on the mat", "the bat and the cat"]
    df = spark.createDataFrame([(t,) for t in corpus], ["text"])
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(df, n_merges=4).collect()
    ]
    enc = bpe_encode(df.withColumn("doc_id", df.text.substr(1, 1)), merges)
    for row in enc.collect():
        # concatenating symbols restores the whitespace-stripped text
        assert "".join(row["bpe_tokens"]) == "".join(row["text"].lower().split())


def test_bpe_train_batched_rounds_match_sequential_when_disjoint(spark):
    """With mutually disjoint top pairs, K merges per round must learn
    the same table as K=1 (counts are invariant under disjoint merges
    within a round)."""
    from etl_finance_pipeline_spark.operators.tokenizer import bpe_train

    df = spark.createDataFrame(
        [("aa bb aa bb cc dd",), ("aa bb cc dd ee",), ("aa ee",)],
        ["text"],
    )
    seq = [tuple(r) for r in bpe_train(df, n_merges=4).collect()]
    bat = [tuple(r) for r in bpe_train(df, n_merges=4, merges_per_round=4).collect()]
    # pairs (a,a), (b,b), (c,c), (d,d) are disjoint -> identical tables
    assert seq == bat
    assert len(seq) == 4


def test_bpe_train_batched_skips_interacting_pairs(spark):
    """A candidate sharing a symbol with an earlier acceptance in the
    round is deferred, never merged on stale counts."""
    from etl_finance_pipeline_spark.operators.tokenizer import bpe_train

    # 'ab' dominates; 'bc' shares symbol b -> must wait a round
    df = spark.createDataFrame([("ab ab ab abc bc",)], ["text"])
    out = bpe_train(df, n_merges=2, merges_per_round=2).collect()
    assert out[0]["left_sym"] == "a" and out[0]["right_sym"] == "b"
    # second merge happened (in a later round), on fresh counts
    assert len(out) == 2 and out[1]["merge_round"] == 2


def test_unigram_train_vocab_structure(spark):
    """Seed = every single char + top-N multi-char pieces; costs are
    -ln(count/total) rounded portably; EM keeps coverage (every char
    stays in the vocabulary with a finite cost)."""
    import math

    from etl_finance_pipeline_spark.operators.tokenizer import unigram_train

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ate the hat",)], ["text"]
    )
    out = {r["piece"]: r for r in unigram_train(df, n_multi=6, iters=2).collect()}
    chars = {c for c in "thecatsonm " if c != " "}
    assert chars <= set(out)  # all single chars kept
    multi = [p for p in out if len(p) > 1]
    assert 0 < len(multi) <= 6 and all(len(p) <= 4 for p in multi)
    # frequent whole words win low costs; costs are finite and positive
    assert "the" in out
    assert all(0 < r["cost"] < 25 for r in out.values())
    # counts are the final Viterbi counts: 'the' appears 4x
    assert out["the"]["piece_count"] == 4
    # cost is portably rounded to 6 decimals
    for r in out.values():
        assert abs(r["cost"] * 1e6 - round(r["cost"] * 1e6)) < 1e-6


def test_unigram_segment_optimality_and_coverage(spark):
    """Viterbi picks the cheapest segmentation: a word equal to one
    low-cost piece segments as ONE piece, never chars; per-doc piece
    counts and costs aggregate over words; words over the length cap
    are skipped."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        unigram_segment,
        unigram_train,
    )

    df = spark.createDataFrame(
        [(1, "abab abab abab"), (2, "abab x " + "y" * 40)], ["doc_id", "text"]
    )
    vocab = unigram_train(df, n_multi=4, iters=2)
    vp = {r["piece"] for r in vocab.collect()}
    assert "abab" in vp  # dominant substring seeded and kept
    seg = {r["doc_id"]: r for r in unigram_segment(df, vocab).collect()}
    # doc 1: three words, each one piece
    assert seg[1]["n_pieces"] == 3
    # doc 2: the 41-char word is skipped by the length cap; only
    # 'abab' (1 piece) + 'x' (1 piece) remain
    assert seg[2]["n_pieces"] == 2
    # segmentation cost of doc1 = 3 * cost('abab')
    cost_abab = next(r["cost"] for r in vocab.collect() if r["piece"] == "abab")
    assert abs(seg[1]["total_cost"] - 3 * cost_abab) < 1e-5


def test_unigram_prune_keeps_chars_and_top_used(spark):
    """prune_to keeps every single char plus the most-USED multi-char
    pieces; the post-prune EM round re-normalizes so probabilities
    sum to ~1 over the survivors' final counts."""
    import math

    from etl_finance_pipeline_spark.operators.tokenizer import unigram_train

    df = spark.createDataFrame(
        [("the cat the cat abab abab",), ("the cat abab xyz",)], ["text"]
    )
    full = {r["piece"]: r for r in unigram_train(df, n_multi=10, iters=2).collect()}
    chars = {p for p in full if len(p) == 1}
    target = len(chars) + 2
    pruned = {
        r["piece"]: r
        for r in unigram_train(
            df, n_multi=10, iters=2, prune_to=target
        ).collect()
    }
    assert chars <= set(pruned)  # coverage never pruned
    multi = [p for p in pruned if len(p) > 1]
    assert len(multi) == 2
    # survivors are the most-used multi-char pieces of the full run
    used = sorted(
        (p for p in full if len(p) > 1),
        key=lambda p: (-full[p]["piece_count"], p),
    )[:2]
    assert sorted(multi) == sorted(used)
    # post-prune re-normalization: counted pieces' probs sum to ~1
    probs = sum(
        math.exp(-r["cost"]) for r in pruned.values() if r["piece_count"] > 0
    )
    assert abs(probs - 1.0) < 1e-3


def test_wordpiece_diverges_from_bpe_on_likelihood(spark):
    """WordPiece ranks merges by count(ab)/(count(a)count(b)): a rare
    pair of RARE symbols beats a frequent pair of ubiquitous ones —
    the case where BPE and WordPiece pick opposite first merges."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        bpe_train,
        wordpiece_train,
    )

    # 'ab' occurs 5x but a,b are everywhere (8 each: 1/64 density);
    # 'qz' occurs once with q,z unique (1/1 density)
    df = spark.createDataFrame([("abab abab ab a b a b a b qz",)], ["text"])
    bpe_first = bpe_train(df, n_merges=1).collect()[0]
    wp = wordpiece_train(df, n_merges=2).collect()
    assert (bpe_first["left_sym"], bpe_first["right_sym"]) == ("a", "b")
    assert (wp[0]["left_sym"], wp[0]["right_sym"]) == ("q", "z")
    assert (wp[0]["pair_count"], wp[0]["left_count"], wp[0]["right_count"]) == (1, 1, 1)
    # next round: qz merged away, a-b wins on likelihood among the rest
    assert (wp[1]["left_sym"], wp[1]["right_sym"]) == ("a", "b")
    assert wp[1]["left_count"] == 8 and wp[1]["right_count"] == 8


def test_wordpiece_merged_symbol_in_later_rounds(spark):
    """A merged symbol's count feeds later likelihood scores, and the
    merged pair participates like any symbol (BPE-style chaining)."""
    from etl_finance_pipeline_spark.operators.tokenizer import wordpiece_train

    out = wordpiece_train(
        spark.createDataFrame([("low low low",)], ["text"]), n_merges=2
    ).collect()
    # all pairs have unique-symbol density; ties break (l, r) asc
    assert (out[0]["left_sym"], out[0]["right_sym"]) == ("l", "o")
    assert (out[1]["left_sym"], out[1]["right_sym"]) == ("lo", "w")


def test_wordpiece_encode_greedy_longest_match(spark):
    """Greedy longest-match-first: with vocab {ab, abc}, 'abcab'
    segments abc|ab (2 pieces), never ab|c|ab; a word with no vocab
    hits falls back to single characters."""
    from etl_finance_pipeline_spark.operators.tokenizer import wordpiece_encode

    merges = spark.createDataFrame(
        [(1, "a", "b", "ab"), (2, "ab", "c", "abc")],
        ["merge_round", "left_sym", "right_sym", "merged"],
    )
    docs = spark.createDataFrame(
        [(1, "abcab ab xyz"), (2, "abc abcabc")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in wordpiece_encode(docs, merges).collect()}
    # doc 1: abcab -> abc|ab (2), ab -> ab (1), xyz -> x|y|z (3)
    assert (out[1]["n_words"], out[1]["n_pieces"]) == (3, 6)
    # doc 2: abc -> abc (1), abcabc -> abc|abc (2)
    assert (out[2]["n_words"], out[2]["n_pieces"]) == (2, 3)


def test_wordpiece_encode_matches_trained_vocab_roundtrip(spark):
    """Encoding the training corpus with its own trained vocab uses
    the merged pieces: piece counts strictly drop versus the
    character count wherever a merge applies."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        wordpiece_encode,
        wordpiece_train,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest widest")], ["doc_id", "text"]
    )
    merges = wordpiece_train(docs, n_merges=3)
    out = {r["doc_id"]: r for r in wordpiece_encode(docs, merges).collect()}
    chars = {1: len("lowlowlowlower"), 2: len("newestwidest")}
    assert out[1]["n_pieces"] < chars[1]
    assert out[1]["n_words"] == 4 and out[2]["n_words"] == 2


def test_bpe_byte_level_no_oov_roundtrip(spark):
    """Byte-level seeding: symbols are uppercase hex pairs of UTF-8
    bytes; the emitted symbols always reassemble to the exact input
    bytes — including a multi-byte code point the trainer never saw
    (the structural no-OOV property word/char-level BPE lacks)."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        bpe_train,
    )

    train = spark.createDataFrame([("abab abab cd",)], ["text"])
    merges_df = bpe_train(train, n_merges=2, byte_level=True)
    ms = [
        (r["left_sym"], r["right_sym"])
        for r in merges_df.orderBy("merge_round").collect()
    ]
    # most frequent adjacent byte pair is 'a','b' -> hex 61+62
    assert ms[0] == ("61", "62")
    eval_df = spark.createDataFrame([("abab x€",)], ["text"])  # € unseen
    out = bpe_encode(eval_df, ms, byte_level=True).collect()[0]["bpe_tokens"]
    hexdig = set("0123456789ABCDEF")
    assert all(len(t) % 2 == 0 and set(t) <= hexdig for t in out)
    # whitespace-tokenized words concatenate: "abab" + "x€"
    assert bytes.fromhex("".join(out)).decode("utf-8") == "ababx€"
    # merges compress: round 1 learned 61+62, round 2 learned
    # 6162+6162, so "abab" is ONE symbol; €'s three unseen bytes
    # pass through as base symbols
    assert out == ["61626162", "78", "E2", "82", "AC"]
