"""Kneser-Ney bigram LM: hand-computed probabilities, the sum-to-one
invariant, and the foreign-model fallback lanes."""

from __future__ import annotations

import math

import pytest

from etl_finance_pipeline_spark.operators.ngram_lm import (
    kn_bigram_lm,
    kn_perplexity,
)

D = 0.75


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b"), (2, "x")], ["doc_id", "text"]
    )


def test_kn_probabilities_by_hand(spark, corpus):
    rows = {(r.w1, r.w2): r for r in kn_bigram_lm(corpus).collect()}
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1 -> 3 types
    assert set(rows) == {("a", "b"), ("b", "a"), ("b", "c")}
    ab = rows[("a", "b")]
    assert (ab.c12, ab.c1, ab.nl, ab.nr) == (3, 3, 1, 1)
    # (3-D)/3 + (D*1/3)*(1/3)
    assert ab.prob == pytest.approx((3 - D) / 3 + (D / 3) * (1 / 3), abs=1e-6)
    ba = rows[("b", "a")]
    assert (ba.c12, ba.c1, ba.nl, ba.nr) == (1, 2, 2, 1)
    assert ba.prob == pytest.approx((1 - D) / 2 + (D * 2 / 2) * (1 / 3), abs=1e-6)


def test_kn_sums_to_one_over_vocab(spark, corpus):
    """Interpolated KN is a proper distribution: for every context,
    summing the discounted mass over seen continuations plus the
    continuation-backoff mass over the WHOLE vocab gives exactly 1."""
    rows = kn_bigram_lm(corpus, round_digits=None).collect()
    bt = len(rows)
    vocab = {r.w2 for r in rows}
    nr = {r.w2: r.nr for r in rows}
    by_ctx: dict[str, list] = {}
    for r in rows:
        by_ctx.setdefault(r.w1, []).append(r)
    for w1, grp in by_ctx.items():
        c1, nl = grp[0].c1, grp[0].nl
        lam = D * nl / c1
        total = sum((r.c12 - D) / c1 for r in grp) + lam * sum(
            nr[w] / bt for w in vocab
        )
        assert total == pytest.approx(1.0, abs=1e-12), w1


def test_kn_perplexity_values(spark, corpus):
    out = {r.doc_id: r for r in kn_perplexity(corpus).collect()}
    # the 1-token doc has no bigrams and is omitted
    assert set(out) == {0, 1}
    assert out[0].n_bigrams == 4
    assert out[1].n_bigrams == 1
    p_ab = (3 - D) / 3 + (D / 3) * (1 / 3)
    assert out[1].avg_logprob == pytest.approx(math.log2(p_ab), abs=1e-6)
    assert out[1].ppl == pytest.approx(1 / p_ab, abs=1e-6)
    # lower perplexity = more typical; doc 1 is the modal bigram only
    assert out[1].ppl < out[0].ppl


def test_kn_perplexity_foreign_model_fallbacks(spark, corpus):
    """Scoring a corpus against a model trained elsewhere exercises
    both fallback lanes: unseen continuation under a known context
    (lambda(w1)/|B|) and a context absent from the model (1/|B|)."""
    lm = kn_bigram_lm(corpus, round_digits=None)
    other = spark.createDataFrame(
        [(10, "a z"), (11, "q r")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in kn_perplexity(other, lm=lm).collect()}
    bt = 3
    # context 'a': c1=3, nl=1 -> lambda = D/3; P = (D/3) * 1/bt
    p_az = (D / 3) * (1 / bt)
    assert out[10].ppl == pytest.approx(1 / p_az, abs=1e-4)
    # context 'q' unknown -> uniform over types
    assert out[11].ppl == pytest.approx(float(bt), abs=1e-4)


def test_kn_perplexity_foreign_model_continuation_mass(spark):
    """The documented unseen-bigram fallback is lambda(w1)·Pcont(w2)
    = lambda(w1)·nr(w2)/|B| — the per-w2 left-extension count must
    actually be looked up (a uniform 1/|B| approximation would give a
    2× smaller probability here)."""
    train = spark.createDataFrame([(0, "a b c b")], ["doc_id", "text"])
    # bigrams: (a,b), (b,c), (c,b) -> |B|=3; nr(b)=|{a,c}|=2
    lm = kn_bigram_lm(train, round_digits=None)
    other = spark.createDataFrame([(10, "b b")], ["doc_id", "text"])
    out = {r.doc_id: r for r in kn_perplexity(other, lm=lm).collect()}
    # (b,b) unseen; context b: c1=1, nl=1 -> lambda(b)=D;
    # Pcont(b)=nr(b)/|B|=2/3 -> p = D * 2/3 = 0.5
    p_bb = D * (2 / 3)
    assert out[10].ppl == pytest.approx(1 / p_bb, abs=1e-4)


def test_ccnet_buckets_tercile_semantics(spark):
    from etl_finance_pipeline_spark.operators.ngram_lm import ccnet_buckets

    rows = [(i, "a b " * (i + 2)) for i in range(6)] + [
        (6, "x y z q r s t u v w"),
        (7, "q q q q q q"),
        (8, "r s r s r s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ccnet_buckets(df).collect()
    buckets = {r["doc_id"]: r["bucket"] for r in out}
    ppls = {r["doc_id"]: r["ppl"] for r in out}
    assert set(buckets.values()) == {"head", "middle", "tail"}
    # bucket order respects perplexity order
    for a in out:
        for b in out:
            if ppls[a["doc_id"]] < ppls[b["doc_id"]]:
                order = {"head": 0, "middle": 1, "tail": 2}
                assert order[buckets[a["doc_id"]]] <= order[buckets[b["doc_id"]]]
