"""Measured scale validation: the hot operator families executed at
10⁷–10⁸-row scale on synthetic ``spark.range`` data (no testdata
dependency), each with an executed-plan assertion that no data-path
exchange is single-partition — the failure mode that turns a correct
operator into a 100 TB scale-killer.

Gated (runs minutes, not CI-speed) and run ALONE — the module builds
its own local[N] session sized for the volume; the shared test
fixture is local[4]:

    SPARK_GRAFT_SCALE=1 python -m pytest tests/test_scale.py -q -s

Measured wall-times are recorded in SCALE.md §Measured.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE") != "1",
    reason="scale suite: set SPARK_GRAFT_SCALE=1 and run the file alone",
)


@pytest.fixture(scope="module")
def bigspark():
    from etl_finance_pipeline_spark import get_spark

    s = get_spark(app_name="scale-validation", shuffle_partitions=64)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _assert_distributed_plan(df, label: str) -> None:
    """The initial physical plan must not funnel the data path through
    one partition: no single-partition exchange, no unpartitioned
    window. (Scalar control aggregates — a final count over 64 partial
    rows — are not in these operators' output plans.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an unpartitioned window would also surface as Exchange
    # SinglePartition feeding the WindowExec, so this one check covers
    # both failure shapes
    assert "Exchange SinglePartition" not in plan, (
        f"{label}: single-partition exchange in plan\n{plan[:3000]}"
    )
    return None



def _assert_only_scalar_single_partition(df, label: str) -> None:
    """Variant for operators whose OUTPUT is a scalar (global count /
    broadcast 1-row stat): single-partition exchanges are allowed
    only when their child is a keys=[] scalar aggregate over partial
    rows (bounded by partition count), never on a keyed data path."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for frag in plan.split("Exchange SinglePartition")[1:]:
        nxt = "\n".join(frag.splitlines()[:3])
        assert "HashAggregate(keys=[]" in nxt or "partial_count" in nxt, (
            f"{label}: non-scalar single-partition exchange\n{nxt}"
        )


def _timed_count(df, label: str) -> tuple[int, float]:
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    print(f"\nSCALE {label}: {n:,} rows out in {dt:.1f}s")
    return n, dt


def test_scale_keep_first_dedupe(bigspark):
    """50M rows, 10M distinct (symbol, ts) keys × 5 duplicates each —
    one hash-partitioned min_by aggregate, map-side combined."""
    from etl_finance_pipeline_spark.operators.normalize import remove_duplicates

    n = 50_000_000
    df = bigspark.range(n).select(
        (F.col("id") % 10_000).alias("SYMBOL_ID"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % 10_000_000) * 60
        ).alias("TIMESTAMP"),
        (F.col("id") % 997).cast("double").alias("CLOSE"),
        F.col("id").alias("_seq"),
    )
    out = remove_duplicates(df, ["SYMBOL_ID", "TIMESTAMP"], order_by=["_seq"])
    _assert_distributed_plan(out, "keep_first_dedupe")
    rows, _ = _timed_count(out, "keep_first_dedupe 50M->10M")
    # keys = id % 10M (symbol is a function of it): 5 dups per key
    assert rows == 10_000_000


def test_scale_candles(bigspark):
    """50M ticks → 5-minute OHLCV candles: one shuffle of partial
    aggregates keyed (symbol, bucket)."""
    from etl_finance_pipeline_spark.operators.resample import candles_from_ticks

    n = 50_000_000
    # base aligned to the 300s bucket width (1_700_000_100 % 300 == 0)
    # so the 60000s span covers exactly 200 buckets, not a 201st
    # straddler at each end
    ticks = bigspark.range(n).select(
        (F.col("id") % 10_000).alias("SYMBOL_ID"),
        F.timestamp_seconds(
            F.lit(1_700_000_100) + (F.col("id") / 10_000).cast("long") * 12
        ).alias("TIMESTAMP"),
        (F.col("id") % 997).cast("double").alias("value"),
    )
    out = candles_from_ticks(ticks, "5T", ["SYMBOL_ID"])
    _assert_distributed_plan(out, "candles")
    rows, _ = _timed_count(out, "candles 50M ticks")
    # 5000 ticks/symbol spaced 12s = 60000s = 200 five-minute buckets
    assert rows == 10_000 * 200


def test_scale_minhash_lsh(bigspark):
    """2M synthetic docs (12-word texts, JVM-generated) through the
    full shingle → signature → banded self-join pipeline."""
    from etl_finance_pipeline_spark.operators.dedup import minhash_lsh_pairs

    # vocab prime 99991 ⇒ doc i ≡ doc i' (mod 99991) are exact
    # duplicates: ~20-copy classes, inside the bucket-size guard (the
    # earlier 997-word vocab made ~2000-copy classes that the guard
    # correctly dropped — and the test then validated nothing)
    words = [
        F.format_string("w%d", (F.col("id") * (7 + j)) % 99991) for j in range(12)
    ]
    docs = bigspark.range(2_000_000).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    pairs = minhash_lsh_pairs(docs)
    _assert_distributed_plan(pairs, "minhash_lsh_pairs")
    rows, _ = _timed_count(pairs, "minhash_lsh 2M docs")
    # 2M docs / 99991 ⇒ classes of 20-21 ⇒ ≥ 99991 * C(20,2) dup pairs
    assert rows >= 99_991 * 190


def test_scale_embed_lsh(bigspark):
    """500k vectors (125k bases × 4 near-identical copies) through
    banded hyperplane LSH + exact re-rank — the pair-generation joins
    are the quadratic risk surface.

    The vectors are deliberately 16-dim (≠ the 64-dim module default)
    to regression-test the plane-dim probe: with mismatched planes
    every signature collapses to 0 and this exact test filled the
    disk with the spill of a 500k² cross join."""
    from etl_finance_pipeline_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    copies = 4
    vecs = bigspark.range(125_000 * copies).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    (F.hash((F.col("id") / copies).cast("long"), F.lit(j)) % 2001)
                    / 1000.0
                )
                for j in range(16)
            ]
        ).alias("embedding"),
    )
    pairs = embedding_near_duplicates(vecs, threshold=0.999)
    _assert_distributed_plan(pairs, "embed_near_dup")
    rows, _ = _timed_count(pairs, "embed_lsh 500k vecs")
    # every 4-copy group yields C(4,2)=6 identical-vector pairs
    assert rows >= 125_000 * 6


def test_scale_star_cc(bigspark):
    """4.5M-edge chain graph (500k components of 10) through
    large-star/small-star contraction — multi-round bounded shuffles,
    lineage truncated per round."""
    from etl_finance_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    pairs = (
        bigspark.range(5_000_000)
        .filter(F.col("id") % 10 != 9)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    t0 = time.time()
    labels = connected_components_star(pairs)
    n_vertices = labels.count()
    n_components = labels.select("component").distinct().count()
    print(f"\nSCALE star_cc: {n_vertices:,} vertices, "
          f"{n_components:,} components in {time.time() - t0:.1f}s")
    assert n_vertices == 5_000_000
    assert n_components == 500_000


def test_scale_hll_distinct(bigspark):
    """50M rows → per-group HLL: one groupBy whose state is
    groups × 512 small ints; estimate must land within the sketch's
    3-sigma band (±14% at b=9)."""
    from etl_finance_pipeline_spark.operators.sketch import hll_distinct

    n = 50_000_000
    df = bigspark.range(n).select(
        F.format_string("g%d", F.col("id") % 5).alias("g"),
        (F.col("id") % 10_000_000).alias("v"),
    )
    out = hll_distinct(df, ["g"], "v", b=9)
    _assert_distributed_plan(out, "hll_distinct")
    rows, _ = _timed_count(out, "hll 50M rows")
    assert rows == 5
    # 10M % 5 == 0 ⇒ each group sees exactly the 2M values ≡ g (mod 5)
    ests = {r["g"]: r["hll_estimate"] for r in out.collect()}
    for g, est in ests.items():
        assert abs(est - 2_000_000) / 2_000_000 < 0.15, (g, est)


def test_scale_count_min(bigspark):
    """50M-event stream through a 4×1024 Count-Min sketch (fixed
    4096-counter state) + broadcast point queries for 5 hot keys."""
    from etl_finance_pipeline_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    n = 50_000_000
    stream = bigspark.range(n).select(
        F.when(
            F.col("id") % 100 < 10, F.format_string("hot%d", F.col("id") % 5)
        )
        .otherwise(F.format_string("cold%d", F.col("id") % 1_000_000))
        .alias("v")
    )
    sketch = count_min_sketch(stream, "v")
    _assert_distributed_plan(sketch, "count_min_sketch")
    rows, _ = _timed_count(sketch, "cms build 50M")
    assert rows <= 4 * 1024
    hot = bigspark.createDataFrame([(f"hot{i}",) for i in range(5)], ["v"])
    est = {r["v"]: r["cms_estimate"] for r in
           cms_estimate(hot, sketch, "v").collect()}
    # each hot key: 50M * 10% / 5 = 1M true hits; CMS never undercounts
    assert all(e >= 1_000_000 for e in est.values())


def test_scale_triangles_hub_safe(bigspark):
    """4M path/skip edges (exactly N-2 triangles) PLUS a 50k-degree
    hub wired to non-adjacent vertices. Degree orientation must point
    every hub edge INTO the hub (oriented out-degree 0), so the hub
    contributes zero wedges — the naive neighbor self-join would
    build C(50k,2) ≈ 1.2B wedges from it."""
    from etl_finance_pipeline_spark.operators.graph import triangle_count

    n = 2_000_000
    base = bigspark.range(n - 2)
    step1 = base.select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    step2 = base.select(F.col("id").alias("src"), (F.col("id") + 2).alias("dst"))
    hub = bigspark.range(50_000).select(
        F.lit(n + 10).alias("src"), (F.col("id") * 7).alias("dst")
    )
    edges = step1.unionAll(step2).unionAll(hub)
    out = triangle_count(edges)
    _assert_only_scalar_single_partition(out, "triangle_count")
    t0 = time.time()
    got = out.collect()[0]["n_triangles"]
    dt = time.time() - t0
    print(f"\nSCALE triangles: {got:,} triangles in {dt:.1f}s")
    # triangles {i, i+1, i+2} for i in [0, n-4]: n-3 of them;
    # hub spokes (spacing 7 > skip width 2) close none
    assert got == n - 3
    assert dt < 120


def test_scale_bloom_probe(bigspark):
    """50M-row probe against a 100k-key bloom (2^20 bits): the probe
    side runs k broadcast semi-joins with no shuffle; survivors =
    members + the deterministic false-positive band."""
    from etl_finance_pipeline_spark.operators.bloom import bloom_build, bloom_probe

    build = bigspark.range(100_000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", bits=20)
    probe = bigspark.range(50_000_000).select((F.col("id") % 10_000_000).alias("k"))
    out = bloom_probe(probe, "k", bloom, bits=20)
    _assert_distributed_plan(out, "bloom_probe")
    rows, _ = _timed_count(out, "bloom probe 50M")
    # 500k member rows always pass; fpr=(1-e^(-3*1e5/2^20))^3 ≈ 1.9%
    assert rows >= 500_000
    assert rows <= 500_000 + int(0.05 * 49_500_000)


def test_scale_association_rules(bigspark):
    """10M basket lines (2M baskets × 5 of 50 items): the in-basket
    pair join fans out C(5,2)=10 pairs per basket, then collapses to
    ≤ 50×50 rules — fan-out bounded by basket size, not corpus."""
    from etl_finance_pipeline_spark.operators.association import association_rules

    df = bigspark.range(10_000_000).select(
        (F.col("id") / 5).cast("long").alias("basket"),
        F.format_string("i%d", (F.col("id") * 7919 + (F.col("id") / 5).cast("long")) % 50).alias(
            "item"
        ),
    )
    out = association_rules(df, "basket", "item", min_support=100)
    _assert_only_scalar_single_partition(out, "association_rules")
    rows, _ = _timed_count(out, "assoc 10M lines")
    assert 0 < rows <= 50 * 49


def test_scale_binned_quartiles(bigspark):
    """50M rows, 5 constant-cardinality groups: the ntile shape would
    sort 10M rows per window task; the binned profile's windows must
    only ever see the bin histogram (an aggregate below every Window
    in the executed plan)."""
    from etl_finance_pipeline_spark.operators.report import (
        binned_quartile_profile,
    )

    df = bigspark.range(50_000_000).select(
        F.format_string("seg%d", F.col("id") % 5).alias("seg"),
        ((F.col("id") * 2654435761) % 500_000 / 100.0 * 100).alias("price"),
    )
    out = binned_quartile_profile(df, "seg", "price", bin_width=100.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    _assert_distributed_plan(out, "binned_quartiles")
    assert "ntile" not in plan
    # every Window node must sit ABOVE the histogram aggregate: in the
    # top-down plan string, a HashAggregate appears between the first
    # Window and the Range/Scan leaf (i.e. windows consume aggregated
    # bins, never raw rows)
    after_window = plan[plan.index("Window") :]
    # "Range (" / "Scan " are leaf NODES ("RangeFrame" inside a
    # windowspecdefinition is not)
    leaf = min(
        i
        for i in (after_window.find("Range ("), after_window.find("Scan "))
        if i >= 0
    )
    assert "HashAggregate" in after_window[:leaf], (
        f"window consumes raw rows:\n{plan[:3000]}"
    )
    rows, dt = _timed_count(out, "binned quartiles 50M x 5 groups")
    assert rows == 20


def test_scale_hotkey_join(bigspark):
    """50M-row left side where ONE key holds 20% of all rows joined to
    a 1M-row right side: the hot lane broadcasts a single right row,
    the cold lane shuffles normally, and the union count equals the
    plain join exactly."""
    from etl_finance_pipeline_spark.functions.skew import hotkey_join

    left = bigspark.range(50_000_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(7)).otherwise(F.col("id") % 1_000_000)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = bigspark.range(1_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("tag")
    )
    out = hotkey_join(left, right, ["k"], hot_threshold=1_000_000)
    _assert_only_scalar_single_partition(out, "hotkey_join")
    rows, _ = _timed_count(out, "hotkey join 50M skewed")
    assert rows == 50_000_000


def test_scale_set_similarity_join(bigspark):
    """200k docs (20k 10-copy groups, distinct rare tokens per group):
    the prefix filter must keep candidate generation proportional to
    true near-dup volume, not all pairs."""
    from etl_finance_pipeline_spark.operators.dedup import set_similarity_join

    df = bigspark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.format_string("alpha%d beta%d gamma%d delta%d", *([(F.col("id") / 10).cast("long")] * 4)),
            F.format_string("tail%d", F.col("id") % 3),
        ).alias("text"),
    )
    out = set_similarity_join(df, threshold=0.8)
    _assert_distributed_plan(out, "set_similarity_join")
    rows, _ = _timed_count(out, "set-sim 200k docs")
    # each 10-copy group with equal tail tokens pairs up: groups have
    # tails 0,0,0,0 pattern per id%3 -> within group, docs sharing the
    # same tail are identical (J=1); cross-tail J = 4/6 < 0.8
    # per group: tails of ids 10g..10g+9 = g*10+i mod 3 -> counts {4,3,3}
    # pairs per group: C(4,2)+C(3,2)+C(3,2) = 6+3+3 = 12
    assert rows == 20_000 * 12


def test_scale_label_propagation(bigspark):
    """1M vertices in 100k 10-cliques (4.5M edges): with the
    self-vote min tiebreak every clique collapses to its min id in
    round 1 and stays there — asserts full convergence and that the
    per-round vote plan keeps data paths keyed."""
    from etl_finance_pipeline_spark.operators.graph import label_propagation

    base = bigspark.range(1_000_000).select(
        (F.col("id") / 10).cast("long").alias("g"), F.col("id").alias("v")
    )
    a, b = base.alias("a"), base.alias("b")
    edges = (
        a.join(b, F.col("a.g") == F.col("b.g"))
        .filter(F.col("a.v") < F.col("b.v"))
        .select(F.col("a.v").alias("src"), F.col("b.v").alias("dst"))
    )
    t0 = time.time()
    labels = label_propagation(edges, rounds=2)
    bad = labels.filter(
        F.col("label") != (F.col("id") / 10).cast("long") * 10
    ).count()
    n = labels.count()
    print(f"\nSCALE lpa 4.5M edges: {n:,} vertices in {time.time() - t0:.1f}s")
    assert n == 1_000_000 and bad == 0


def test_scale_substring_dedup(bigspark):
    """10M synthetic docs (tiny vocab → heavy gram collisions): span
    discovery must stay distributed — gram-hash-keyed frequency +
    semi-join, doc-keyed cover-merge windows; no single-partition
    exchange anywhere on the data path."""
    from etl_finance_pipeline_spark.operators.dedup import (
        duplicate_token_spans,
    )

    n = 10_000_000
    # doc text = 12 tokens drawn from id arithmetic; ~50% of docs share
    # their template with id+1, planting real duplicated spans
    df = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), ((F.col("id") / 2 + j) % 50).cast("int").cast("string"))
                for j in range(12)
            ],
        ).alias("text"),
    )
    out = duplicate_token_spans(df, k=8)
    _assert_distributed_plan(out, "substring_dedup")
    rows, _ = _timed_count(out, "substring_dedup 10M docs")
    assert rows > 0


def test_scale_suffix_dup_spans_exact_vs_cover(bigspark):
    """1M synthetic docs with planted pairwise duplicates (docs 2m and
    2m+1 share exactly one 8-token span at offset 5; every other gram
    is unique, so seed frequency is bounded at 2): the exact
    seed-and-chain lane stays distributed, reconstructs exactly one
    span per pair with both offsets right, and the measured
    cover-vs-exact position comparison shows ZERO miss/over marks at
    10⁶-doc scale — the quantified closure of the cover lane's 'not a
    suffix array' caveat, at the tier the round-11 verdict asked for
    (not just sf0.01)."""
    from etl_finance_pipeline_spark.operators.dedup import (
        duplicate_token_spans,
        suffix_dup_spans,
    )

    n = 1_000_000
    pair = (F.col("id") / 2).cast("long").cast("string")
    i = F.col("id").cast("string")
    toks = (
        [F.concat(F.lit(f"u{j}x"), i) for j in range(4)]
        + [F.concat(F.lit(f"s{j}x"), pair) for j in range(8)]
        + [F.concat(F.lit(f"v{j}x"), i) for j in range(4)]
    )
    df = bigspark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
    )
    exact = suffix_dup_spans(df, k=8)
    _assert_distributed_plan(exact, "suffix_dup_spans")
    rows, _ = _timed_count(exact, "suffix_dup_spans 1M docs")
    assert rows == n // 2  # exactly one pairwise span per (2m, 2m+1)
    [s0] = exact.filter("id_a = 0").collect()
    assert (s0["id_b"], s0["a_start"], s0["b_start"], s0["span_tokens"]) == (
        1, 5, 5, 8,
    )
    # measured miss-rate readout at scale: cover marks == exact marks
    cover = duplicate_token_spans(df, k=8)
    cpos = cover.select(
        "doc_id",
        F.explode(F.sequence("span_start", "span_end")).alias("pos"),
    ).distinct()
    ea = exact.select(
        F.col("id_a").alias("doc_id"),
        F.explode(
            F.sequence(
                F.col("a_start"), F.col("a_start") + F.col("span_tokens") - 1
            )
        ).alias("pos"),
    )
    eb = exact.select(
        F.col("id_b").alias("doc_id"),
        F.explode(
            F.sequence(
                F.col("b_start"), F.col("b_start") + F.col("span_tokens") - 1
            )
        ).alias("pos"),
    )
    epos = ea.unionByName(eb).distinct()
    n_cover, _ = _timed_count(cpos, "cover-marked positions")
    n_exact, _ = _timed_count(epos, "exact-marked positions")
    n_common, _ = _timed_count(
        cpos.join(epos, ["doc_id", "pos"]), "common marked positions"
    )
    assert n_cover == n_exact == n_common == 8 * n


def test_scale_pq_encode_no_shuffle(bigspark):
    """PQ encode over 20M vectors is a NARROW projection: the codebook
    rides as a literal, zero exchanges in the plan."""
    from etl_finance_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    dim = 16
    train = bigspark.range(1000).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") * (j + 3)) % 97).cast("double") for j in range(dim)]
        ).alias("embedding"),
    )
    cb = pq_train(train, m=4, ksub=8, iters=2)
    n = 20_000_000
    corpus = bigspark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") * (j + 3)) % 97).cast("double") for j in range(dim)]
        ).alias("embedding"),
    )
    out = pq_encode(corpus, cb, engine="numpy")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"pq_encode must be narrow\n{plan[:2000]}"
    # a bare count would let Catalyst prune the codes expression away —
    # aggregate over the codes so every argmin actually evaluates
    forced = out.select(F.element_at("codes", 1).alias("_c0"))
    import time as _t

    t0 = _t.perf_counter()
    total = forced.agg(F.count("_c0"), F.sum("_c0")).collect()[0][0]
    print(f"SCALE pq_encode 20M vectors (forced): {total:,} rows in "
          f"{_t.perf_counter() - t0:.1f}s")
    assert total == n


def test_scale_unigram_em_corpus_independent(bigspark):
    """Unigram-LM EM cost is corpus-size-independent after the first
    pass: 10M documents collapse to a Zipf-bounded distinct-word
    frame (synthetic: ~2.6k distinct words), and each EM round's DP
    touches only that frame. The corpus pass is one
    map-side-combinable count; nothing in the round plans funnels
    through one partition."""
    from etl_finance_pipeline_spark.operators.tokenizer import (
        _uni_words,
        unigram_train,
    )

    n = 10_000_000
    # ~2.6k distinct 3-word documents over a synthetic vocabulary
    docs = bigspark.range(n).select(
        F.concat_ws(
            " ",
            F.concat(F.lit("tok"), (F.col("id") % 137).cast("string")),
            F.concat(F.lit("word"), (F.col("id") % 19).cast("string")),
            F.concat(F.lit("x"), (F.col("id") % 7).cast("string")),
        ).alias("text")
    )
    words = _uni_words(docs, "text", 16)
    _assert_distributed_plan(words, "unigram word counts")
    t0 = time.perf_counter()
    vocab = unigram_train(docs, n_multi=32, iters=2)
    rows = vocab.collect()
    dt = time.perf_counter() - t0
    print(f"SCALE unigram_train 10M docs: vocab={len(rows)} in {dt:.1f}s")
    assert len(rows) > 32  # chars + multi
    counted = [r for r in rows if r["piece_count"] > 0]
    assert counted, rows[:5]


def test_scale_ivfpq_codes_only_shuffle(bigspark):
    """IVF-PQ search at 2M vectors: after encoding, only (cid, s,
    code) int tuples shuffle — the distance tables broadcast, the
    residual vectors never move. Assert the search output plan has no
    single-partition exchange and the run completes."""
    from etl_finance_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        train_kmeans_centroids,
    )

    dim = 16
    n = 2_000_000

    def vecs(m):
        return bigspark.range(m).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        ((F.col("id") * (j + 3)) % 97).cast("double")
                        + (F.col("id") % 5).cast("double")
                    )
                    for j in range(dim)
                ]
            ).alias("embedding"),
        )

    coarse = train_kmeans_centroids(vecs(2000), k=8, iters=2).select(
        F.col("cluster_id").alias("cid"), "cvec"
    )
    out = ivfpq_topk(
        vecs(n), vecs(5), coarse, k=5, nprobe=2, m=4, ksub=8, iters=2,
        encode_engine="numpy",
    )
    t0 = time.perf_counter()
    rows = out.collect()
    dt = time.perf_counter() - t0
    _assert_distributed_plan(out, "ivfpq search")
    print(f"SCALE ivfpq_topk 2M vectors: {len(rows)} results in {dt:.1f}s")
    assert len(rows) == 25


def test_scale_line_dedup_hot_boilerplate(bigspark):
    """10M lines across 2M docs where ONE line appears in every doc
    (doc frequency 2M — the worst skew case): both aggregates are
    algebraic, so partial combine collapses the hot line per map task
    and no reducer sees its full fan-in. Output must drop exactly the
    boilerplate copies and keep every unique line."""
    from etl_finance_pipeline_spark.operators.corpus import line_dedup

    n_docs = 2_000_000
    docs = bigspark.range(n_docs).select(F.col("id").alias("doc_id"))
    lines = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("pos")
    ).select(
        "doc_id",
        "pos",
        F.when(F.col("pos") == 0, F.lit("ACCEPT COOKIES TO CONTINUE"))
        .otherwise(
            F.concat_ws("-", F.lit("u"), F.col("doc_id"), F.col("pos"))
        )
        .alias("line"),
    )
    out = line_dedup(lines, min_docs=2, keep="none")
    _assert_distributed_plan(out, "line_dedup")
    rows, dt = _timed_count(out, "line_dedup 10M lines, 2M-copy hot line")
    assert rows == n_docs * 4
    assert dt < 300


def test_scale_kn_bigram_lm(bigspark):
    """20M-token synthetic corpus over a 1k-word vocabulary: ONE
    corpus-scale (w1, w2) aggregate, then vocab-table work. The model
    row count is bounded by observed bigram types, not corpus size."""
    from etl_finance_pipeline_spark.operators.ngram_lm import kn_bigram_lm

    n_docs = 1_000_000
    docs = bigspark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * 31 + i * 7 + i * i, F.lit(1000)),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    lm = kn_bigram_lm(docs)  # eager checkpoint: corpus pass runs here
    rows = lm.count()
    dt = time.time() - t0  # construction + count (the honest wall)
    print(f"\nSCALE kn_bigram_lm 20M tokens, 1k vocab: {rows:,} rows in {dt:.1f}s")
    assert rows <= 1_000_000  # vocab^2 bound, far under corpus size
    assert dt < 300


def test_scale_dsir_weights(bigspark):
    """DSIR scoring at 1M docs: two 64-key bucket aggregates + one
    broadcast-ratio scoring pass keyed by doc — the corpus never
    shuffles on a data-sized key."""
    from etl_finance_pipeline_spark.operators.dsir import dsir_weights

    n_docs = 1_000_000
    docs = bigspark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.concat(
                    F.lit("t"), F.pmod(F.col("id") * 13 + i * 5, F.lit(500))
                ),
            ),
        ).alias("text"),
    )
    target = docs.filter(F.col("doc_id") % 3 == 0)
    out = dsir_weights(docs, target)
    # the model fit carries keys=[] scalar aggregates (bucket totals)
    # — allowed; the doc-keyed scoring path must stay partitioned
    _assert_only_scalar_single_partition(out, "dsir_weights")
    rows, dt = _timed_count(out, "dsir_weights 1M docs")
    assert rows == n_docs
    assert dt < 300


def test_scale_pca_covariance_numpy_lane(bigspark):
    """Covariance of 2M 16-dim vectors through the Arrow/numpy Gram
    lane: one partial 16×16 Gram per batch, d² = 256 output rows —
    corpus size never appears in the shuffle."""
    from etl_finance_pipeline_spark.operators.pca import embedding_covariance

    dim = 16
    n = 2_000_000
    vecs = bigspark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.col("id") * (3 + j) + j * j, F.lit(1000)) / 500.0
                 - 1.0).alias(f"x{j}")
                for j in range(dim)
            ]
        ).alias("embedding"),
    )
    t0 = time.time()
    cov = embedding_covariance(vecs, engine="numpy")  # eager checkpoint
    rows = cov.count()
    dt = time.time() - t0  # construction + count (the honest wall)
    print(f"\nSCALE pca covariance numpy 2M x 16d: {rows:,} rows in {dt:.1f}s")
    assert rows == dim * dim
    assert dt < 300


def test_scale_hamming_identical_fingerprint_collapse(bigspark):
    """1M ids sharing ONE fingerprint (every black-frame video hashing
    alike — the degenerate case that made the pre-collapse lossless
    join O(n²)): identical fingerprints collapse to a single banded
    row, so candidate generation sees ONE distinct fingerprint and
    star mode emits exactly n−1 rep→member edges plus the cross
    edges — linear work, linear output. A quadratic plan would emit
    ~5×10¹¹ candidates and blow the time bound by orders of
    magnitude."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    n_hot = 1_000_000
    n_tail = 100_000
    hot = bigspark.range(n_hot).select(
        F.col("id").alias("doc_id"), F.lit(0x5A5A5A5A).cast("long").alias("fp")
    )
    # diverse tail so banding still has real work to do — xxhash64
    # spreads all 64 bits, the shape real sketches have (a tail whose
    # high bands are constant is the lossless ceiling's territory,
    # not the collapse's)
    tail = bigspark.range(n_tail).select(
        (F.col("id") + n_hot).alias("doc_id"),
        F.xxhash64(F.col("id")).alias("fp"),
    )
    df = hot.unionByName(tail)
    out = hamming_pairs(
        df, "fp", id_col="doc_id", bits=64, bands=8, max_hamming=2,
        max_bucket_size=None, identical_mode="star",
    )
    _assert_distributed_plan(out, "hamming_identical_collapse")
    rows, dt = _timed_count(out, "hamming star, 1M-copy hot fingerprint")
    # at least the hot group's star edges; cross edges from the tail add more
    assert rows >= n_hot - 1
    assert dt < 120


def test_scale_hamming_multiindex_uniform_fps(bigspark):
    """2M DISTINCT uniform 64-bit fingerprints, 8-bit bands: every
    (band, key) bucket holds ~7,800 distinct fps, so direct
    enumeration would stream ~6×10¹⁰ candidates. With the opt-in
    multi-index (sub_band_threshold=4096) oversized buckets re-band
    their remaining 56 bits into max_hamming+1 sub-slices and the
    uniform variation splits sub-buckets down to ~singletons —
    the billion-scale uniform-fingerprint shape, subquadratic."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    n = 2_000_000
    df = bigspark.range(n).select(
        F.col("id").alias("doc_id"), F.xxhash64(F.col("id")).alias("fp")
    )
    out = hamming_pairs(
        df, "fp", id_col="doc_id", bits=64, bands=8, max_hamming=2,
        max_bucket_size=None, sub_band_threshold=4096,
        identical_mode="star",
    )
    _assert_distributed_plan(out, "hamming_multiindex_uniform")
    rows, dt = _timed_count(out, "hamming multi-index, 2M uniform fps")
    # random 64-bit pairs within hamming 2 are essentially nonexistent
    assert rows < 100
    assert dt < 180


def test_scale_zipf_fit_hapax_heavy_vocab(bigspark):
    """2M docs, each contributing ONE unique hapax token (the web-corpus
    URL/number/typo tail that grows with corpus size) plus head tokens:
    the min_count cutoff must kill the 2M-type tail with a map-side
    filter BEFORE any ranking, and the head cap must plan as
    TakeOrderedAndProject — never a single-partition sort of the full
    vocabulary."""
    from etl_finance_pipeline_spark.operators.text_analysis import zipf_fit

    n = 2_000_000
    docs = bigspark.range(n).select(
        F.concat_ws(
            " ",
            F.lit("the"),
            F.concat(F.lit("w"), (F.col("id") % 1000).cast("string")),
            F.concat(F.lit("u"), F.col("id").cast("string")),
        ).alias("text")
    )
    out = zipf_fit(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    t0 = time.time()
    row = out.collect()[0]
    dt = time.time() - t0
    print(f"\nSCALE zipf_fit hapax-heavy: 2M hapax types filtered in {dt:.1f}s")
    # survivors: 'the' (2M) + w0..w999 (2000 each); the 2M u-tokens are hapax
    assert row["n_fit_types"] == 1001
    assert row["n_fit_tokens"] == 4_000_000
    assert row["slope"] < 0
    assert dt < 120


def test_scale_pack_bins_sharded_ffd(bigspark):
    """10M documents into 256-token FFD bins across 512 shards: the
    sequential greedy walk is per-shard (the parallelism unit), so
    the plan is ONE hash exchange on shard feeding the Arrow kernel —
    never a global sort or single-partition funnel."""
    from etl_finance_pipeline_spark.operators.corpus import pack_bins

    n = 10_000_000
    docs = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 90 + 10).alias("n_tokens"),  # 10..99 tokens
    )
    out = pack_bins(docs, seq_tokens=256, num_shards=512)
    _assert_distributed_plan(out, "pack_bins")
    rows, dt = _timed_count(out, "pack_bins 10M docs, 512 shards")
    assert rows == n
    assert dt < 240


def test_scale_link_extract_narrow_map(bigspark):
    """2M synthesized pages through canonicalize + link_extract +
    anchor_texts: extraction is a narrow projection + explode (no
    data-path exchange before the first aggregate), anchor fan-out is
    the expected per-page anchor count, and the nofollow exclusion
    holds at volume."""
    from etl_finance_pipeline_spark.operators.corpus import (
        anchor_texts,
        link_extract,
        synthesize_html,
        url_canonicalize,
    )

    n = 2_000_000
    df = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 97).cast("string")).alias(
            "text"
        ),
        F.concat(
            F.lit("https://src"),
            (F.col("id") % 20).cast("string"),
            F.lit(".com/a/"),
            (F.col("id") % 100).cast("string"),
        ).alias("url"),
    )
    pages = url_canonicalize(synthesize_html(df))
    links = link_extract(pages)
    _assert_distributed_plan(links, "link_extract")
    rows, _ = _timed_count(links, "link_extract 2M pages")
    # per-page anchors: 8 fixed + variant(1/2/1 for id%3==0,1,2 incl.
    # the id%3==0 'local' partner link) + mirror (id%5==3) + sponsored
    # (id%7==1)
    expect = 0
    for r in (0, 1, 2):
        cnt = n // 3 + (1 if n % 3 > r else 0)
        expect += cnt * (8 + {0: 1, 1: 1, 2: 2}[r])
    expect += len(range(3, n, 5))  # id%5==3 mirrors
    expect += len(range(1, n, 7))  # id%7==1 sponsored
    assert rows == expect
    at = anchor_texts(pages)
    nf = at.filter("nofollow").groupBy("anchor_text").count().collect()
    assert {r["anchor_text"] for r in nf} == {"Sponsored"}
    assert sum(r["count"] for r in nf) == len(range(1, n, 7))


def test_scale_html_extract_narrow_map(bigspark):
    """2M synthesized HTML pages through the jusText-lite extractor:
    a pure projection chain — ZERO exchanges in the plan, wall-clock
    bound by regex throughput only."""
    from etl_finance_pipeline_spark.operators.corpus import (
        html_extract,
        synthesize_html,
    )

    n = 2_000_000
    docs = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon text body "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = html_extract(synthesize_html(docs)).filter(F.length("text") > 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    rows, dt = _timed_count(out, "html_extract 2M pages")
    assert rows == n
    assert dt < 180


def test_scale_hamming_guarded_mode(bigspark):
    """Guarded mode (max_bucket_size) at 2M fps: the any-surviving-
    bucket dedupe (round-9 recall fix) adds one exchange over the
    RESULT pair set, not the candidate set — the plan stays
    distributed and the skew guard still drops the hot bucket."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    n = 2_000_000
    # uniform fps plus one 100k-copy hot fingerprint whose buckets the
    # guard must drop (weight 100k >> cap) without dropping its exact
    # Hamming-0 pairs (emitted via the identical-fp path, not banding)
    hot = bigspark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit(123456789).alias("fp")
    )
    tail = bigspark.range(n).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.xxhash64(F.col("id")).alias("fp"),
    )
    out = hamming_pairs(
        hot.unionByName(tail), "fp", id_col="doc_id", bits=64, bands=8,
        max_hamming=2, max_bucket_size=1000, identical_mode="star",
    )
    _assert_distributed_plan(out, "hamming_guarded")
    rows, dt = _timed_count(out, "hamming guarded, 2M fps + 100k-copy hot")
    # star edges of the hot group always surface; uniform tail pairs
    # within hamming 2 are essentially nonexistent
    assert rows >= 100_000 - 1
    assert dt < 180


def test_scale_changefeed_incremental_dedup(bigspark, tmp_path):
    """Change-feed ingest dedup against a 200k-doc standing table:
    the new side's scan plans ONLY the ingest commit's files
    (O(changed files) — asserted on inputFiles), the pair path stays
    distributed (broadcast banded batch; the corpus never shuffles on
    the join), and every planted exact near-dup surfaces."""
    from etl_finance_pipeline_spark.operators.dedup import changefeed_near_dup
    from etl_finance_pipeline_spark.sources.table_format import (
        read_changes,
        snapshot,
        write_table,
    )

    t = str(tmp_path / "bigdocs")
    n = 200_000

    def corpus_text(c):
        # six id-derived tokens: cross-doc shingle overlap is zero, so
        # candidate volume is exactly the planted-dup set
        return F.concat_ws(
            " ", *[F.concat(F.lit(p), c) for p in ("aa", "bb", "cc", "dd", "ee", "ff")]
        )

    standing = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        corpus_text(F.col("id").cast("string")).alias("text"),
    )
    write_table(standing, t)  # v0: the standing corpus
    batch = bigspark.range(500).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        corpus_text((F.col("id") * 400).cast("string")).alias("text"),
    )
    write_table(batch, t)  # v1: the ingest commit (all planted dups)

    v0files = {os.path.basename(f["path"]) for f in snapshot(t, 0).files}
    ch = read_changes(bigspark, t, from_version=0)
    scanned = {os.path.basename(p) for p in ch.inputFiles()}
    assert scanned and scanned.isdisjoint(v0files)  # O(changed files)

    out = changefeed_near_dup(bigspark, t, from_version=0, threshold=0.99)
    _assert_distributed_plan(out, "changefeed_near_dup")
    rows, dt = _timed_count(out, "changefeed dedup: 200k standing + 500 ingest")
    assert rows == 500
    assert dt < 120


def test_scale_warc_parse_roundtrip(bigspark):
    """Stage −1 at 2M records / 20k multi-record blobs: envelope
    build + blob concat is one groupBy; the parse (split, header
    regex, Content-Length framing) is a narrow per-blob chain. Every
    record must re-frame (length_ok) and recover its payload."""
    from etl_finance_pipeline_spark.operators.corpus import (
        synthesize_warc,
        warc_parse,
    )

    n = 2_000_000
    pages = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("<html><body><p>payload "),
            F.col("id").cast("string"),
            F.lit(" tail</p></body></html>"),
        ).alias("html"),
        F.concat(F.lit("http://ex.com/p/"), F.col("id").cast("string")).alias(
            "url"
        ),
        (F.col("id") % 20_000).cast("int").alias("blob_id"),
    )
    parsed = warc_parse(synthesize_warc(pages))
    ok = parsed.filter(
        F.col("length_ok") & F.col("payload").contains("payload ")
    )
    _assert_distributed_plan(ok, "warc_parse")
    rows, dt = _timed_count(ok, "warc parse: 2M records / 20k blobs")
    assert rows == n
    assert dt < 240


def test_scale_sft_render_narrow_map(bigspark):
    """2M documents through the SFT chat-template renderer: a pure
    projection chain (split → transform/slice → array_join) — ZERO
    exchanges in the plan; at 100 TB this is a narrow codegen map
    over the corpus scan, the html_extract plan shape."""
    from etl_finance_pipeline_spark.operators.sft import sft_render

    n = 2_000_000
    # ~40 tokens → 4 turns (12/12/12/4), trailing assistant kept
    base = " ".join(f"w{i}" for i in range(39))
    docs = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(base + " t"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    out = sft_render(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    rows, dt = _timed_count(out, "sft_render 2M conversations")
    assert rows == n  # every doc has 4 turns → all valid
    assert dt < 240


def test_scale_pref_pairs_group_bound(bigspark, tmp_path):
    """Preference pairing at 2M docs across 20k prompt groups: the
    ranking windows partition on the group key, so no window sees
    more than ~100 rows — the plan must not funnel through a single
    partition (the production grouping key is the prompt id, whose
    group size is bounded by responses-per-prompt)."""
    from etl_finance_pipeline_spark.plans.training_data import (
        _pref_pair_frame,
    )

    n = 2_000_000
    docs = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        # vary quality drivers: half of EACH group gets noisy digit
        # tails (id // 20000 alternates within a group; id % 2 would
        # correlate with the group key and make groups uniform)
        F.when(
            (F.floor(F.col("id") / 20_000) % 2) == 0,
            F.lit(
                "the quick brown fox jumps over the lazy dog and runs on"
            ),
        )
        .otherwise(F.lit("zz9## 77!! 0x0x0x 9991 !!##"))
        .alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20_000).cast("string")).alias(
            "source"
        ),
        F.lit(56).cast("long").alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    pairs = _pref_pair_frame(bigspark, str(tmp_path))
    _assert_distributed_plan(pairs, "pref_pairs")
    rows, dt = _timed_count(pairs, "pref_pairs 2M docs / 20k groups")
    assert rows > 0
    assert dt < 300


def test_scale_curation_signal_maps(bigspark):
    """5M docs through script_census + code_signals (round-10
    curation signals): both are pure codegen projections — ZERO
    exchanges — so at 100 TB they ride the corpus scan for free."""
    from etl_finance_pipeline_spark.operators.text_analysis import (
        code_signals,
        script_census,
    )

    n = 5_000_000
    docs = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox def load(x): return x; привет "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    probes = {"script_census": "cyrillic", "code_signals": "symbol_ppm"}
    for op, label in ((script_census, "script_census"), (code_signals, "code_signals")):
        out = op(docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (label, plan[:2000])
        # aggregate over EVERY numeric output so column pruning cannot
        # skip any of the projection under test (a bare count() would
        # skip all of it)
        nums = [
            f.name for f in out.schema.fields
            if f.dataType.simpleString() == "bigint"
        ]
        t0 = time.time()
        agg = out.agg(
            F.count("*").alias("n"),
            F.sum(probes[label]).alias("s"),
            *[F.sum(c).alias(f"_{c}") for c in nums],
        ).collect()[0]
        dt = time.time() - t0
        print(f"\nSCALE {label} 5M docs: {agg['n']:,} rows in {dt:.1f}s")
        assert agg["n"] == n and agg["s"] > 0
        assert dt < 180


def test_scale_ngram_novelty_distinct_join(bigspark):
    """2M-doc train split vs 100k held-out docs through the n-gram
    novelty audit: both sides dedup BEFORE the shingle join, the plan
    stays distributed (no single-partition data-path exchange), and
    the full audit completes in bounded wall-clock. Half the held-out
    shingles are planted novel, so the output is non-degenerate."""
    from etl_finance_pipeline_spark.operators.dedup import ngram_novelty

    vocab = 200_000
    train = bigspark.range(2_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("t"), (F.col("id") % vocab).cast("string")),
            F.concat(F.lit("t"), ((F.col("id") + 1) % vocab).cast("string")),
            F.concat(F.lit("t"), ((F.col("id") + 2) % vocab).cast("string")),
            F.concat(F.lit("t"), ((F.col("id") + 3) % vocab).cast("string")),
        ).alias("text"),
    )
    # even ids reuse train vocab (seen); odd ids use an out-of-vocab
    # prefix (novel) — novelty must land strictly between 0 and 1e6
    ho = bigspark.range(100_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.when(F.col("id") % 2 == 0, F.lit("t")).otherwise(F.lit("x")),
                (F.col("id") % vocab).cast("string"),
            ),
            F.concat(F.lit("t"), ((F.col("id") + 1) % vocab).cast("string")),
            F.concat(F.lit("t"), ((F.col("id") + 2) % vocab).cast("string")),
            F.concat(F.lit("t"), ((F.col("id") + 3) % vocab).cast("string")),
        ).alias("text"),
    )
    out = ngram_novelty(train, ho)
    _assert_distributed_plan(out, "ngram_novelty")
    t0 = time.time()
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum("n_novel").alias("novel"),
        F.sum("n_shingles").alias("tot"),
    ).collect()[0]
    dt = time.time() - t0
    print(f"ngram_novelty 2M train / 100k heldout: {dt:.1f}s "
          f"novel={agg['novel']}/{agg['tot']}")
    assert agg["n"] == 100_000
    assert 0 < agg["novel"] < agg["tot"]
    assert dt < 300


def test_scale_bitext_ivf_bucketed_mining(bigspark):
    """100k × 100k bitext mining through the IVF-bucketed candidate
    generator — the exact miner's pair frame would be 10¹⁰ rows; the
    bucketed miner joins 256 inverted lists on cid instead. Vectors
    carry planted cluster structure (256 anchor directions) so the
    lists are balanced; every source emits exactly one best pair."""
    import math

    from etl_finance_pipeline_spark.operators.similarity import (
        bitext_margin_mine_ivf,
    )

    n, n_cells, dim = 100_000, 256, 4

    def side(offset: int):
        a = (F.col("id") % n_cells) * (2.0 * math.pi / n_cells)
        jit = ((F.col("id") * 7 + offset) % 13).cast("double") / 1300.0
        return bigspark.range(n).select(
            (F.col("id") + offset).alias("vec_id"),
            F.array(
                F.cos(a) + jit, F.sin(a) - jit,
                F.cos(a * 2.0) + jit, F.sin(a * 2.0) - jit,
            ).alias("embedding"),
        )

    cents = bigspark.range(n_cells).select(
        F.col("id").alias("cid"),
        F.array(
            F.cos(F.col("id") * (2.0 * math.pi / n_cells)),
            F.sin(F.col("id") * (2.0 * math.pi / n_cells)),
            F.cos(F.col("id") * (4.0 * math.pi / n_cells)),
            F.sin(F.col("id") * (4.0 * math.pi / n_cells)),
        ).alias("cvec"),
    )
    out = bitext_margin_mine_ivf(
        side(0), side(10_000_000), cents,
        k=4, nprobe=2, margin_threshold_ppm=0,
    )
    _assert_distributed_plan(out, "bitext_ivf")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]
    t0 = time.time()
    rows = out.count()
    dt = time.time() - t0
    print(f"\nSCALE bitext_ivf 100k x 100k / {n_cells} lists: "
          f"{rows:,} best pairs in {dt:.1f}s")
    assert rows == n
    assert dt < 420


def test_scale_url_dedup(bigspark):
    """20M crawl URLs over 4M logical pages (5 snapshots each, with
    scheme/case/tracking decoration varying per snapshot): the whole
    stage −0.5 lane is one projection chain + ONE map-combinable
    min/count aggregate keyed by the canonical identity key — no
    window, no join, no second pass over the corpus."""
    from etl_finance_pipeline_spark.operators.corpus import url_dedup

    n = 20_000_000
    pages = 4_000_000
    d = F.col("id")
    url = F.concat(
        F.element_at(
            F.array(F.lit("https://"), F.lit("http://"), F.lit("")),
            (d % 3 + 1).cast("int"),
        ),
        F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("host"),
        (d % 1000).cast("string"),
        F.lit(".com/p/"),
        (d % pages).cast("string"),
        F.when(d % 3 == 0, F.lit("?utm_source=s")).otherwise(F.lit("")),
    )
    urls = bigspark.range(n).select(
        d.alias("doc_id"),
        F.when(d % 7 == 0, F.upper(url)).otherwise(url).alias("url"),
    )
    out = url_dedup(urls)
    _assert_distributed_plan(out, "url_dedup")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:2000]
    rows, dt = _timed_count(out, "url_dedup 20M->4M")
    assert rows == pages
    assert dt < 300


def test_scale_fim_samples(bigspark):
    """5M documents through FIM sample prep: the whole transform
    (gates, split points, PSM/SPM rendering, md5 fingerprint) is one
    exchange-free codegen projection — it must ride the code-route
    scan with zero shuffles."""
    from etl_finance_pipeline_spark.operators.corpus import fim_samples

    n = 5_000_000
    docs = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("def f(x):\n    return x + "), (F.col("id") % 997).cast("string")
        ).alias("text"),
        (F.col("id") % 2 == 0).alias("is_code"),
    )
    out = fim_samples(docs, gate_col="is_code", rate_pct=50,
                      keep_cols=("is_code",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    # force every output column, not just the count path
    agg = out.groupBy("mode").agg(
        F.count("*").alias("n"),
        F.count("sample_md5").alias("n_md5"),
        F.sum(F.coalesce(F.col("fim_j") - F.col("fim_i"), F.lit(0))).alias("mid"),
    )
    t0 = time.time()
    modes = {r["mode"]: r["n"] for r in agg.collect()}
    dt = time.time() - t0
    print(f"\nSCALE fim_samples 5M docs: {modes} in {dt:.1f}s")
    assert sum(modes.values()) == n
    assert modes["psm"] > 0 and modes["spm"] > 0
    # non-code docs never transform: plain >= the 2.5M ungated half
    assert modes["plain"] >= n // 2
    assert dt < 180


def test_scale_kmeans_assign(bigspark):
    """2M vectors assigned to an 8-centroid codebook: Lloyd's argmin
    as one exchange-free projection over the corpus (the bucketing
    map semantic packing and IVF builds ride)."""
    import math

    from etl_finance_pipeline_spark.operators.similarity import kmeans_assign

    n = 2_000_000
    k = 8
    cents = bigspark.createDataFrame(
        [(c, [math.cos(2 * math.pi * c / k), math.sin(2 * math.pi * c / k),
              1.0, 0.0]) for c in range(k)],
        "cluster_id int, cvec array<double>",
    )
    vecs = bigspark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.cos(F.col("id") * 0.001), F.sin(F.col("id") * 0.001),
            F.lit(1.0), F.lit(0.0),
        ).alias("embedding"),
    )
    out = kmeans_assign(vecs, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    t0 = time.time()
    counts = out.groupBy("cluster_id").count().collect()
    dt = time.time() - t0
    total = sum(r["count"] for r in counts)
    print(f"\nSCALE kmeans_assign 2M x 8 cells: {len(counts)} cells in {dt:.1f}s")
    assert total == n
    assert dt < 180


def test_scale_bt_ratings(bigspark):
    """5M pairwise duels over 1,000 items: the distributed reduction
    is ONE map-combinable aggregate to <= k^2/2 sufficient-statistic
    rows; only those (499,500 here) cross to the driver for the fixed
    MM rounds — the documented control-plane collect, exercised at
    its intended item scale (sources/models, not documents)."""
    from etl_finance_pipeline_spark.functions.scalar import portable_hash64
    from etl_finance_pipeline_spark.operators.mlprep import bt_ratings

    n = 5_000_000
    k = 1_000
    d = bigspark.range(n).select(
        (F.col("id") % k).alias("_x"),
        # independent sweep: (id % k, (id // k) % k) covers every
        # ordered pair ~n/k^2 times -> ~k^2/2 distinct unordered pairs
        ((F.col("id") / k).cast("long") % k).alias("_y"),
        portable_hash64(F.col("id").cast("string")).alias("_h"),
    ).filter(F.col("_x") != F.col("_y"))
    duels = d.select(
        F.least("_x", "_y").cast("string").alias("item_a"),
        F.greatest("_x", "_y").cast("string").alias("item_b"),
        # stronger items (lower index) win more often: win prob for a
        # depends on the index gap via a hash threshold
        ((F.col("_h") % 100) < 50 + F.least(
            (F.greatest("_x", "_y") - F.least("_x", "_y")) / 25, F.lit(45.0)
        )).cast("int").alias("win_a"),
    )
    t0 = time.time()
    out = bt_ratings(duels, iters=5)
    rows = out.collect()
    dt = time.time() - t0
    print(f"\nSCALE bt_ratings 5M duels / {k} items: {len(rows)} ratings in {dt:.1f}s")
    assert len(rows) == k
    assert all(r["rating"] > 0 for r in rows)
    strong = next(r["rating"] for r in rows if r["item"] == "0")
    weak = next(r["rating"] for r in rows if r["item"] == "999")
    assert strong > weak
    assert dt < 300


def test_scale_incremental_authority_refresh(bigspark, tmp_path):
    """Continuous-crawl authority maintenance against a 2M-edge
    standing graph: the under-threshold refresh reads ONLY the ingest
    commit's change feed (O(changed files) — asserted on inputFiles,
    disjoint from the 2M-edge v0 files) and carries the standing rank
    without touching the base; the over-threshold refresh re-ranks
    the pinned current snapshot and matches the converged fixpoint
    row count."""
    from etl_finance_pipeline_spark.sources.incremental import (
        aggregate_state_version,
        refresh_authority,
    )
    from etl_finance_pipeline_spark.sources.table_format import (
        read_changes,
        read_table,
        snapshot,
        write_table,
    )

    base = str(tmp_path / "edges")
    state = str(tmp_path / "rank")
    n = 2_000_000
    hosts = 50_000
    standing = bigspark.range(n).select(
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias("src"),
        F.concat(
            F.lit("h"), ((F.col("id") * 31 + 7) % hosts).cast("string")
        ).alias("dst"),
    )
    write_table(standing, base)  # v0: the standing graph

    t0 = time.time()
    assert refresh_authority(bigspark, base, state) is not None
    dt_full = time.time() - t0
    print(f"\n[scale] authority full rank, 2M edges / 50k hosts: {dt_full:.1f}s")
    assert read_table(bigspark, state).count() == hosts
    assert dt_full < 300

    # small ingest commit: under threshold -> carried, and the delta
    # scan plans only the new commit's files
    batch = bigspark.range(1_000).select(
        F.lit("hnew").alias("src"),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias("dst"),
    )
    write_table(batch, base)  # v1
    v0files = {os.path.basename(f["path"]) for f in snapshot(base, 0).files}
    ch = read_changes(bigspark, base, from_version=0)
    scanned = {os.path.basename(p) for p in ch.inputFiles()}
    assert scanned and scanned.isdisjoint(v0files)  # O(changed files)

    t0 = time.time()
    assert (
        refresh_authority(bigspark, base, state, edge_delta_threshold=0.1)
        is None
    )
    dt_carry = time.time() - t0
    print(f"[scale] authority carried (1k-row delta under 10%): {dt_carry:.1f}s")
    assert aggregate_state_version(state) == 0
    # the carry decision costs the delta count, not a graph pass
    assert dt_carry < dt_full / 2

    # past the threshold -> re-rank catches up to the current snapshot
    assert (
        refresh_authority(bigspark, base, state, edge_delta_threshold=0.001)
        is not None
    )
    assert aggregate_state_version(state) == snapshot(base).version
    assert read_table(bigspark, state).count() == hosts + 1


def test_scale_redirect_resolve_partitioned(bigspark):
    """5M start keys chased through a 1.67M-edge redirect map with
    broadcast_map=False — the fetch-log-sized-map configuration: every
    hop must be a key-partitioned join (NO broadcast of the map, no
    single-partition exchange), and per-row state stays a bounded
    visited array."""
    from etl_finance_pipeline_spark.operators.corpus import (
        redirect_resolve,
    )

    n = 5_000_000
    starts = bigspark.range(n).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("url_key")
    )
    i = F.col("id")
    mapping = (
        bigspark.range(n)
        .filter(i % 3 == 0)
        .select(
            F.concat(F.lit("k"), i.cast("string")).alias("src"),
            F.concat(
                F.lit("k"), ((i * 7 + 1) % n).cast("string")
            ).alias("dst"),
        )
    )
    out = redirect_resolve(starts, mapping, broadcast_map=False)
    _assert_distributed_plan(out, "redirect_resolve")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan[:3000]
    rows, dt = _timed_count(out, "redirect_resolve 5M keys")
    assert rows == n
    assert dt < 300


def test_scale_directive_parse(bigspark):
    """2M pages through the page-level directive parses (meta robots,
    canonical link, hreflang alternates): each parse is regexp +
    explode riding the page scan — ZERO exchanges in the extraction
    frames — and the flag counts match the planted arithmetic
    exactly."""
    from etl_finance_pipeline_spark.operators.corpus import (
        canonical_links,
        hreflang_links,
        meta_robots,
        synthesize_directives,
    )

    n = 2_000_000
    base = bigspark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("<html><head></head><body></body></html>").alias("html"),
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 1000).cast("string"),
            F.lit(".com/a/b"),
        ).alias("url_canon"),
        F.concat(
            F.lit("h"),
            (F.col("id") % 1000).cast("string"),
            F.lit(".com/a/b"),
        ).alias("url_key"),
    )
    pages = synthesize_directives(base)

    mr = meta_robots(pages).filter(F.col("noindex"))
    cl = canonical_links(pages)
    hl = hreflang_links(pages)
    for df, label in ((mr, "meta"), (cl, "canonical"), (hl, "hreflang")):
        _assert_distributed_plan(df, f"directive_parse:{label}")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, (label, plan[:2000])

    exp_noindex = sum(1 for d in range(n) if d % 23 == 7 or d % 11 == 4)
    exp_canon = sum(1 for d in range(n) if d % 6 in (2, 5))
    exp_alts = sum(d % 3 + 2 for d in range(n) if d % 4 == 1)
    rows, dt = _timed_count(mr, "meta_robots 2M pages")
    assert rows == exp_noindex
    assert cl.count() == exp_canon
    assert hl.count() == exp_alts
    assert dt < 300
