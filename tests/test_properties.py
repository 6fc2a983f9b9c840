"""Property-based tests (hypothesis): engine operators vs pandas
reference semantics on randomized series.

These pin the subtle order/NULL/bucket semantics that unit examples
can miss: OHLC resample vs pandas.resample, interpolation vs
pandas.interpolate, SMA vs pandas.rolling, keep-first dedupe vs
pandas index.duplicated.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.gaps import interpolate_linear, reindex_to_grid
from etl_finance_pipeline_spark.operators.normalize import remove_duplicates
from etl_finance_pipeline_spark.operators.report import sma
from etl_finance_pipeline_spark.operators.resample import resample_ohlc

T0 = datetime(2024, 1, 2, 9, 0)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# series of (minute_offset, value) with unique offsets
series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=120),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(series=series_strategy)
@settings(**SETTINGS)
def test_resample_matches_pandas(spark, series):
    rows = [("X", T0 + timedelta(minutes=m), float(v)) for m, v in series]
    pdf = pd.DataFrame(rows, columns=["SYMBOL", "TIMESTAMP", "CLOSE"]).set_index(
        "TIMESTAMP"
    )
    # pandas: OHLC of the single value column
    want = (
        pdf["CLOSE"]
        .resample("5min")
        .agg(["first", "max", "min", "last"])
        .dropna(subset=["last"])
    )

    sdf = spark.createDataFrame(rows, ["SYMBOL", "TIMESTAMP", "CLOSE"]).withColumns(
        {
            "OPEN": F.col("CLOSE"),
            "HIGH": F.col("CLOSE"),
            "LOW": F.col("CLOSE"),
        }
    )
    got = {
        r["TIMESTAMP"]: r
        for r in resample_ohlc(sdf, "5T", ["SYMBOL"]).collect()
    }
    assert len(got) == len(want)
    for ts, w in want.iterrows():
        g = got[ts.to_pydatetime()]
        assert g["OPEN"] == pytest.approx(w["first"])
        assert g["HIGH"] == pytest.approx(w["max"])
        assert g["LOW"] == pytest.approx(w["min"])
        assert g["CLOSE"] == pytest.approx(w["last"])


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_interpolate_matches_pandas(spark, vals):
    rows = [
        ("X", T0 + timedelta(minutes=i), v if v is None else float(v))
        for i, v in enumerate(vals)
    ]
    sdf = spark.createDataFrame(
        rows, "SYMBOL string, TIMESTAMP timestamp, CLOSE double"
    )
    got = [
        r["CLOSE"]
        for r in interpolate_linear(sdf, ["CLOSE"], ["SYMBOL"])
        .orderBy("TIMESTAMP")
        .collect()
    ]
    want = (
        pd.Series([v for v in vals], dtype="float64")
        .interpolate(method="linear", limit_direction="both")
        .tolist()
    )
    for g, w in zip(got, want):
        if pd.isna(w):
            assert g is None  # all-null column stays null
        else:
            assert g == pytest.approx(w, rel=1e-9, abs=1e-9)


@given(series=series_strategy, window=st.integers(min_value=1, max_value=10))
@settings(**SETTINGS)
def test_sma_matches_pandas(spark, series, window):
    series = sorted(series)
    rows = [("X", T0 + timedelta(minutes=m), float(v)) for m, v in series]
    sdf = spark.createDataFrame(rows, ["SYMBOL", "TIMESTAMP", "CLOSE"])
    got = [
        r[f"SMA_{window}"]
        for r in sma(sdf, "CLOSE", window, ["SYMBOL"]).orderBy("TIMESTAMP").collect()
    ]
    want = (
        pd.Series([v for _, v in series])
        .rolling(window, min_periods=1)
        .mean()
        .tolist()
    )
    assert got == pytest.approx(want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key with collisions
            st.integers(min_value=0, max_value=1000),  # arrival seq
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    )
)
@settings(**SETTINGS)
def test_dedupe_matches_pandas_keep_first(spark, rows):
    sdf = spark.createDataFrame(rows, ["k", "seq"])
    got = sorted(
        (r["k"], r["seq"]) for r in remove_duplicates(sdf, ["k"], order_by=["seq"]).collect()
    )
    pdf = pd.DataFrame(rows, columns=["k", "seq"]).sort_values("seq")
    want = sorted(
        (int(r["k"]), int(r["seq"]))
        for _, r in pdf[~pdf["k"].duplicated(keep="first")].iterrows()
    )
    assert got == want


@given(series=series_strategy)
@settings(**SETTINGS)
def test_reindex_row_count_is_span(spark, series):
    rows = [("X", T0 + timedelta(minutes=m), float(v)) for m, v in series]
    sdf = spark.createDataFrame(rows, ["SYMBOL", "TIMESTAMP", "CLOSE"])
    out = reindex_to_grid(sdf, "1T", ["SYMBOL"])
    mins = sorted(m for m, _ in series)
    assert out.count() == mins[-1] - mins[0] + 1


@given(
    trades=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=25, unique=True,
    ),
    quotes=st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 500),
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1, max_size=25,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, trades, quotes):
    from etl_finance_pipeline_spark.operators.temporal import asof_join

    t_rows = [(k, T0 + timedelta(seconds=s)) for k, s in trades]
    q_rows = [(k, T0 + timedelta(seconds=s), float(v)) for k, s, v in quotes]
    left = spark.createDataFrame(t_rows, "k int, TIMESTAMP timestamp")
    right = spark.createDataFrame(q_rows, "k int, TIMESTAMP timestamp, quote double")
    got = {
        (r["k"], r["TIMESTAMP"]): r["quote_right"]
        for r in asof_join(left, right, ["k"]).collect()
    }

    lp = pd.DataFrame(t_rows, columns=["k", "TIMESTAMP"]).sort_values("TIMESTAMP")
    rp = pd.DataFrame(q_rows, columns=["k", "TIMESTAMP", "quote"]).sort_values(
        "TIMESTAMP"
    )
    want_df = pd.merge_asof(lp, rp, on="TIMESTAMP", by="k", direction="backward")
    assert len(got) == len(lp)
    for _, r in want_df.iterrows():
        w = r["quote"]
        g = got[(r["k"], r["TIMESTAMP"].to_pydatetime())]
        if pd.isna(w):
            assert g is None
        else:
            assert g == pytest.approx(w)


@given(
    present=st.lists(st.integers(0, 80), min_size=2, max_size=50, unique=True),
    short_gap=st.integers(1, 10),
)
@settings(**SETTINGS)
def test_gap_islands_match_reference_clustering(spark, present, short_gap):
    """Islands clustering vs a straightforward single-pass reference
    implementation on the same grid."""
    from etl_finance_pipeline_spark.operators.gaps import detect_gaps

    present = sorted(present)
    rows = [("X", T0 + timedelta(minutes=m), 1.0) for m in present]
    sdf = spark.createDataFrame(rows, "SYMBOL string, TIMESTAMP timestamp, CLOSE double")
    got = sorted(
        (r["start"], r["end"], r["missing_count"])
        for r in detect_gaps(sdf, "1T", ["SYMBOL"], short_gap_minutes=short_gap).collect()
    )

    # reference: walk the full grid, cluster consecutive missing stamps
    have = set(present)
    want = []
    run = []
    for m in range(present[0], present[-1] + 1):
        if m not in have:
            run.append(m)
        elif run:
            want.append(run)
            run = []
    if run:
        want.append(run)
    want = sorted(
        (
            T0 + timedelta(minutes=r[0]),
            T0 + timedelta(minutes=r[-1]),
            len(r),
        )
        for r in want
    )
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=40,
    ),
    buckets=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_salted_agg_equals_plain_agg(spark, rows, buckets):
    """Two-phase salted aggregation must equal the unsalted aggregate
    for every algebraic function, for any salt bucket count."""
    from etl_finance_pipeline_spark.functions.skew import salted_agg

    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: (r["n"], r["mn"], r["mx"], round(r["s"], 6))
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("count", "*"), "mn": ("min", "v"), "mx": ("max", "v"), "s": ("sum", "v")},
            salt_buckets=buckets,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["mn"], r["mx"], round(r["s"], 6))
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum("v").alias("s"),
        )
        .collect()
    }
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=40,
    ).filter(lambda ps: any(a != b for a, b in ps))
)
@settings(**SETTINGS)
def test_star_components_match_propagation(spark, pairs):
    """Large-star/small-star and label propagation agree on arbitrary
    random graphs (hypothesis-generated edge lists)."""
    from etl_finance_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    prop = {
        r["id"]: r["component"]
        for r in connected_components(df, max_iter=60).collect()
    }
    star = {
        r["id"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert star == prop


def test_connected_components_raise_without_convergence(spark):
    """Exhausting max_iter without a fixpoint must raise, not return
    components labeled by non-root intermediates (both variants)."""
    import pytest as _pytest

    from etl_finance_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # a 12-vertex chain: propagation needs ~diameter rounds, star ~log²
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(chain, max_iter=2).collect()
    with _pytest.raises(RuntimeError, match="not stable"):
        connected_components_star(chain, max_iter=1).collect()
    # and with enough rounds both converge to one component
    ok = connected_components(chain, max_iter=20).collect()
    assert {r["component"] for r in ok} == {0}


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta epsilon zeta eta".split()),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.75]),
)
@settings(**SETTINGS)
def test_set_similarity_join_matches_bruteforce_property(spark, docs, threshold):
    """Prefix filtering is LOSSLESS: on arbitrary small corpora the
    result equals the brute-force all-pairs token-set Jaccard join."""
    from itertools import combinations

    from etl_finance_pipeline_spark.operators.dedup import set_similarity_join

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in set_similarity_join(df, threshold=threshold).collect()
    }
    sets = {i: set(w) for i, w in ((i, ws) for i, ws in enumerate(docs))}
    expected = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        jac = inter / len(sets[a] | sets[b])
        if jac >= threshold:
            expected[(a, b)] = jac
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-6


@given(
    vals=st.lists(
        st.floats(min_value=1.0, max_value=1e4, allow_nan=False, width=32),
        min_size=2,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_wilder_rsi_matches_pandas_property(spark, vals):
    """RSI kernel equals the pandas ewm(adjust=False) reference on
    arbitrary positive series."""
    from etl_finance_pipeline_spark.operators.report import wilder_rsi

    rows = [("A", T0 + timedelta(minutes=i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "SYMBOL string, TIMESTAMP timestamp, CLOSE double")
    got = [
        r["RSI"]
        for r in wilder_rsi(df, key_cols=["SYMBOL"], n=14)
        .orderBy("TIMESTAMP")
        .collect()
    ]
    px = pd.Series([float(v) for v in vals])
    d = px.diff()
    ag = d.clip(lower=0.0).iloc[1:].ewm(alpha=1 / 14, adjust=False).mean()
    al = (-d).clip(lower=0.0).iloc[1:].ewm(alpha=1 / 14, adjust=False).mean()
    assert got[0] is None
    for i in range(1, len(vals)):
        g, l = ag.iloc[i - 1], al.iloc[i - 1]
        if g == 0.0 and l == 0.0:
            want = 50.0
        elif l == 0.0:
            want = 100.0
        else:
            want = 100.0 - 100.0 / (1.0 + g / l)
        assert abs(got[i] - want) < 1e-9, i


# random word-soup documents over a tiny vocabulary: high gram-collision
# probability, which is exactly what stresses span merging
_WORDS = ["aa", "bb", "cc", "dd"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14),
    min_size=1,
    max_size=6,
)


def _brute_spans(docs: list[list[str]], k: int) -> set[tuple[int, int, int]]:
    """Reference ExactSubstr: count every k-gram across all docs
    (positions included), mark covered token positions, merge runs."""
    from collections import Counter

    grams: Counter = Counter()
    for toks in docs:
        for i in range(len(toks) - k + 1):
            grams[tuple(toks[i : i + k])] += 1
    out = set()
    for di, toks in enumerate(docs):
        covered = set()
        for i in range(len(toks) - k + 1):
            if grams[tuple(toks[i : i + k])] >= 2:
                covered.update(range(i + 1, i + k + 1))  # 1-based
        for pos in sorted(covered):
            if pos - 1 not in covered:
                end = pos
                while end + 1 in covered:
                    end += 1
                out.add((di, pos, end))
    return out


@given(docs=docs_strategy, k=st.integers(min_value=2, max_value=4))
@settings(**SETTINGS)
def test_duplicate_token_spans_matches_bruteforce(spark, docs, k):
    from etl_finance_pipeline_spark.operators.dedup import (
        duplicate_token_spans,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs) if toks]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_token_spans(df, k=k).collect()
    }
    # rows carry only non-empty docs; map brute-force doc indexes back
    # to the original ids
    id_map = [i for i, toks in enumerate(docs) if toks]
    expected = {
        (id_map[di], s, e)
        for (di, s, e) in _brute_spans([docs[i] for i in id_map], k)
    }
    assert got == expected


doc_corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=10,
)


@given(docs=doc_corpus_strategy)
@settings(**SETTINGS)
def test_kn_bigram_lm_matches_reference(spark, docs):
    """KN bigram counts + probabilities vs a direct Python reference
    over random small corpora (including empty and 1-token docs)."""
    from collections import Counter, defaultdict

    from etl_finance_pipeline_spark.operators.ngram_lm import kn_bigram_lm

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.w1, r.w2): (r.c12, r.c1, r.nl, r.nr, r.prob)
        for r in kn_bigram_lm(df, round_digits=None).collect()
    }
    bc = Counter()
    for toks in docs:
        toks = [t for t in " ".join(toks).lower().split()] or [""]
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    if not bc:
        assert got == {}
        return
    c1 = Counter(); nl = defaultdict(set); nr = defaultdict(set)
    for (a, b), c in bc.items():
        c1[a] += c
        nl[a].add(b)
        nr[b].add(a)
    bt = len(bc)
    D = 0.75
    assert set(got) == set(bc)
    for (a, b), (gc12, gc1, gnl, gnr, gp) in got.items():
        assert (gc12, gc1, gnl, gnr) == (bc[(a, b)], c1[a], len(nl[a]), len(nr[b]))
        want = (bc[(a, b)] - D) / c1[a] + (D * len(nl[a]) / c1[a]) * (len(nr[b]) / bt)
        assert gp == pytest.approx(want, rel=1e-12)


@given(docs=doc_corpus_strategy, min_docs=st.integers(min_value=1, max_value=3))
@settings(**SETTINGS)
def test_line_dedup_matches_reference(spark, docs, min_docs):
    """line_dedup keep='none' vs a direct Python reference: a line
    survives iff its text occurs in fewer than min_docs distinct
    documents (2-word pseudo-lines over random corpora)."""
    from collections import defaultdict

    from etl_finance_pipeline_spark.operators.corpus import (
        line_dedup,
        segment_lines,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    seg = segment_lines(df, words_per_line=2)
    got = {
        (r.doc_id, r.pos, r.line)
        for r in line_dedup(seg, min_docs=min_docs).collect()
    }
    # reference segmentation mirrors segment_lines(words_per_line=2)
    ref_lines = {}
    for i, toks in enumerate(docs):
        t = " ".join(toks).lower().split() or [""]
        ref_lines[i] = [" ".join(t[j : j + 2]) for j in range(0, len(t), 2)]
    docfreq = defaultdict(set)
    for i, ls in ref_lines.items():
        for line in ls:
            docfreq[line].add(i)
    want = {
        (i, p, line)
        for i, ls in ref_lines.items()
        for p, line in enumerate(ls)
        if len(docfreq[line]) < min_docs
    }
    assert got == want


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),  # score bucket (forces ties)
            st.booleans(),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_binary_auc_matches_pair_counting(spark, data):
    """Exact AUC vs the O(P·N) pair-counting definition
    (ties count half) on random tied score distributions."""
    from etl_finance_pipeline_spark.operators.mlprep import binary_auc

    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    if not pos or not neg:
        return  # AUC undefined
    rows = [(float(s) / 8.0, int(y)) for s, y in data]
    df = spark.createDataFrame(rows, "probe_score double, label int")
    got = binary_auc(df).collect()[0]["auc"]
    wins = sum(1.0 for p in pos for n in neg if p > n)
    ties = sum(0.5 for p in pos for n in neg if p == n)
    want = (wins + ties) / (len(pos) * len(neg))
    assert got == pytest.approx(want, abs=2e-6)


@given(
    docs=doc_corpus_strategy,
    target_mask=st.lists(st.booleans(), min_size=10, max_size=10),
)
@settings(**SETTINGS)
def test_dsir_weights_match_reference(spark, docs, target_mask):
    """DSIR log weights vs a direct Python reference reproducing the
    md5 bucket hashing and Laplace log-ratio exactly."""
    import hashlib
    import math
    from collections import Counter

    from etl_finance_pipeline_spark.operators.dsir import dsir_weights

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    tgt_ids = {i for i, t in enumerate(docs) if target_mask[i % 10]}
    if not tgt_ids:
        tgt_ids = {0}
    target = df.filter(F.col("doc_id").isin(*tgt_ids))
    B = 16
    got = {
        r.doc_id: (r.n_grams, r.logw)
        for r in dsir_weights(df, target, n_buckets=B).collect()
    }

    def grams(toks):
        t = " ".join(toks).lower().split() or [""]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    tcnt, rcnt = Counter(), Counter()
    for i, toks in enumerate(docs):
        for g in grams(toks):
            rcnt[bucket(g)] += 1
            if i in tgt_ids:
                tcnt[bucket(g)] += 1
    tn, rn = sum(tcnt.values()), sum(rcnt.values())
    ratio = {
        b: math.log((tcnt[b] + 1) / (tn + B)) - math.log((rcnt[b] + 1) / (rn + B))
        for b in range(B)
    }
    for i, toks in enumerate(docs):
        gs = grams(toks)
        want = sum(ratio[bucket(g)] for g in gs)
        assert got[i][0] == len(gs)
        assert got[i][1] == pytest.approx(want, abs=2e-6)


@given(docs=doc_corpus_strategy)
@settings(**SETTINGS)
def test_containment_matches_reference(spark, docs):
    """Containment pairs vs a direct shingle-set Python reference
    (k=2 shingles; directed pairs, threshold 0)."""
    from etl_finance_pipeline_spark.operators.dedup import containment_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, shingle_k=2, threshold=0.0).collect()
    }
    sets = {}
    for i, toks in enumerate(docs):
        t = " ".join(toks).lower().split() or [""]
        sets[i] = {" ".join(t[j : j + 2]) for j in range(len(t) - 1)}
    want = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = inter / len(sets[a])
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)


@given(
    fps=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=30,
    ),
    max_hamming=st.integers(min_value=0, max_value=6),
    sub=st.booleans(),
)
@settings(**SETTINGS)
def test_hamming_pairs_match_bruteforce_property(spark, fps, max_hamming, sub):
    """Lossless banded Hamming (bands=8 > any max_hamming here) vs
    brute force over arbitrary int64 fingerprints INCLUDING
    duplicates and negative values — covers the identical-fp
    collapse, the first-match dedup, and (sub=True) the multi-index
    sub-banding path."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    rows = [(i, f) for i, f in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            df, "fp", id_col="doc_id", bits=64, bands=8,
            max_hamming=max_hamming, max_bucket_size=None,
            sub_band_threshold=(2 if sub else None),
        ).collect()
    }
    import itertools

    expected = {}
    for (ia, fa), (ib, fb) in itertools.combinations(rows, 2):
        h = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
        if h <= max_hamming:
            expected[(min(ia, ib), max(ia, ib))] = h
    assert got == expected


@given(
    fps=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=24,
    ),
    max_hamming=st.integers(min_value=0, max_value=6),
    cap=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_hamming_pairs_guarded_mode_property(spark, fps, max_hamming, cap):
    """Guarded mode (max_bucket_size set) must emit every pair present
    in ANY surviving bucket — including a pair whose FIRST matching
    band's bucket was dropped by the skew guard but that still shares
    a surviving later band (the bitwise first-band shortcut would
    discard it). Identical fingerprints bypass the banding entirely,
    so Hamming-0 duplicate pairs always surface regardless of cap."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    bits, bands = 64, 8
    sb = bits // bands
    rows = [(i, f) for i, f in enumerate(fps)]
    df = spark.createDataFrame(rows, "doc_id long, fp long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(
            df, "fp", id_col="doc_id", bits=bits, bands=bands,
            max_hamming=max_hamming, max_bucket_size=cap,
        ).collect()
    }

    # bucket member weight = pre-collapse row count per (band, key)
    m64 = (1 << 64) - 1
    weight: dict = {}
    for _i, f in rows:
        u = f & m64
        for b in range(bands):
            k = (b, (u >> (b * sb)) & ((1 << sb) - 1))
            weight[k] = weight.get(k, 0) + 1

    import itertools

    expected = {}
    for (ia, fa), (ib, fb) in itertools.combinations(rows, 2):
        h = bin((fa ^ fb) & m64).count("1")
        if h > max_hamming:
            continue
        if fa == fb:
            expected[(min(ia, ib), max(ia, ib))] = 0
            continue
        ua, ub = fa & m64, fb & m64
        survives = any(
            (ua >> (b * sb)) & ((1 << sb) - 1) == (ub >> (b * sb)) & ((1 << sb) - 1)
            and weight[(b, (ua >> (b * sb)) & ((1 << sb) - 1))] <= cap
            for b in range(bands)
        )
        if survives:
            expected[(min(ia, ib), max(ia, ib))] = h
    assert got == expected


def test_hamming_pairs_rejects_conflicting_knobs(spark):
    """max_bucket_size (lossy guard) and sub_band_threshold (lossless
    multi-index) are contradictory contracts — asking for both raises
    instead of silently ignoring one."""
    from etl_finance_pipeline_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame([(1, 5), (2, 7)], "doc_id long, fp long")
    with pytest.raises(ValueError, match="mutually exclusive"):
        hamming_pairs(
            df, "fp", id_col="doc_id",
            max_bucket_size=100, sub_band_threshold=64,
        )


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=10),
        min_size=1,
        max_size=12,
    ),
    pieces=st.lists(
        st.text(alphabet="abc", min_size=2, max_size=4),
        min_size=0,
        max_size=6,
    ),
)
@settings(**SETTINGS)
def test_wordpiece_encode_matches_greedy_reference(spark, words, pieces):
    """Greedy longest-match-first segmentation vs a direct Python
    re-implementation over random words and vocabularies."""
    from etl_finance_pipeline_spark.operators.tokenizer import wordpiece_encode

    vocab = set(pieces)
    maxlen = max((len(p) for p in vocab), default=1)

    def greedy(w):
        pos, np = 0, 0
        while pos < len(w):
            step = 1
            for ln in range(min(maxlen, len(w) - pos), 1, -1):
                if w[pos:pos + ln] in vocab:
                    step = ln
                    break
            pos += step
            np += 1
        return np

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(sorted(vocab))] or [(0, "")],
        ["merge_round", "merged"],
    )
    out = wordpiece_encode(docs, merges).collect()
    # tokens() lowercases and splits on whitespace; the alphabet is
    # already lowercase, and hypothesis words are non-empty
    expect_words = [w for w in text.split() if len(w) <= 16]
    if not expect_words:
        assert out == []
        return
    row = out[0]
    assert row["n_words"] == len(expect_words)
    assert row["n_pieces"] == sum(greedy(w) for w in expect_words)
