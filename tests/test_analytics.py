"""Sketches, triangle counting, association rules, bloom semi-join,
Z-order layout (operators/sketch.py, graph.py::triangle_count,
association.py, bloom.py, functions/layout.py::zvalue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.layout import quantize, zvalue
from etl_finance_pipeline_spark.operators.association import association_rules
from etl_finance_pipeline_spark.operators.bloom import bloom_build, bloom_probe
from etl_finance_pipeline_spark.operators.graph import triangle_count
from etl_finance_pipeline_spark.operators.sketch import hll_distinct, kmv_distinct


# ---------------------------------------------------------------- sketches


def test_hll_estimate_within_standard_error(spark):
    # 2000 distinct values, b=9 -> m=512, relative error ~1.04/sqrt(m)=4.6%
    df = spark.range(6000).select(
        F.lit("g").alias("g"), (F.col("id") % 2000).alias("v")
    )
    est = hll_distinct(df, ["g"], "v", b=9).collect()[0]["hll_estimate"]
    assert abs(est - 2000) / 2000 < 0.15  # 3 sigma


def test_hll_is_insensitive_to_duplication(spark):
    # A sketch over values must depend only on the distinct set.
    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    dup = base.unionAll(base).unionAll(base)
    e1 = hll_distinct(base, ["g"], "v").collect()[0]["hll_estimate"]
    e2 = hll_distinct(dup, ["g"], "v").collect()[0]["hll_estimate"]
    assert e1 == e2


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = kmv_distinct(df, ["g"], "v", k=64).collect()[0]["kmv_estimate"]
    assert est == 40.0


def test_kmv_estimate_within_standard_error(spark):
    # n=5000, k=64 -> relative error ~1/sqrt(k-2) = 12.7%
    df = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = kmv_distinct(df, ["g"], "v", k=64).collect()[0]["kmv_estimate"]
    assert abs(est - 5000) / 5000 < 0.4  # 3 sigma


def test_sketches_group_independently(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") < 40, "small").otherwise("big").alias("g"),
        F.col("id").alias("v"),
    )
    kmv = {r["g"]: r["kmv_estimate"] for r in kmv_distinct(df, ["g"], "v").collect()}
    assert kmv["small"] == 40.0  # below k -> exact
    assert kmv["big"] > 300


# ---------------------------------------------------------------- triangles


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; a pendant edge adds none.
    edges = [(a, b) for a in range(4) for b in range(4) if a != b] + [(3, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count(df).collect()[0]["n_triangles"] == 4


def test_triangle_count_ignores_direction_duplicates_loops(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], ["src", "dst"]
    )
    assert triangle_count(df).collect()[0]["n_triangles"] == 1


def test_triangle_count_per_vertex(spark):
    # Two triangles sharing edge (1,2): vertices 1,2 in both.
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (1, 4)], ["src", "dst"]
    )
    counts = {r["id"]: r["n_triangles"] for r in
              triangle_count(df, per_vertex=True).collect()}
    assert counts == {1: 2, 2: 2, 3: 1, 4: 1}


# ---------------------------------------------------------------- association


def test_association_rules_hand_computed(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "basket", "item", min_support=2).collect()
    }
    ab = rules[("a", "b")]
    # supp(a,b)=2, supp(a)=3 -> conf=2/3; P(b)=2/4 -> lift=(2/3)/(1/2)
    assert ab["pair_support"] == 2
    assert abs(ab["confidence"] - 2 / 3) < 1e-6
    assert abs(ab["lift"] - 4 / 3) < 1e-6
    ba = rules[("b", "a")]
    assert ba["confidence"] == 1.0  # supp(a,b)/supp(b) = 2/2
    assert ("a", "c") not in rules  # below min_support


def test_association_rules_mega_basket_dropped(spark):
    big = [(1, f"i{j}") for j in range(10)] + [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(big, ["basket", "item"])
    rules = association_rules(
        df, "basket", "item", min_support=2, max_basket_items=5
    ).collect()
    # Basket 1 (10 items) is dropped: only the (i0,i1) pair from 2/3 remains.
    pairs = {(r["antecedent"], r["consequent"]) for r in rules}
    assert pairs == {("i0", "i1"), ("i1", "i0")}


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 200, 2).select(F.col("id").alias("k"))  # evens
    bloom = bloom_build(build, "k", bits=16)
    probe = spark.range(200).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom_probe(probe, "k", bloom, bits=16).collect()}
    bloom.unpersist()
    assert set(range(0, 200, 2)) <= passed  # every member passes


def test_bloom_filters_most_non_members(spark):
    build = spark.range(50).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", bits=16)
    probe = spark.range(10_000).select(F.col("id").alias("k"))
    n_pass = bloom_probe(probe, "k", bloom, bits=16).count()
    bloom.unpersist()
    # 50 true + fpr ~ (1-e^(-150/65536))^3 ~ 1.2e-8 -> essentially exact
    assert 50 <= n_pass <= 60


def test_bloom_probe_keeps_all_columns_and_duplicates(spark):
    build = spark.createDataFrame([(7,)], ["k"])
    bloom = bloom_build(build, "k", bits=16)
    probe = spark.createDataFrame([(7, "x"), (7, "y"), (8, "z")], ["k", "payload"])
    out = bloom_probe(probe, "k", bloom, bits=16).collect()
    bloom.unpersist()
    assert sorted(r["payload"] for r in out) == ["x", "y"]


# ---------------------------------------------------------------- z-order


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], ["x", "y"])
    out = df.select(zvalue(F.col("x"), F.col("y"), 2).alias("z")).collect()
    # x bits at even positions: x=3 -> 0b0101=5; y=3 -> 0b1010=10; both -> 15
    assert [r["z"] for r in out] == [5, 10, 15]


def test_quantize_bounds_and_degenerate_span(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], ["v"])
    out = df.select(
        quantize(F.col("v"), F.lit(0.0), F.lit(100.0), 8).alias("q"),
        quantize(F.col("v"), F.lit(7.0), F.lit(7.0), 8).alias("qz"),
    ).collect()
    qs = [r["q"] for r in out]
    assert qs[0] == 0 and qs[2] == 255 and 0 < qs[1] < 255
    assert all(r["qz"] == 0 for r in out)


def test_zorder_locality_beats_single_column_sort(spark):
    # After z-bucketing, per-bucket ranges on BOTH dims must be far
    # tighter than the global range (the data-skipping property).
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("int").alias("y")
    )
    z = df.select(
        "x", "y", F.shiftright(zvalue(F.col("x"), F.col("y"), 6), 6).alias("f")
    )
    stats = z.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("sx"), (F.max("y") - F.min("y")).alias("sy")
    ).agg(F.max("sx").alias("mx"), F.max("sy").alias("my")).collect()[0]
    assert stats["mx"] <= 15 and stats["my"] <= 15  # vs global span 63


# ---------------------------------------------------------------- count-min


def test_cms_never_undercounts_and_exact_without_collisions(spark):
    from etl_finance_pipeline_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame(
        [(v,) for v in ["a"] * 5 + ["b"] * 3 + ["c"] * 2], ["v"]
    )
    sketch = count_min_sketch(df, "v", d=4, w_buckets=4096)
    keys = df.select("v").distinct()
    est = {r["v"]: r["cms_estimate"] for r in
           cms_estimate(keys, sketch, "v", d=4, w_buckets=4096).collect()}
    # 3 keys in 4096 buckets: no collisions -> estimates are exact
    assert est == {"a": 5, "b": 3, "c": 2}


def test_cms_overcount_bounded_by_min_row(spark):
    from etl_finance_pipeline_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.range(2000).select((F.col("id") % 500).alias("v"))  # 4 each
    sketch = count_min_sketch(df, "v", d=4, w_buckets=64)
    keys = df.select("v").distinct()
    rows = cms_estimate(keys, sketch, "v", d=4, w_buckets=64).collect()
    # Guaranteed >= true count; min-of-4-rows keeps worst overcount sane
    assert all(r["cms_estimate"] >= 4 for r in rows)
    assert min(r["cms_estimate"] for r in rows) < 500  # collisions don't explode


# ---------------------------------------------------------------- drift


def test_source_drift_zero_for_identical_distributions(spark, tmp_path):
    import os

    from etl_finance_pipeline_spark.plans.analytics import q_source_drift

    # Two sources with the SAME token distribution -> corpus equals
    # each source's distribution -> KL = JS = 0.
    rows = [(i, "x y z", "s1" if i % 2 else "s2", "en", 5) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "lang", "n_chars"])
    df.write.mode("overwrite").parquet(os.path.join(tmp_path, "documents.parquet"))
    out = {r["source"]: r for r in q_source_drift(spark, str(tmp_path)).collect()}
    assert out["s1"]["kl_divergence"] == 0.0
    assert out["s1"]["js_divergence"] == 0.0


def test_source_drift_detects_divergent_source(spark, tmp_path):
    import math
    import os

    from etl_finance_pipeline_spark.plans.analytics import q_source_drift

    rows = [(i, "aa bb", "base", "en", 5) for i in range(9)] + [
        (9, "zz qq", "weird", "en", 5)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source", "lang", "n_chars"])
    df.write.mode("overwrite").parquet(os.path.join(tmp_path, "documents.parquet"))
    out = {r["source"]: r for r in q_source_drift(spark, str(tmp_path)).collect()}
    # "weird" tokens are 10% of the corpus: KL(weird||corpus)=ln(10)
    assert abs(out["weird"]["kl_divergence"] - math.log(10)) < 1e-5
    assert out["weird"]["js_divergence"] > out["base"]["js_divergence"]
    # JS is bounded by ln 2
    assert all(0 <= r["js_divergence"] <= math.log(2) + 1e-9 for r in out.values())


# ---------------------------------------------------------------- funnel


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_window_funnel_depths_and_window_bound(spark):
    from etl_finance_pipeline_spark.operators.funnel import window_funnel

    rows = [
        # u1 completes all 3 inside the hour
        (1, _ts("2024-01-01 10:00:00"), "view"),
        (1, _ts("2024-01-01 10:10:00"), "click"),
        (1, _ts("2024-01-01 10:20:00"), "purchase"),
        # u2: purchase outside the 1h window of first view
        (2, _ts("2024-01-01 10:00:00"), "view"),
        (2, _ts("2024-01-01 10:30:00"), "click"),
        (2, _ts("2024-01-01 11:30:00"), "purchase"),
        # u3: click BEFORE view -> not matched (strict order)
        (3, _ts("2024-01-01 09:00:00"), "click"),
        (3, _ts("2024-01-01 10:00:00"), "view"),
        # u4 never views -> absent
        (4, _ts("2024-01-01 10:00:00"), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["user_id"]: r
        for r in window_funnel(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"], "1 hour"
        ).collect()
    }
    assert out[1]["depth"] == 3
    assert out[2]["depth"] == 2 and out[2]["t3"] is None
    assert out[3]["depth"] == 1
    assert 4 not in out


def test_window_funnel_greedy_earliest_match(spark):
    from etl_finance_pipeline_spark.operators.funnel import window_funnel

    # Earliest view anchors the window even when a later view would
    # let the purchase qualify: windowFunnel is anchored greedy.
    rows = [
        (1, _ts("2024-01-01 10:00:00"), "view"),
        (1, _ts("2024-01-01 12:00:00"), "view"),
        (1, _ts("2024-01-01 12:10:00"), "click"),
        (1, _ts("2024-01-01 12:20:00"), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    row = window_funnel(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"], "1 hour"
    ).collect()[0]
    # anchored at 10:00 -> click/purchase at 12:xx are out of window
    assert row["depth"] == 1


def test_funnel_conversion_report(spark):
    from etl_finance_pipeline_spark.operators.funnel import funnel_conversion

    rows = []
    for u in range(10):
        rows.append((u, _ts("2024-01-01 10:00:00"), "view"))
    for u in range(6):
        rows.append((u, _ts("2024-01-01 10:10:00"), "click"))
    for u in range(2):
        rows.append((u, _ts("2024-01-01 10:20:00"), "purchase"))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["depth"]: r
        for r in funnel_conversion(
            df, "user_id", "ts", "event_type", ["view", "click", "purchase"], "1 hour"
        ).collect()
    }
    assert out[1]["n_users"] == 10 and out[1]["conversion_rate"] == 1.0
    assert out[2]["n_users"] == 6 and abs(out[2]["conversion_rate"] - 0.6) < 1e-9
    assert out[3]["n_users"] == 2 and abs(out[3]["conversion_rate"] - 0.2) < 1e-9


# ---------------------------------------------------------------- BFS


def test_bfs_distances_path_graph(spark):
    from etl_finance_pipeline_spark.operators.graph import bfs_distances

    fwd = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["src", "dst"]
    )
    edges = fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([(1,)], ["id"])
    out = {r["id"]: r["distance"] for r in
           bfs_distances(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is beyond max_hops; 10/11 unreachable


def test_bfs_multi_source_takes_nearest(spark):
    from etl_finance_pipeline_spark.operators.graph import bfs_distances

    fwd = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    edges = fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = spark.createDataFrame([(1,), (4,)], ["id"])
    out = {r["id"]: r["distance"] for r in
           bfs_distances(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 0}


def test_clustering_coefficient_known_graph(spark):
    from etl_finance_pipeline_spark.operators.graph import clustering_coefficient

    # K4: every vertex has deg 3, sits in 3 triangles -> coeff 1.0;
    # pendant vertex 9 (deg 1) excluded; vertex 3 bridges -> deg 4.
    edges = [(a, b) for a in range(4) for b in range(4) if a < b] + [(3, 9), (9, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r["id"]: r for r in clustering_coefficient(df).collect()}
    for v in (0, 1, 2):
        assert out[v]["deg"] == 3 and out[v]["n_triangles"] == 3
        assert out[v]["clustering_coeff"] == 1.0
    # vertex 3: deg 4 (K4 + pendant), still 3 triangles -> 2*3/(4*3)=0.5
    assert out[3]["deg"] == 4 and out[3]["clustering_coeff"] == 0.5
    # vertex 9: deg 2 (3 and 5), no triangle -> 0.0
    assert out[9]["n_triangles"] == 0 and out[9]["clustering_coeff"] == 0.0
    assert 5 not in out  # deg 1


def test_hll_merge_is_lossless(spark):
    """The merged sketch must EQUAL the sketch of the unioned data —
    the property that lets per-day/per-segment sketches answer any
    later union query without a rescan."""
    from etl_finance_pipeline_spark.operators.sketch import (
        hll_estimate_from_sketch,
        hll_merge,
        hll_sketch,
    )

    a = spark.range(0, 3000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(2000, 5000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    sk = hll_sketch(a.unionAll(b).select(F.lit("ab").alias("tag"), "v"), ["tag"], "v")
    direct = hll_estimate_from_sketch(sk, ["tag"]).collect()[0]["hll_estimate"]
    merged_sk = hll_merge(
        hll_sketch(a.select(F.lit("ab").alias("tag"), "v"), ["tag"], "v").unionAll(
            hll_sketch(b.select(F.lit("ab").alias("tag"), "v"), ["tag"], "v")
        ),
        ["tag"],
    )
    merged = hll_estimate_from_sketch(merged_sk, ["tag"]).collect()[0]["hll_estimate"]
    assert merged == direct  # bit-identical, not just close
    assert abs(merged - 5000) / 5000 < 0.15


# ------------------------------------------------------- sketch guards


def test_double_hash_row_guard(spark):
    """h1 + i*h2 over 60-bit words overflows signed 64-bit at i >= 8:
    the sketch/bloom builders must refuse d/k outside 1..8 up front
    instead of failing at runtime under ANSI mode."""
    import pytest as _pytest

    from etl_finance_pipeline_spark.operators.sketch import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([("a",)], ["v"])
    with _pytest.raises(ValueError, match="1..8"):
        count_min_sketch(df, "v", d=9)
    with _pytest.raises(ValueError, match="1..8"):
        cms_estimate(df, df, "v", d=0)
    with _pytest.raises(ValueError, match="1..8"):
        bloom_build(df, "v", k=9)
    # d=8 is the documented ceiling and must work
    assert count_min_sketch(df, "v", d=8, w_buckets=64).count() == 8


def test_histogram_quantile_edges_and_interpolation(spark):
    """q=0.0 resolves to the first occupied bin (clamped target), and
    interior quantiles interpolate within one bin width of exact."""
    from etl_finance_pipeline_spark.operators.sketch import histogram_quantile

    df = spark.range(1000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    out = histogram_quantile(
        df, ["g"], "v", quantiles=[0.0, 0.5, 1.0], bins=100, lo=0.0, hi=1000.0
    ).collect()[0]
    assert out["q0_0"] is not None and out["q0_0"] <= 10.0  # first bin
    assert abs(out["q0_5"] - 500.0) <= 10.0  # within one bin width
    assert out["q1_0"] is not None and out["q1_0"] <= 1000.0


def test_event_transitions_counts_and_probabilities(spark):
    """Hand-computed first-order transition matrix: per-user ordered
    pairs, P(to|from) normalized over each from-row."""
    from datetime import datetime, timedelta

    from etl_finance_pipeline_spark.operators.funnel import event_transitions

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: view > click > view > purchase
        (1, t0, 1, "view"), (2, t0 + timedelta(minutes=1), 1, "click"),
        (3, t0 + timedelta(minutes=2), 1, "view"),
        (4, t0 + timedelta(minutes=3), 1, "purchase"),
        # user 2: view > view
        (5, t0, 2, "view"), (6, t0 + timedelta(minutes=1), 2, "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {
        (r["from_event"], r["to_event"]): (r["n_transitions"], r["p"])
        for r in event_transitions(df).collect()
    }
    # from 'view': click 1, purchase 1, view 1 -> p = 1/3 each
    assert got[("view", "click")] == (1, 0.333333)
    assert got[("view", "purchase")] == (1, 0.333333)
    assert got[("view", "view")] == (1, 0.333333)
    assert got[("click", "view")] == (1, 1.0)
    assert ("purchase", "view") not in got  # last event has no successor


def test_label_propagation_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge: after a few rounds
    each clique converges to its min id; deterministic tiebreak."""
    from itertools import combinations

    from etl_finance_pipeline_spark.operators.graph import label_propagation

    edges = [(a, b) for a, b in combinations([1, 2, 3, 4], 2)]
    edges += [(a, b) for a, b in combinations([10, 11, 12, 13], 2)]
    edges.append((4, 10))  # bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["id"]: r["label"] for r in label_propagation(df, rounds=4).collect()}
    assert {out[1], out[2], out[3]} == {1}
    assert {out[11], out[12], out[13]} == {10}


def test_label_propagation_isolated_vertex_self_loop_dropped(spark):
    from etl_finance_pipeline_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2), (3, 3)], "src long, dst long")
    out = {r["id"]: r["label"] for r in label_propagation(df, rounds=2).collect()}
    # self-loop-only vertex 3 is dropped (no real edges); 1-2 merge
    assert 3 not in out
    assert out[1] == out[2] == 1


def test_cuped_reduces_variance_on_correlated_covariate(spark):
    """With y strongly correlated to x, the CUPED-adjusted per-arm
    means must move toward each other (the arm difference shrinks)
    and theta must approximate the known slope."""
    import __spark_entry__ as entrymod

    rows = []
    # y = 2x + arm_effect; arm = user % 2; x varies by user
    for u in range(200):
        x = 5 + (u * 7) % 45  # covariate: view count
        rows += [(u * 1000 + i, u, "view", 0.0) for i in range(x)]
        y = 2.0 * x + (1.0 if u % 2 else 0.0)
        rows.append((u * 1000 + 999, u, "purchase", y))
    df = spark.createDataFrame(rows, "event_id long, user_id long, event_type string, value double")
    # inline the query body against this frame
    from etl_finance_pipeline_spark.plans.analytics import q_cuped_experiment  # noqa: F401
    from etl_finance_pipeline_spark.functions.scalar import portable_round  # noqa: F401
    from pyspark.sql import functions as F

    per_user = df.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).cast("long").alias("x"),
        F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(30,6)"))), F.lit(0).cast("decimal(30,6)")).alias("y"),
    ).withColumn("arm", F.pmod(F.col("user_id"), F.lit(2)).cast("int"))
    g = per_user.agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).collect()[0]
    theta = float(g["n"] * g["sxy"] - g["sx"] * g["sy"]) / float(g["n"] * g["sxx"] - g["sx"] * g["sx"])
    assert abs(theta - 2.0) < 0.05  # recovers the slope
    arms = per_user.groupBy("arm").agg(
        F.avg(F.col("y").cast("double")).alias("my"), F.avg("x").alias("mx")
    ).collect()
    gx = sum(r["mx"] for r in arms) / 2  # arms are same-sized by construction? close enough
    adj = {r["arm"]: r["my"] - theta * (r["mx"] - gx) for r in arms}
    raw = {r["arm"]: r["my"] for r in arms}
    assert abs(adj[1] - adj[0] - 1.0) < abs(raw[1] - raw[0] - 1.0) + 1e-9
    assert abs(adj[1] - adj[0] - 1.0) < 0.2  # near the true effect


# ------------------------------------------------------------ ml prep


def test_k_anonymity_flags_small_classes(spark):
    from etl_finance_pipeline_spark.operators.mlprep import k_anonymity_audit

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 2)] * 2, "seg string, nat long"
    )
    got = {(r["seg"], r["nat"]): (r["class_size"], r["violates_k"])
           for r in k_anonymity_audit(df, ["seg", "nat"], k=3).collect()}
    assert got[("a", 1)] == (5, False)
    assert got[("b", 2)] == (2, True)


def test_impute_group_mean_fills_and_flags(spark):
    from etl_finance_pipeline_spark.operators.mlprep import impute_group_mean

    df = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g1", None),
         (4, "g2", None)],  # g2 all-NULL -> stays NULL
        "k long, g string, v double",
    )
    got = {r["k"]: (r["v"], r["v_imputed"])
           for r in impute_group_mean(df, "v", ["g"]).collect()}
    assert got[3] == (15.0, True)
    assert got[1] == (10.0, False)
    assert got[4] == (None, False)


def test_string_index_frequency_then_lexical(spark):
    from etl_finance_pipeline_spark.operators.mlprep import string_index

    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",), (None,)], "x string"
    )
    encoded, mapping = string_index(df, "x")
    m = {r["value"]: r["index"] for r in mapping.collect()}
    # a and b tie at freq 2 -> lexical: a=0, b=1; c=2
    assert m == {"a": 0, "b": 1, "c": 2}
    got = {r["x"]: r["x_idx"] for r in encoded.collect()}
    assert got["c"] == 2 and got[None] is None


def test_k_core_peels_periphery(spark):
    """A 4-clique with pendant chains: the 3-core is exactly the
    clique (every pendant peels, including cascades); 2-core keeps
    the clique only; k above the max degree empties the graph."""
    from etl_finance_pipeline_spark.operators.graph import k_core

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pendants = [(1, 10), (10, 11), (11, 12), (2, 20)]
    pairs = spark.createDataFrame(clique + pendants, ["id_a", "id_b"])
    core3 = {r["id"]: r["core_degree"] for r in k_core(pairs, k=3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    core9 = k_core(pairs, k=9).collect()
    assert core9 == []
