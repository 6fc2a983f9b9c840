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
