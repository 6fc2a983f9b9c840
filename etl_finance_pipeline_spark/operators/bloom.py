"""Bloom-filter pre-filtered semi-join: build a bloom filter over the
(filtered) build side's join keys and use it to discard probe-side
rows BEFORE the join shuffle — the classic 100 TB trick for a
selective dim→fact join, where most fact rows match nothing and
shipping them to the shuffle is pure waste. Spark can inject runtime
bloom filters itself (`spark.sql.optimizer.runtime.bloomFilter.enabled`),
but an explicit operator lets a pipeline persist/reuse the filter
across queries and lets us gate its exact semantics with an oracle.

Determinism: k hash positions per key by double hashing (Kirsch &
Mitzenmacher 2006) over the two 60-bit md5 words — pos_i =
(h1 + i*h2) mod m — the identical arithmetic the DuckDB oracle runs,
so the surviving row set (true matches + reproducible false
positives) hash-matches exactly.

Scale shape: the filter is a distinct set of bit positions (≤ m =
2^bits, i.e. KBs–MBs as a 1-column frame) — Catalyst broadcasts it;
the probe side explodes k positions per row (narrow), broadcast-joins
the bit set, and keeps rows whose k positions all hit. No shuffle
touches the probe table until AFTER the filter has discarded
non-matching rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.sketch import (
    _check_double_hash_rows,
    hash_word,
)


def _positions(col, k: int, m: int):
    _check_double_hash_rows(k, "k")
    h1 = hash_word(col, 1)
    h2 = hash_word(col, 16)
    return F.array(*[((h1 + F.lit(i) * h2) % m).alias(f"p{i}") for i in range(k)])


def bloom_build(
    df: DataFrame, key_col: str, bits: int = 16, k: int = 3
) -> DataFrame:
    """Bloom filter over ``df[key_col]`` as a DataFrame of set bit
    positions (1 column ``pos``, ≤ 2^bits rows) — inspectable,
    persistable, and mergeable by union.

    The returned frame is ``.persist()``-ed (the probe references it k
    times) and THE CALLER OWNS THE UNPERSIST: call
    ``bloom.unpersist()`` once the probe's results have been consumed.
    A filter left cached is small (≤ 2^bits rows) and subject to LRU
    eviction, but long-lived sessions building many filters should
    release them explicitly."""
    m = 1 << bits
    bloom = (
        df.select(F.explode(_positions(F.col(key_col), k, m)).alias("pos"))
        .distinct()
    )
    # The probe broadcasts this frame once per hash function (k
    # branches): persist so the build table is scanned once, not k
    # times. The frame is <= 2^bits rows — negligible cache footprint.
    return bloom.persist()


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    bits: int = 16,
    k: int = 3,
) -> DataFrame:
    """Keep rows of ``df`` whose key passes the bloom filter (all k
    positions set). Passes all true members plus a reproducible
    false-positive set of density ≈ (1 - e^(-kn/m))^k."""
    _check_double_hash_rows(k, "k")
    m = 1 << bits
    h1 = hash_word(F.col(key_col), 1)
    h2 = hash_word(F.col(key_col), 16)
    # k successive broadcast LEFT SEMI joins, one per hash position:
    # the probe side stays narrow end-to-end (no shuffle, no
    # aggregation), each join only drops rows. This is the property
    # that makes the operator a pre-SHUFFLE filter at fact scale.
    out = df
    for i in range(k):
        out = (
            out.withColumn("_pos", (h1 + F.lit(i) * h2) % m)
            .join(
                F.broadcast(bloom.withColumnRenamed("pos", "_pos")),
                "_pos",
                "left_semi",
            )
            .drop("_pos")
        )
    return out
