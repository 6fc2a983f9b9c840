"""Skew-handling helpers: salted two-phase aggregation and salted
broadcast join for hot keys.

AQE's skew-join splitting handles most skew automatically (enabled in
session.py), but a *single* pathologically hot group in a groupBy
(one symbol with 30% of all rows, empty-text documents, the null key)
still serializes into one task. The classic fix is salting: spread
each group over N sub-groups, partially aggregate, then merge — two
shuffles, but each task bounded by group_size/N.

Only algebraic aggregates can be salted (their partial states merge):
sum, count, min, max, avg (= sum+count). Holistic aggregates (median,
count_distinct) need different machinery (percentile sketches /
HLL — Spark's approx_percentile / approx_count_distinct are already
mergeable and need no salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (phase-1 partial fn, phase-2 merge fn builder)
_MERGE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    *aggs*: output column -> (fn, input column) with fn in
    {sum, count, min, max, avg}. Example::

        salted_agg(df, ["symbol"],
                   {"n": ("count", "*"), "vol": ("sum", "VOLUME"),
                    "px": ("avg", "CLOSE")})

    Phase 1 groups by (keys, salt) where salt = pmod(hash(all cols),
    buckets) — uniform spread regardless of key distribution; phase 2
    merges partials by keys alone. Results are exactly equal to the
    unsalted aggregate for the supported algebraic functions (floating
    -point sums may differ in summation order, as any distributed sum
    does).
    """
    partial_exprs = []
    merge_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"_s_{out}"))
            partial_exprs.append(F.count(col).alias(f"_c_{out}"))
            merge_exprs.append(
                (F.sum(f"_s_{out}") / F.sum(f"_c_{out}")).alias(out)
            )
        elif fn in _MERGE:
            p, m = _MERGE[fn]
            partial_exprs.append(p(col).alias(f"_p_{out}"))
            merge_exprs.append(m(f"_p_{out}").alias(out))
        else:
            raise ValueError(
                f"unsupported salted aggregate {fn!r} "
                f"(algebraic only: sum/count/min/max/avg)"
            )

    salted = df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted equi-join for a skewed LEFT side against a small-ish
    RIGHT side that cannot be broadcast outright: the left adds a
    random-ish salt, the right is replicated *salt_buckets* times, and
    the join key becomes (on..., salt) — the hot key's rows spread over
    *salt_buckets* tasks.

    Prefer ``F.broadcast(right)`` when the right side fits in memory,
    and AQE skew-join for moderate skew; this is for the case where
    neither applies (right too big to broadcast, one key dominating).
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    )
    replicated_right = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = salted_left.join(replicated_right, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def hotkey_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Hot/cold split equi-join for a skew-dominated LEFT side: keys
    whose left-side row count reaches *hot_threshold* take the
    BROADCAST lane (only the hot keys' right-side rows are broadcast —
    a handful of rows even when *right* itself is huge), everything
    else takes the normal shuffle join. Compared to
    :func:`salted_join`, which replicates the ENTIRE right side
    ``salt_buckets`` times, this ships exactly the rows the hot keys
    need and leaves the uniform tail untouched.

    The hot-key set is an exact count aggregate (map-side combinable;
    the frame is |hot keys| rows — tiny by definition) used twice via
    broadcast semi/anti joins to split both sides. Supports ``inner``
    and ``left`` joins (result = hot-lane ∪ cold-lane exactly).

    This is the manual form of AQE's skew-join split, for when the
    skew is known ahead of time (a permanent celebrity key) and you
    want the split to survive plan changes and apply to non-sort-merge
    strategies.
    """
    if how not in ("inner", "left"):
        raise ValueError("hotkey_join supports inner and left joins")
    hot = (
        left.groupBy(*on)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= hot_threshold)
        .select(*on)
    )
    left_hot = left.join(F.broadcast(hot), on, "left_semi")
    left_cold = left.join(F.broadcast(hot), on, "left_anti")
    right_hot = right.join(F.broadcast(hot), on, "left_semi")
    joined_hot = left_hot.join(F.broadcast(right_hot), on, how)
    joined_cold = left_cold.join(right, on, how)
    return joined_hot.unionByName(joined_cold)
