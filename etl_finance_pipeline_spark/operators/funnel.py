"""Window funnel: per-user ordered-step conversion within a time
window (the ClickHouse ``windowFunnel`` / product-analytics primitive
"view → click → purchase within 1 hour of the first view").

Semantics: a user reaches depth d if there exist events
e_1 < e_2 < ... < e_d (strictly increasing timestamps) with the
required types, all within ``window`` of e_1, where e_1 is the
user's EARLIEST step-1 event and each later step is matched greedily
(earliest event after the previous step). Greedy-earliest is the
standard windowFunnel('strict_order'-free) resolution and makes the
result unique and portable.

Scale shape: one aggregate per step, each keyed by user — d-1 joins
that all hash-partition on the SAME key (user), so under Spark's
co-partitioning the chain is one logical shuffle stage per step with
map-side-combinable mins, never a window over all events and never a
per-user array materialization. Skew = per-user event skew, bounded
by the step-type filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window: str = "1 hour",
) -> DataFrame:
    """Per-user funnel times: (user, t1..td, depth) with t_i NULL
    once the chain breaks; depth = deepest step reached. Only users
    with a step-1 event appear."""
    if len(steps) < 2:
        raise ValueError("window_funnel needs at least 2 steps")
    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    cur = (
        base.filter(F.col("_tp") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        bound_cols = ["_u", "t1"] if prev == "t1" else ["_u", "t1", prev]
        nxt = (
            base.filter(F.col("_tp") == step)
            .join(cur.select(*bound_cols), "_u")
            .filter(
                (F.col("_ts") > F.col(prev))
                & (F.col("_ts") <= F.col("t1") + F.expr(f"INTERVAL {window}"))
            )
            .groupBy("_u")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "_u", "left")
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(depth)
    # the chain guarantees t_i is NULL whenever t_{i-1} is, so the
    # last non-null level IS the depth
    return cur.select(
        F.col("_u").alias(user_col),
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        depth.alias("depth"),
    )


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window: str = "1 hour",
) -> DataFrame:
    """Aggregate funnel report: one row per depth with the user count
    reaching AT LEAST that depth and the conversion rate from depth 1
    (rounded to 6 decimals)."""
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    per_user = window_funnel(df, user_col, ts_col, type_col, steps, window)
    by_depth = per_user.groupBy("depth").agg(F.count("*").alias("_n"))
    # users at depth >= d: suffix sum over the (tiny) depth histogram
    # via an unbounded window over <= len(steps) rows
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.col("depth").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = by_depth.withColumn("n_users", F.sum("_n").over(w))
    total = F.broadcast(per_user.agg(F.count("*").alias("_tot")))
    return (
        cum.crossJoin(total)
        .select(
            "depth",
            "n_users",
            portable_round(F.col("n_users") / F.col("_tot"), 6).alias(
                "conversion_rate"
            ),
        )
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every ordered pair of consecutive events WITHIN a user's timeline,
    count the (from → to) transition and report its conditional
    probability P(to | from) — the "what do users do next" model
    behind next-action prediction, anomaly screens, and journey
    simulation.

    Ordering is (ts, tiebreak) per user, so ties are deterministic
    across engines. The lead window partitions BY USER (bounded by a
    user's activity, never a global sort); the transition counts are
    one map-side-combinable groupBy; P(to|from) divides by the
    per-from total via a window over the (tiny) event-type-pair
    matrix, not the data.

    Output: (from_event, to_event, n_transitions, p) with p rounded
    to 6 decimals.
    """
    from pyspark.sql.window import Window

    from etl_finance_pipeline_spark.functions.scalar import portable_round

    order = [F.col(ts_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("from_event"),
            F.lead(type_col).over(w).alias("to_event"),
        )
        .filter(F.col("to_event").isNotNull())
    )
    counts = pairs.groupBy("from_event", "to_event").agg(
        F.count("*").alias("n_transitions")
    )
    w_from = Window.partitionBy("from_event")
    return counts.select(
        "from_event",
        "to_event",
        "n_transitions",
        portable_round(
            F.col("n_transitions") / F.sum("n_transitions").over(w_from), 6
        ).alias("p"),
    )
