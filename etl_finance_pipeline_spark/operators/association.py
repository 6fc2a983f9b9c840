"""Market-basket association rules: pairwise support / confidence /
lift over (basket_id, item) pairs — the co-occurrence analytics a
retail warehouse runs over order lines ("customers who bought X also
bought Y"), and the same machinery behind co-occurrence features for
recommender training data.

Scale shape: the only quadratic step is the within-basket item pair
self-join, whose fan-out is (basket size choose 2) — bounded by
``max_basket_items`` (baskets above the cap are dropped with their
pairs, the standard guard against pathological mega-baskets that
would otherwise dominate the shuffle). Everything else is map-side
combinable counting; item-level stats join back by item key
(broadcast-able: #distinct items << #pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.functions.scalar import portable_round


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_items: int = 64,
) -> DataFrame:
    """Mine pairwise rules a→b from a long (basket, item) frame.

    Returns one row per ordered pair (both directions) with
    ``pair_support`` (baskets containing both), ``confidence``
    (support / baskets containing a), and ``lift``
    (confidence / P(b)), rounded to 6 decimals.
    """
    baskets = df.select(
        F.col(basket_col).alias("_basket"), F.col(item_col).alias("_item")
    ).distinct()
    sizes = baskets.groupBy("_basket").agg(F.count("*").alias("_n"))
    kept_ids = sizes.filter(F.col("_n") <= max_basket_items).select("_basket")
    kept = baskets.join(kept_ids, "_basket")
    # 1-row global stat, broadcast into the final projection rather
    # than collected: keeps the whole rule mine one lazy plan.
    n_baskets = F.broadcast(kept_ids.agg(F.count("*").alias("_nb")))

    item_supp = kept.groupBy("_item").agg(F.count("*").alias("_supp"))

    a = kept.alias("a")
    b = kept.alias("b")
    pairs = (
        a.join(b, F.col("a._basket") == F.col("b._basket"))
        .filter(F.col("a._item") < F.col("b._item"))
        .groupBy(
            F.col("a._item").alias("x"), F.col("b._item").alias("y")
        )
        .agg(F.count("*").alias("pair_support"))
        .filter(F.col("pair_support") >= min_support)
    )
    # Both rule directions from each unordered pair.
    directed = pairs.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        "pair_support",
    ).unionAll(
        pairs.select(
            F.col("y").alias("antecedent"),
            F.col("x").alias("consequent"),
            "pair_support",
        )
    )
    out = (
        directed.join(
            item_supp.withColumnRenamed("_item", "antecedent").withColumnRenamed(
                "_supp", "_supp_a"
            ),
            "antecedent",
        )
        .join(
            item_supp.withColumnRenamed("_item", "consequent").withColumnRenamed(
                "_supp", "_supp_b"
            ),
            "consequent",
        )
        .crossJoin(n_baskets)
        .select(
            "antecedent",
            "consequent",
            "pair_support",
            portable_round(F.col("pair_support") / F.col("_supp_a"), 6).alias("confidence"),
            portable_round(
                (F.col("pair_support") / F.col("_supp_a"))
                / (F.col("_supp_b") / F.col("_nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return out
