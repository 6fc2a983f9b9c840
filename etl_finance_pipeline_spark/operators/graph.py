"""Connected components over a pair list — near-duplicate CLUSTERS.

Pairwise near-dup output (MinHash/SimHash/embedding pairs) is not yet
a dedup decision: transitively connected documents form one duplicate
cluster and the pipeline keeps one representative per cluster. This is
iterative label propagation expressed as DataFrame joins:

  label(v) ← min(label(v), min_{(u,v)∈E} label(u))   until fixpoint

Each iteration is one equality join + one groupBy-min (both shuffle on
vertex id, map-side combinable); the driver only checks a convergence
COUNT per iteration. Iterations needed = graph diameter — near-dup
clusters are shallow (pairs share content), so convergence in a few
rounds. At web scale you'd switch to the large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce"),
which bounds rounds by O(log² n); the per-round dataflow is the same
join+min shape as here.

Lineage is truncated per iteration with ``localCheckpoint(eager=True)``
— without it the logical plan compounds (measured: 1146 shuffles in the
final explain after 6 iterations at sf0.1) and Catalyst re-optimizes the
whole history every round. The eager materialization is free here
because the convergence count forces each iteration anyway. On a real
cluster with executor loss, use ``spark.sparkContext.setCheckpointDir``
+ ``.checkpoint()`` instead: localCheckpoint stores blocks on executors
and is not fault-tolerant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex appearing in *pairs*, where
    component = min vertex id reachable through the pair graph."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # neighbor minimum: for each dst, the min component among its srcs
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("component").alias("_nbr"))
        )
        # One frame carries both the new label and the convergence flag, so
        # the eager checkpoint + count below is the ONLY action per round
        # (the old version did a second labels-vs-labels join just to count
        # changes). localCheckpoint truncates lineage so the next round's
        # plan starts from a leaf, not the full iteration history.
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("_nbr"), F.col("component")) < F.col("component")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def near_dup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for dedup: every id in *pairs* gets its
    connected component; ids from *all_ids* not in any pair get a
    singleton component (their own id). ``component`` doubles as the
    cluster representative to KEEP."""
    comp = connected_components(pairs, id_a, id_b).withColumnRenamed("id", id_col)
    if all_ids is None:
        return comp
    singletons = all_ids.select(id_col).join(
        comp.select(id_col), on=id_col, how="left_anti"
    ).withColumn("component", F.col(id_col))
    return comp.unionByName(singletons)
