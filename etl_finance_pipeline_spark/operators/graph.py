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
rounds. For DEEP graphs (pathological duplicate chains), use
:func:`connected_components_star` — the large-star/small-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond"), whose round count is O(log² n) regardless of diameter;
equivalence is property-tested against this propagation on chains,
cliques and random graphs.

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
from pyspark.sql.window import Window
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
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iter} rounds "
            "(labels still changing); raise max_iter — propagation "
            "needs ~graph-diameter rounds"
        )
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) via the alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — the web-scale path: rounds bounded O(log² n)
    regardless of graph DIAMETER, where plain label propagation needs
    diameter rounds (a pathological near-dup chain of k documents
    takes k rounds there, ~log k here).

    Per round both operations are one groupBy-min plus one join —
    the same shuffle shape as propagation, so per-round cost is
    comparable and the win is purely round count:

      large-star(u): every neighbor v > u re-attaches to
                     min(N(u) ∪ {u})
      small-star(u): every neighbor v ≤ u (and u) re-attaches to
                     min(N≤(u) ∪ {u})

    At fixpoint the edge set is a disjoint union of stars rooted at
    each component's min id. Convergence is detected with a
    (count, sum-of-hash) signature of the canonical edge set — two
    tiny aggregates, no full-set comparison join. Default for
    near-dup clustering stays label propagation (content-sharing
    graphs are shallow); switch here when cluster chains run deep."""
    # materialize the input ONCE: the pair frame is usually the tail
    # of an expensive pipeline (LSH banding etc.) and is referenced by
    # the vertex universe AND both branches of round 1's symmetrize —
    # without truncation that pipeline re-executes up to 3×
    p0 = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    p0 = p0.localCheckpoint(eager=True)
    e = p0.filter(F.col("u") != F.col("v"))
    # canonical directed form: child > parent
    e = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    # original vertex universe (self-pairs included: they label as
    # their own singleton, matching connected_components)
    universe = p0.select(F.col("u").alias("id")).union(
        p0.select(F.col("v").alias("id"))
    ).distinct()

    def signature(edges: DataFrame) -> tuple:
        row = edges.agg(
            F.count("*").alias("n"),
            # decimal sum: a bigint sum of 64-bit hashes overflows ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_sig = None
    for _ in range(max_iter):
        # LARGE-STAR over the symmetric neighborhood
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("_mn"), F.col("u"))
        # no distinct here: duplicates don't affect the min-based
        # small-star below, which dedupes its own output — saves one
        # shuffle per round
        e = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # SMALL-STAR over the child->parent form (v <= u by construction)
        mins = e.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("_mn"), F.col("u"))
        e = (
            e.join(mins, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("c"), m.alias("p")),
                        F.struct(F.col("u").alias("c"), m.alias("p")),
                    )
                ).alias("_e")
            )
            .select(F.col("_e.c").alias("u"), F.col("_e.p").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        # Returning here would label components by non-root
        # intermediates — fail loudly instead, mirroring
        # connected_components. (The signature is (count,
        # sum-of-xxhash64); a collision masking a real change is
        # ~2^-64 per round — accepted.)
        raise RuntimeError(
            f"connected_components_star: edge set not stable after "
            f"{max_iter} rounds; raise max_iter (expected O(log² n))"
        )

    children = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    # vertices whose every edge contracted away (self-pairs filtered
    # above never enter) are roots of their own singleton only if they
    # appeared in the input — recover them from the original edge list
    labeled = children.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )
    missing = universe.join(labeled.select("id"), "id", "left_anti").withColumn(
        "component", F.col("id")
    )
    return labeled.unionByName(missing)


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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    round_digits: int | None = 6,
) -> DataFrame:
    """PageRank over a directed edge list — the crawl-graph centrality
    signal web-corpus pipelines use to prioritize/quality-weight pages
    (OPIC/harmonic-centrality variants fill the same role in Common
    Crawl ranking).

    Classic normalized iteration, no dangling-mass redistribution
    (documented choice — dangling vertices leak mass, acceptable for a
    RANKING signal and keeps the per-iteration algebra reproducible in
    the SQL oracle):

      r0(v)   = 1/N
      r_i(v)  = (1-d)/N + d * Σ_{(u,v)∈E} r_{i-1}(u) / outdeg(u)

    Ranks are portably rounded each iteration, pinning the float
    fixpoint cross-engine exactly as ``train_kmeans_centroids`` does.

    Output: (id, rank) for every vertex (src or dst of any edge).

    Scale shape (100 TB): per iteration one equi-join of edges to the
    rank frame (both hash-partitioned by src — co-partitioned across
    iterations) and one map-side-combinable groupBy(dst) sum. Hot
    pages (skewed in-degree) are a sum — AQE-splittable partial aggs
    — and hub pages (skewed out-degree) fan out rows but never
    buffer. Lineage is truncated per round like connected_components.
    The vertex count and per-vertex constants broadcast; the driver
    never sees a data row.
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = verts.count()  # scalar: control flow, not a data path
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    # links feeds every iteration's contribution join: persist, or
    # the degree aggregate + join re-execute once per iteration
    links = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    def _r(c):
        return portable_round(c, round_digits) if round_digits is not None else c

    ranks = verts.select("id", _r(F.lit(1.0 / n)).alias("rank"))
    for _ in range(iters):
        contribs = (
            links.join(ranks, links.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            verts.join(contribs, verts.id == contribs.dst, "left")
            .select(
                "id",
                _r(
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    verts.unpersist()
    links.unpersist()
    return ranks


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    round_digits: int | None = 6,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004): PageRank
    with the teleport BIASED to a trusted seed set instead of uniform
    — trust flows out from known-good vertices along (dofollow)
    edges, so pages reachable only from spam regions accumulate
    little of it. The standard companion of raw authority in
    production link graphs; the difference between the two is the
    spam-mass readout.

      t0(v)  = s(v)
      t_i(v) = (1-d)·s(v) + d · Σ_{(u,v)∈E} t_{i-1}(u) / outdeg(u)

    where s(v) = 1/|S| for v in the seed frame *seeds* (one ``id``
    column) and 0 otherwise. Same normalized-iteration algebra,
    portable per-round rounding, and per-iteration lineage truncation
    as :func:`pagerank`, so the SQL oracle replays it exactly.

    Scale shape: identical to pagerank — per iteration one equi-join
    of edges to the trust frame plus one map-combinable groupBy(dst)
    sum; the seed vector rides the vertex frame (a left-semi-derived
    0/1 column), and |S| is the only driver-side scalar.

    Output: (id, trust) for every vertex.
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    sd = seeds.select(F.col(seeds.columns[0]).alias("id")).distinct()
    ns = sd.count()  # scalar: control flow, not a data path
    svec = verts.join(
        sd.withColumn("_hit", F.lit(1.0 / ns)), "id", "left"
    ).select(
        "id", F.coalesce(F.col("_hit"), F.lit(0.0)).alias("_s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    links = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    def _r(c):
        return portable_round(c, round_digits) if round_digits is not None else c

    trust = svec.select("id", _r(F.col("_s")).alias("trust"))
    for _ in range(iters):
        contribs = (
            links.join(trust, links.src == trust.id)
            .select("dst", (F.col("trust") / F.col("_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_in"))
        )
        trust = (
            svec.join(contribs, svec.id == contribs.dst, "left")
            .select(
                "id",
                _r(
                    (1.0 - damping) * F.col("_s")
                    + damping * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("trust"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    svec.unpersist()
    links.unpersist()
    return trust


def pagerank_with_trust(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    top_seeds: int = 3,
    iters: int = 3,
    damping: float = 0.85,
    round_digits: int | None = 6,
) -> tuple[DataFrame, DataFrame]:
    """:func:`pagerank` and :func:`trustrank` over ONE shared set of
    materialized frames — the trust family's spine (authority ranks,
    then trust propagated from the top-*top_seeds* authority domains).
    Running the two operators separately re-distincts the edge set and
    re-builds the (edges ⋈ outdeg) contribution frame for the second
    loop (guide §2.4: share the exchange, don't recompute it); here
    e / verts / links persist once and feed BOTH unrolled loops. The
    per-iteration algebra, rounding, and seed derivation (rank desc,
    id asc, LIMIT k) are byte-identical to the separate operators —
    the SQL oracles replay them unchanged.

    Returns (ranks(id, rank), trust(id, trust)), both materialized.
    """
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = verts.count()  # scalar: control flow, not a data path
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))
    links = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    def _r(c):
        return portable_round(c, round_digits) if round_digits is not None else c

    ranks = verts.select("id", _r(F.lit(1.0 / n)).alias("rank"))
    for _ in range(iters):
        contribs = (
            links.join(ranks, links.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            verts.join(contribs, verts.id == contribs.dst, "left")
            .select(
                "id",
                _r(
                    F.lit((1.0 - damping) / n)
                    + damping * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )

    sd = (
        ranks.orderBy(F.col("rank").desc(), "id").limit(top_seeds).select("id")
    )
    ns = sd.count()  # scalar, mirrors trustrank's seed count
    svec = verts.join(
        sd.withColumn("_hit", F.lit(1.0 / ns)), "id", "left"
    ).select(
        "id", F.coalesce(F.col("_hit"), F.lit(0.0)).alias("_s")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    trust = svec.select("id", _r(F.col("_s")).alias("trust"))
    for _ in range(iters):
        contribs = (
            links.join(trust, links.src == trust.id)
            .select("dst", (F.col("trust") / F.col("_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_in"))
        )
        trust = (
            svec.join(contribs, svec.id == contribs.dst, "left")
            .select(
                "id",
                _r(
                    (1.0 - damping) * F.col("_s")
                    + damping * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("trust"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    verts.unpersist()
    links.unpersist()
    svec.unpersist()
    return ranks, trust


def triangle_count(edges: DataFrame, per_vertex: bool = False) -> DataFrame:
    """Count triangles in an undirected graph given as (src, dst)
    pairs (direction, duplicates, and self-loops are normalized away).

    Degree-oriented wedge counting (the MapReduce-era standard, cf.
    Suri & Vassilvitskii 2011): orient every edge from its lower-
    degree endpoint to the higher (ties by id), build wedges around
    the low vertex, and close them against the canonical edge set.
    Orientation bounds each vertex's wedge fan-out by its ORIENTED
    out-degree (O(sqrt(m)) on any graph), so the wedge join cannot
    explode around hubs the way a naive neighbor self-join does —
    this is what makes it survive power-law graphs at scale. Cost:
    two equi-join shuffles plus one degree aggregate.

    Returns a 1-row (n_triangles) frame, or per-vertex counts when
    ``per_vertex`` (each triangle credited to all three corners).

    Multi-branch reuse: ``canon`` feeds the degree union, the
    orientation join, AND the wedge-closing join; ``oriented`` feeds
    both wedge sides. These are NOT persisted — the branches share
    identical exchange subtrees, so Spark's exchange reuse
    (``spark.sql.exchange.reuse``, on by default; visible as
    ``ReusedExchange`` nodes) materializes each shuffle once within
    the execution. Measured equal-cost to an explicit persist, and —
    unlike persist on a lazily-returned frame — leaves no cached
    blocks behind for the caller to leak (the round-4 bench leaked
    two edge-sized frames per call this way, degrading every query
    that ran after it in the session).
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("id"))
        .unionAll(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    oriented = (
        canon.join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    l = oriented.alias("l")
    r = oriented.alias("r")
    wedges = l.join(r, F.col("l.a") == F.col("r.a")).filter(
        F.col("l.b") < F.col("r.b")
    ).select(
        F.col("l.a").alias("apex"),
        F.least("l.b", "r.b").alias("wu"),
        F.greatest("l.b", "r.b").alias("wv"),
    )
    closed = wedges.join(
        canon, (wedges.wu == canon.u) & (wedges.wv == canon.v), "inner"
    )
    if not per_vertex:
        return closed.agg(F.count("*").alias("n_triangles"))
    corners = (
        closed.select(F.col("apex").alias("id"))
        .unionAll(closed.select(F.col("wu").alias("id")))
        .unionAll(closed.select(F.col("wv").alias("id")))
    )
    return corners.groupBy("id").agg(F.count("*").alias("n_triangles"))


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: hop distance from the nearest seed for every
    vertex within ``max_hops``, by synchronous frontier relaxation —
    each round one equi-join (edges x current distances) and one
    min-aggregate, both hash-partitioned on vertex id. Rounds =
    max_hops (bounded), so the driver does bounded control flow while
    all data stays distributed; lineage is truncated per round like
    the other iterative operators.

    ``edges`` is directed (src, dst) — pass both directions for an
    undirected walk. ``seeds`` is a 1-column (id) frame at distance 0.
    Returns (id, distance) for every reached vertex.
    """
    dist = seeds.select(F.col("id"), F.lit(0).alias("distance")).localCheckpoint(
        eager=True
    )
    for _ in range(max_hops):
        relaxed = (
            edges.join(dist, edges.src == dist.id)
            .select(F.col("dst").alias("id"), (F.col("distance") + 1).alias("distance"))
            .unionAll(dist)
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
            .localCheckpoint(eager=True)
        )
        dist = relaxed
    return dist


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex: 2T / (deg * (deg-1))
    for vertices of degree >= 2, where T is the vertex's triangle
    count — the community-density signal behind spam-farm detection
    and graph-quality weighting. Composes :func:`triangle_count`
    (per-vertex) with one degree aggregate; the duplicated
    canonicalization subtree is exchange-reused by Spark when the
    edge derivation is deterministic."""
    from etl_finance_pipeline_spark.functions.scalar import portable_round

    canon = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("id"))
        .unionAll(canon.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    tri = triangle_count(edges, per_vertex=True)
    joined = deg.join(tri, "id", "left").select(
        "id",
        "deg",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    )
    return joined.filter(F.col("deg") >= 2).select(
        "id",
        "deg",
        "n_triangles",
        portable_round(
            (F.lit(2.0) * F.col("n_triangles"))
            / (F.col("deg") * (F.col("deg") - F.lit(1.0))),
            6,
        ).alias("clustering_coeff"),
    )


def label_propagation(
    edges: DataFrame, rounds: int = 4
) -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan et al. 2007), made deterministic: labels start as
    vertex ids; each round every vertex adopts the most frequent
    label among its NEIGHBORS PLUS ITSELF (the self-vote damps the
    two-cycle oscillation pure synchronous LPA exhibits on sparse
    structures), ties broken by smallest label. Fixed *rounds* — a
    bounded unrolled schedule is the reproducible variant, and the
    per-round SQL unroll is what the oracle checks.

    Per round: one labels⋈edges join (shuffle on src), one
    (dst, label) vote count (map-side combinable), one per-dst argmax
    window (bounded by a vertex's distinct neighbor labels). Lineage
    truncated per round; rounds are a constant, so driver work is
    O(rounds), never data-dependent.

    Output: (id, label) — vertices sharing a label are one community.
    """
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionAll(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = und.select(F.col("u").alias("id")).distinct()
    labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        nbr = und.join(labels.withColumnRenamed("id", "v"), "v").select(
            F.col("u").alias("id"), "label"
        )
        votes = (
            nbr.unionAll(labels)  # self-vote
            .groupBy("id", "label")
            .agg(F.count("*").alias("_c"))
        )
        w = Window.partitionBy("id").orderBy(
            F.col("_c").desc(), F.col("label")
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", "label")
            .localCheckpoint(eager=True)
        )
    return labels


def k_core(
    pairs: DataFrame,
    k: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    vertices whose degree in the SURVIVING subgraph is < *k* until a
    fixpoint — the standard device for separating the dense core of a
    similarity/interaction graph from its sparse periphery (spam-farm
    detection, dense-cluster seeds, graph-sampling cutoffs).

    Per round: one degree aggregate over surviving edges + one
    semi-join filter, both hash-partitioned on the vertex id —
    peeling needs at most O(|V|) rounds in theory but converges in a
    handful on real degree distributions; per-round frames
    localCheckpoint so plan depth stays O(1). Fail-loud at *max_iter*
    like the other iterative operators.

    Output: (id, core_degree) — vertices of the k-core with their
    degree INSIDE the core.
    """
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        sym = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = sym.groupBy("u").agg(F.count("*").alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("u")
        n_before = e.count()
        e2 = (
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        if e2.count() == n_before:
            sym_f = e2.select("u", "v").union(
                e2.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            return (
                sym_f.groupBy("u")
                .agg(F.count("*").cast("long").alias("core_degree"))
                .select(F.col("u").alias("id"), "core_degree")
            )
        e = e2
    raise RuntimeError(
        f"k_core: no fixpoint after {max_iter} peeling rounds — "
        "raise max_iter"
    )
