"""Connected components over a pair graph — cluster-level dedup survivors.

The near-dup operators (n-gram Jaccard, MinHash-LSH, embedding cosine)
all emit PAIRS; turning pairs into a survivor set needs a policy. The
dominance rule in operators/similarity.dedup_by_cosine (drop any higher-id
member of any pair) is order-independent and join-only, but over-drops on
chains. The cluster semantic most corpus pipelines actually want — keep
exactly ONE representative per transitive near-dup CLUSTER — is connected
components over the pair graph, computed here by min-label propagation
expressed as DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one shuffle-join + groupBy (both on
the node id, so AQE reuses the partitioning); rounds needed = graph
diameter, and near-dup graphs are short-diameter by construction (members
of a cluster are mutually similar), so the cap of ``max_iter`` rounds is a
safety rail, not a budget. ``localCheckpoint`` cuts the growing lineage
each round — without it the plan doubles per iteration.

At 100 TB: min-label propagation is the simple member of the family; the
published scale-out refinement is the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond"), which bounds rounds by O(log^2 n) on adversarial diameters. The
operator's contract (pairs in, (id, component) out) is unchanged if that
kernel is swapped in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id1_col: str = "id_1",
    id2_col: str = "id_2",
    max_iter: int = 25,
) -> DataFrame:
    """Undirected pair graph -> (id, component) with component = the
    minimum node id reachable from ``id``. Only nodes that appear in some
    pair are returned (isolated rows have no near-dup decision to make).

    Deterministic; converges in <= diameter rounds. A graph that has not
    converged within ``max_iter`` rounds is pathologically chained (a
    >max_iter-diameter path — not the short-diameter shape near-dup
    clusters have by construction); the partially-contracted edge set is
    then handed to :func:`connected_components_stars`, whose round count
    is O(log^2 n) regardless of diameter, instead of raising."""
    e = pairs.select(
        F.col(id1_col).cast("bigint").alias("src"),
        F.col(id2_col).cast("bigint").alias("dst"),
    )
    # symmetrize once; propagation then only needs the src -> dst direction
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy(edges.src.alias("id"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # the convergence flag rides the label update itself (one column on
        # the already-materialized checkpoint) instead of a third join of
        # new-vs-old labels per round — the changed probe below is then a
        # filter+limit over checkpointed rows, no shuffle
        new_labels = (
            labels.alias("l")
            .join(nbr_min.alias("n"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("n.nbr_comp"), F.col("l.comp"))
                ).alias("comp"),
                (
                    F.coalesce(F.col("n.nbr_comp"), F.col("l.comp")) < F.col("l.comp")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.select("id", "comp")
        if changed == 0:
            return labels
    # No fixpoint within the rail: switch kernels rather than fail. The
    # labels computed so far are still a valid CONTRACTION (every node's
    # label is some reachable node), so the star kernel runs on the
    # label-graph — (label(u), label(v)) per original edge — which has the
    # same component structure with diameter already shrunk by max_iter
    # hops, then the final label is composed through the contraction.
    contracted = (
        edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(F.col("comp").alias("c_src"), "dst")
        .join(
            labels.select(F.col("id").alias("dst"), F.col("comp").alias("c_dst")),
            "dst",
        )
        .select(F.col("c_src").alias("id_1"), F.col("c_dst").alias("id_2"))
        .filter(F.col("id_1") != F.col("id_2"))
    )
    roots = connected_components_stars(contracted)
    return (
        labels.join(roots.withColumnRenamed("id", "comp"), "comp", "left")
        .select(
            "id",
            F.coalesce(F.col("root"), F.col("comp")).alias("comp"),
        )
    )


def connected_components_stars(
    pairs: DataFrame,
    id1_col: str = "id_1",
    id2_col: str = "id_2",
    max_iter: int = 64,
) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    Algorithm 3) -> (id, root) with root = the component's minimum id.

    Each half-round is one groupBy + join on the node id (AQE reuses the
    partitioning) and STRICTLY SHRINKS the sum of edge endpoints'
    distances to their roots; convergence is O(log^2 n) rounds on ANY
    graph shape — including the long-path diameters that defeat plain
    min-label propagation. At 100 TB this is the kernel of record for
    unknown graph shapes; propagation stays the cheap path for the
    short-diameter graphs near-dup clustering actually emits.

    * large-star: per node u, link every LARGER neighbor to the minimum
      of the closed neighborhood — long chains fold toward small ids
      without growing any node's degree unboundedly.
    * small-star: per node u, link every not-larger neighbor (and u) to
      that minimum — flattens the local tree into a star.

    Fixpoint: the edge set is unchanged by a full round; every edge then
    joins a node directly to its component root."""
    e = pairs.select(
        F.col(id1_col).cast("bigint").alias("u"),
        F.col(id2_col).cast("bigint").alias("v"),
    ).filter(F.col("u") != F.col("v"))
    edges = e.distinct().localCheckpoint(eager=True)

    def _large_star(ed: DataFrame) -> DataFrame:
        nbrs = ed.unionByName(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = nbrs.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least(F.col("_mn"), F.col("u")).alias("m")
        )
        return (
            nbrs.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(ed: DataFrame) -> DataFrame:
        # orient toward the smaller endpoint, group on the larger
        o = ed.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            o.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        return linked

    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        changed = (
            new_edges.exceptAll(edges).limit(1).count()
            + edges.exceptAll(new_edges).limit(1).count()
        )
        edges = new_edges
        if changed == 0:
            break
    else:  # max_iter is a log^2-scaled rail; hitting it means a bug, not data
        raise RuntimeError(
            f"connected_components_stars: no fixpoint within {max_iter} rounds"
        )
    # at fixpoint every edge is (node, root); roots also label themselves
    sym = edges.unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select(
            F.col("u").alias("id"),
            F.least(F.col("_mn"), F.col("u")).alias("root"),
        )
    )


def cluster_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id1_col: str = "id_1",
    id2_col: str = "id_2",
    prefer_col: str | None = None,
) -> DataFrame:
    """Keep exactly one representative per connected near-dup cluster of
    ``pairs``; rows in no pair survive untouched. One anti-join against
    the non-representative member set.

    By default the representative is the MINIMUM id (deterministic and
    free — it IS the component label). With ``prefer_col``, the survivor
    is the cluster member with the HIGHEST value of that column
    (ties -> minimum id) — the policy real corpus pipelines want when
    duplicates span sources of different trust: keep the curated copy,
    drop the crawl's, regardless of which happened to get the smaller id
    (CCNet keeps by source priority; SemDeDup keeps by centroid
    distance — any such score works here).

    Scale: the ranking runs on the PAIR-NODE set only (comp ⋈ the
    (id, prefer) projection of ``df`` — one narrow shuffle sized by the
    near-dup minority, never the corpus), then one window per cluster
    and the same anti-join as the default path."""
    comp = connected_components(pairs, id1_col, id2_col)
    if prefer_col is None:
        dropped = comp.filter(F.col("comp") != F.col("id")).select(
            F.col("id").alias("_drop")
        )
    else:
        from pyspark.sql import Window

        prefs = df.select(
            F.col(id_col).cast("bigint").alias("id"), F.col(prefer_col).alias("_pref")
        )
        w = Window.partitionBy("comp").orderBy(
            F.col("_pref").desc(), F.col("id").asc()
        )
        dropped = (
            comp.join(prefs, "id")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") > 1)
            .select(F.col("id").alias("_drop"))
        )
    return df.join(dropped, df[id_col] == dropped["_drop"], "left_anti")
