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

    Deterministic; converges in <= diameter rounds (asserted against
    ``max_iter`` — raising means the graph is pathologically chained and
    the star-alternation kernel should replace this one)."""
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
        new_labels = (
            labels.alias("l")
            .join(nbr_min.alias("n"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("n.nbr_comp"), F.col("l.comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "id")
            .filter(F.col("a.comp") != F.col("b.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no fixpoint within {max_iter} rounds — "
        "pathological diameter; use a star-alternation kernel"
    )


def cluster_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str, id1_col: str = "id_1", id2_col: str = "id_2"
) -> DataFrame:
    """Keep exactly one representative (the minimum id) per connected
    near-dup cluster of ``pairs``; rows in no pair survive untouched.
    One anti-join against the non-representative member set."""
    comp = connected_components(pairs, id1_col, id2_col)
    dropped = comp.filter(F.col("comp") != F.col("id")).select(
        F.col("id").alias("_drop")
    )
    return df.join(dropped, df[id_col] == dropped["_drop"], "left_anti")
