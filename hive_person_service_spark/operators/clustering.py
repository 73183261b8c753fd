"""Connected components over near-duplicate pairs -> dedup groups.

A dedup pipeline ends with GROUPS, not pairs: if A~B and B~C, all three
form one cluster and one canonical representative survives. This is
small-diameter connected components via iterative minimum-label
propagation -- each round, every node adopts the smallest id reachable in
one hop; near-dup clusters are tiny (duplicates of one document), so
convergence takes O(cluster diameter) rounds, not O(graph size).

Scale: each round is one groupBy over the edge list (shuffle on node id).
The edge list is the LSH output -- already bounded by candidate
generation. localCheckpoint() per round truncates the lineage so 10
rounds don't build a 10-deep recursive plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 10,
) -> DataFrame:
    """(node, component) for every node in the pair list; component = the
    smallest node id in its connected component. Raises if not converged
    within max_iterations (a near-dup graph that deep means the threshold
    is too loose, not that more iterations are needed)."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        edges.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
    )
    comp_t = labels.schema["comp"].dataType
    for _ in range(max_iterations):
        # every node adopts min(own label, neighbors' labels); the node's
        # PREVIOUS label rides along (the own-row carries it, neighbor
        # rows carry null, max() recovers the single non-null value), so
        # the convergence probe is a filter over the checkpointed result
        # instead of a join against the old labels -- the graph_wcc
        # discipline (r12: was a per-round join + broadcast build, ~8
        # jobs/round; now checkpoint + probe, identical labels)
        neighbor_labels = (
            edges.join(labels, edges["b"] == labels["node"])
            .select(
                edges["a"].alias("node"),
                F.col("comp"),
                F.lit(None).cast(comp_t).alias("prev"),
            )
        )
        own = labels.select("node", "comp", F.col("comp").alias("prev"))
        new_labels = (
            own.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"), F.max("prev").alias("prev"))
            .localCheckpoint()
        )
        changed = (
            new_labels.where(F.col("comp") != F.col("prev")).limit(1).count()
        )
        labels = new_labels.select("node", "comp")
        if changed == 0:
            edges.unpersist()
            return labels
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_groups(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Collapse near-dup pairs into groups: every doc mapped to its
    canonical (smallest-id) representative; docs in no pair map to
    themselves. ``keep = (doc_id == canon)`` marks survivors.

    ``pairs`` is persisted here: it is an expensive pipeline (typically
    LSH candidate generation) that would otherwise be recomputed by the
    emptiness probe AND by both branches of the edge-list union."""
    pairs = pairs.persist()
    if pairs.limit(1).count() == 0:
        # no near-dups at all (the common case on clean corpora): skip the
        # iterative propagation entirely
        pairs.unpersist()
        return docs.select(
            docs[id_col], docs[id_col].alias("canon")
        ).withColumn("keep", F.lit(True))
    comp = connected_components(pairs)
    # comp's final labels were localCheckpoint()ed inside the loop, so the
    # returned plan no longer references pairs
    pairs.unpersist()
    return (
        docs.join(comp, docs[id_col] == comp["node"], "left")
        .select(
            docs[id_col],
            F.coalesce(F.col("comp"), docs[id_col]).alias("canon"),
        )
        .withColumn("keep", F.col(id_col) == F.col("canon"))
    )
