"""Iterative graph analytics on DataFrames: PageRank with dangling-mass
redistribution. Complements the connected-components labeler the dedup
pipeline uses (operators/clustering.py) -- together they cover the two
iterative-graph shapes an analytics service meets: propagation to a fixed
point (components) and power iteration to a score (rank).

Scale shape: each iteration is one shuffle -- edges join ranks on src
(edges pre-partitioned by src once, so the per-iteration exchange hits only
the rank side) -- plus a tiny global aggregate for the dangling mass.
Lineage is cut with localCheckpoint every few rounds: without it the plan
doubles per iteration and the driver, not the data, becomes the bottleneck.
Iterations scale with convergence (~tens), never with graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count("*").alias("out_deg"))


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 15,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Power-iteration PageRank over an edge list (src, dst). Returns
    (node, rank); ranks sum to 1 (dangling mass -- nodes with no out-edges
    -- is redistributed uniformly each round, so probability is conserved).

    checkpoint_every=1 (r4): the dangling-mass scalar is BROADCAST each
    round, and a broadcast job executes its subtree immediately -- with
    unmaterialized ranks that subtree recomputes every prior iteration
    back to the last checkpoint, turning k rounds into O(k^2) work (the
    16.7s sweep-tail entry in round 3). Materializing the (node, rank)
    table each round -- it's tiny relative to the graph at any scale --
    makes every round O(1) jobs over cached input; measured 2.5x faster
    at the fixture scale with bitwise-identical ranks (same arithmetic,
    same iteration count).

    Citation note: standard public formulation (Page et al. 1999);
    implementation is DataFrame-native -- no GraphX/RDD dependency."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).persist()
    n = nodes.count()

    deg = out_degrees(edges)
    # contribution edges: src -> dst carrying 1/out_deg(src)
    contrib_edges = (
        edges.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition("src")
        .persist()
    )
    contrib_edges.count()
    # dangling nodes (no out-edges) are a FIXED set; materialize it once
    # instead of re-running the degree groupBy over the full edge list
    # inside every round's dangling-mass job (the round-3 sweep tail)
    danglers = (
        nodes.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
        .persist()
    )
    danglers.count()

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iter):
        incoming = (
            contrib_edges.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("w")).alias("in_mass"))
        )
        # mass sitting on dangling nodes (rank not forwarded by any edge):
        # collected as a SCALAR (one tiny job over the materialized rank
        # table) and folded in as a literal -- the broadcast+crossJoin form
        # this replaces paid a BroadcastExchange build job per round and
        # carried a BroadcastNestedLoopJoin in the update plan for the same
        # single double (identical arithmetic: the collected double is the
        # exact value the broadcast row carried)
        m = (
            ranks.join(danglers, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                (
                    (1.0 - damping) / n
                    + damping
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.lit(m) / n)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    if n_iter % checkpoint_every == 0:
        # the returned plan is a checkpoint scan -- the loop's persisted
        # inputs are no longer referenced; release them so a long session
        # doesn't accumulate graph caches (guide §5). When the final round
        # was NOT checkpointed the caches must outlive the call (the
        # returned plan still reads them) and stay.
        for df_ in (contrib_edges, danglers, nodes):
            df_.unpersist(blocking=False)
    return ranks


def top_ranked(ranks: DataFrame, k: int = 10) -> DataFrame:
    """ORDER BY + LIMIT, not a global window: plans as
    TakeOrderedAndProject (per-partition heaps, no single-partition
    shuffle), which survives billion-node rank tables."""
    return ranks.orderBy(F.col("rank").desc(), F.col("node")).limit(k)


def bfs_distances(
    edges: DataFrame,
    source: int,
    max_hops: int = 12,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Single-source BFS hop distances by frontier expansion (the third
    iterative-graph shape next to components and pagerank: level-
    synchronous traversal).

    ``edges`` is a directed (src, dst) relation. Each round expands the
    current frontier one hop (edges join frontier on src), anti-joins the
    already-settled set so a node is settled at its FIRST (minimal) depth,
    and checkpoints to keep lineage flat. Iterations scale with graph
    DIAMETER (bounded by ``max_hops``), never with node count; each round
    is one join + one anti-join on the frontier -- at 100 TB the frontier
    relation is the small side and broadcasts, while the edge relation
    stays partitioned by src across the cluster.
    """
    spark = edges.sparkSession
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).persist()
    edges.count()

    # NOTE (r11 opt round): an accumulate-settled-pieces variant (keep
    # per-hop checkpointed frames in a list, union lazily, skip the
    # per-hop dist re-checkpoint) measured consistently SLOWER at sf0.1
    # (11.7s vs 7.5s interleaved best-of-4): each hop's anti-join then
    # broadcasts a union of k many-partition pieces, and those broadcast
    # builds cost more than re-materializing the compact dist table.
    dist = spark.createDataFrame([(int(source), 0)], "node LONG, hops INT")
    frontier = dist
    try:
        for hop in range(1, max_hops + 1):
            nxt = (
                edges.join(
                    F.broadcast(frontier.select(F.col("node").alias("src"))),
                    "src",
                )
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(F.broadcast(dist.select("node")), "node", "left_anti")
                .select("node", F.lit(hop).alias("hops"))
            )
            if (hop % checkpoint_every) == 0:
                nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            dist = dist.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
    finally:
        edges.unpersist()
    return dist.select("node", F.col("hops").cast("long").alias("hops"))
