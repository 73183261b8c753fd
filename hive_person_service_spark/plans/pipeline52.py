"""Round-7 graph addition: k-core decomposition (bounded peel).

``graph_kcore_peel`` runs R synchronized peeling rounds of the k-core
algorithm over the customer<->supplier co-shipment graph: each round
drops every edge touching a node of degree < K, and reports the
surviving node/edge counts per round.  Fixing the ROUND COUNT (rather
than iterating to fixpoint) makes the whole computation a finite
relational expression both engines can evaluate exactly -- the DuckDB
oracle is the same R rounds unrolled into chained CTEs, so the
iterative peel is hash-checked end to end (the graph_components
precedent: certify multi-hop logic against an independent engine).

Scale shape: one round = a degree groupBy + two hash joins against the
node-degree relation, all shuffling on node id; R bounds the job count
the way the BFS diameter bounds graph_shortest_path.  Each round's
edge set is cached and the previous round unpersisted -- the standard
iterative-refinement pattern (PageRank does the same), keeping lineage
depth O(1) per round instead of recomputing the whole prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

KCORE_K = 25
KCORE_ROUNDS = 6

_EDGES_SQL = """
e0 AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
s0 AS MATERIALIZED (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)
"""


def _kcore_oracle(k: int, rounds: int) -> str:
    # every CTE MATERIALIZED: DuckDB's default inlining expands the
    # round chain combinatorially (s_i referenced 3x per round -- the
    # reco_item_cooccurrence lesson from round 6)
    ctes = [_EDGES_SQL.strip()]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""d{i} AS MATERIALIZED (SELECT a, COUNT(*) AS d FROM s{p} GROUP BY a),
s{i} AS MATERIALIZED (
  SELECT s.a, s.b FROM s{p} s
  JOIN d{i} da ON s.a = da.a AND da.d >= {k}
  JOIN d{i} db ON s.b = db.a AND db.d >= {k})"""
        )
    stats = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS round,"
        f" CAST(COUNT(DISTINCT a) AS BIGINT) AS n_nodes,"
        f" CAST(COUNT(*) AS BIGINT) AS n_edges FROM s{i}"
        for i in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@declare("graph_kcore_peel", oracle=_kcore_oracle(KCORE_K, KCORE_ROUNDS))
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core peel (K=25, 6 synchronized rounds) of the symmetrized
    customer<->supplier shipment graph; output = (round, n_nodes,
    n_edges) survival curve.  The edge counts are over the SYMMETRIZED
    directed relation (2x the undirected edge count), same as the
    oracle's CTEs."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e0 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + 1_000_000).alias("b"),
        )
        .distinct()
    )
    s = e0.unionByName(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).cache()  # the loop's base relation: build the edge join ONCE

    stats: list[tuple[int, int, int]] = []
    prev_cached = s
    prev_edges = -1
    for i in range(1, KCORE_ROUNDS + 1):
        # cache the degree relation: it feeds BOTH broadcast keep-sets,
        # whose exchanges are not identical (different projection), so
        # uncached each broadcast build re-ran the degree groupBy over the
        # full edge relation -- one grouped pass per round, not two
        d = (
            s.groupBy("a").agg(F.count("*").alias("d"))
            .where(F.col("d") >= KCORE_K)
            .select("a")
            .cache()
        )
        keep_a = F.broadcast(d)
        keep_b = F.broadcast(d.select(F.col("a").alias("b")))
        s = s.join(keep_a, "a").join(keep_b, "b").select("a", "b").cache()
        # collect this round's TWO numbers eagerly (a bounded
        # R-rows-total driver collect, like PageRank's convergence
        # probes) so the output never re-walks the peel lineage
        row = s.agg(
            F.countDistinct("a").alias("n"), F.count("*").alias("e")
        ).collect()[0]
        stats.append((i, int(row["n"]), int(row["e"])))
        d.unpersist()
        prev_cached.unpersist()
        prev_cached = s
        if int(row["e"]) == prev_edges:
            # fixpoint: peeling only removes edges, so an unchanged
            # edge COUNT means an identical edge SET -- every later
            # round is equal by induction; emit without computing
            stats.extend(
                (j, int(row["n"]), int(row["e"]))
                for j in range(i + 1, KCORE_ROUNDS + 1)
            )
            break
        prev_edges = int(row["e"])
    prev_cached.unpersist()
    return spark.createDataFrame(
        stats, "round bigint, n_nodes bigint, n_edges bigint"
    )


# ---------------------------------------------------------------------------
# k-means TRAINING (full Lloyd rounds, oracle-checked)
# ---------------------------------------------------------------------------

KM_K = 8
KM_ROUNDS = 3
KM_DIM = 64


def _km_oracle(k: int, rounds: int, dim: int) -> str:
    """DuckDB replay of the identical quantized Lloyd iteration: every
    CTE MATERIALIZED (multi-referenced), centroid updates rounded to 6
    decimals exactly like the Spark side, so each round's assignment is
    argmax over BIT-IDENTICAL centroid values in both engines."""
    ctes = [
        f"""cent1 AS MATERIALIZED (
      SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings ORDER BY vec_id LIMIT {k})"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"""a{r} AS MATERIALIZED (
      SELECT vec_id, c_id AS cluster, cos FROM (
        SELECT e.vec_id, c.c_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), c.ce) AS cos,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_dot_product(
                                    CAST(e.embedding AS DOUBLE[]), c.ce) DESC,
                                  c.c_id) AS rn
        FROM embeddings e CROSS JOIN cent{r} c) WHERE rn = 1)"""
        )
        if r < rounds:
            ctes.append(
                f"""cent{r + 1} AS MATERIALIZED (
      SELECT cluster AS c_id, list(v ORDER BY dim) AS ce FROM (
        SELECT a.cluster, t.i AS dim,
               ROUND(AVG(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)), 6) AS v
        FROM a{r} a JOIN embeddings e USING (vec_id)
        CROSS JOIN range(1, {dim + 1}) t(i)
        GROUP BY a.cluster, t.i)
      GROUP BY cluster)"""
            )
    stats = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS BIGINT) AS round, CAST(cluster AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs, ROUND(AVG(cos), 4) AS mean_cos
    FROM a{r} GROUP BY cluster"""
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@declare("ml_kmeans_train", oracle=_km_oracle(KM_K, KM_ROUNDS, KM_DIM))
def ml_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means TRAINING, oracle-checked end to end -- rare for an
    iterative ML fit and possible because every source of cross-engine
    drift is pinned: deterministic seeds (K lowest vec_ids), a fixed
    round count, and centroid updates QUANTIZED to 6 decimals so both
    engines argmax over bit-identical centroids each round.  Output is
    the per-round training curve (cluster sizes + mean best-cosine).

    Scale shape per round: assignment is a broadcast of K centroids +
    map-side argmax (max-of-struct partial agg); the update is one
    posexplode + groupBy(cluster, dim) -- K*dim accumulators; only
    K*dim rounded doubles ever reach the driver (the same sufficient-
    statistics bound as ml_train_ols)."""
    from ..functions.vectors import cosine_expr, to_double_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("ev")
    )
    cents = [
        (int(r["vec_id"]), list(r["ev"]))
        for r in emb.orderBy("vec_id").limit(KM_K).collect()
    ]  # bounded: K seed vectors
    emb = emb.cache()

    stats: list[tuple[int, int, int, float]] = []
    for r in range(1, KM_ROUNDS + 1):
        cent_df = F.broadcast(
            spark.createDataFrame(cents, "c_id long, ce array<double>")
        )
        scored = emb.crossJoin(cent_df).select(
            "vec_id",
            "c_id",
            cosine_expr(F.col("ev"), F.col("ce")).alias("cos"),
        )
        assign = scored.groupBy("vec_id").agg(
            F.max(F.struct(F.col("cos"), (-F.col("c_id")).alias("neg_c"))).alias("b")
        ).select(
            "vec_id",
            (-F.col("b.neg_c")).cast("long").alias("cluster"),
            F.col("b.cos").alias("cos"),
        )
        if r < KM_ROUNDS:
            # two consumers (cluster stats + the centroid update): cache so
            # the K x N cosine scoring + argmax runs once per round, not
            # twice -- the update job below then reads the materialized
            # assignment instead of recomputing `scored`
            assign = assign.cache()
        for row in assign.groupBy("cluster").agg(
            F.count("*").alias("n"), F.round(F.avg("cos"), 4).alias("mc")
        ).collect():
            stats.append((r, int(row["cluster"]), int(row["n"]), float(row["mc"])))
        if r < KM_ROUNDS:
            upd = (
                assign.join(emb, "vec_id")
                .select("cluster", F.posexplode("ev").alias("dim", "val"))
                .groupBy("cluster", "dim")
                .agg(F.round(F.avg("val"), 6).alias("v"))
                .collect()
            )  # bounded: K*dim rounded doubles
            by_c: dict[int, dict[int, float]] = {}
            for row in upd:
                by_c.setdefault(int(row["cluster"]), {})[int(row["dim"])] = float(row["v"])
            cents = [
                (c, [dims[i] for i in range(KM_DIM)])
                for c, dims in sorted(by_c.items())
            ]
            assign.unpersist()
    emb.unpersist()
    return spark.createDataFrame(
        sorted(stats), "round bigint, cluster bigint, n_vecs bigint, mean_cos double"
    )
