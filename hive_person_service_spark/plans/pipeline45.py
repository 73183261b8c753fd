"""Round-5 batch 45: graph traversal, privacy, recommendations, rolling
holistic windows, and person-record entity resolution.

- graph_shortest_path: single-source BFS over the supplier co-shipment
  kNN backbone -- the third iterative-graph shape (level-synchronous
  traversal) next to components and pagerank, and fully oracle-checked
  against DuckDB's recursive-CTE BFS.
- reco_item_cooccurrence: market-basket lift over order baskets
  ("bought X also bought Y") -- equi-join + broadcast supports, the
  classic co-occurrence recommender precompute.
- win_rolling_median: EXACT rolling 7-day median (holistic aggregate
  over a moving frame) via sorted in-frame arrays; integer-cents daily
  totals keep the median engine-exact.
- dedup_entity_jarowinkler: entity resolution of typo'd person names
  against a canonical dimension -- first-letter blocking keeps candidate
  pairs relational, the Arrow-batched Jaro-Winkler scorer is pinned
  bit-for-bit to DuckDB's native builtin (operators/linkage.py), so the
  whole fuzzy-match is oracle-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import declare

_BFS_HOPS = 12
_BFS_SOURCE = 1
_BFS_K = 3

_SURNAMES = [
    "anderson", "martinez", "thompson", "garcia", "robinson",
    "clarkson", "mitchell", "johnson", "peterson", "sullivan",
    "coleman", "henderson", "marshall", "simmons", "castillo",
    "mcdonald", "harrington", "fletcher", "whitfield", "caldwell",
]


@declare(
    "graph_shortest_path",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
      SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_suppkey <> b.l_suppkey
      GROUP BY 1, 2),
    backbone AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               ROW_NUMBER() OVER (PARTITION BY src
                                  ORDER BY w DESC, dst) AS rn
        FROM pairs) t
      WHERE rn <= {_BFS_K}),
    bfs(node, dist) AS (
      SELECT CAST({_BFS_SOURCE} AS BIGINT), 0
      UNION
      SELECT e.dst, bfs.dist + 1
      FROM bfs JOIN backbone e ON e.src = bfs.node
      WHERE bfs.dist < {_BFS_HOPS})
    SELECT node, CAST(MIN(dist) AS BIGINT) AS hops
    FROM bfs GROUP BY node
    """,
)
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop distances from supplier 1 over the top-3
    co-shipment backbone (each supplier keeps its 3 heaviest partners --
    the scale-free sparsification graph_triangles established; a raw
    co-shipment graph is complete and BFS would be vacuous). The Spark
    side runs level-synchronous frontier expansion (operators/graph.py
    bfs_distances): iterations scale with graph DIAMETER, each round
    joins the broadcast frontier against the src-partitioned edge
    relation -- the Pregel BFS shape that holds at billion-edge scale.
    The oracle replays the same traversal as a recursive CTE."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    w = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    backbone = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _BFS_K)
        .select("src", "dst")
    )
    from ..operators.graph import bfs_distances

    return bfs_distances(backbone, _BFS_SOURCE, max_hops=_BFS_HOPS)


@declare(
    "reco_item_cooccurrence",
    oracle="""
    WITH baskets AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item_n AS MATERIALIZED (
      SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS s FROM baskets GROUP BY 1),
    tot AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM baskets),
    co AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS co_orders
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
    SELECT part_a, part_b, co_orders,
           ROUND(co_orders * tot.n / (ia.s * ib.s), 6) AS lift
    FROM co
    JOIN item_n ia ON co.part_a = ia.l_partkey
    JOIN item_n ib ON co.part_b = ib.l_partkey
    CROSS JOIN tot
    ORDER BY lift DESC, part_a, part_b
    LIMIT 20
    """,
)
def reco_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift: top-20 part pairs by lift = P(a,b)/(P(a)P(b))
    over order baskets -- the co-occurrence precompute behind "customers
    who bought X also bought Y". Pair generation is the basket self-join
    on the order key (co-partitioned shuffle, pair count bounded by
    sum of basket-size^2, never corpus^2 -- measured max basket 17 at
    sf0.1, SCALE.md; a pathological 10^4-item basket would need the
    standard cap-or-salt-above-threshold guard before the self-join);
    item supports and the order total are broadcast back. Counts are
    exact integers so lift is reproducible IEEE arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.caching import persist_bounded

    baskets = persist_bounded(
        "basket_pairs_baskets",
        li.select("l_orderkey", "l_partkey").distinct(),
    )
    item_n = baskets.groupBy("l_partkey").agg(
        F.count("*").cast("double").alias("s")
    )
    tot = baskets.select(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("co_orders"))
    )
    ia = item_n.select(
        F.col("l_partkey").alias("part_a"), F.col("s").alias("sa")
    )
    ib = item_n.select(
        F.col("l_partkey").alias("part_b"), F.col("s").alias("sb")
    )
    out = (
        co.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "co_orders",
            F.round(
                F.col("co_orders") * F.col("n") / (F.col("sa") * F.col("sb")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(20)
    )
    return out


@declare(
    "win_rolling_median",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority,
             strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority, day, cents,
           median(CAST(cents AS DOUBLE)) OVER (
             PARTITION BY o_orderpriority ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
    FROM daily
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling 7-day median of daily revenue per order priority --
    a holistic aggregate over a moving frame, which no running-state
    window can compute. The frame's values are collected into an in-row
    array, sorted, and interpolated (even count -> mean of the two
    middles, DuckDB's quantile_cont semantics) entirely in JVM
    higher-order functions. Daily totals are FLOOR-cents integers so
    the median is engine-exact. The window partitions by priority over
    the ~#days grouped relation, never the raw fact table -- frame width
    (7) bounds per-row state at any scale."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
        .cast("long")
        .alias("cents")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    frame = F.array_sort(F.collect_list(F.col("cents").cast("double")).over(w))
    n = F.size(frame)
    med = F.when(
        n % 2 == 1, F.element_at(frame, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(frame, (n / 2).cast("int"))
            + F.element_at(frame, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return daily.select(
        "o_orderpriority", "day", "cents", med.alias("med7")
    )


def _surname_case_duck() -> str:
    items = ", ".join(f"'{s}'" for s in _SURNAMES)
    return f"(ARRAY[{items}])[CAST(c_custkey % 20 AS INTEGER) + 1]"


@declare(
    "dedup_entity_jarowinkler",
    oracle=f"""
    WITH canon AS (
      SELECT unnest(ARRAY[{", ".join(f"'{s}'" for s in _SURNAMES)}]) AS canon_name),
    dirty AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0
                  THEN substr(base, 1, 2) || substr(base, 4, 1)
                       || substr(base, 3, 1) || substr(base, 5)
                  ELSE base END AS dirty_name
      FROM (SELECT c_custkey, {_surname_case_duck()} AS base FROM customer) t),
    scored AS (
      SELECT d.c_custkey, d.dirty_name, c.canon_name,
             jaro_winkler_similarity(d.dirty_name, c.canon_name) AS jw
      FROM dirty d JOIN canon c
        ON substr(d.dirty_name, 1, 1) = substr(c.canon_name, 1, 1)),
    best AS (
      SELECT c_custkey, dirty_name, canon_name, jw,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY jw DESC, canon_name) AS rn
      FROM scored WHERE jw >= 0.85)
    SELECT c_custkey, dirty_name, canon_name AS matched_name,
           ROUND(jw, 6) AS score
    FROM best WHERE rn = 1
    """,
)
def dedup_entity_jarowinkler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution of typo'd person names against a canonical
    surname dimension: every customer gets a deterministic surname
    (typos injected by swapping characters 3/4 for every third key --
    the fixture corpus has no natural dirty names, the PII-injection
    precedent), candidates are blocked on the FIRST LETTER (an equi-join
    column -- typos never touch it), and the survivors are scored with
    the Arrow-batched Jaro-Winkler UDF pinned bit-for-bit to DuckDB's
    native builtin, so the fuzzy match is fully oracle-checked. Best
    match per record via a per-key window at threshold 0.85. At 100 TB
    the canonical dimension broadcasts and only same-block pairs reach
    Python."""
    from ..operators.linkage import jaro_winkler_udf

    c = load_table(spark, sf_dir, "customer")
    base = F.element_at(
        F.array(*[F.lit(s) for s in _SURNAMES]),
        (F.col("c_custkey") % 20 + 1).cast("int"),
    )
    dirty = (
        c.select("c_custkey", base.alias("base"))
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 3 == 0,
                F.concat(
                    F.substring("base", 1, 2),
                    F.substring("base", 4, 1),
                    F.substring("base", 3, 1),
                    F.col("base").substr(F.lit(5), F.lit(64)),
                ),
            )
            .otherwise(F.col("base"))
            .alias("dirty_name"),
        )
    )
    canon = spark.createDataFrame(
        [(s,) for s in _SURNAMES], "canon_name STRING"
    )
    scored = (
        dirty.join(
            F.broadcast(canon),
            F.substring("dirty_name", 1, 1) == F.substring("canon_name", 1, 1),
        )
        .withColumn("jw", jaro_winkler_udf("dirty_name", "canon_name"))
        .where(F.col("jw") >= 0.85)
    )
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("jw").desc(), F.col("canon_name")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_custkey",
            "dirty_name",
            F.col("canon_name").alias("matched_name"),
            F.round("jw", 6).alias("score"),
        )
    )
