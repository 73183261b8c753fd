"""Round-4 continuation batch 29: cogrouped pandas extension point,
graph motif counting, collation-aware grouping.

udf_cogrouped_pandas completes the §2.K pandas API family (scalar /
grouped-agg / grouped-map / mapInPandas / mapInArrow already declared):
cogroup().applyInPandas is the two-sided extension point -- the mount
for pandas merge_asof-style custom joins. graph_triangles adds motif
counting to the graph family (degrees / components / pagerank).
fn_collation exercises Spark 4 collations (UTF8_LCASE) -- the
Hive-migration answer to case-insensitive keys without lower() walls.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "udf_cogrouped_pandas",
    oracle="""
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS spend,
           ROUND(MAX(c.c_acctbal), 2) AS acctbal
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey < 500
      AND o.o_custkey < 500
    GROUP BY c.c_custkey
    """,
)
def udf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided pandas extension point: customers and their orders are
    cogrouped on the key and each (customer-rows, order-rows) pair of
    pandas frames meets in one Python function -- the mount for custom
    two-sided logic (pandas merge_asof, per-entity reconciliation,
    model scoring against history) that single-input grouped-map can't
    express. Both sides shuffle once on the key, Arrow moves the
    batches, and per-key work is pure pandas. Here the function computes
    the per-customer order rollup so the DuckDB join-aggregate can
    oracle-check the plumbing end-to-end. Keys missing either side are
    dropped in-function (inner semantics, matching the oracle).
    cogroup dispatches Python ONCE PER KEY, so like every declared
    Python-per-row/per-key extension point (udtf_ngrams_analyze's 40-doc
    slice) the key set is absolutely bounded (custkey < 500) — the
    round-4 sweep measured the unbounded form at 27 s purely in per-key
    dispatch; the production shape batches per key group by
    construction, which is the API's cost model, not this query's."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where((F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") < 500))
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_custkey") < 500)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )

    def merge(cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        if cust.empty or orders.empty:
            return pd.DataFrame(
                {"c_custkey": [], "n_orders": [], "spend": [], "acctbal": []}
            ).astype(
                {"c_custkey": "int64", "n_orders": "int64", "spend": "float64", "acctbal": "float64"}
            )
        return pd.DataFrame(
            {
                "c_custkey": [int(cust["c_custkey"].iloc[0])],
                "n_orders": [int(len(orders))],
                "spend": [round(float(orders["o_totalprice"].sum()), 2)],
                "acctbal": [round(float(cust["c_acctbal"].max()), 2)],
            }
        )

    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            merge, "c_custkey long, n_orders long, spend double, acctbal double"
        )
    )


@declare(
    "graph_triangles",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), pairs AS (
      SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
             COUNT(*) AS shared
      FROM ps a JOIN ps b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
      GROUP BY 1, 2
    ), topk AS (
      SELECT s1, s2 FROM (
        SELECT s1, s2,
               row_number() OVER (PARTITION BY s1
                                  ORDER BY shared DESC, s2) AS rn
        FROM pairs) WHERE rn <= 10
    ), edges AS (
      SELECT DISTINCT LEAST(s1, s2) AS s1, GREATEST(s1, s2) AS s2 FROM topk
    ), tri AS (
      SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
      FROM edges e1
      JOIN edges e2 ON e2.s1 = e1.s2
      JOIN edges e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the kNN BACKBONE of the supplier co-shipment
    graph. The raw co-shipment graph (suppliers adjacent when they ship
    a common part) is COMPLETE in this fixture at every sf -- uniform
    part assignment connects every pair, so its triangle count is the
    C(n,3) formula and the wedge join is a vacuous n^3 enumeration (the
    round-4 sweep measured 42 s). The honest graph analysis on a dense
    similarity graph is its k-nearest-neighbor sparsification: keep each
    supplier's 10 strongest partners (shared-part count desc, partner id
    tie-break -- deterministic), symmetrize, and count triangles there
    -- mutual strong-partnership motifs. Edges are <= 10n by
    construction at ANY scale, so the ordered wedge-close join
    (join on middle vertex, close with one equi-join) stays bounded
    however dense the underlying co-occurrence is -- this is exactly the
    kNN-graph discipline the ANN tiers apply to embeddings. The pair
    weights come from one bounded self-join of the distinct bipartite
    relation (fan-out = suppliers-per-part^2), aggregated before the
    top-k window, and the backbone is persisted for its four consumers
    (wedge sides + count)."""
    ps = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    ps2 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p2"), F.col("l_suppkey").alias("sb")
    ).distinct()
    pairs = (
        ps.join(ps2, (F.col("l_partkey") == F.col("p2")) & (F.col("l_suppkey") != F.col("sb")))
        .groupBy(F.col("l_suppkey").alias("s1"), F.col("sb").alias("s2"))
        .agg(F.count("*").alias("shared"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("s1").orderBy(F.col("shared").desc(), "s2")
    topk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("s1", "s2")
    )
    from ..operators.caching import persist_bounded

    edges = persist_bounded(
        "triangles_knn_edges",
        topk.select(
            F.least("s1", "s2").alias("s1"), F.greatest("s1", "s2").alias("s2")
        ).distinct(),
    )
    e1 = edges.select(F.col("s1").alias("a"), F.col("s2").alias("b"))
    e2 = edges.select(F.col("s1").alias("b"), F.col("s2").alias("c"))
    e3 = edges.select(F.col("s1").alias("a"), F.col("s2").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"])
    return (
        edges.agg(F.count("*").cast("long").alias("n_edges"))
        .crossJoin(tri.agg(F.count("*").cast("long").alias("n_triangles")))
    )


@declare(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN UPPER(source) ELSE source END AS src
      FROM documents
    )
    SELECT LOWER(src) AS source_ci,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT src) AS BIGINT) AS n_raw_forms
    FROM mixed
    GROUP BY LOWER(src)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): the source tag is
    deliberately case-mangled (upper-cased on even doc ids), then
    grouped under the UTF8_LCASE collation -- equality, joins, and
    GROUP BY become case-insensitive AT THE TYPE LEVEL, the
    Hive-migration answer for case-insensitive keys that otherwise
    spawn lower() wrappers on every predicate (and defeat pushdown on
    collated-key columns). The emitted key is canonicalized with
    lower() (the collation's group representative is first-seen,
    which is partition-order-dependent); n_raw_forms counts the
    distinct raw spellings each class absorbed."""
    d = load_table(spark, sf_dir, "documents")
    mixed = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("src"),
    )
    return (
        mixed.groupBy(F.collate("src", "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.countDistinct("src").cast("long").alias("n_raw_forms"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("source_ci"),
            "n_docs",
            "n_raw_forms",
        )
    )
