"""Round-4 continuation batch 28: multi-dimensional clustering payoff +
co-occurrence analytics.

scan_zorder_2d closes the loop the layout/skipping operators opened:
Z-order (operators/layout.py) exists to make MULTI-column predicates
prunable, and this query proves it end-to-end -- a 2-D band predicate
served by footer-stats pruning on BOTH dimensions with bit-identical
results. orders_market_basket is the association-rules staple
(support / confidence / lift) with the per-order pair explosion bounded
by basket size.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def zorder_orders_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) orders Z-ordered on
    (o_custkey, o_totalprice) into 16 files; returns the path. Shared by
    the declared query and the pruning pytest."""
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:z2d".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"orders_z2d_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from ..operators.layout import zorder_write

        zorder_write(
            load_table(spark, sf_dir, "orders"),
            path,
            ["o_custkey", "o_totalprice"],
            bits=8,
            n_files=16,
        )
    return path


def zorder_2d_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, int]:
    """The pruned 2-D band scan; returns (df, files_kept, files_total) so
    the pytest can pin the skip without re-deriving the layout."""
    from ..operators.skipping import build_stats_index, prune_files

    path = zorder_orders_layout(spark, sf_dir)
    # persist the (files x columns) index: unpersisted, every downstream
    # job (file count + each prune) re-ran the footer-reading Python stage
    stats = build_stats_index(
        spark, path, ["o_custkey", "o_totalprice"]
    ).persist()
    n_total = stats.select("file").distinct().count()
    keep_cust = set(prune_files(stats, "o_custkey", 100.0, 400.0))
    keep_price = set(prune_files(stats, "o_totalprice", 50_000.0, 150_000.0))
    keep = sorted(keep_cust & keep_price)
    stats.unpersist()
    if not keep:
        base = spark.read.parquet(path).where(F.lit(False))
        return base, 0, n_total
    base = spark.read.parquet(*keep).where(
        F.col("o_custkey").between(100, 400)
        & F.col("o_totalprice").between(50_000.0, 150_000.0)
    )
    return base, len(keep), n_total


@declare(
    "scan_zorder_2d",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 400
      AND o_totalprice BETWEEN 50000 AND 150000
    GROUP BY o_orderstatus
    """,
)
def scan_zorder_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional data skipping over a Z-ordered layout: orders is
    Morton-interleaved on (o_custkey, o_totalprice) so file min/max
    footer stats are tight in BOTH dimensions simultaneously (a sort by
    one column makes only that column prunable), and the 2-D band
    predicate keeps only files whose ranges overlap in both columns
    (intersection of the per-column prunes) with the exact predicate as
    residual. The oracle aggregates the original un-clustered table --
    agreement proves 2-D pruning lost nothing; the kept-file count is
    pinned strictly below the layout's total by
    tests/test_zorder_declared.py. At 100 TB this is the layout choice
    that serves person-AND-amount investigations from a fraction of the
    files either single-column sort could."""
    df, _, _ = zorder_2d_pruned_scan(spark, sf_dir)
    return df.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@declare(
    "orders_market_basket",
    oracle="""
    WITH basket AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM basket
    ), part_support AS MATERIALIZED (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS sup FROM basket GROUP BY l_partkey
    ), pair_support AS MATERIALIZED (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS co
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.co,
           sa.sup AS sup_a, sb.sup AS sup_b,
           ROUND(p.co / CAST(sa.sup AS DOUBLE), 4) AS confidence,
           ROUND(p.co * (SELECT n FROM n_orders) / (sa.sup * CAST(sb.sup AS DOUBLE)), 4)
             AS lift
    FROM pair_support p
    JOIN part_support sa ON sa.l_partkey = p.part_a
    JOIN part_support sb ON sb.l_partkey = p.part_b
    """,
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (support / confidence /
    lift): co-occurring part pairs within an order, scored against the
    parts' individual supports. The pair explosion self-joins baskets on
    l_orderkey -- fan-out bounded by C(basket_size, 2), basket sizes are
    Zipf-small, and the join key is the natural shuffle key, so at
    100 TB this is one co-partitioned SMJ plus two broadcast-able
    support joins (part-support is part-cardinality-sized). The lift
    denominator's corpus total arrives as a broadcast 1-row aggregate
    (the PMI-totals pattern). HAVING co >= 2 keeps the rule set to
    actually-repeating pairs."""
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = basket.select(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    part_sup = basket.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("sup")
    )
    a = basket.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "k").where(F.col("part_a") < F.col("part_b"))
    pair_sup = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("co"))
        .where(F.col("co") >= 2)
    )
    sa = part_sup.select(F.col("l_partkey").alias("part_a"), F.col("sup").alias("sup_a"))
    sb = part_sup.select(F.col("l_partkey").alias("part_b"), F.col("sup").alias("sup_b"))
    return (
        pair_sup.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "co",
            "sup_a",
            "sup_b",
            F.round(F.col("co") / F.col("sup_a").cast("double"), 4).alias("confidence"),
            F.round(
                F.col("co") * F.col("n") / (F.col("sup_a") * F.col("sup_b").cast("double")),
                4,
            ).alias("lift"),
        )
    )
