"""Round-4 continuation batch 27: mergeable distinct-count state +
window/SQL surface completions.

agg_bitmap_distinct and sketch_hll_mergeable are the two production
answers to COUNT(DISTINCT) at 100 TB -- exact roaring-style bitmaps when
the key space is dense integers, Datasketches HLL when it isn't; both
are MERGEABLE (partials combine associatively), which is what lets a
lake maintain per-partition state and answer any rollup without
rescanning facts. win_locf is the last-observation-carried-forward gap
fill every metrics pipeline runs; sort_limit_offset is the pagination
contract; sql_group_by_all the modern grouping shorthand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import declare


@declare(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+ bitmap
    family, the roaring-bitmap idea): each customer key sets one bit in a
    per-bucket bitmap (bitmap_bucket_number shards the key space into
    32k-bit buckets), bitmaps OR-merge associatively in partial
    aggregation, and bitmap_count reads the exact cardinality out.
    Unlike COUNT(DISTINCT) -- whose partial state is the full key set --
    bitmap state is bounded by key-space density, merges in O(words),
    and can be PERSISTED per partition then OR-merged at query time, the
    same lifecycle as the KMV/CMS sketches but exact. Agreement with the
    plain COUNT(DISTINCT) oracle proves the bitmap path loses nothing.
    Two-level aggregate: bucket bitmaps first, then sum of per-bucket
    counts."""
    o = load_table(spark, sf_dir, "orders")
    buckets = (
        o.groupBy(
            "o_orderstatus",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias("bm"),
            F.count("*").cast("long").alias("n_orders_b"),
        )
    )
    return buckets.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_custs"),
        F.sum("n_orders_b").cast("long").alias("n_orders"),
    )


@declare("sketch_hll_mergeable", oracle=None)  # rows-only: sketch bytes are impl-specific
def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL lifecycle (Spark 3.5+ hll_sketch_agg /
    hll_union_agg): per-DAY user sketches built once, then OR-merged up
    to months -- the persisted-partial pattern where a year of daily
    sketch rows (KBs each) answers any date-range distinct-users
    question without touching events again. Output: per-month merged
    estimate alongside the exact distinct count and the absolute
    relative error. Rows-only (sketch estimates are implementation-
    defined); tests/test_hll_bitmap.py pins union-of-daily == direct
    monthly sketch estimate EXACTLY (merge loses nothing) and relative
    error < 5%."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    monthly = (
        daily.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"))
    )
    exact = (
        ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return (
        monthly.join(exact, "month")
        .select(
            "month",
            F.col("est_users").cast("long").alias("est_users"),
            "exact_users",
            F.round(
                F.abs(F.col("est_users") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("month")
    )


@declare(
    "win_locf",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
           CAST(event_type = 'error' AS BOOLEAN) AS was_gap
    FROM events
    """,
)
def win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill: readings flagged as
    sensor errors are nulled and repaired with the most recent good
    value per user (last IGNORE NULLS over an unbounded-preceding ROWS
    frame) -- the timeseries repair that precedes any model or rollup.
    Window partitions by the entity key, so at 100 TB this is one
    shuffle on user_id with O(1) state per row; leading gaps stay NULL
    by design (nothing to carry). Per-row doubles pass through untouched
    (bit-exact cross-engine, no aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(good, ignorenulls=True).over(w).alias("filled"),
        (F.col("event_type") == "error").alias("was_gap"),
    )


@declare(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (page 3 of the price-ranked report, 20 rows/page):
    ORDER BY ... LIMIT 20 OFFSET 40 with a unique tie-break key so every
    page is deterministic. Spark executes offset+limit as a single
    top-(60) per partition followed by one final ordered take -- the
    offset never materializes a global sort. Deep pagination (OFFSET
    10^6) should switch to keyset pagination (WHERE price < last_seen)
    -- same plan as sort_limit_topk -- since top-(offset+k) state grows
    with the offset."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(40)
        .limit(20)
    )


@declare(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus,
           CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus, YEAR(CAST(o_orderdate AS DATE))
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / modern-warehouse shorthand): every
    non-aggregate select item becomes a grouping key -- the
    report-authoring convenience that removes the classic
    keys-drift-out-of-sync bug between SELECT and GROUP BY. Resolves at
    analysis time to the explicit form (the oracle), identical plan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gba_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM gba_orders
        GROUP BY ALL
        """
    )
