"""§2.D -- aggregations: grouped, global, HAVING, distinct counts, rollup /
cube, collect, percentiles, statistical aggs.

Scale notes: every groupBy here is a partial (map-side) + final hash
aggregate -- one shuffle on the group keys, AQE-coalesced. Double-typed
accumulations are rounded in-query per the registry conventions so the
DuckDB oracle hashes match regardless of partial-agg order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary hash aggregate (the flagship / BASELINE
    q_pricing_summary shape): filter + groupBy + sum/avg/min/max/count."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count("*").alias("cnt"),
        )
    )


@declare(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS cnt,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_suppkey) AS n_supp
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (keyless) aggregate: partial per partition -> single final."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@declare(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING: post-aggregation filter."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .where(F.col("n_orders") >= 15)
    )


@declare(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (BASELINE q_distinct_users shape);
    Spark expands to a two-phase aggregate automatically."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"), F.count("*").alias("n")
    )


@declare("agg_approx_distinct", oracle=None)  # rows-only: HLL estimates differ by impl
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++): the 100 TB path for
    distinct-user metrics -- single pass, fixed memory per group. Rows-only
    check (Spark HLL++ vs DuckDB HLL give different estimates); pytest
    asserts <5% relative error vs exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


@declare(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP multi-grain aggregate: (r,n), (r), () grains with NULL-filled
    grouping columns."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("bal")
    )


@declare(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping-set grains in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@declare(
    "agg_collect",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_list,
           CAST(len(list(DISTINCT user_id)) AS BIGINT) AS n_users
    FROM events WHERE user_id < 40 GROUP BY event_type
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array (deterministic per-group array build);
    output serialized to a string for engine-stable hashing."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    arr = F.sort_array(F.collect_set("user_id"))
    return ev.groupBy("event_type").agg(
        F.array_join(arr.cast("array<string>"), ",").alias("user_list"),
        F.size(F.collect_set("user_id")).cast("long").alias("n_users"),
    )


@declare(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS price_p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation -- matches DuckDB
    quantile_cont). The 100 TB path swaps in percentile_approx (fixed-memory
    sketch, rows-only checkable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.25), 4).alias("p25"),
        F.round(F.percentile("l_quantity", 0.50), 4).alias("p50"),
        F.round(F.percentile("l_quantity", 0.75), 4).alias("p75"),
        F.round(F.percentile("l_extendedprice", 0.90), 4).alias("price_p90"),
    )


@declare("agg_percentile_approx", oracle=None)  # rows-only: sketch-specific
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch): the 100 TB path --
    single pass, bounded memory, mergeable partials. Rows-only check (the
    sketch's answers differ from DuckDB's exact quantiles by design);
    pytest-bounded against the exact values."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 1000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("price_p90_approx"),
    )


@declare(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/correlation/covariance."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "cov_qty_price"
        ),
    )
