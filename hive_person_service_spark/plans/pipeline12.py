"""Batch 13 — SQL-registered UDFs, funnel latency, policy dedup, Pareto
coverage (round 2):

- sql_udf_registered: a Python (Arrow) UDF registered into the SQL catalog
  (spark.udf.register) and invoked from a spark.sql string -- the Hive
  `CREATE FUNCTION` + SQL-usage path, distinct from udf_scalar's
  DataFrame-API usage.
- events_step_latency: per-user first-view -> first-purchase latency
  distribution summary (funnel step timing).
- dedup_exact_keep_best: exact dedup keeping the BEST row per duplicate
  group by an explicit policy (longest text, then lowest id) -- the
  realistic survivor rule; dedup_exact's lowest-id rule stays as the
  simple form.
- sql_pareto_customers: smallest prefix of customers (by revenue)
  covering 80% of total revenue -- cumulative-share window over the
  compacted per-customer aggregate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.global_rank import with_global_prefix_sum
from ..sources import load_table, register_views
from .registry import declare


@declare(
    "sql_udf_registered",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice * 0.07), 2) AS total_fee
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_udf_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF registered into the SQL catalog and called from a SQL
    string (the Hive CREATE FUNCTION + HiveQL usage path): an Arrow-
    vectorized fee function over orders. The UDF body is deliberately
    DuckDB-expressible so the query stays oracle-checked; the point under
    test is the registration + SQL-resolution surface, which udf_scalar
    (DataFrame API) does not touch."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def order_fee(total: pd.Series) -> pd.Series:
        return total * 0.07

    spark.udf.register("order_fee", order_fee)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(order_fee(o_totalprice)), 2) AS total_fee
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@declare(
    "events_step_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_buy
      FROM events GROUP BY user_id),
    lat AS (
      SELECT user_id, (first_buy - first_view) / 3600e6 AS hours
      FROM firsts
      WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
        AND first_buy >= first_view)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(hours), 4) AS avg_hours,
           ROUND(MEDIAN(hours), 4) AS median_hours,
           ROUND(MIN(hours), 4) AS min_hours,
           ROUND(MAX(hours), 4) AS max_hours
    FROM lat
    """,
)
def events_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step timing: per-user first view -> first purchase latency
    (users whose first purchase follows their first view), summarized.
    One conditional-min groupBy on user_id does all the per-user work;
    the summary is a single global aggregate over users."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_buy"),
    )
    lat = firsts.where(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select(
        ((F.col("first_buy") - F.col("first_view")) / 3600e6).alias("hours")
    )
    return lat.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("hours"), 4).alias("avg_hours"),
        F.round(F.median("hours"), 4).alias("median_hours"),
        F.round(F.min("hours"), 4).alias("min_hours"),
        F.round(F.max("hours"), 4).alias("max_hours"),
    )


@declare(
    "dedup_exact_keep_best",
    oracle="""
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
             row_number() OVER (PARTITION BY text
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
)
def dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with a quality survivor policy: keep the longest copy
    (ties -> lowest id) per distinct text. Same one-shuffle window shape
    as dedup_exact; only the ORDER BY inside the group changes -- which is
    exactly how production survivor rules (highest quality score, newest
    crawl, preferred source) slot in."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_chars")
    )


@declare(
    "sql_pareto_customers",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, SUM(o_totalprice) AS revenue
      FROM orders GROUP BY o_custkey),
    tot AS (SELECT SUM(revenue) AS total FROM rev),
    ranked AS (
      SELECT o_custkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, o_custkey)
               / total AS cum_share
      FROM rev CROSS JOIN tot)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(MAX(cum_share), 6) AS covered_share
    FROM ranked
    WHERE cum_share < 0.8 OR (cum_share >= 0.8 AND
          cum_share - revenue / (SELECT total FROM tot) < 0.8)
    """,
)
def sql_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto coverage: the smallest revenue-ranked customer prefix whose
    cumulative share reaches 80% (count + exact share covered). The
    cumulative sum over the customer aggregate is the two-phase global
    prefix sum (operators/global_rank.py: range-partitioned parallel
    in-partition running sum + broadcast exclusive prefix of the tiny
    per-partition totals) -- no partition-less window over the
    customer-cardinality relation, so the plan holds at billions of
    customers. The crossing row is kept via 'cumulative share minus own
    contribution still below threshold'."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    tot = rev.agg(F.sum("revenue").alias("total"))
    cum = with_global_prefix_sum(
        rev,
        [F.col("revenue").desc(), F.col("o_custkey")],
        "revenue",
        "cum_rev",
    )
    ranked = cum.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        "revenue",
        (F.col("cum_rev") / F.col("total")).alias("cum_share"),
        (F.col("revenue") / F.col("total")).alias("own_share"),
    )
    kept = ranked.where(
        (F.col("cum_share") < 0.8)
        | (F.col("cum_share") - F.col("own_share") < 0.8)
    )
    return kept.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(F.max("cum_share"), 6).alias("covered_share"),
    )
