"""Batch 23 — cohort economics + vector integrity (round 2):

- orders_cohort_ltv: acquisition-cohort lifetime-value matrix -- revenue
  per (first-order-year cohort, years-since-acquisition offset); the
  orders-side twin of the events cohort-retention matrix.
- emb_norm_audit: embedding-table integrity audit (L2-norm min/avg/max,
  off-unit count, zero-vector count) -- the data-quality gate an
  embedding pipeline runs before the vectors feed ANN indexing, where a
  silent normalization bug poisons every cosine downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import to_double_array
from ..sources import load_table
from .registry import declare


@declare(
    "orders_cohort_ltv",
    oracle="""
    WITH first_year AS (
      SELECT o_custkey, MIN(CAST(year(o_orderdate) AS BIGINT)) AS cohort
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort,
             CAST(year(o.o_orderdate) AS BIGINT) - f.cohort AS yr_offset,
             o.o_totalprice AS p
      FROM orders o JOIN first_year f ON o.o_custkey = f.o_custkey)
    SELECT cohort, yr_offset,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(p), 2) AS revenue
    FROM rev GROUP BY cohort, yr_offset
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV matrix: customers grouped by first-order year, revenue
    accumulated per years-since-acquisition offset. The first-year
    relation is customers-sized (broadcastable against orders keyed the
    same way); one orders groupBy on (cohort, offset) finishes it --
    reading down a column shows how later cohorts monetize vs earlier
    ones at the same age."""
    o = load_table(spark, sf_dir, "orders")
    first_year = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate").cast("long")).alias("cohort")
    )
    rev = o.join(first_year, "o_custkey").select(
        "cohort",
        (F.year("o_orderdate").cast("long") - F.col("cohort")).alias("yr_offset"),
        F.col("o_totalprice").alias("p"),
    )
    return rev.groupBy("cohort", "yr_offset").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("p"), 2).alias("revenue"),
    )


@declare(
    "emb_norm_audit",
    oracle="""
    WITH norms AS (
      SELECT vec_id,
             SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(MIN(nrm), 6) AS min_norm,
           ROUND(AVG(nrm), 6) AS avg_norm,
           ROUND(MAX(nrm), 6) AS max_norm,
           CAST(SUM(CASE WHEN ABS(nrm - 1.0) > 1e-3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_off_unit,
           CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero
    FROM norms
    """,
)
def emb_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding integrity audit: L2-norm spread plus off-unit (>1e-3
    from 1.0) and zero-vector counts, in one map-side pass (per-row
    zip_with/aggregate dot, single global aggregate). Run before vectors
    feed cosine/ANN stages -- a normalization regression here corrupts
    every similarity number downstream and is otherwise invisible."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array("embedding")
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norms = emb.select(F.sqrt(dot).alias("nrm"))
    return norms.agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.avg("nrm"), 6).alias("avg_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.sum(F.when(F.abs(F.col("nrm") - 1.0) > 1e-3, 1).otherwise(0))
        .cast("long")
        .alias("n_off_unit"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
    )
