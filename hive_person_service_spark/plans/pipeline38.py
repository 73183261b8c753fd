"""Round-4 continuation batch 38: alternate client API surfaces.

- api_pandas_on_spark: the pandas API on Spark (pyspark.pandas) driving
  the SAME engine — a pandas user's groupby/assign chain compiles to the
  identical Catalyst plan a DataFrame user gets, proven by the DuckDB
  oracle. This is the migration surface for single-node pandas pipelines
  that outgrew one machine.
- stat_crosstab: DataFrameStatFunctions.crosstab — the contingency-table
  utility (pair frequencies pivoted wide) the exploratory layer uses
  before committing to a pivot query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "api_pandas_on_spark",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(c_acctbal), 2) AS bal_total,
           ROUND(AVG(c_acctbal), 4) AS bal_mean
    FROM customer WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def api_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas API on Spark (pyspark.pandas): a filter -> groupby -> agg
    chain written exactly as a pandas user writes it, executed by the
    same Catalyst/Tungsten engine as every other query here —
    `.to_spark()` hands back the lazy plan, nothing materializes on one
    node. The visible API tax: pandas semantics need an index, so the
    plan carries AttachDistributedSequence nodes (distributed, but an
    extra pass) — the reason the engine's first-class surface stays the
    DataFrame API and this query exists as the MIGRATION exemplar: a
    pandas workload that outgrew one machine ports by changing the
    import, and the oracle proves the semantics carried over exactly."""
    import pyspark.pandas as ps

    c = load_table(spark, sf_dir, "customer")
    psdf = c.pandas_api()
    pos = psdf[psdf["c_acctbal"] > 0]
    agg = pos.groupby("c_mktsegment").agg({"c_acctbal": ["count", "sum", "mean"]})
    # MultiIndex columns flatten to '<col>_<fn>' on the Spark side.
    out = agg.reset_index().to_spark()
    return out.select(
        F.col("`(c_mktsegment, )`").alias("c_mktsegment"),
        F.col("`(c_acctbal, count)`").cast("long").alias("n"),
        F.round(F.col("`(c_acctbal, sum)`"), 2).alias("bal_total"),
        F.round(F.col("`(c_acctbal, mean)`"), 4).alias("bal_mean"),
    )


@declare(
    "stat_crosstab",
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR) AS c_nationkey_c_mktsegment,
           CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                AS BIGINT) AS AUTOMOBILE,
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                AS BIGINT) AS BUILDING,
           CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END)
                AS BIGINT) AS FURNITURE,
           CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END)
                AS BIGINT) AS HOUSEHOLD,
           CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
                AS BIGINT) AS MACHINERY
    FROM customer GROUP BY c_nationkey
    """,
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrameStatFunctions.crosstab: the nation x segment contingency
    table, pivoted wide with zero-filled empty cells — the exploratory
    pair-frequency utility (chi-square's input; quality_chi2_source_lang
    computes the statistic, this declares the raw matrix API). One
    shuffle; distinct-value columns are bounded by the segment dimension.
    The fixture's 5 segments are pinned in the oracle column list — a new
    segment value would (correctly) fail the schema comparison rather
    than silently drop."""
    c = load_table(spark, sf_dir, "customer")
    ct = c.stat.crosstab("c_nationkey", "c_mktsegment")
    cols = [x for x in ct.columns if x != "c_nationkey_c_mktsegment"]
    return ct.select(
        "c_nationkey_c_mktsegment",
        *[F.col(f"`{x}`").cast("long").alias(x) for x in sorted(cols)],
    )
