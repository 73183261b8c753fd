"""Extras batch 6 -- statistical modelling aggregates.

- agg_regression: per-group OLS via the SQL:2023 linear-regression
  aggregate family (regr_slope / regr_intercept / regr_r2 / regr_count) --
  the built-in, partial-aggregable way to fit y = a*x + b per segment
  without collecting anything to the driver. Complements agg_stats (corr /
  covar) which pinned the second-moment surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag OLS of extended price on quantity: regr_* aggregates
    run as one partial-aggregable grouped pass (map-side moment sums, one
    tiny shuffle of K moment tuples -- the 100 TB-safe way to fit millions
    of per-segment models). Slope/intercept rounded to 4 (accumulation-
    order discipline), r2 to 6 (normalized to [0,1])."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
    )
