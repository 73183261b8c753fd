"""Batch 16 — customer segmentation + SLI monitoring (round 2):

- orders_rfm_segments: RFM (recency / frequency / monetary) quintile
  segmentation per customer -- the standard lifecycle-marketing
  segmentation, expressed as one orders groupBy + ntile windows over the
  compacted customer aggregate.
- events_error_burn: rolling error-rate SLI with a burn-rate flag over
  hourly aggregates (error-budget monitoring over the compacted hourly
  relation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.global_rank import with_global_ntile
from ..sources import load_table
from .registry import declare


@declare(
    "orders_rfm_segments",
    oracle="""
    WITH horizon AS (SELECT MAX(o_orderdate) AS h FROM orders),
    cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                       CAST(MAX(h) AS DATE)) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders CROSS JOIN horizon
      GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey)
                  AS BIGINT) AS r,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey)
                  AS BIGINT) AS f,
             CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey)
                  AS BIGINT) AS m
      FROM cust)
    SELECT o_custkey, recency_days, frequency, monetary, r, f, m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
             AS segment
    FROM scored
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order vs
    the data horizon), frequency (order count), monetary (revenue), each
    quintiled (best = 1), concatenated into the familiar '111'..'555'
    segment code. One orders groupBy does the corpus work; each quintile
    is an EXACT ntile(5) computed by the two-phase global rank
    (operators/global_rank.py: range-partitioned parallel sort + local
    row number + broadcast partition-count offsets) -- no partition-less
    window touches the customer-cardinality relation, so the plan holds
    at billions of customers. Deterministic o_custkey tie-breaks make
    each ntile order total."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    cust = (
        o.crossJoin(F.broadcast(horizon))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.to_date(F.max("h")), F.to_date(F.max("o_orderdate")))
            .alias("recency_days"),
            F.count("*").cast("long").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
    )
    # Three INDEPENDENT ntiles over the same base aggregate, joined on the
    # customer key -- chaining them instead would nest each layer's plan
    # inside the next (multiplicative subtree growth: measured 128 scans /
    # 254 broadcast joins for the chained form vs ~14/6 here).
    def quintile(order, name):
        return with_global_ntile(cust, order, 5, name).select("o_custkey", name)

    scored = (
        cust.join(quintile([F.col("recency_days"), F.col("o_custkey")], "r"),
                  "o_custkey")
        .join(quintile([F.col("frequency").desc(), F.col("o_custkey")], "f"),
              "o_custkey")
        .join(quintile([F.col("monetary").desc(), F.col("o_custkey")], "m"),
              "o_custkey")
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r",
        "f",
        "m",
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ).alias("segment"),
    )


@declare(
    "events_error_burn",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(COUNT(*) AS BIGINT) AS total,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errors
      FROM events GROUP BY 1),
    rolled AS (
      SELECT hr, total, errors,
             SUM(errors) OVER w AS err6,
             SUM(total) OVER w AS tot6,
             COUNT(*) OVER w AS n6
      FROM hourly
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour, total, errors,
           ROUND(CAST(err6 AS DOUBLE) / tot6, 6) AS err_rate_6h,
           (CAST(err6 AS DOUBLE) / tot6) > 0.25 AS burn_alert
    FROM rolled WHERE n6 = 6
    """,
)
def events_error_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn monitoring: rolling 6-hour error rate over the
    hourly aggregate, alert flag when the window exceeds 25% (the fixture
    has ~20% baseline error share, so alerts are sparse-but-present).
    The raw stream is touched once by the hourly groupBy; the rolling
    window runs over hours only. Global hour ordering is fine -- hours
    are bounded (the compacted relation is tiny at any corpus scale)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count("*").cast("long").alias("total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errors"),
    )
    w = Window.orderBy("hr").rowsBetween(-5, 0)
    rolled = hourly.select(
        "hr",
        "total",
        "errors",
        F.sum("errors").over(w).alias("err6"),
        F.sum("total").over(w).alias("tot6"),
        F.count("*").over(w).alias("n6"),
    )
    rate = F.col("err6").cast("double") / F.col("tot6")
    return rolled.where(F.col("n6") == 6).select(
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        "total",
        "errors",
        F.round(rate, 6).alias("err_rate_6h"),
        (rate > 0.25).alias("burn_alert"),
    )
