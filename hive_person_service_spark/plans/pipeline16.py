"""Batch 18 — bucketed time-range join + grouped forecasting (round 2):

- join_range_bucketed: the time-range join (every view/click touch within
  7 days before a purchase, per user) rewritten as an EQUI-join on coarse
  time buckets + exact residual filter -- the standard trick that turns a
  theta join into a shuffle join at scale. Oracle-identical to the plain
  range formulation.
- events_forecast_holt: Holt linear (double-exponential) per-event-type
  forecast over the daily count series via applyInPandas -- the grouped
  sequential-model extension point; rows-only with a pure-pandas
  reference pytest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

RANGE_US = 7 * 24 * 3600 * 1_000_000  # 7-day window in µs
BUCKET_US = 24 * 3600 * 1_000_000  # 1-day buckets => <= 8 candidate buckets

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_STEPS = 3


@declare(
    "join_range_bucketed",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS pid, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS pus
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      FROM events WHERE event_type IN ('view', 'click'))
    SELECT p.pid, t.event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM p JOIN t ON p.user_id = t.user_id
     AND t.tus >= p.pus - {RANGE_US} AND t.tus < p.pus
    GROUP BY p.pid, t.event_type
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join via COARSE-BUCKET EQUI-JOIN: each touch keys on its
    day bucket; each purchase explodes to the <= 8 day buckets its 7-day
    window can intersect; they meet on (user_id, bucket) -- a plain
    shuffle-hash/SMJ key -- and the exact µs bounds filter the residue.
    Same output as the theta-join formulation (the oracle IS the plain
    range join), but the join condition Catalyst sees is pure equality:
    at 100 TB this is the difference between a key-partitioned shuffle
    and a broadcast-nested-loop fallback. Bucket fan-out is bounded
    (window/bucket + 1), so shuffled volume is ~8x the purchase side,
    not |p| x |t|."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.unix_micros("ts").alias("pus"),
    )
    t = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    ).select(
        F.col("user_id").alias("tu"),
        "event_type",
        F.unix_micros("ts").alias("tus"),
        (F.unix_micros("ts") / BUCKET_US).cast("long").alias("bucket"),
    )
    p_buckets = p.select(
        "pid",
        "pu",
        "pus",
        F.explode(
            F.sequence(
                ((F.col("pus") - RANGE_US) / BUCKET_US).cast("long"),
                (F.col("pus") / BUCKET_US).cast("long"),
            )
        ).alias("bucket"),
    )
    joined = p_buckets.join(
        t,
        (F.col("pu") == F.col("tu")) & (p_buckets["bucket"] == t["bucket"]),
    ).where(
        (F.col("tus") >= F.col("pus") - RANGE_US) & (F.col("tus") < F.col("pus"))
    )
    return joined.groupBy("pid", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )


@declare("events_forecast_holt", oracle=None)  # rows-only: sequential model
def events_forecast_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (level + trend double-exponential smoothing) forecast of
    the next 3 daily counts per event type: daily aggregate -> one
    applyInPandas group per type running the sequential recurrence (a few
    dozen points per group -- the grouped-map extension point is for the
    RECURRENCE, not the aggregation, which stays JVM-side). Deterministic
    (fixed alpha/beta, no fitting); pytest pins Spark output equal to a
    pure-pandas reference."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("double").alias("n"))

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("step", LongType()),
            StructField("forecast", DoubleType()),
        ]
    )
    alpha, beta, steps = HOLT_ALPHA, HOLT_BETA, HOLT_STEPS

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ys = pdf["n"].to_numpy()
        et = pdf["event_type"].iloc[0]
        if len(ys) < 2:
            return pd.DataFrame(columns=["event_type", "step", "forecast"])
        level, trend = float(ys[0]), float(ys[1] - ys[0])
        for y in ys[1:]:
            prev = level
            level = alpha * float(y) + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        rows = [
            (et, h, round(level + h * trend, 4)) for h in range(1, steps + 1)
        ]
        return pd.DataFrame(rows, columns=["event_type", "step", "forecast"])

    return daily.groupBy("event_type").applyInPandas(holt, out_schema)
