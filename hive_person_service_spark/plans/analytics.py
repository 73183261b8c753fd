"""Composite event analytics over the events stream: conversion funnel and
weekly retention -- the person-service-style questions the engine's
primitives compose into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "events_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS vts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS cts
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.vts GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS pts
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.cts GROUP BY e.user_id)
    SELECT v.user_id,
           epoch_us(CAST(v.vts AS TIMESTAMP)) AS view_us,
           epoch_us(CAST(c.cts AS TIMESTAMP)) AS click_us,
           epoch_us(CAST(p.pts AS TIMESTAMP)) AS purchase_us,
           c.user_id IS NOT NULL AS reached_click,
           p.user_id IS NOT NULL AS reached_purchase
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first view -> first click after
    it -> first purchase after that. Three grouped mins + two broadcast-able
    left joins; no window over the raw stream."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_micros("vts").alias("view_us"),
            F.unix_micros("cts").alias("click_us"),
            F.unix_micros("pts").alias("purchase_us"),
            F.col("cts").isNotNull().alias("reached_click"),
            F.col("pts").isNotNull().alias("reached_purchase"),
        )
    )


@declare(
    "events_retention",
    oracle="""
    WITH active AS (SELECT DISTINCT user_id,
                           date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
                    FROM events)
    SELECT a.wk AS week_start, COUNT(*) AS active_users,
           SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS retained_next_week
    FROM active a
    LEFT JOIN active b
      ON a.user_id = b.user_id AND b.wk = a.wk + INTERVAL 7 DAY
    GROUP BY a.wk
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention cohort: distinct active (user, week) pairs
    self-joined one week forward. The distinct pre-aggregation shrinks the
    self-join input from events to user-weeks (the scale lever)."""
    def active_pairs() -> DataFrame:
        # fresh scan each side: same-lineage self-joins are ambiguous
        ev = load_table(spark, sf_dir, "events")
        return ev.select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
        ).distinct()

    a = active_pairs()
    b = active_pairs().select(
        F.col("user_id").alias("b_user"), F.col("wk").alias("b_wk")
    )
    joined = a.join(
        b,
        (a["user_id"] == b["b_user"])
        & (b["b_wk"] == a["wk"] + F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    return joined.groupBy(a["wk"].alias("week_start")).agg(
        F.count("*").alias("active_users"),
        F.sum(F.when(b["b_wk"].isNotNull(), 1).otherwise(0)).alias(
            "retained_next_week"
        ),
    )
