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
    "events_densify",
    oracle="""
    WITH bounds AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events WHERE user_id < 30 GROUP BY user_id),
    days AS (
      SELECT user_id,
             unnest([d0 + CAST(i AS INTEGER)
                     FOR i IN range(0, date_diff('day', d0, d1) + 1)]) AS day
      FROM bounds),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n,
             ROUND(SUM(value), 4) AS total
      FROM events WHERE user_id < 30 GROUP BY 1, 2)
    SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
           coalesce(daily.n, 0) AS n,
           coalesce(daily.total, 0.0) AS total
    FROM days d LEFT JOIN daily ON d.user_id = daily.user_id AND d.day = daily.day
    """,
)
def events_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (gap filling): every calendar day in each
    user's active range, zero-filled where no events -- sequence() explode +
    left join, the standard pre-step for rolling metrics over sparse
    activity."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    bounds = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    return (
        days.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@declare(
    "text_stopword_filter",
    oracle="""
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
    WHERE token NOT IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on')
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
)
def text_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-filtered term frequencies: the stopword set ships to every
    task as a broadcast literal IN-list (at real vocabulary sizes: a
    broadcast left-anti join against a stopword table -- same plan shape)."""
    stopwords = ["the", "a", "of", "and", "to", "in", "is", "on"]
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .where(~F.col("token").isin(stopwords))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(50)
    )


@declare(
    "subquery_scalar_correlated",
    oracle="""
    SELECT c_custkey, c_name,
           (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
             AS max_order
    FROM customer WHERE c_custkey < 500
    """,
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: Catalyst decorrelates it into a left
    outer join against the per-key aggregate (RewriteCorrelatedScalarSubquery)."""
    import uuid as _uuid

    c = f"cust_{_uuid.uuid4().hex[:10]}"
    o = f"ord_{_uuid.uuid4().hex[:10]}"
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(c)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(o)
    return spark.sql(
        f"""
        SELECT c_custkey, c_name,
               (SELECT MAX(o_totalprice) FROM {o} WHERE o_custkey = c_custkey)
                 AS max_order
        FROM {c} WHERE c_custkey < 500
        """
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
