"""§2.I -- streaming operators, declared as batch event-time equivalents
(oracle-checkable; the driver oracle is batch DuckDB). The true Structured
Streaming forms of the same computations live in ../streaming/ and are
smoke-tested with trigger(availableNow=True) for batch-equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS we,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM events GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (BASELINE q_events_window shape);
    windows are epoch-aligned in both engines."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return ev.groupBy(win, "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    ).select(
        F.col("window.start").alias("ws"),
        F.col("window.end").alias("we"),
        "event_type",
        "n",
        "total",
    )


@declare(
    "stream_sliding",
    oracle="""
    SELECT ws, event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM (
      SELECT time_bucket(INTERVAL '15 minutes', CAST(e.ts AS TIMESTAMP))
               - INTERVAL '15 minutes' * g.i AS ws,
             e.event_type, e.value
      FROM events e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) g)
    GROUP BY ws, event_type
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, 15-minute hop): each event lands in 4
    overlapping windows; the oracle reconstructs the same window set by
    shifting the 15-minute bucket."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "15 minutes")
    return ev.groupBy(win, "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    ).select(
        F.col("window.start").alias("ws"), "event_type", "n", "total"
    )


@declare(
    "stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END
               AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged)
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-minute gap) per user. Spark's
    session_window end = last event + gap; the oracle rebuilds identical
    sessions with the gaps-and-islands pattern."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total",
        )
    )


@declare(
    "stream_dedup_events",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id,
           CAST(ts AS TIMESTAMP) AS first_ts
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dedup, batch form: deterministic first event per
    (user, event_type). Streaming form: dropDuplicatesWithinWatermark in
    ../streaming/jobs.py (keep-first within the watermark horizon)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )
