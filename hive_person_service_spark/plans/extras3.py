"""Fourth coverage batch: statistical aggregates (mode/median), value
histograms, window-function sessionization (the batch twin of
session_window), and blocked fuzzy (edit-distance) dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "agg_mode_median",
    oracle="""
    SELECT mode(o_orderpriority) AS mode_priority,
           ROUND(median(o_totalprice), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE + MEDIAN + an exact quantile in one global aggregate.
    Mode is well-defined here (the fixture's top priority count is unique);
    Spark's mode() is tie-nondeterministic, so queries over tie-prone
    columns should pre-aggregate counts and row_number instead."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.mode("o_orderpriority").alias("mode_priority"),
        F.round(F.median("o_totalprice"), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@declare(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total
    FROM events
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram -- one shuffle on the bucket id; the
    building block for numeric profiling at any scale (bucket count is
    bounded, so the aggregate state is tiny regardless of row count)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50.0).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
    )


@declare(
    "events_sessionize",
    oracle="""
    SELECT user_id, session_id, COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
    FROM (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_sess
        FROM events))
    GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function sessionization (30-min gap): lag -> new-session flag
    -> running sum = session id -> per-session aggregate. The batch twin of
    session_window (stream_session) expressed as pure windows -- one shuffle
    on user_id serves all three window/aggregate steps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) <= gap_us,
            0,
        )
        .otherwise(1)
        .alias("new_sess"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
    )


@declare(
    "dedup_fuzzy_levenshtein",
    oracle="""
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang
     AND substr(a.text, 1, 16) = substr(b.text, 1, 16)
     AND CAST(FLOOR(a.n_chars / 50) AS BIGINT) = CAST(FLOOR(b.n_chars / 50) AS BIGINT)
     AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 20
    WHERE levenshtein(a.text, b.text) <= 20
    """,
)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy dedup: edit-distance pairs within
    (lang, 16-char text prefix, length-bucket) blocks. Four bounds keep
    the quadratic term cold: the block join (pairs only form inside
    blocks), the PREFIX band (standard record-linkage blocking -- at sf1
    the (lang, length) blocks alone degenerate to 20.7M candidate pairs
    because block population grows linearly with corpus size; adding the
    prefix key cuts that to 217k, and on this corpus loses zero true
    matches -- trades recall for near-linear cost by design, like every
    blocking scheme; MinHash-LSH is the recall-preserving alternative),
    a length pre-filter (edit distance >= length difference), and Spark's
    BOUNDED 3-arg levenshtein (banded DP, O(len*t) not O(len^2), returns
    -1 past the threshold). The probe side is repartitioned so the join's
    levenshtein work spreads across cores instead of riding one scan task
    (measured 480s -> ~3s at sf0.1). JVM-side, no Python in the loop."""
    d = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    a = d.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("a_lang"),
        F.col("n_chars").alias("a_nc"),
        F.floor(F.col("n_chars") / 50).cast("long").alias("a_blk"),
        F.substring("text", 1, 16).alias("a_pfx"),
        F.col("text").alias("a_text"),
    ).repartition(par)
    b = d.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("b_lang"),
        F.col("n_chars").alias("b_nc"),
        F.floor(F.col("n_chars") / 50).cast("long").alias("b_blk"),
        F.substring("text", 1, 16).alias("b_pfx"),
        F.col("text").alias("b_text"),
    )
    return (
        a.join(
            b,
            (F.col("a_lang") == F.col("b_lang"))
            & (F.col("a_pfx") == F.col("b_pfx"))
            & (F.col("a_blk") == F.col("b_blk"))
            & (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_nc") - F.col("b_nc")) <= 20),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("a_text", "b_text", 20).cast("long"),
        )
        .where(F.col("edit_dist") >= 0)
        .select("a_id", "b_id", "edit_dist")
    )
