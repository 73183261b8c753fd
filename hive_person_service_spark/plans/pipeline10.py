"""Batch 11 — evaluation + drift + temporal-join widening (round 2):

- text_lang_confusion: labeled-vs-predicted language confusion matrix with
  per-true-language recall (the evaluation table any classifier-backed
  filter stage reports).
- quality_ks_drift: two-sample Kolmogorov-Smirnov statistic between two
  sources' length distributions (distribution-drift gate between corpus
  snapshots / sources), computed relationally over value-level CDFs.
- join_asof_nearest: nearest-in-time as-of join (either direction) --
  operators/joins.py asof_join(direction='nearest').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..sources import load_table
from .registry import declare


@declare(
    "text_lang_confusion",
    oracle="""
    WITH pred AS (
      SELECT lang,
             CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
                  WHEN regexp_matches(text, '[äöüß]') THEN 'de'
                  WHEN regexp_matches(text, '[éèêàçœ]') THEN 'fr'
                  WHEN regexp_matches(text, '[ñ¿¡áíó]') THEN 'es'
                  ELSE 'en' END AS predicted
      FROM documents)
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS share
    FROM pred GROUP BY lang, predicted
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled lang x predicted lang counts
    plus per-true-language share (diagonal = recall). Same character-class
    detector as text_langid; the matrix is langs² rows, so the share
    window runs on a compacted aggregate."""
    d = load_table(spark, sf_dir, "documents")
    pred = d.select(
        "lang",
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(F.col("text").rlike("[äöüß]"), "de")
        .when(F.col("text").rlike("[éèêàçœ]"), "fr")
        .when(F.col("text").rlike("[ñ¿¡áíó]"), "es")
        .otherwise("en")
        .alias("predicted"),
    )
    counts = pred.groupBy("lang", "predicted").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "predicted",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("share"),
    )


@declare(
    "quality_ks_drift",
    oracle="""
    WITH s AS (
      SELECT n_chars AS v, source FROM documents
      WHERE source IN ('src0', 'src1')),
    tot AS (
      SELECT SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS n1
      FROM s),
    vals AS (
      SELECT v,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
      FROM s GROUP BY v),
    cum AS (
      SELECT v,
             SUM(c0) OVER (ORDER BY v) AS f0,
             SUM(c1) OVER (ORDER BY v) AS f1
      FROM vals)
    SELECT ROUND(MAX(ABS(CAST(f0 AS DOUBLE) / n0
                         - CAST(f1 AS DOUBLE) / n1)), 6) AS ks,
           CAST(MAX(n0) AS BIGINT) AS n0, CAST(MAX(n1) AS BIGINT) AS n1
    FROM cum CROSS JOIN tot
    """,
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between src0's and src1's document-length
    distributions: aggregate to value-level counts first (<= 512 distinct
    lengths), then the empirical-CDF windows and the max-gap run on that
    compacted relation -- the corpus is touched by exactly one groupBy.
    The drift gate run between corpus snapshots before a retrain."""
    d = load_table(spark, sf_dir, "documents")
    s = d.where(F.col("source").isin("src0", "src1")).select(
        F.col("n_chars").alias("v"), "source"
    )
    tot = s.agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("n1"),
    )
    vals = s.groupBy("v").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vals.select(
        "v",
        F.sum("c0").over(w).alias("f0"),
        F.sum("c1").over(w).alias("f1"),
    )
    gap = F.abs(
        F.col("f0").cast("double") / F.col("n0")
        - F.col("f1").cast("double") / F.col("n1")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.max(gap), 6).alias("ks"),
            F.max("n0").cast("long").alias("n0"),
            F.max("n1").cast("long").alias("n1"),
        )
    )


@declare(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         pairs AS (
           SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
                  row_number() OVER (
                    PARTITION BY p.event_id
                    ORDER BY ABS(epoch_us(CAST(c.ts AS TIMESTAMP))
                                 - epoch_us(CAST(p.ts AS TIMESTAMP))),
                             c.ts, c.event_id DESC) AS rn
           FROM p LEFT JOIN c ON p.user_id = c.user_id)
    SELECT purchase_id, user_id, click_id FROM pairs WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: for each purchase, the temporally
    CLOSEST click by the same user in either direction (ties: earlier
    click, then largest event_id). asof_join(direction='nearest') --
    µs-exact integer deltas, windowed pick partitioned by purchase."""
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .alias("p")
    )
    c = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .alias("c")
    )
    out = asof_join(
        p, c, on="user_id", left_id="event_id", left_ts="ts", right_ts="ts",
        tie_break="event_id", how="left", direction="nearest",
    )
    return out.select(
        p["event_id"].alias("purchase_id"),
        p["user_id"],
        c["event_id"].alias("click_id"),
    )
