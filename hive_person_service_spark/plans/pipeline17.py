"""Batch 19 — mergeable sketches as relations + seasonal baselines
(round 2):

- sketch_kmv_daily_merge: KMV (k-minimum-values) distinct sketches built
  PER DAY, then merged across days by re-taking the k smallest -- the
  re-aggregatable-sketch pattern (daily rollup tables that answer monthly
  NDV without rescanning raw data). Hashes are md5-hex compared as
  strings and the estimator's fraction is re-derived with
  instr-arithmetic, so the WHOLE sketch lifecycle (build, merge,
  estimate) is oracle-checked -- unlike opaque binary sketch blobs.
- events_seasonal_anomaly: hour-of-day seasonal baseline per event type
  (mean/stddev over the period) and the days deviating most from their
  seasonal expectation -- the seasonality-aware twin of the trailing-
  window rate spike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

KMV_K = 64
HEX = "0123456789abcdef"


def _frac_expr(h):
    """Numeric fraction in [0,1) of an md5 hex string's first 8 digits --
    pure instr/substr arithmetic, identical in Spark and DuckDB."""
    out = None
    for i in range(1, 9):
        d = (F.instr(F.lit(HEX), F.substring(h, i, 1)) - 1) / (16.0 ** i)
        out = d if out is None else out + d
    return out


@declare(
    "sketch_kmv_daily_merge",
    oracle=f"""
    WITH hashed AS (
      SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             md5(CAST(user_id AS VARCHAR)) AS h
      FROM events),
    daily AS (
      SELECT day, h FROM (
        SELECT day, h,
               row_number() OVER (PARTITION BY day ORDER BY h) AS rn
        FROM (SELECT DISTINCT day, h FROM hashed))
      WHERE rn <= {KMV_K}),
    merged AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM daily))
      WHERE rn <= {KMV_K}),
    kth AS (
      SELECT MAX(h) AS h, COUNT(*) AS k FROM merged),
    frac AS (
      SELECT k, {" + ".join(
        f"(instr('{HEX}', substr(h, {i}, 1)) - 1) / {16.0 ** i}"
        for i in range(1, 9)
      )} AS f
      FROM kth)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(FLOOR((k - 1) / f + 0.5) AS BIGINT) AS ndv_estimate,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
             AS ndv_exact
    FROM frac
    """,
)
def sketch_kmv_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV distinct-count lifecycle, entirely relational: hash
    users (md5-hex, string-ordered), keep the k smallest per DAY (the
    daily sketch a rollup table would persist), merge the daily sketches
    by re-taking the k smallest overall, estimate NDV = (k-1)/frac(kth
    smallest). Exact distinct rides along for error inspection. Per-day
    windows partition by day; the merge works on days x k rows only --
    the monthly-NDV-from-daily-rollups pattern with no raw rescan."""
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    w_day = Window.partitionBy("day").orderBy("h")
    daily = (
        hashed.withColumn("rn", F.row_number().over(w_day))
        .where(F.col("rn") <= KMV_K)
        .select("day", "h")
    )
    w_all = Window.orderBy("h")
    merged = (
        daily.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(w_all))
        .where(F.col("rn") <= KMV_K)
    )
    kth = merged.agg(F.max("h").alias("h"), F.count("*").alias("k"))
    est = kth.select(
        F.col("k").cast("long").alias("k"),
        F.floor((F.col("k") - 1) / _frac_expr(F.col("h")) + 0.5)
        .cast("long")
        .alias("ndv_estimate"),
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("long").alias("ndv_exact")
    )
    return est.crossJoin(F.broadcast(exact))


@declare(
    "events_seasonal_anomaly",
    oracle="""
    WITH cell AS (
      SELECT event_type,
             CAST(strftime(CAST(ts AS TIMESTAMP), '%H') AS INTEGER) AS hod,
             DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2, 3),
    base AS (
      SELECT event_type, hod, AVG(n) AS mu, STDDEV_SAMP(n) AS sd,
             COUNT(*) AS nd
      FROM cell GROUP BY event_type, hod)
    SELECT c.event_type, strftime(c.day, '%Y-%m-%d') AS day,
           CAST(c.hod AS BIGINT) AS hod, c.n,
           ROUND((c.n - b.mu) / b.sd, 4) AS z
    FROM cell c JOIN base b
      ON c.event_type = b.event_type AND c.hod = b.hod
    WHERE b.nd >= 7 AND b.sd > 0 AND ABS((c.n - b.mu) / b.sd) >= 3
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: baseline mean/stddev per
    (event_type, hour-of-day) cell across days, then flag (type, day,
    hour) cells deviating >= 3 sigma from THEIR OWN hour's baseline --
    catches the 3am spike a trailing-window detector normalizes away.
    Two groupBys over the compacted cell relation; the baseline (types x
    24 rows) broadcasts back."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        F.hour("ts").alias("hod"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count("*").cast("long").alias("n"))
    base = cell.groupBy("event_type", "hod").agg(
        F.avg("n").alias("mu"),
        F.stddev_samp("n").alias("sd"),
        F.count("*").alias("nd"),
    )
    j = cell.join(F.broadcast(base), ["event_type", "hod"])
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        j.where((F.col("nd") >= 7) & (F.col("sd") > 0) & (F.abs(z) >= 3))
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("hod").cast("long").alias("hod"),
            "n",
            F.round(z, 4).alias("z"),
        )
    )
