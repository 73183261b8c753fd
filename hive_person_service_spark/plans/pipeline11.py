"""Batch 12 — time-weighted aggregates, independence testing, distributed
PCA (round 2):

- events_twap: per-user time-weighted average of `value` (each reading
  weighted by its holding interval to the next event) -- the TWAP/telemetry
  integral windowed per user, never globally.
- quality_chi2_source_lang: chi-square independence statistic between
  source and lang (are sources language-skewed? -- the corpus-balance
  check before mixture design); expected counts from broadcast margins.
- emb_pca_power: first principal component by matrix-free power iteration
  (v <- normalize(sum_x x (x . v))): each iteration is one 64-group
  aggregate, the driver only ever holds the 64-float vector. Output is
  each embedding's PC1 projection. Rows-only (iterative, not
  SQL-expressible); pytest pins |cos| vs numpy's exact eigenvector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "events_twap",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
             lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_tus
      FROM events),
    iv AS (
      SELECT user_id, value, next_tus - tus AS dt
      FROM seq WHERE next_tus IS NOT NULL)
    SELECT user_id,
           ROUND(SUM(value * dt) / SUM(dt), 6) AS twap,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM iv GROUP BY user_id HAVING SUM(dt) > 0
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value`: each reading holds until
    the user's next event; TWAP = integral / total time. One lead window
    partitioned by user (µs-exact integer intervals), one groupBy on the
    same key -- a single user_id shuffle serves both."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("tus"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_tus"),
    )
    iv = seq.where(F.col("next_tus").isNotNull()).select(
        "user_id", "value", (F.col("next_tus") - F.col("tus")).alias("dt")
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
            ).alias("twap"),
            F.count("*").cast("long").alias("n_intervals"),
            F.sum("dt").alias("_tot"),
        )
        .where(F.col("_tot") > 0)
        .drop("_tot")
    )


@declare(
    "quality_chi2_source_lang",
    oracle="""
    WITH o AS (
      SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS obs
      FROM documents GROUP BY source, lang),
    rs AS (SELECT source, SUM(obs) AS rtot FROM o GROUP BY source),
    cs AS (SELECT lang, SUM(obs) AS ctot FROM o GROUP BY lang),
    n AS (SELECT SUM(obs) AS tot FROM o),
    cells AS (
      SELECT o.source, o.lang, obs, rtot * ctot / tot AS exp
      FROM o JOIN rs USING (source) JOIN cs USING (lang) CROSS JOIN n)
    SELECT ROUND(SUM((obs - exp) * (obs - exp) / exp), 4) AS chi2,
           CAST((COUNT(DISTINCT source) - 1) * (COUNT(DISTINCT lang) - 1)
                AS BIGINT) AS dof
    FROM cells
    """,
)
def quality_chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic between source and lang over the
    observed source x lang contingency table (sources language-skewed?).
    The table is 20 x 5 cells after one corpus groupBy; margins and the
    grand total broadcast back onto it."""
    d = load_table(spark, sf_dir, "documents")
    o = d.groupBy("source", "lang").agg(
        F.count("*").cast("double").alias("obs")
    )
    rs = o.groupBy("source").agg(F.sum("obs").alias("rtot"))
    cs = o.groupBy("lang").agg(F.sum("obs").alias("ctot"))
    n = o.agg(F.sum("obs").alias("tot"))
    cells = (
        o.join(F.broadcast(rs), "source")
        .join(F.broadcast(cs), "lang")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "lang",
            "obs",
            (F.col("rtot") * F.col("ctot") / F.col("tot")).alias("exp"),
        )
    )
    return cells.agg(
        F.round(
            F.sum((F.col("obs") - F.col("exp")) ** 2 / F.col("exp")), 4
        ).alias("chi2"),
        (
            (F.countDistinct("source") - 1) * (F.countDistinct("lang") - 1)
        ).cast("long").alias("dof"),
    )


@declare("emb_pca_power", oracle=None)  # rows-only: iterative algorithm
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PC1 projection of every embedding via matrix-free power iteration:
    v <- normalize(sum_x x (x . v)), 6 iterations from a fixed seed vector.
    Each iteration is one job -- per-row dot against the broadcast v
    (zip_with/aggregate, JVM-side), posexplode, 64-group sum -- so the
    driver holds 64 floats and the cluster never materializes a covariance
    matrix (the D x D Gram step stays an aggregation). pytest pins
    |cos(v, numpy eigenvector)| >= 0.99 and the projection identity."""
    from ..operators.pca import pc1_projections

    emb = load_table(spark, sf_dir, "embeddings")
    return pc1_projections(emb, dim=64, iters=6)
