"""Batch 22 — traffic hygiene + template mining + retention flows
(round 2):

- events_bot_detection: low-jitter high-rate user screen (many events +
  abnormally regular inter-arrival times) -- the traffic-hygiene filter a
  behavioral dataset runs before training.
- text_template_families: documents collapsing to the same bag-of-words
  fingerprint grouped into template families (the 'same boilerplate,
  shuffled words' structure exact dedup misses but template mining wants).
- orders_customer_yoy: year-over-year customer flow -- retained / new /
  churned counts per year pair (full-outer self-join of adjacent activity
  years on the compacted customer-year relation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

BOT_MIN_EVENTS = 20
BOT_CV_MAX = 0.8  # coefficient of variation below which cadence is "robotic"


@declare(
    "events_bot_detection",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events),
    stats AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_gaps,
             AVG(gap) AS mu,
             STDDEV_SAMP(gap) AS sd
      FROM seq WHERE gap IS NOT NULL
      GROUP BY user_id)
    SELECT user_id, n_gaps,
           ROUND(sd / mu, 6) AS cadence_cv
    FROM stats
    WHERE n_gaps >= {BOT_MIN_EVENTS} AND mu > 0 AND sd / mu < {BOT_CV_MAX}
    ORDER BY cadence_cv, user_id
    """,
)
def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robotic-cadence screen: users with >= {BOT_MIN_EVENTS} inter-event
    gaps whose coefficient of variation (stddev/mean) falls below
    {BOT_CV_MAX} -- human traffic is bursty (CV ~ 1 for Poisson, higher
    with sessions), schedulers and scripts are regular. One lag window +
    one aggregate, both keyed on user_id (a single shuffle serves both).
    The behavioral-data hygiene gate before events feed training."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    stats = seq.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.avg("gap").alias("mu"),
        F.stddev_samp("gap").alias("sd"),
    )
    cv = F.col("sd") / F.col("mu")
    return (
        stats.where(
            (F.col("n_gaps") >= BOT_MIN_EVENTS)
            & (F.col("mu") > 0)
            & (cv < BOT_CV_MAX)
        )
        .select("user_id", "n_gaps", F.round(cv, 6).alias("cadence_cv"))
        .orderBy("cadence_cv", "user_id")
    )


@declare(
    "text_template_families",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS bow_fp
      FROM documents)
    SELECT bow_fp,
           CAST(COUNT(*) AS BIGINT) AS family_size,
           CAST(MIN(doc_id) AS BIGINT) AS exemplar
    FROM fp GROUP BY bow_fp HAVING COUNT(*) >= 2
    """,
)
def text_template_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template families: documents sharing a bag-of-words fingerprint
    (sorted distinct token set) grouped, families of >= 2 kept with a
    deterministic exemplar -- catches boilerplate whose word ORDER varies
    (exact dedup misses it; this is the grouping text_fingerprint's
    per-doc rows feed). One groupBy on the fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(tokens_expr()))))
    return (
        d.select("doc_id", fp.alias("bow_fp"))
        .groupBy("bow_fp")
        .agg(
            F.count("*").cast("long").alias("family_size"),
            F.min("doc_id").cast("long").alias("exemplar"),
        )
        .where(F.col("family_size") >= 2)
    )


@declare(
    "orders_customer_yoy",
    oracle="""
    WITH cy AS (
      SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr
      FROM orders),
    pairs AS (
      SELECT COALESCE(cur.yr, prv.yr + 1) AS yr,
             CASE WHEN cur.o_custkey IS NOT NULL AND prv.o_custkey IS NOT NULL
                  THEN 'retained'
                  WHEN cur.o_custkey IS NOT NULL THEN 'new'
                  ELSE 'churned' END AS flow
      FROM cy cur
      FULL OUTER JOIN cy prv
        ON cur.o_custkey = prv.o_custkey AND cur.yr = prv.yr + 1)
    SELECT yr, flow, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs
    WHERE yr > (SELECT MIN(yr) FROM cy)
      AND yr <= (SELECT MAX(yr) FROM cy)
    GROUP BY yr, flow
    """,
)
def orders_customer_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer flows: for each year, customers active in
    both it and the prior year (retained), only in it (new), only in the
    prior year (churned). Full-outer self-join of the compacted distinct
    (customer, year) relation on (customer, year-1); edge years outside
    both-sides-observable range are excluded. 'new' means
    not-active-last-year (TPC-H-style fixture has no first-ever-year
    signal beyond the data horizon)."""
    o = load_table(spark, sf_dir, "orders")
    cy = o.select(
        "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
    ).distinct()
    cur = cy.select(F.col("o_custkey").alias("ck"), F.col("yr").alias("cyr"))
    prv = cy.select(F.col("o_custkey").alias("pk"), F.col("yr").alias("pyr"))
    pairs = cur.join(
        prv,
        (F.col("ck") == F.col("pk")) & (F.col("cyr") == F.col("pyr") + 1),
        "full_outer",
    ).select(
        F.coalesce(F.col("cyr"), F.col("pyr") + 1).alias("yr"),
        F.when(
            F.col("ck").isNotNull() & F.col("pk").isNotNull(), "retained"
        )
        .when(F.col("ck").isNotNull(), "new")
        .otherwise("churned")
        .alias("flow"),
    )
    bounds = cy.agg(
        F.min("yr").alias("lo"), F.max("yr").alias("hi")
    )
    return (
        pairs.crossJoin(F.broadcast(bounds))
        .where((F.col("yr") > F.col("lo")) & (F.col("yr") <= F.col("hi")))
        .groupBy("yr", "flow")
        .agg(F.count("*").cast("long").alias("n"))
    )
