"""Batch 21 — curation impact reporting + activity concentration
(round 2):

- dedup_impact_report: the one-row before/after summary a data-curation
  run headlines: corpus size, survivors of exact text dedup and of
  line-level dedup, and the token budget each stage saves.
- events_power_users: p99-activity users and the share of all events
  they generate (activity-concentration screen; approx-quantile cut
  broadcast back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare


@declare(
    "dedup_impact_report",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, len(string_split(text, ' ')) AS toks
      FROM documents),
    exact_surv AS (
      SELECT SUM(toks) AS tok_exact, COUNT(*) AS n_exact
      FROM (SELECT text, MIN(doc_id) AS keeper,
                   MIN(len(string_split(text, ' '))) AS toks
            FROM documents GROUP BY text)),
    line_surv AS (
      SELECT COUNT(*) AS n_lines, COUNT(DISTINCT line) AS n_uniq_lines
      FROM (SELECT unnest(string_split(text, ' . ')) AS line
            FROM documents))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens,
           CAST(MAX(e.n_exact) AS BIGINT) AS n_docs_after_exact,
           CAST(MAX(e.tok_exact) AS BIGINT) AS n_tokens_after_exact,
           CAST(SUM(toks) - MAX(e.tok_exact) AS BIGINT) AS tokens_saved,
           CAST(MAX(l.n_lines) AS BIGINT) AS n_lines,
           CAST(MAX(l.n_uniq_lines) AS BIGINT) AS n_uniq_lines
    FROM base CROSS JOIN exact_surv e CROSS JOIN line_surv l
    """,
)
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation impact one-rower: corpus docs/tokens, docs+tokens
    surviving exact text dedup (keep-first), tokens the stage saves, and
    line-level duplication stats ('.'-separated spans as the line proxy
    on this fixture). Three independent aggregates broadcast-joined into
    one row -- the report a dedup pipeline prints before/after shipping."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "text", F.size(tokens_expr()).alias("toks")
    )
    totals = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
    )
    exact = (
        base.groupBy("text")
        .agg(F.min("toks").alias("toks"))
        .agg(
            F.count("*").cast("long").alias("n_docs_after_exact"),
            F.sum("toks").cast("long").alias("n_tokens_after_exact"),
        )
    )
    lines = (
        d.select(F.explode(F.split("text", " \\. ")).alias("line"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.countDistinct("line").cast("long").alias("n_uniq_lines"),
        )
    )
    return (
        totals.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(lines))
        .select(
            "n_docs",
            "n_tokens",
            "n_docs_after_exact",
            "n_tokens_after_exact",
            (F.col("n_tokens") - F.col("n_tokens_after_exact")).alias(
                "tokens_saved"
            ),
            "n_lines",
            "n_uniq_lines",
        )
    )


@declare(
    "events_power_users",
    oracle="""
    WITH ua AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id),
    cut AS (
      SELECT quantile_disc(n, 0.99) AS p99 FROM ua),
    tot AS (SELECT SUM(n) AS total FROM ua)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_power_users,
           CAST(MIN(n) AS BIGINT) AS min_events,
           CAST(SUM(n) AS BIGINT) AS their_events,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(total), 6) AS share
    FROM ua CROSS JOIN cut CROSS JOIN tot
    WHERE n >= p99
    """,
)
def events_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: users at or above the p99 event count and
    the share of ALL events they generate. The p99 cut is an exact
    discrete percentile over the per-user aggregate (percentile_disc --
    user counts are discrete); cut + total broadcast back onto the user
    relation. At 100 TB the user aggregate IS the small side."""
    ev = load_table(spark, sf_dir, "events")
    ua = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("n"))
    cut = ua.agg(
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)").alias("p99")
    )
    tot = ua.agg(F.sum("n").alias("total"))
    return (
        ua.crossJoin(F.broadcast(cut))
        .crossJoin(F.broadcast(tot))
        .where(F.col("n") >= F.col("p99"))
        .agg(
            F.count("*").cast("long").alias("n_power_users"),
            F.min("n").cast("long").alias("min_events"),
            F.sum("n").cast("long").alias("their_events"),
            F.round(
                F.sum("n").cast("double") / F.max("total"), 6
            ).alias("share"),
        )
    )
