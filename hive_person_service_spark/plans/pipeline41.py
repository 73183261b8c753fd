"""Round-4 continuation batch 41: declarative alert rules, readability
scoring, cached-relation surface.

- events_alert_rules: a rules ENGINE, not hard-coded thresholds — the
  alert conditions live in a rules relation (metric, comparator, bound,
  severity) that joins against computed metrics; ops teams add rules by
  inserting rows, not redeploying queries.
- text_readability: Flesch reading-ease + Flesch-Kincaid grade per
  document from sentence/word/syllable counts — the classic
  layout-free readability features a corpus quality filter adds next to
  the Gopher rules.
- sql_cache_table: CACHE TABLE ... SELECT — the explicitly materialized
  in-memory relation (Spark's columnar cache) serving repeated
  dashboards; the oracle recomputes from source, proving the cache is
  transparent to semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

# (rule_id, metric, op, bound, severity) — the rules RELATION. In
# production this is a table ops edits; here it is inline and mirrored
# verbatim in the oracle.
_ALERT_RULES = [
    (1, "error_rate", ">", 0.25, "page"),
    (2, "error_rate", ">", 0.22, "warn"),
    (3, "purchases", "<", 5.0, "warn"),
    (4, "events_total", ">", 450.0, "info"),
]


def _rules_sql() -> str:
    rows = ", ".join(
        f"({rid}, '{m}', '{op}', {b}, '{sev}')"
        for rid, m, op, b, sev in _ALERT_RULES
    )
    return (
        f"(SELECT * FROM (VALUES {rows})"
        " AS r(rule_id, metric, op, bound, severity))"
    )


@declare(
    "events_alert_rules",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS events_total,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) AS error_rate,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS purchases
      FROM events GROUP BY 1),
    metrics AS (
      SELECT day, 'events_total' AS metric, events_total AS value FROM daily
      UNION ALL
      SELECT day, 'error_rate', error_rate FROM daily
      UNION ALL
      SELECT day, 'purchases', purchases FROM daily),
    rules AS (SELECT * FROM {_rules_sql()} r)
    SELECT CAST(m.day AS VARCHAR) AS day, r.rule_id, m.metric, r.severity,
           ROUND(m.value, 6) AS value, r.bound
    FROM metrics m JOIN rules r ON m.metric = r.metric
    WHERE (r.op = '>' AND m.value > r.bound)
       OR (r.op = '<' AND m.value < r.bound)
    """,
)
def events_alert_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative alerting: daily metrics go LONG-form (metric, value)
    and join a RULES relation (metric, comparator, bound, severity); a
    violation row fires wherever the comparator holds. Adding an alert
    is an INSERT into the rules table — no query redeploy — which is the
    whole point of a rules engine. The rules side is broadcast-sized by
    nature; the metrics side is the compacted per-day relation, so the
    join is a broadcast over a calendar-bounded input at any corpus
    scale. The comparator dispatch is a codegen CASE, not an eval()."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("events_total"),
        (
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*")
        ).alias("error_rate"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("purchases"),
    )
    metrics = (
        daily.select("day", F.lit("events_total").alias("metric"),
                     F.col("events_total").alias("value"))
        .unionByName(
            daily.select("day", F.lit("error_rate").alias("metric"),
                         F.col("error_rate").alias("value"))
        )
        .unionByName(
            daily.select("day", F.lit("purchases").alias("metric"),
                         F.col("purchases").alias("value"))
        )
    )
    rules = spark.createDataFrame(
        _ALERT_RULES, "rule_id INT, metric STRING, op STRING, bound DOUBLE,"
        " severity STRING"
    )
    fired = (
        metrics.join(F.broadcast(rules), "metric")
        .where(
            ((F.col("op") == ">") & (F.col("value") > F.col("bound")))
            | ((F.col("op") == "<") & (F.col("value") < F.col("bound")))
        )
    )
    return fired.select(
        F.col("day").cast("string").alias("day"),
        "rule_id",
        "metric",
        "severity",
        F.round("value", 6).alias("value"),
        "bound",
    )


@declare(
    "text_readability",
    oracle="""
    WITH counts AS (
      SELECT doc_id,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
             GREATEST(len(regexp_extract_all(lower(text), '[a-z]+')), 1) AS words,
             GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS syllables
      FROM documents)
    SELECT doc_id, CAST(sentences AS BIGINT) AS sentences,
           CAST(words AS BIGINT) AS words,
           CAST(syllables AS BIGINT) AS syllables,
           ROUND(206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
                 - 84.6 * (CAST(syllables AS DOUBLE) / words), 4)
             AS flesch_ease,
           ROUND(0.39 * (CAST(words AS DOUBLE) / sentences)
                 + 11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59, 4)
             AS fk_grade
    FROM counts
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability features per document: Flesch reading-ease and
    Flesch-Kincaid grade from sentence / word / vowel-group-syllable
    counts — the classic corpus-quality features (too-hard and too-easy
    tails both signal non-prose) computed layout-free with three regex
    scans, no tokenizer model. Pure codegen projection: at 100 TB this
    runs at scan speed and fuses with the other quality signals in one
    pass (corpus_signals_fused's pattern). The vowel-group syllable
    heuristic is the standard cheap estimator; both engines run the
    identical regexes, and the division-only arithmetic is exact until
    the display rounding."""
    d = load_table(spark, sf_dir, "documents")
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))), F.lit(1)
    )
    words = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))),
        F.lit(1),
    )
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))),
        F.lit(1),
    )
    c = d.select(
        "doc_id",
        sentences.alias("sentences"),
        words.alias("words"),
        syllables.alias("syllables"),
    )
    wps = F.col("words").cast("double") / F.col("sentences")
    spw = F.col("syllables").cast("double") / F.col("words")
    return c.select(
        "doc_id",
        F.col("sentences").cast("long").alias("sentences"),
        F.col("words").cast("long").alias("words"),
        F.col("syllables").cast("long").alias("syllables"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch_ease"),
        F.round(0.39 * wps + 11.8 * spw - 15.59, 4).alias("fk_grade"),
    )


@declare(
    "sql_cache_table",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    WHERE l_quantity < 25
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_cache_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CACHE TABLE ... AS SELECT: the explicitly materialized in-memory
    relation (Spark's columnar cache with its own batch layout and
    stats) that serves repeated dashboard reads without rescanning
    parquet — the engine's answer to a hot mid-sized aggregate input.
    The query reads THROUGH the cached relation (InMemoryTableScan,
    plan-pinned in tests/test_pipeline41.py) and the oracle recomputes
    from the source table, proving the cache changes the physical plan
    only. UNCACHE keeps repeated selfcheck runs from pinning executor
    memory across queries."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_ct_lineitem")
    # UNCACHE alone leaves the temp VIEW behind and the next CACHE TABLE
    # AS SELECT would collide — drop both so the query is re-invocable
    # (the driver and the oracle gate both call it repeatedly).
    spark.sql("UNCACHE TABLE IF EXISTS _ct_small_lines")
    spark.catalog.dropTempView("_ct_small_lines")
    spark.sql(
        """
        CACHE TABLE _ct_small_lines AS
        SELECT l_returnflag, l_linestatus, l_quantity
        FROM _ct_lineitem WHERE l_quantity < 25
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(SUM(l_quantity), 2) AS qty
        FROM _ct_small_lines
        GROUP BY l_returnflag, l_linestatus
        """
    )
