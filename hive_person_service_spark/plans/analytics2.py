"""Analytics batch 2 -- training-order construction + information-theoretic
quality + event-cadence analytics (all oracle-checked):

- dataset_interleave: deterministic source-interleaved training order --
  reproducible within-source shuffle (md5 sort key) + strict round-robin
  across sources via the (rn-1)*K + source_rank formula, which needs NO
  global window: the order is computed arithmetically from per-source row
  numbers, so it scales to any corpus size.
- text_entropy: per-document token Shannon entropy (the classic gibberish /
  low-information filter) as pure map-side higher-order expressions;
  summation runs over SORTED distinct tokens so the float fold is
  bit-identical across engines.
- events_interarrival: per-user inter-event-time distribution (count, min,
  max, mean, median of gaps) -- the burstiness / bot-detection signal; one
  window pass + one grouped aggregate on exact epoch microseconds.
- events_cohort_matrix: the full cohort-retention matrix (first-active-week
  cohort x week offset -> retained users + share), generalizing the
  single-step events_retention; distinct user-weeks first, so all joins run
  on the compacted activity relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare


@declare(
    "dataset_interleave",
    oracle="""
    WITH ranked_src AS (
      SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS srank
      FROM (SELECT DISTINCT source FROM documents)),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src FROM ranked_src),
    shuffled AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS rn
      FROM documents)
    SELECT s.doc_id, s.source, r.srank, s.rn,
           (s.rn - 1) * k.n_src + r.srank AS seq_pos
    FROM shuffled s JOIN ranked_src r ON s.source = r.source CROSS JOIN k
    """,
)
def dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training order: shuffle within each source by a
    reproducible md5 key, then interleave sources round-robin. seq_pos =
    (rn-1)*K + source_rank is computed arithmetically -- per-source windows
    only (bounded partitions), never a global row_number, so the ordering
    key scales to any corpus and any downstream writer can sort by it."""
    docs = load_table(spark, sf_dir, "documents")
    ranked_src = (
        docs.select("source")
        .distinct()
        .withColumn(
            "srank", F.row_number().over(Window.orderBy("source")).cast("long")
        )
    )
    n_src = ranked_src.count()
    # Per-source rank via the grouped two-phase operator: only ~5 sources
    # exist, so a window PARTITIONed by source would push corpus/5 rows
    # through single tasks at scale (operators/global_rank.py).
    from ..operators.global_rank import with_grouped_row_number

    shuffle_key = F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string")))
    shuffled = with_grouped_row_number(
        docs.select("doc_id", "source", shuffle_key.alias("__sk")),
        ["source"],
        [F.col("__sk"), F.col("doc_id")],
        out="rn",
    ).drop("__sk")
    return shuffled.join(F.broadcast(ranked_src), "source").select(
        "doc_id",
        "source",
        "srank",
        "rn",
        ((F.col("rn") - 1) * n_src + F.col("srank")).alias("seq_pos"),
    )


@declare(
    "text_entropy",
    oracle="""
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(len(uniq) AS BIGINT) AS n_uniq,
           FLOOR(-list_dot_product(
              list_transform(uniq, u ->
                (CAST(len(list_filter(t, x -> x = u)) AS DOUBLE) / n)
                  * log2(CAST(len(list_filter(t, x -> x = u)) AS DOUBLE) / n)),
              list_transform(uniq, u -> 1.0)) * 1e6 + 0.5) / 1e6 AS entropy
    FROM (
      SELECT doc_id, t, len(t) AS n, list_sort(list_distinct(t)) AS uniq
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token Shannon entropy per document, zero shuffles: distinct tokens
    are SORTED before the fold so Spark's aggregate() and DuckDB's
    list_dot_product sum in the same order (bit-identical doubles), then
    FLOOR-half-up to 6dp (transcendental output discipline). O(uniq * n)
    per row via higher-order functions -- fine for document-sized arrays,
    and linear in corpus size overall."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_expr()
    n = F.size(t).cast("double")
    uniq = F.array_sort(F.array_distinct(t))
    term = lambda u: (  # noqa: E731
        F.size(F.filter(t, lambda x: x == u)).cast("double") / n
    )
    terms = F.transform(uniq, lambda u: term(u) * F.log2(term(u)))
    ent = -F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v)
    return d.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(uniq).cast("long").alias("n_uniq"),
        (F.floor(ent * 1e6 + 0.5) / 1e6).alias("entropy"),
    )


@declare(
    "events_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
               AS gap_us
      FROM (SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events))
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           FLOOR(SUM(gap_us) / (1e6 * COUNT(gap_us)) * 1e4 + 0.5) / 1e4
             AS mean_gap_sec,
           FLOOR(quantile_cont(gap_us, 0.5) / 1e6 * 1e4 + 0.5) / 1e4
             AS median_gap_sec
    FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-time stats (burstiness / bot signal): lag over
    exact epoch microseconds (event_id tie-break for determinism), then one
    grouped pass for count/min/max/mean/median. Both the window and the
    aggregate partition on user_id, so AQE coalesces them onto one shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "user_id", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        (F.floor(F.sum("gap_us") / (1e6 * F.count("gap_us")) * 1e4 + 0.5) / 1e4)
        .alias("mean_gap_sec"),
        (F.floor(F.percentile("gap_us", 0.5) / 1e6 * 1e4 + 0.5) / 1e4)
        .alias("median_gap_sec"),
    )


@declare(
    "events_cohort_matrix",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
      FROM events),
    cohort AS (SELECT user_id, MIN(wk) AS cw FROM active GROUP BY user_id),
    sized AS (SELECT cw, COUNT(*) AS cohort_size FROM cohort GROUP BY cw)
    SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cw, a.wk) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active,
           ROUND(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size, 6)
             AS retention
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    JOIN sized s ON c.cw = s.cw
    GROUP BY c.cw, s.cohort_size, date_diff('day', c.cw, a.wk) / 7
    """,
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cohort-retention matrix: first-active-week cohort x week offset
    -> retained users and retention share. Everything downstream of the
    first DISTINCT runs on the compacted (user, week) relation (~30x
    smaller than events); cohort sizes broadcast back for the share."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("wk").alias("cw"))
    sized = cohort.groupBy("cw").agg(F.count("*").alias("cohort_size"))
    joined = active.join(cohort, "user_id").join(F.broadcast(sized), "cw")
    off = (F.datediff("wk", "cw") / 7).cast("long")
    return (
        joined.groupBy(
            F.col("cw"), F.col("cohort_size"), off.alias("week_offset")
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )
