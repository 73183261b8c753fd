"""Batch 10 — substring-level dedup, budget allocation, vocab stats, burst
detection (round 2):

- text_substring_spans: cross-document duplicated-substring spans (the
  span-level dedup primitive from "Deduplicating Training Data Makes
  Language Models Better", Lee et al. 2022 -- suffix-array semantics
  approximated with fixed-k token shingles + gaps-and-islands merge).
- dataset_token_budget: largest-remainder proportional allocation of a
  fixed token budget across sources (the mixture-to-budget step of a
  training-data assembly run; exact integer arithmetic, no sampling).
- text_bpe_pair_stats: adjacent character-pair frequencies inside tokens
  -- the score table the first BPE merge reads (vocab induction stats).
- events_rate_spike: hourly event-rate z-score against a trailing 24h
  window per event type (burst/incident detection over the compacted
  hourly relation, never the raw stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

SPAN_K = 5  # token n-gram length for duplicated-substring detection
BUDGET = 100_000  # token budget for the allocation query


@declare(
    "text_substring_spans",
    oracle=f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    kg AS (
      SELECT doc_id,
             unnest([{{'pos': i, 'g': array_to_string(t[i:i+{SPAN_K - 1}], ' ')}}
                     FOR i IN range(1, len(t) - {SPAN_K - 2})]) AS s
      FROM tok WHERE len(t) >= {SPAN_K}),
    pos AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM kg),
    dup AS (
      SELECT g FROM pos GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (
      SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (g)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       <= {SPAN_K} THEN 0 ELSE 1 END AS brk
      FROM hits),
    grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS span_id
      FROM isl)
    SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
           CAST(MIN(pos) AS BIGINT) AS start_tok,
           CAST(MAX(pos) + {SPAN_K} - 1 AS BIGINT) AS end_tok,
           CAST(MAX(pos) + {SPAN_K} - MIN(pos) AS BIGINT) AS span_tokens
    FROM grp GROUP BY doc_id, span_id
    """,
)
def text_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring spans: token {SPAN_K}-grams occurring in >= 2
    documents, merged per document into maximal spans via gaps-and-islands
    (break when the next duplicated position is > k away). The span-level
    signal substring dedup removes and document-level dedup misses.
    Shingling is in-row; the only corpus shuffles are the gram groupBy and
    the per-doc island windows (partitioned by doc_id, never global)."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_expr()
    kg = F.transform(
        F.sequence(F.lit(1), F.size(t) - (SPAN_K - 1)),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.concat_ws(" ", F.slice(t, i, SPAN_K)).alias("g"),
        ),
    )
    from ..operators.caching import persist_bounded

    pos = persist_bounded(
        "substring_spans_pos",
        d.select("doc_id", F.explode(kg).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g")),
    )  # feeds the dup aggregate AND the hits join: shingle the
    # corpus once, not twice (kept as groupBy+join, NOT a min/max window
    # over g -- a window cannot partial-aggregate, so one hot boilerplate
    # shingle would funnel into a single task at scale)
    dup = pos.groupBy("g").agg(
        F.countDistinct("doc_id").alias("nd")
    ).where(F.col("nd") >= 2).select("g")
    hits = pos.join(dup, "g").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) <= SPAN_K, 0).otherwise(1),
    )
    grp = isl.withColumn(
        "span_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return grp.groupBy("doc_id", "span_id").agg(
        F.min("pos").cast("long").alias("start_tok"),
        (F.max("pos") + SPAN_K - 1).cast("long").alias("end_tok"),
        (F.max("pos") + SPAN_K - F.min("pos")).cast("long").alias("span_tokens"),
    )


@declare(
    "dataset_token_budget",
    oracle=f"""
    WITH cnt AS (
      SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS tokens
      FROM documents GROUP BY source),
    tot AS (SELECT SUM(tokens) AS total FROM cnt),
    exact AS (
      SELECT source, tokens,
             CAST(tokens AS DOUBLE) * {BUDGET} / total AS share
      FROM cnt CROSS JOIN tot),
    base AS (
      SELECT source, tokens, share, CAST(FLOOR(share) AS BIGINT) AS alloc0,
             share - FLOOR(share) AS frac
      FROM exact),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rnk,
             {BUDGET} - SUM(alloc0) OVER () AS leftover
      FROM base)
    SELECT source, tokens,
           CAST(alloc0 + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked
    """,
)
def dataset_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation of a fixed token budget
    across sources, proportional to each source's token count: floor the
    exact shares, hand the leftover units to the largest fractional parts
    (deterministic tie-break on source). Exact integer output that sums to
    the budget -- the mixture-to-budget step of corpus assembly. The
    source relation is tiny (20 rows), so every window here runs on a
    compacted aggregate, not the corpus."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(
        F.sum(F.size(tokens_expr())).cast("long").alias("tokens")
    )
    tot = cnt.agg(F.sum("tokens").alias("total"))
    exact = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        (F.col("tokens").cast("double") * BUDGET / F.col("total")).alias("share"),
    )
    base = exact.select(
        "source",
        "tokens",
        F.floor("share").cast("long").alias("alloc0"),
        (F.col("share") - F.floor("share")).alias("frac"),
    )
    w_rank = Window.orderBy(F.col("frac").desc(), "source")
    w_all = Window.partitionBy()
    ranked = base.select(
        "source",
        "tokens",
        "alloc0",
        F.row_number().over(w_rank).alias("rnk"),
        (F.lit(BUDGET) - F.sum("alloc0").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "tokens",
        (
            F.col("alloc0")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        ).cast("long").alias("alloc"),
    )


@declare(
    "text_bpe_pair_stats",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    pairs AS (
      SELECT unnest([substr(w, i, 2) FOR i IN range(1, len(w))]) AS pair
      FROM tok WHERE len(w) >= 2)
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent character-pair frequencies inside tokens: the score table
    the first BPE merge consumes (and re-consumes per merge step during
    vocab induction). In-row pair explode + one groupBy; top-30 via
    TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    w = F.explode(tokens_expr()).alias("w")
    tok = d.select(w).where(F.length("w") >= 2)
    pairs = tok.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.substring(F.col("w"), i, 2),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


@declare(
    "events_rate_spike",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    scored AS (
      SELECT event_type, hr, n,
             AVG(n) OVER w AS mu,
             STDDEV_SAMP(n) OVER w AS sd,
             COUNT(*) OVER w AS nw
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:00') AS hour, n,
           ROUND((n - mu) / sd, 4) AS z
    FROM scored
    WHERE nw >= 24 AND sd > 0 AND (n - mu) / sd >= 2.5
    """,
)
def events_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hourly event counts z-scored against the TRAILING
    24-hour window per event type (current hour excluded); flag z >= 2.5
    once a full day of history exists. All windows run over the compacted
    hourly relation (types x hours rows), shuffling on event_type only --
    the raw stream is touched once, by the groupBy."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "hr",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
        F.count("*").over(w).alias("nw"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        scored.where(
            (F.col("nw") >= 24) & (F.col("sd") > 0) & (z >= 2.5)
        )
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
            "n",
            F.round(z, 4).alias("z"),
        )
    )
