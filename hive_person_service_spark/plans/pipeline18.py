"""Batch 20 — corpus novelty, seasonality, concentration, burstiness
(round 2):

- text_ngram_novelty: per-document novelty = fraction of its 3-gram
  shingles first seen in THIS document (by doc_id order) -- the
  decreasing-novelty curve dataset-ordering and crawl-frontier decisions
  read; pure first-occurrence relational form.
- orders_seasonality_index: monthly revenue seasonality index (month
  total / average month) -- the classic seasonal profile.
- lineitem_supplier_hhi: Herfindahl-Hirschman supplier-concentration
  index per part over supplied quantity -- single-supplier risk flags.
- text_burstiness: variance-to-mean ratio (index of dispersion) of
  per-document counts for the most frequent terms -- bursty terms
  (topical) vs uniform terms (function words); the term-weighting signal
  behind stopword discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles_expr, tokens_expr
from ..sources import load_table
from .registry import declare

BURSTY_TOP = 50


@declare(
    "text_ngram_novelty",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(t[i:i+2], ' ')
                     FOR i IN range(1, len(t) - 1)]) AS g
      FROM tok WHERE len(t) >= 3),
    firsts AS (SELECT g, MIN(doc_id) AS first_doc FROM sh GROUP BY g),
    per_doc AS (
      SELECT s.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new
      FROM sh s JOIN firsts f USING (g)
      GROUP BY s.doc_id)
    SELECT doc_id, n_grams, n_new,
           ROUND(CAST(n_new AS DOUBLE) / n_grams, 6) AS novelty
    FROM per_doc
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty in doc_id (ingest) order: a shingle is
    novel if no earlier document contains it (first_doc == this doc).
    One groupBy builds the global first-occurrence relation; the join back
    keys on the shingle. The curve's decay is what crawl scheduling /
    dataset-ordering reads; near-dup documents show novelty ~ 0."""
    d = load_table(spark, sf_dir, "documents")
    # The .distinct() is value-wise redundant (shingles_expr dedupes
    # in-row) but kept deliberately: its Exchange+Aggregate subtree is
    # identical under both consumers (first-occurrence aggregate + the
    # join back), so ReuseExchange shingles the corpus once and shares the
    # shuffle -- the text_containment measurement (r11 opt round): the
    # shared distinct beat both .persist() and bare recompute.
    sh = d.select(
        "doc_id", F.explode(shingles_expr(tokens_expr(), 3)).alias("g")
    ).distinct()
    firsts = sh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_new"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_new",
        F.round(F.col("n_new").cast("double") / F.col("n_grams"), 6).alias(
            "novelty"
        ),
    )


@declare(
    "orders_seasonality_index",
    oracle="""
    WITH monthly AS (
      SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
             SUM(o_totalprice) AS revenue
      FROM orders GROUP BY 1),
    avg_m AS (SELECT AVG(revenue) AS avg_rev FROM monthly)
    SELECT month, ROUND(revenue, 2) AS revenue,
           ROUND(revenue / avg_rev, 6) AS seasonality_index
    FROM monthly CROSS JOIN avg_m
    """,
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue seasonality index: each calendar month's revenue
    over the average month (index 1.0 = typical). One orders groupBy; the
    12-row average broadcasts back."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month("o_orderdate").cast("long").alias("month")
    ).agg(F.sum("o_totalprice").alias("revenue"))
    avg_m = monthly.agg(F.avg("revenue").alias("avg_rev"))
    return monthly.crossJoin(F.broadcast(avg_m)).select(
        "month",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.col("avg_rev"), 6).alias(
            "seasonality_index"
        ),
    )


@declare(
    "lineitem_supplier_hhi",
    oracle="""
    WITH sq AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT l_partkey, SUM(q) AS tq FROM sq GROUP BY l_partkey),
    shares AS (
      SELECT sq.l_partkey, (q / tq) AS share,
             COUNT(*) OVER (PARTITION BY sq.l_partkey) AS n_supp
      FROM sq JOIN tot USING (l_partkey))
    SELECT l_partkey,
           CAST(MAX(n_supp) AS BIGINT) AS n_suppliers,
           ROUND(SUM(share * share), 6) AS hhi
    FROM shares GROUP BY l_partkey
    ORDER BY hhi DESC, l_partkey LIMIT 20
    """,
)
def lineitem_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-concentration HHI per part (sum of squared quantity
    shares; 1.0 = single-supplier): the top-20 most concentrated parts --
    the supply-risk screen (a fixed-threshold screen returns nothing on
    this diffuse fixture, max HHI ~0.2). Two aggregations sharing the
    l_partkey key and a partitioned count window -- every shuffle keys on
    the part; TakeOrdered caps the result."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    sq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    )
    tot = sq.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    shares = sq.join(tot, "l_partkey").select(
        "l_partkey",
        (F.col("q") / F.col("tq")).alias("share"),
        F.count("*").over(Window.partitionBy("l_partkey")).alias("n_supp"),
    )
    return (
        shares.groupBy("l_partkey")
        .agg(
            F.max("n_supp").cast("long").alias("n_suppliers"),
            F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
        )
        .orderBy(F.col("hhi").desc(), "l_partkey")
        .limit(20)
    )


@declare(
    "text_burstiness",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    stats AS (
      SELECT w,
             SUM(c) AS total,
             SUM(c * c) AS sum_sq,
             COUNT(*) AS n_present
      FROM tf GROUP BY w),
    top AS (
      SELECT w, total, sum_sq, n_present FROM stats
      ORDER BY total DESC, w LIMIT {BURSTY_TOP}),
    disp AS (
      SELECT w, total,
             total / n_docs AS mean_all,
             (sum_sq - 2 * (total / n_docs) * total
              + n_docs * (total / n_docs) * (total / n_docs)) / n_docs
               AS var_all
      FROM top CROSS JOIN nd)
    SELECT w AS term, CAST(total AS BIGINT) AS total,
           ROUND(var_all / mean_all, 6) AS burstiness
    FROM disp
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance/mean of per-document counts,
    zero-including) for the {BURSTY_TOP} most frequent terms: ~1 means
    Poisson-uniform usage (function words), >> 1 means bursty/topical
    concentration. Per-doc counts aggregate once; variance over ALL docs
    (including zero-count docs) comes from the sum/sum-of-squares
    identity with the corpus size as a broadcast scalar -- the zero rows
    never materialize."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens_expr()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    nd = d.agg(F.count("*").cast("double").alias("n_docs"))
    stats = tf.groupBy("w").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        F.count("*").alias("n_present"),
    )
    top = stats.orderBy(F.col("total").desc(), "w").limit(BURSTY_TOP)
    mean_all = F.col("total") / F.col("n_docs")
    var_all = (
        F.col("sum_sq")
        - 2 * mean_all * F.col("total")
        + F.col("n_docs") * mean_all * mean_all
    ) / F.col("n_docs")
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("term"),
            F.col("total").cast("long").alias("total"),
            F.round(var_all / mean_all, 6).alias("burstiness"),
        )
    )
