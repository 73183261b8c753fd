"""Batch 14 — tokenizer design stats, epoch ordering, backlog aging
(round 2):

- text_vocab_coverage: cumulative token-occurrence coverage of the
  frequency-ranked vocabulary at checkpoint sizes (the coverage curve a
  tokenizer-size decision reads).
- dataset_epoch_shuffle: deterministic per-epoch reshuffle -- a different
  reproducible permutation of the corpus for each training epoch from
  pure hash arithmetic (no rand(), no global sort at scale: the hash IS
  the sort key, so a range-partitioned write realizes the order).
- orders_backlog_aging: order aging buckets (days since order, relative
  to the data's own horizon) by status -- the operational backlog report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import load_table
from .registry import declare

EPOCHS = 3
COVERAGE_POINTS = (10, 50, 100, 500)


@declare(
    "text_vocab_coverage",
    oracle=f"""
    WITH tf AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w),
    tot AS (SELECT SUM(c) AS t FROM tf),
    ranked AS (
      SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rnk,
             SUM(c) OVER (ORDER BY c DESC, w) AS cum
      FROM tf),
    pts AS (SELECT unnest(ARRAY{list(COVERAGE_POINTS)}) AS k)
    SELECT k AS vocab_size,
           ROUND(MAX(CASE WHEN rnk <= k THEN cum END) / MAX(t), 6)
             AS coverage
    FROM ranked CROSS JOIN pts CROSS JOIN tot
    WHERE rnk <= k
    GROUP BY k
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: fraction of all token OCCURRENCES covered
    by the top-k frequency-ranked vocab at k in {10, 50, 100, 500} -- what
    sizes the tokenizer/vocab budget discussion around a corpus. One corpus
    tokenize+groupBy; ranking and cumulative windows run on the vocab
    relation (square-root-of-corpus sized in practice)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens_expr()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("c"))
    )
    tot = tf.agg(F.sum("c").alias("t"))
    w_rank = Window.orderBy(F.col("c").desc(), "w")
    ranked = tf.select(
        "w",
        "c",
        F.row_number().over(w_rank).alias("rnk"),
        F.sum("c").over(w_rank).alias("cum"),
    )
    pts = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in COVERAGE_POINTS])).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(pts))
        .crossJoin(F.broadcast(tot))
        .where(F.col("rnk") <= F.col("k"))
        .groupBy(F.col("k").alias("vocab_size"))
        .agg(
            F.round(
                F.max(F.when(F.col("rnk") <= F.col("k"), F.col("cum")))
                / F.max("t"),
                6,
            ).alias("coverage")
        )
    )


@declare(
    "dataset_epoch_shuffle",
    oracle=f"""
    WITH e AS (SELECT unnest(generate_series(0, {EPOCHS - 1})) AS epoch)
    SELECT epoch, doc_id,
           CAST(row_number() OVER (
                  PARTITION BY epoch
                  ORDER BY (doc_id * 2654435761 + epoch * 40503) % 1000003,
                           doc_id) AS BIGINT) AS pos
    FROM documents CROSS JOIN e
    """,
)
def dataset_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic reshuffle: epoch e orders documents by
    hash(doc_id, e) -- every epoch sees a different permutation, every
    rerun sees the same ones, with no rand() (partition-order dependent)
    and no persisted shuffle state. Here the position is materialized with
    a per-epoch window for the oracle; the 100 TB run never materializes
    pos -- it range-partitions + sorts BY THE HASH KEY on write, which
    realizes exactly this order."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e = spark.range(EPOCHS).select(F.col("id").cast("long").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(e)).select(
        "epoch",
        "doc_id",
        ((F.col("doc_id") * 2654435761 + F.col("epoch") * 40503) % 1000003).alias(
            "hk"
        ),
    )
    # EPOCHS (=3) partitions over corpus x epochs rows: per-epoch position
    # via the grouped two-phase rank (operators/global_rank.py), not an
    # EPOCHS-task partitioned window.
    from ..operators.global_rank import with_grouped_row_number

    return with_grouped_row_number(
        keyed, ["epoch"], [F.col("hk"), F.col("doc_id")], out="pos"
    ).select("epoch", "doc_id", "pos")


@declare(
    "orders_backlog_aging",
    oracle="""
    WITH horizon AS (SELECT MAX(o_orderdate) AS h FROM orders),
    aged AS (
      SELECT o_orderstatus,
             date_diff('day', CAST(o_orderdate AS DATE), CAST(h AS DATE))
               AS age_days
      FROM orders CROSS JOIN horizon)
    SELECT o_orderstatus,
           CASE WHEN age_days <= 30 THEN '0-30'
                WHEN age_days <= 90 THEN '31-90'
                WHEN age_days <= 365 THEN '91-365'
                ELSE '365+' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM aged GROUP BY 1, 2
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order backlog aging report: days-since-order (relative to the
    data's own horizon, so the query is reproducible) bucketed into aging
    bands per status. The horizon is a broadcast 1-row aggregate; one
    groupBy on (status, bucket)."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    aged = o.crossJoin(F.broadcast(horizon)).select(
        "o_orderstatus",
        F.datediff(F.to_date("h"), F.to_date("o_orderdate")).alias("age_days"),
    )
    bucket = (
        F.when(F.col("age_days") <= 30, "0-30")
        .when(F.col("age_days") <= 90, "31-90")
        .when(F.col("age_days") <= 365, "91-365")
        .otherwise("365+")
    )
    return aged.groupBy(
        "o_orderstatus", bucket.alias("age_bucket")
    ).agg(F.count("*").cast("long").alias("n"))
