"""Round-4 continuation batch 43: BM25 ranked retrieval and batch model
scoring — the two classic serving-side operators the registry lacked.

- text_bm25_search: the canonical ranked-retrieval scorer (Okapi BM25)
  over the corpus inverted index — TF-IDF (text_tfidf) weighs terms,
  BM25 RANKS documents for a query with saturation (k1) and length
  normalization (b); this is the retrieval tier before embeddings.
- ml_score_logistic: batch inference of a fixed-weight logistic model
  over relational features — the "score 100 TB with last night's model"
  job; weights inline as a literal relation, sigmoid in codegen, fully
  oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

BM25_K1 = 1.2
BM25_B = 0.75
_BM25_QUERY = ["data", "model", "system"]  # the search terms


@declare(
    "text_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents),
    toks_f AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS len FROM toks_f
           GROUP BY doc_id),
    stats AS (SELECT AVG(len) AS avgdl, COUNT(*) AS n_docs FROM dl),
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks_f
      WHERE tok IN ('data', 'model', 'system')
      GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT t.doc_id,
             SUM(
               ln(1 + ((SELECT n_docs FROM stats) - df.df + 0.5)
                      / (df.df + 0.5))
               * (t.tf * ({BM25_K1} + 1))
               / (t.tf + {BM25_K1} * (1 - {BM25_B}
                   + {BM25_B} * dl.len / (SELECT avgdl FROM stats)))
             ) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM tf t JOIN df USING (tok) JOIN dl ON t.doc_id = dl.doc_id
      GROUP BY t.doc_id)
    SELECT doc_id, ROUND(score, 6) AS bm25, n_terms_hit
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval: score every document against the
    query terms through the corpus inverted index — per-term IDF with
    the +0.5 smoothing, term-frequency saturation (k1=1.2) and document-
    length normalization (b=0.75), summed per document, top-20. This is
    THE lexical retrieval tier (what a search service runs before or
    alongside the embedding ANN tiers), built from the same primitives
    as text_tfidf: tokenize + explode once, two broadcast-sized side
    relations (per-term df, corpus stats), one aggregation keyed on
    doc_id, TakeOrderedAndProject for the top-k. Query-term filtering
    happens BEFORE the tf aggregate, so the per-query work scales with
    postings touched, not corpus size — the inverted-index access
    pattern in relational form. ln() outputs round to 6 per the
    registry discipline; summation order is deterministic only after
    the per-doc aggregate, so the sum accumulates over <= 3 term rows —
    bounded and stable."""
    d = load_table(spark, sf_dir, "documents")
    # four consumers (dl, corpus stats, tf, df) — persist the token
    # stream so the corpus tokenizes once, the text_pipeline convention
    from ..operators.caching import persist_bounded

    toks = persist_bounded(
        "bm25_toks",
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        ).where(F.col("tok") != ""),
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("double").alias("len"))
    stats = dl.agg(
        F.avg("len").alias("avgdl"), F.count("*").cast("double").alias("n_docs")
    )
    tf = (
        toks.where(F.col("tok").isin(_BM25_QUERY))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_rel = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        1
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("len") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df_rel), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (idf * (F.col("tf") * (BM25_K1 + 1)) / denom).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.round("score", 6).alias("bm25"), "n_terms_hit")
    )


# Fixed logistic weights: (feature, weight). In production these load
# from last night's training job; inline keeps the query self-contained
# and the oracle able to restate them.
_LR_BIAS = -6.0
_LR_WEIGHTS = [
    ("n_orders", 0.15),
    ("log_spend", 0.35),
    ("acctbal_k", -0.08),
]


@declare(
    "ml_score_logistic",
    oracle=f"""
    WITH feats AS (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS DOUBLE) AS n_orders,
             ln(1 + COALESCE(SUM(o.o_totalprice), 0)) AS log_spend,
             c.c_acctbal / 1000.0 AS acctbal_k
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_acctbal),
    z AS (
      SELECT c_custkey,
             {_LR_BIAS} + {_LR_WEIGHTS[0][1]} * n_orders
                        + {_LR_WEIGHTS[1][1]} * log_spend
                        + {_LR_WEIGHTS[2][1]} * acctbal_k AS logit
      FROM feats)
    SELECT c_custkey,
           ROUND(logit, 6) AS logit,
           ROUND(1 / (1 + exp(-logit)), 6) AS p,
           CAST(1 / (1 + exp(-logit)) >= 0.5 AS BOOLEAN) AS predicted
    FROM z
    """,
)
def ml_score_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference in pure SQL: per-customer features (order
    count, log spend, balance) dot a FIXED logistic weight vector, then
    the sigmoid — the nightly "score the whole base with the trained
    model" job, which at 100 TB is a feature aggregation plus a codegen
    projection: no model server, no Python, no per-row RPC. The weights
    are data (a literal relation here, a table in production), so
    retraining redeploys NOTHING. The feature join is the natural
    customer-key shuffle; everything after is map-side. exp() output
    rounds to 6 per the transcendental discipline; the 0.5 decision
    threshold compares the same IEEE doubles in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    feats = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.count("o_orderkey").cast("double").alias("n_orders"),
            F.log(1 + F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias(
                "log_spend"
            ),
        )
        .select(
            "c_custkey",
            "n_orders",
            "log_spend",
            (F.col("c_acctbal") / 1000.0).alias("acctbal_k"),
        )
    )
    logit = F.lit(_LR_BIAS)
    for feat, w in _LR_WEIGHTS:
        logit = logit + F.lit(w) * F.col(feat)
    p = 1 / (1 + F.exp(-F.col("logit")))
    return feats.select("c_custkey", logit.alias("logit")).select(
        "c_custkey",
        F.round("logit", 6).alias("logit"),
        F.round(p, 6).alias("p"),
        (p >= 0.5).alias("predicted"),
    )
