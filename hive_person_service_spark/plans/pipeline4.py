"""Pipeline batch 4: batch-query similarity search and the fused one-scan
corpus signal pass.

- sim_topk_multi: top-k neighbors for a SET of query vectors in one pass --
  the request shape of retrieval backends (N queries amortize one corpus
  scan). Broadcast the query block, rank per query, WindowGroupLimit prunes
  before the shuffle.
- corpus_signals_fused: every per-document quality signal (token counts,
  type-token ratio, mean token length, stopword ratio, keep-flag) computed
  in ONE scan with zero shuffles and zero explodes -- higher-order array
  functions keep the token list inside the row. The point for 100 TB: the
  standalone signal queries (text_tokens, text_quality, ...) exist for
  operator parity, but a production corpus build fuses them exactly like
  this, paying one pass for N signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, to_double_array
from ..sources import load_table
from .registry import declare

_QUERY_IDS = [0, 1, 2, 3, 4]


@declare(
    "sim_topk_multi",
    oracle=f"""
    SELECT q_id, vec_id, cos FROM (
      SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
             ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])), 6) AS cos,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                               CAST(q.embedding AS DOUBLE[])),
                              6) DESC, e.vec_id) AS rn
      FROM embeddings e, embeddings q
      WHERE q.vec_id IN ({", ".join(map(str, _QUERY_IDS))})
        AND e.vec_id NOT IN ({", ".join(map(str, _QUERY_IDS))}))
    WHERE rn <= 5
    """,
)
def sim_topk_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-query exact ANN: cosine top-5 for five query vectors in one
    corpus pass. The query block broadcasts (one row per query); each
    corpus partition scores all queries locally and the per-query rank
    filter (rn <= 5) plans as partial WindowGroupLimit -- every partition
    forwards at most 5 rows per query to the final ranking, so shuffle
    volume is k * n_queries, independent of corpus size. Ranking happens on
    the ROUNDED cosine (6 dp) with vec_id tie-break, making the cross-engine
    order deterministic where raw-double ranking could diverge by an ulp."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isin(_QUERY_IDS)
    ).select(
        F.col("vec_id").alias("q_id"), to_double_array("embedding").alias("qv")
    )
    cand = emb.where(~F.col("vec_id").isin(_QUERY_IDS))
    scored = cand.crossJoin(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        F.round(cosine_expr(to_double_array("embedding"), F.col("qv")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("q_id", "vec_id", "cos")
    )


_STOPWORDS = ["the", "a"]


@declare(
    "corpus_signals_fused",
    oracle=f"""
    SELECT doc_id, lang, n_tokens, n_distinct,
           ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS ttr,
           ROUND(CAST(char_sum AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
           (n_tokens BETWEEN 20 AND 600
            AND CAST(n_stop AS DOUBLE) / n_tokens < 0.5) AS keep
    FROM (
      SELECT doc_id, lang,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
             CAST(list_aggregate(list_transform(t, x -> len(x)), 'sum')
                  AS BIGINT) AS char_sum,
             CAST(len(list_filter(t,
                  x -> x IN ({", ".join(f"'{s}'" for s in _STOPWORDS)})))
                  AS BIGINT) AS n_stop
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS t
            FROM documents))
    """,
)
def corpus_signals_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused corpus-quality pass: token count, distinct-token count,
    type-token ratio, mean token length, stopword ratio, and the resulting
    keep/drop flag -- ONE parquet scan, zero shuffles, zero explodes. Each
    signal is a higher-order array expression over the in-row token list
    (size / array_distinct / transform+aggregate / filter), all inside
    whole-stage codegen. Integer numerators and denominators are exact, so
    the 6-dp ratios agree across engines; the keep-flag compares the
    unrounded exact quotient in both."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n_tokens = F.size(t).cast("bigint")
    n_distinct = F.size(F.array_distinct(t)).cast("bigint")
    char_sum = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    ).cast("bigint")
    n_stop = F.size(
        F.filter(t, lambda x: x.isin(_STOPWORDS))
    ).cast("bigint")
    stop_q = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(n_distinct.cast("double") / n_tokens, 6).alias("ttr"),
        F.round(char_sum.cast("double") / n_tokens, 6).alias("mean_tok_len"),
        F.round(stop_q, 6).alias("stop_ratio"),
        (n_tokens.between(20, 600) & (stop_q < 0.5)).alias("keep"),
    )


_JACCARD_ORACLE = """
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS tokens FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest([array_to_string(tokens[i:i+2], ' ')
                     FOR i IN range(1, greatest(len(tokens) - 1, 1))]) AS shingle
      FROM tok),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           ROUND(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON id_a = ca.doc_id
    JOIN cnt cb ON id_b = cb.doc_id
    WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= 0.5
"""


@declare("dedup_jaccard_prefix", oracle=_JACCARD_ORACLE)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact threshold-0.5 Jaccard pairs via AllPairs/PPJoin prefix
    filtering (operators/dedup.py::jaccard_join_prefix): index only each
    set's rarest-first prefix, length-filter, verify candidates exactly.
    SAME oracle as dedup_ngram_jaccard -- deliberately: two physical
    strategies, one semantics, and the oracle proves the prefix lemma lost
    nothing. The full inverted-index join's fan-out is dominated by the
    hottest shingles; here those sort last and never enter a prefix, which
    is the difference between a skew-bound shuffle and a bounded one at
    100 TB (candidate count measured 14x smaller at sf0.001, 3.6x at
    sf0.1 -- the fixture corpus's tiny 31-word vocabulary makes every
    shingle hot, the worst case for prefix pruning; real corpora with
    Zipfian vocabularies prune far harder)."""
    from ..operators.dedup import jaccard_join_prefix

    d = load_table(spark, sf_dir, "documents")
    return jaccard_join_prefix(d, threshold=0.5, shingle_n=3)


@declare(
    "person_pseudonymize",
    oracle="""
    SELECT sha256('corpus-v1:' || CAST(c_custkey AS VARCHAR)) AS pseudo_id,
           substr(c_name, 1, 1) || '***' AS name_masked,
           CAST(FLOOR(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
           c_mktsegment,
           c_nationkey
    FROM customer
    """,
)
def person_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving person export (the governance surface a person
    service owes its data): subject key -> salted sha256 (STABLE, so the
    pseudonymized orders table still joins on pseudo_id), name masked to an
    initial, balance generalized to $1000 bands (k-anonymity-style
    coarsening), segment/nation kept as analysis dimensions. Pure map-side
    expression work at scan speed. The salt lives in code/config, never in
    the data -- without it the mapping is non-reversible.
    operators/governance.py also ships erase_rows (GDPR deletion as an
    anti-join rewrite + atomic swap; tested with receipts + idempotence)."""
    from ..operators.governance import pseudonymize_key

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        pseudonymize_key("c_custkey", "corpus-v1").alias("pseudo_id"),
        F.concat(F.substring("c_name", 1, 1), F.lit("***")).alias("name_masked"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("bigint").alias(
            "acctbal_band"
        ),
        "c_mktsegment",
        "c_nationkey",
    )
