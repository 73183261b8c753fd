"""Round-6 batch 49: ``dataset_temperature_mixture`` — temperature-scaled
source sampling (the multilingual-LM standard: q_i ∝ p_i^α flattens the
source distribution toward uniform as α → 0), with exact token-budget
allocation by largest remainder. Complements dataset_mixture (fixed
config weights) and dataset_token_budget (α = 1 proportional): the three
cover the mixture policies a real pretraining data pipeline switches
between. Single scan; every window step runs on the ~20-row per-source
relation, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

ALPHA = 0.7  # temperature exponent (XLM-R / mC4 convention)
T_BUDGET = 500_000

_TEMP_ORACLE = f"""
WITH cnt AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
p AS (
  SELECT source, tokens,
         POW(tokens, {ALPHA}) / SUM(POW(tokens, {ALPHA})) OVER () AS q
  FROM cnt),
base AS (
  -- q_r is a distinct name on purpose: reusing "q" would shadow the
  -- input column and make FLOOR(q * B) resolution engine-dependent
  SELECT source, tokens, ROUND(q, 8) AS q_r,
         CAST(FLOOR(q * {T_BUDGET}) AS BIGINT) AS alloc0,
         q * {T_BUDGET} - FLOOR(q * {T_BUDGET}) AS frac
  FROM p),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rnk,
         {T_BUDGET} - SUM(alloc0) OVER () AS leftover
  FROM base)
SELECT source, tokens, q_r AS q,
       CAST(alloc0 + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM ranked
"""


@declare("dataset_temperature_mixture", oracle=_TEMP_ORACLE)
def dataset_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights: per-source token mass p_i is
    raised to α = 0.7 and renormalized (q_i ∝ p_i^α -- the standard
    low-resource upsampling curve), then a 500k-token budget is allocated
    exactly by largest remainder (floor + ranked fractional top-up, the
    same discipline as dataset_token_budget). The whole plan is one scan
    + a ~20-row aggregate; the window steps run on the per-source
    relation, never the corpus. POW on identical IEEE doubles is
    engine-identical here because tokens are integers and α is a literal;
    q is rounded to 8 decimals in BOTH engines for the hash compare while
    alloc stays exact integer arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    pw = F.pow(F.col("tokens").cast("double"), F.lit(float(ALPHA)))
    tot = cnt.agg(F.sum(pw).alias("__t"))
    base = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "tokens",
            (pw / F.col("__t")).alias("qq"),
        )
        .select(
            "source",
            "tokens",
            F.round("qq", 8).alias("q"),
            F.floor(F.col("qq") * T_BUDGET).cast("long").alias("alloc0"),
            (F.col("qq") * T_BUDGET - F.floor(F.col("qq") * T_BUDGET)).alias(
                "frac"
            ),
        )
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy(F.lit(1))
    ranked = base.select(
        "*",
        F.row_number()
        .over(w_all.orderBy(F.desc("frac"), F.asc("source")))
        .alias("rnk"),
        (F.lit(T_BUDGET) - F.sum("alloc0").over(w_all)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "tokens",
        "q",
        (
            F.col("alloc0")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


@declare("sim_mmr_topk", oracle=None)  # rows-only: greedy sequential
# selection has no SQL form; pytests pin the lam=1 == plain-top-k
# identity, an independent quadratic reference replay, and determinism
def sim_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval (MMR, lambda=0.7): distributed top-50 cosine
    pool for query vec_id 0, then greedy maximal-marginal-relevance
    rerank -- each pick maximizes relevance minus its similarity to the
    already-picked set, so near-duplicate neighbors stop crowding the
    context window (the standard RAG rerank). Driver work is bounded by
    the POOL (50 rows), never the corpus; the retrieval stage is the same
    broadcast-query TakeOrderedAndProject plan as sim_topk."""
    from ..operators.mmr import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_topk(spark, emb, query_vec_id=0, k=10, pool=50, lam=0.7)
