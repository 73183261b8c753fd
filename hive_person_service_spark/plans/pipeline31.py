"""Round-4 continuation batch 31: compressed-embedding retrieval tiers.

Two additions to the similarity family's accuracy/cost ladder
(sim_topk exact -> IVF -> hyperplane-LSH -> PQ/IVF-PQ):
emb_matryoshka_topk retrieves on a PREFIX of the embedding (the
matryoshka representation trick -- 4x less IO from the same column),
and emb_sign_hamming_topk retrieves on 1-bit sign quantization (64x
compression, Hamming via two bit_count words). Both are oracle-checked
-- the quantized scores are deterministic arithmetic, so DuckDB
re-derives them exactly -- and both carry the full-precision cosine of
their candidates so the ranking drift is visible in the result itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, to_double_array
from ..sources import load_table
from .registry import declare


@declare(
    "emb_matryoshka_topk",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), scored AS (
      SELECT e.vec_id,
             list_dot_product(CAST(e.embedding AS DOUBLE[])[1:16], (SELECT qv[1:16] FROM q))
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[])[1:16],
                                        CAST(e.embedding AS DOUBLE[])[1:16]))
                  * sqrt(list_dot_product((SELECT qv[1:16] FROM q), (SELECT qv[1:16] FROM q))))
               AS cos16_raw,
             list_dot_product(CAST(e.embedding AS DOUBLE[]), (SELECT qv FROM q)) AS cos_full_raw
      FROM embeddings e WHERE e.vec_id <> 0
    )
    SELECT vec_id, ROUND(cos16_raw, 6) AS cos16, ROUND(cos_full_raw, 6) AS cos_full
    FROM scored
    ORDER BY cos16_raw DESC, vec_id
    LIMIT 10
    """,
)
def emb_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka retrieval: top-10 neighbors of the query scored on the
    FIRST 16 of 64 dimensions (prefix-truncated, renormalized cosine) --
    the trained-front-loaded-embedding trick that cuts scan IO and
    dot-product FLOPs 4x while reading the same column (slice() prunes
    nothing at parquet level, but a materialized prefix column would).
    Each candidate also carries its full-precision cosine, so the result
    itself shows the quality drift the cheaper tier costs. Same
    broadcast + TakeOrderedAndProject shape as sim_topk: at 100 TB the
    prefix pass is the shortlist stage and the full column re-ranks."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        to_double_array("embedding").alias("qv")
    )
    e16 = F.slice(to_double_array("embedding"), 1, 16)
    q16 = F.slice(F.col("qv"), 1, 16)
    cos16 = cosine_expr(e16, q16) / (
        F.sqrt(cosine_expr(e16, e16)) * F.sqrt(cosine_expr(q16, q16))
    )
    return (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cos16.alias("cos16_raw"),
            cosine_expr(to_double_array("embedding"), F.col("qv")).alias("cos_full_raw"),
        )
        .orderBy(F.col("cos16_raw").desc(), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            F.round("cos16_raw", 6).alias("cos16"),
            F.round("cos_full_raw", 6).alias("cos_full"),
        )
    )


_SIGN_ORACLE = """
WITH packed AS (
  SELECT vec_id,
         list_sum(list_transform(CAST(embedding AS DOUBLE[])[1:32],
             (x, i) -> CASE WHEN x > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END))
           AS w_lo,
         list_sum(list_transform(CAST(embedding AS DOUBLE[])[33:64],
             (x, i) -> CASE WHEN x > 0 THEN 1::BIGINT << (i - 1) ELSE 0::BIGINT END))
           AS w_hi,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
), q AS (SELECT w_lo, w_hi, v FROM packed WHERE vec_id = 0)
SELECT p.vec_id,
       CAST(bit_count(xor(p.w_lo, (SELECT w_lo FROM q)))
            + bit_count(xor(p.w_hi, (SELECT w_hi FROM q))) AS BIGINT) AS hamming,
       ROUND(list_dot_product(p.v, (SELECT v FROM q)), 6) AS cos_full
FROM packed p WHERE p.vec_id <> 0
ORDER BY hamming, vec_id
LIMIT 10
"""


@declare("emb_sign_hamming_topk", oracle=_SIGN_ORACLE)
def emb_sign_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign) quantization retrieval: each 64-dim embedding packs
    to TWO 32-bit sign words (64x compression), and candidate ranking is
    Hamming distance -- two XOR + popcount instructions per comparison,
    the cheapest retrieval tier that still correlates with cosine for
    normalized vectors (angle ~ pi * hamming / d). Packing is a JVM
    higher-order fold (transform with index + aggregate); no Python, no
    shuffle before the final top-k. Candidates carry their
    full-precision cosine for visible drift. At 100 TB the packed words
    persist as two BIGINT columns (16 bytes/vector) and the binary pass
    shortlists for exact re-rank -- same ladder as PQ but with free
    encode."""
    emb = load_table(spark, sf_dir, "embeddings")

    def pack(lo: int):
        # SQL form: shiftleft's Python wrapper wants a literal bit count,
        # but the SQL function takes the index expression directly.
        return F.expr(
            f"aggregate(transform(slice(v, {lo}, 32), "
            "(x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)"
        )

    packed = emb.withColumn("v", to_double_array("embedding")).select(
        "vec_id",
        pack(1).alias("w_lo"),
        pack(33).alias("w_hi"),
        F.col("v"),
    )
    q = packed.where(F.col("vec_id") == 0).select(
        F.col("w_lo").alias("q_lo"), F.col("w_hi").alias("q_hi"), F.col("v").alias("qv")
    )
    return (
        packed.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
            )
            .cast("long")
            .alias("hamming"),
            F.round(cosine_expr(F.col("v"), F.col("qv")), 6).alias("cos_full"),
        )
        .orderBy("hamming", "vec_id")
        .limit(10)
    )
