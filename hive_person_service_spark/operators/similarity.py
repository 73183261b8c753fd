"""Similarity-search operators over the embeddings surface (SURVEY.md §2.J).

Three tiers, by scale:
  * exact expression-level dot products (zip_with/aggregate) -- oracle-
    checkable, fine for bounded candidate sets;
  * blockwise exact kNN via Arrow-batched mapInPandas against a broadcast
    matrix -- the "one side fits in executor memory" regime (vectorized
    numpy, ~10-100x the per-pair expression cost);
  * random-hyperplane LSH bucketing -- the 100 TB regime: candidates only
    ever meet inside a bucket (groupBy/join on bucket id, no cross join).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.vectors import cosine_expr, to_double_array

_PAIR_SCHEMA = StructType(
    [
        StructField("a_id", LongType()),
        StructField("b_id", LongType()),
        StructField("cos", DoubleType()),
    ]
)


def exact_topk_pairs_blockwise(
    spark: SparkSession, emb: DataFrame, k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Global top-k most-similar pairs (a < b) -- blockwise exact.

    The full matrix is broadcast (N x 64 floats; 2000 vectors = 0.5 MB --
    at larger N switch to tiling the broadcast side); each partition
    multiplies its rows against it with one numpy matmul and emits only its
    local top-k, so the shuffle carries partitions*k rows, not N^2.
    """
    rows = emb.select(id_col, "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def topk_block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if pdf.empty:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            sims = block @ all_mat.T  # (rows_in_block, N)
            # keep a < b only: mask columns with id <= row id
            col_ids = all_ids[None, :]
            mask = col_ids <= block_ids[:, None]
            sims[mask] = -np.inf
            flat = sims.ravel()
            take = min(k, flat.size)
            idx = np.argpartition(flat, -take)[-take:]
            r, c = np.unravel_index(idx, sims.shape)
            out = pd.DataFrame(
                {
                    "a_id": block_ids[r],
                    "b_id": all_ids[c],
                    "cos": flat[idx],
                }
            )
            yield out[np.isfinite(out["cos"])]

    local = emb.select(id_col, "embedding").mapInPandas(topk_block, _PAIR_SCHEMA)
    return local.orderBy(F.col("cos").desc(), "a_id", "b_id").limit(k)


def cosine_pairs_blockwise(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (a < b) with round(cos, 6) >= threshold -- blockwise exact.

    Same regime as exact_topk_pairs_blockwise: the corpus matrix is broadcast
    and each partition does one numpy matmul for its block row-stripe, so the
    N^2 dot products never materialize as rows -- only the (sparse) pairs
    above threshold are emitted. Replaces the non-equi-join formulation,
    whose zip_with/aggregate expression is evaluated per pair (~50x slower).
    At corpus sizes past broadcast reach, tile the right side or drop to the
    LSH tier (ann_pairs_lsh).
    """
    rows = emb.select(id_col, "embedding").collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if pdf.empty:
                continue
            block_ids = pdf[id_col].to_numpy(dtype=np.int64)
            block = np.array(list(pdf["embedding"]), dtype=np.float64)
            sims = np.round(block @ all_mat.T, 6)  # (rows_in_block, N)
            keep = (sims >= threshold) & (all_ids[None, :] > block_ids[:, None])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"a_id": block_ids[r], "b_id": all_ids[c], "cos": sims[r, c]}
            )

    return emb.select(id_col, "embedding").mapInPandas(block_pairs, _PAIR_SCHEMA)


def knn_join_exact(
    anchors: DataFrame, corpus: DataFrame, k: int, id_col: str = "vec_id"
) -> DataFrame:
    """Exact k nearest neighbors per anchor via expression-level dot product
    + per-anchor top-k window. Quadratic in |anchors| x |corpus| -- bound the
    anchor set or use the LSH tier at scale."""
    from pyspark.sql import Window

    a = anchors.select(
        F.col(id_col).alias("a_id"), to_double_array("embedding").alias("va")
    )
    b = corpus.select(
        F.col(id_col).alias("b_id"), to_double_array("embedding").alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("a_id") != F.col("b_id"))
    scored = pairs.select(
        "a_id",
        "b_id",
        F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cos"),
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return (
        scored.withColumn("neighbor_rank", F.row_number().over(w).cast("long"))
        .where(F.col("neighbor_rank") <= k)
    )


def _hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed; MT19937 is
    version-stable in numpy)."""
    return np.random.RandomState(42).standard_normal((n_planes, dim))


def lsh_bucket_ids(
    emb: DataFrame, n_planes: int = 12, dim: int = 64, id_col: str = "vec_id"
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket id per vector: bit p =
    sign(v . plane_p), packed to one long. Arrow-batched pandas UDF (numpy
    matmul per batch; planes broadcast by closure)."""
    planes = _hyperplanes(n_planes, dim)

    @F.pandas_udf(LongType())
    def bucket(col: pd.Series) -> pd.Series:
        m = np.array(list(col), dtype=np.float64)
        bits = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return emb.select(id_col, "embedding", bucket("embedding").alias("bucket"))


def ann_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.6,
    n_planes: int = 12,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate near-neighbor pairs: bucket by hyperplane signs, pair
    only within buckets, verify exact cosine, threshold. The scale path for
    embedding-cosine near-dup detection."""
    bucketed = lsh_bucket_ids(emb, n_planes=n_planes, id_col=id_col)
    a = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("a_id"),
        to_double_array("embedding").alias("va"),
    )
    b = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("b_id"),
        to_double_array("embedding").alias("vb"),
    )
    pairs = a.join(b, on=["bucket"]).where(F.col("a_id") < F.col("b_id"))
    return (
        pairs.select(
            "a_id", "b_id", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .where(F.col("cos") >= threshold)
        .distinct()
    )
