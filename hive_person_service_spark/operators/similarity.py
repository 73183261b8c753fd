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

import math
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


#: Bound on the rows the driver materializes per broadcast tile. At 64
#: float64 dims this is ~50 MB of matrix per tile -- well inside both the
#: driver heap and the executor-side broadcast budget.
DEFAULT_TILE_ROWS = 100_000


def _broadcast_tiles(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str,
    max_tile_rows: int,
):
    """Yield ``(b_ids, b_mat)`` broadcast handles covering ``emb`` in tiles
    of at most ~``max_tile_rows`` rows each.

    The driver only ever holds ONE tile's rows at a time (the previous
    tile's local copy is garbage-collected once its broadcast is shipped),
    so the driver's peak footprint is O(tile), not O(N) -- the full-table
    ``collect()`` this replaces was the canonical 100x-scale killer. Tiles
    are assigned by ``pmod(xxhash64(id), n_tiles)``, so sizes are even in
    expectation (hash-uniform ids), not strictly bounded.
    """
    n = emb.count()
    n_tiles = max(1, math.ceil(n / max_tile_rows))
    sel = emb.select(id_col, "embedding")
    if n_tiles == 1:
        rows = sel.collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        del rows
        yield spark.sparkContext.broadcast(ids), spark.sparkContext.broadcast(mat)
        return
    keyed = sel.withColumn(
        "__tile", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_tiles))
    ).persist()
    try:
        for t in range(n_tiles):
            rows = keyed.where(F.col("__tile") == t).drop("__tile").collect()
            if not rows:
                continue
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            mat = np.array([r[1] for r in rows], dtype=np.float64)
            del rows
            yield (
                spark.sparkContext.broadcast(ids),
                spark.sparkContext.broadcast(mat),
            )
    finally:
        keyed.unpersist()


def exact_topk_pairs_blockwise(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    max_tile_rows: int = DEFAULT_TILE_ROWS,
) -> DataFrame:
    """Global top-k most-similar pairs (a < b) -- blockwise exact.

    The corpus matrix is broadcast in bounded tiles (``max_tile_rows`` rows
    each; one tile fits executor memory regardless of N); each partition
    multiplies its row-stripe against the tile with one numpy matmul and
    emits only its local top-k, so the shuffle carries
    partitions * tiles * k rows, never N^2. The global top-k is the top-k of
    the union of per-tile top-ks (every true pair lives in exactly the tile
    holding its b side), so tiling is exact, not approximate.
    """
    sel = emb.select(id_col, "embedding")
    per_tile = []
    for b_ids, b_mat in _broadcast_tiles(spark, emb, id_col, max_tile_rows):

        def topk_block(
            batches: Iterator[pd.DataFrame], b_ids=b_ids, b_mat=b_mat
        ) -> Iterator[pd.DataFrame]:
            tile_ids, tile_mat = b_ids.value, b_mat.value
            for pdf in batches:
                if pdf.empty:
                    continue
                block_ids = pdf[id_col].to_numpy(dtype=np.int64)
                block = np.array(list(pdf["embedding"]), dtype=np.float64)
                sims = block @ tile_mat.T  # (rows_in_block, tile_n)
                # keep a < b only: mask columns with id <= row id
                mask = tile_ids[None, :] <= block_ids[:, None]
                sims[mask] = -np.inf
                flat = sims.ravel()
                take = min(k, flat.size)
                idx = np.argpartition(flat, -take)[-take:]
                r, c = np.unravel_index(idx, sims.shape)
                out = pd.DataFrame(
                    {
                        "a_id": block_ids[r],
                        "b_id": tile_ids[c],
                        "cos": flat[idx],
                    }
                )
                yield out[np.isfinite(out["cos"])]

        per_tile.append(sel.mapInPandas(topk_block, _PAIR_SCHEMA))
    local = per_tile[0]
    for t in per_tile[1:]:
        local = local.unionAll(t)
    return local.orderBy(F.col("cos").desc(), "a_id", "b_id").limit(k)


def cosine_pairs_blockwise(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    max_tile_rows: int = DEFAULT_TILE_ROWS,
) -> DataFrame:
    """All pairs (a < b) with round(cos, 6) >= threshold -- blockwise exact.

    Same tiling regime as exact_topk_pairs_blockwise: the corpus matrix is
    broadcast in bounded tiles and each partition does one numpy matmul per
    (row-stripe, tile), so the N^2 dot products never materialize as rows --
    only the (sparse) pairs above threshold are emitted. Each qualifying
    pair (a, b) is emitted by exactly one tile (the one holding b), so the
    tile union is the exact answer with no dedup pass. Replaces the
    non-equi-join formulation, whose zip_with/aggregate expression is
    evaluated per pair (~50x slower). Past the all-tiles-resident regime
    (N * stripes worth of matmuls), drop to the LSH tier (ann_pairs_lsh).
    """
    sel = emb.select(id_col, "embedding")
    per_tile = []
    for b_ids, b_mat in _broadcast_tiles(spark, emb, id_col, max_tile_rows):

        def block_pairs(
            batches: Iterator[pd.DataFrame], b_ids=b_ids, b_mat=b_mat
        ) -> Iterator[pd.DataFrame]:
            tile_ids, tile_mat = b_ids.value, b_mat.value
            for pdf in batches:
                if pdf.empty:
                    continue
                block_ids = pdf[id_col].to_numpy(dtype=np.int64)
                block = np.array(list(pdf["embedding"]), dtype=np.float64)
                sims = np.round(block @ tile_mat.T, 6)
                keep = (sims >= threshold) & (
                    tile_ids[None, :] > block_ids[:, None]
                )
                r, c = np.nonzero(keep)
                yield pd.DataFrame(
                    {"a_id": block_ids[r], "b_id": tile_ids[c], "cos": sims[r, c]}
                )

        per_tile.append(sel.mapInPandas(block_pairs, _PAIR_SCHEMA))
    out = per_tile[0]
    for t in per_tile[1:]:
        out = out.unionAll(t)
    return out


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
