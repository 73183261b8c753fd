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


#: Bound on the rows either side of one block-pair group materializes in
#: an executor task. At 64 float64 dims this is ~50 MB of matrix per
#: side -- well inside executor memory.
DEFAULT_TILE_ROWS = 100_000

_STRIPE_TAG = 0
_TILE_TAG = 1

#: Corpus row counts keyed by the analyzed plan's semantic hash PLUS the
#: identity (path, mtime_ns, size) of the backing files -- a fixture
#: regenerated in place at the same path (known driver behavior; see
#: loader._events_ts_kind, which is keyed the same way) must not reuse a
#: stale N: if the data GREW, tiles sized from the old count could exceed
#: max_tile_rows and blow task memory. The count only SIZES the tiling
#: (any P/T give exact results -- pinned by
#: test_tiled_blockwise_matches_single_tile), so residual staleness from
#: an unstat-able source costs at most tile granularity, never answers.
_COUNT_CACHE: dict[tuple, int] = {}


def _file_identity(df: DataFrame) -> tuple:
    """Best-effort (path, mtime_ns, size) fingerprint of the plan's input
    files (empty for non-file-backed plans, e.g. in-memory relations)."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return ()
    ident = []
    for f in sorted(files)[:64]:  # bounded stat cost on many-file layouts
        p = urlparse(f).path or f
        try:
            st = os.stat(p)
            ident.append((p, st.st_mtime_ns, st.st_size))
        except OSError:
            ident.append((p, -1, -1))
    return tuple(ident)


def _cached_count(df: DataFrame) -> int:
    try:
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            _file_identity(df),
        )
    except Exception:
        return df.count()
    if key not in _COUNT_CACHE:
        if len(_COUNT_CACHE) > 256:
            _COUNT_CACHE.clear()
        _COUNT_CACHE[key] = df.count()
    return _COUNT_CACHE[key]


def _block_pair_groups(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str,
    max_tile_rows: int,
) -> DataFrame:
    """Pair every row-stripe with every tile ENTIRELY executor-side.

    Rows are hash-assigned a stripe id ``p`` (>= cluster parallelism, so
    the matmuls parallelize) and a tile id ``t`` (sized so one tile fits
    in task memory). The stripe copy is replicated across all T tiles and
    the tile copy across all P stripes via ``explode(sequence(...))``, so
    a ``groupBy(p, t)`` shuffle co-locates each (stripe, tile) block pair
    in one task: the shuffle carries N*(P+T) rows -- the same volume the
    broadcast formulation ships executor-to-executor -- but NO corpus
    bytes ever transit the driver (the collect()-and-broadcast loop this
    replaces streamed the whole corpus through one JVM sequentially).
    Every unordered pair (a < b) meets in exactly one group -- (p(a),
    t(b)) with a in the stripe role -- so downstream masking on a < b
    keeps the union exact with no dedup pass.
    """
    n = _cached_count(emb)
    n_tiles = max(1, math.ceil(n / max_tile_rows))
    par = spark.sparkContext.defaultParallelism
    # Stripes: enough for full parallelism at scale, but no more than one
    # per ~256 rows -- a tiny corpus split across `par` Python tasks pays
    # more in per-task round-trips than the matmuls cost.
    n_stripes = max(n_tiles, min(par, math.ceil(n / 256)) or 1)
    sel = emb.select(id_col, "embedding")
    hashed = F.xxhash64(F.col(id_col))
    stripes = sel.select(
        F.lit(_STRIPE_TAG).alias("__role"),
        F.pmod(hashed, F.lit(n_stripes)).alias("__p"),
        F.explode(F.sequence(F.lit(0), F.lit(n_tiles - 1))).alias("__t"),
        F.col(id_col),
        "embedding",
    )
    tiles = sel.select(
        F.lit(_TILE_TAG).alias("__role"),
        F.explode(F.sequence(F.lit(0), F.lit(n_stripes - 1))).alias("__p"),
        F.pmod(hashed, F.lit(n_tiles)).alias("__t"),
        F.col(id_col),
        "embedding",
    )
    # Pre-partition on the exact group key with exactly P*T partitions:
    # the groupBy's required HashPartitioning is already satisfied, so no
    # second exchange, and no empty reduce tasks when P*T is far below
    # spark.sql.shuffle.partitions (the tiny-corpus case).
    return stripes.unionAll(tiles).repartition(
        n_stripes * n_tiles, "__p", "__t"
    )


def _split_roles(pdf: pd.DataFrame, id_col: str):
    stripe = pdf[pdf["__role"] == _STRIPE_TAG]
    tile = pdf[pdf["__role"] == _TILE_TAG]
    if stripe.empty or tile.empty:
        return None
    a_ids = stripe[id_col].to_numpy(dtype=np.int64)
    a_mat = np.array(list(stripe["embedding"]), dtype=np.float64)
    b_ids = tile[id_col].to_numpy(dtype=np.int64)
    b_mat = np.array(list(tile["embedding"]), dtype=np.float64)
    return a_ids, a_mat, b_ids, b_mat


def exact_topk_pairs_blockwise(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    max_tile_rows: int = DEFAULT_TILE_ROWS,
) -> DataFrame:
    """Global top-k most-similar pairs (a < b) -- blockwise exact.

    Block-pair equi-join regime (see _block_pair_groups): each (stripe,
    tile) group does ONE numpy matmul in its own task and emits only its
    local top-k, so the post-matmul shuffle carries P * T * k rows, never
    N^2, and nothing routes through the driver. The global top-k is the
    top-k of the union of per-group top-ks (every true pair lives in
    exactly one group), so blocking is exact, not approximate.
    """
    grouped = _block_pair_groups(spark, emb, id_col, max_tile_rows)

    def topk_block(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = _split_roles(pdf, id_col)
        if parts is None:
            return pd.DataFrame(
                {
                    "a_id": pd.Series([], dtype="int64"),
                    "b_id": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        a_ids, a_mat, b_ids, b_mat = parts
        sims = a_mat @ b_mat.T  # (stripe_n, tile_n)
        # keep a < b only: mask columns with id <= row id
        mask = b_ids[None, :] <= a_ids[:, None]
        sims[mask] = -np.inf
        flat = sims.ravel()
        take = min(k, flat.size)
        idx = np.argpartition(flat, -take)[-take:]
        r, c = np.unravel_index(idx, sims.shape)
        out = pd.DataFrame(
            {"a_id": a_ids[r], "b_id": b_ids[c], "cos": flat[idx]}
        )
        return out[np.isfinite(out["cos"])]

    local = grouped.groupBy("__p", "__t").applyInPandas(topk_block, _PAIR_SCHEMA)
    return local.orderBy(F.col("cos").desc(), "a_id", "b_id").limit(k)


def cosine_pairs_blockwise(
    spark: SparkSession,
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    max_tile_rows: int = DEFAULT_TILE_ROWS,
) -> DataFrame:
    """All pairs (a < b) with round(cos, 6) >= threshold -- blockwise exact.

    Same block-pair equi-join regime as exact_topk_pairs_blockwise: one
    numpy matmul per (stripe, tile) group, so the N^2 dot products never
    materialize as rows -- only the (sparse) pairs above threshold are
    emitted, and no corpus bytes transit the driver. Each qualifying pair
    (a, b) is emitted by exactly one group, so the union is the exact
    answer with no dedup pass. Replaces the non-equi-join formulation,
    whose zip_with/aggregate expression is evaluated per pair (~50x
    slower). Past the all-pairs-of-blocks regime (P * T matmuls), drop to
    the LSH tier (ann_pairs_lsh).
    """
    grouped = _block_pair_groups(spark, emb, id_col, max_tile_rows)

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        parts = _split_roles(pdf, id_col)
        if parts is None:
            return pd.DataFrame(
                {
                    "a_id": pd.Series([], dtype="int64"),
                    "b_id": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        a_ids, a_mat, b_ids, b_mat = parts
        sims = np.round(a_mat @ b_mat.T, 6)
        keep = (sims >= threshold) & (b_ids[None, :] > a_ids[:, None])
        r, c = np.nonzero(keep)
        return pd.DataFrame(
            {"a_id": a_ids[r], "b_id": b_ids[c], "cos": sims[r, c]}
        )

    return grouped.groupBy("__p", "__t").applyInPandas(block_pairs, _PAIR_SCHEMA)


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
