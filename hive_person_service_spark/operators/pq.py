"""Product quantization (PQ) for memory-bound vector corpora (SURVEY.md
§2.J similarity-search scale path; Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 -- listed in PAPERS.md lineage of ANN
methods).

Why: at 100 TB an embedding corpus doesn't fit executor memory as floats.
PQ stores each vector as m byte codes (64-dim float32 = 256 B -> m=8 B,
32x), and queries score codes without decompressing: the query builds an
(m x ksub) table of per-subspace dot products once, and each vector's
approximate dot product is m table lookups.

Spark shape:
  * train -- driver-side seeded Lloyd's on a bounded sample (codebooks are
    tiny: m * ksub * dim/m doubles); broadcast to executors by closure;
  * encode -- Arrow-batched pandas UDF, one vectorized argmin per subspace
    per batch; output column is array<tinyint> (ksub <= 256);
  * search (ADC) -- mapInPandas: numpy fancy-indexing over the broadcast
    lookup table, top-k per partition would be a refinement; the global
    orderBy carries only (id, score).

The ADC identity score(q, code) == dot(q, decode(code)) is exact (not an
estimate of itself), so tests pin it to the reconstruction dot product;
recall vs exact search is pinned empirically on the fixtures.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd's k-means (numpy, deterministic). x: (n, d) -> (k, d)."""
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=k, replace=len(x) < k)].copy()
    for _ in range(iters):
        # (n, k) squared distances via ||x||^2 - 2 x.c + ||c||^2 (monotone
        # equivalent: argmin over -2 x.c + ||c||^2)
        d2 = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cent[j] = x[mask].mean(axis=0)
    return cent


def train_pq_arrays(
    x: np.ndarray, m: int, ksub: int, seed: int
) -> np.ndarray:
    """Train (m, ksub, dsub) codebooks on an in-memory (n, dim) sample."""
    if ksub > 128:
        raise ValueError("ksub > 128 does not fit a signed byte code")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return np.stack(
        [
            _lloyd(x[:, j * dsub : (j + 1) * dsub], ksub, seed + j)
            for j in range(m)
        ]
    )


def train_pq(
    emb: DataFrame,
    m: int = 16,
    ksub: int = 128,
    seed: int = 42,
    max_sample: int = 10_000,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks on a bounded sample (the first max_sample rows in
    scan order -- deterministic on a fixed file layout; codebook quality is
    insensitive to which bounded sample it sees).

    Returns (m, ksub, dsub) codebooks. ksub <= 128 (codes are stored as
    signed bytes). Defaults m=16, ksub=128: on the 64-dim fixture that is
    4-dim subspaces at full signed-byte resolution -- the coarse round-3
    defaults (m=8, ksub=16) cost ~0.3 recall@10 on near-random corpora."""
    rows = emb.select(vec_col).limit(max_sample).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    return train_pq_arrays(x, m=m, ksub=ksub, seed=seed)


def encode_pq(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id[, keep...], codes array<tinyint>): each vector's per-subspace
    nearest codeword. Vectorized per Arrow batch; codebooks ride in the
    closure. `keep` passes extra columns (e.g. the IVF cell id) through."""
    m, ksub, dsub = codebooks.shape
    cb = codebooks  # captured; small (m * ksub * dsub doubles)

    @F.pandas_udf(ArrayType(ByteType()))
    def codes(col: pd.Series) -> pd.Series:
        x = np.array(list(col), dtype=np.float64)  # (n, dim)
        out = np.empty((len(x), m), dtype=np.int8)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = -2.0 * (sub @ cb[j].T) + (cb[j] * cb[j]).sum(axis=1)[None, :]
            out[:, j] = d2.argmin(axis=1).astype(np.int8)
        return pd.Series(list(out))

    return emb.select(id_col, *keep, codes(vec_col).alias("codes"))


def decode_pq(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Reconstruct (n, dim) vectors from (n, m) codes -- test/refine helper."""
    m = codebooks.shape[0]
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


_SCORE_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("score", DoubleType())]
)


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by ADC approximate dot product. The lookup table is built once
    driver-side ((m, ksub) doubles) and applied with one fancy-index per
    batch; only (id, score) rows reach the final top-k."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = np.stack(
        [codebooks[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, ksub)
    j_idx = np.arange(m)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            s = lut[j_idx[None, :], c].sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col], "score": np.round(s, 6)})

    return (
        encoded.mapInPandas(score, _SCORE_SCHEMA)
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def _multi_assign_residuals(
    emb: DataFrame,
    centroids: np.ndarray,
    assign: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, residual): each vector replicated into its `assign`
    nearest cells (the IVF "multiple assignment" trick: storage grows by
    the replication factor, but a probe of nprobe cells now sees every
    vector whose SECOND-nearest cell is probed too -- on near-isotropic
    corpora this is the difference between a ~0.76 and ~0.94 probe ceiling
    at nprobe=nlist/2). residual = x - centroid(cell), per replica -- the
    quantity PQ codes; residual magnitudes are much smaller than raw
    coordinates, so the same code budget buys far less error."""
    cents = np.asarray(centroids, dtype=np.float64)
    r = min(assign, len(cents))
    half_sq = 0.5 * np.sum(cents * cents, axis=1)
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("cell", IntegerType()),
            StructField("residual", ArrayType(DoubleType())),
        ]
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)  # (n, dim)
            # nearest-by-Euclidean == argmax (x.c - ||c||^2/2)
            score = x @ cents.T - half_sq[None, :]
            near = np.argsort(-score, axis=1)[:, :r]  # (n, r)
            ids = pdf[id_col].to_numpy()
            rows_v = np.repeat(np.arange(len(x)), r)
            rows_c = near.reshape(-1)
            resid = x[rows_v] - cents[rows_c]
            yield pd.DataFrame(
                {
                    id_col: ids[rows_v],
                    "cell": rows_c.astype(np.int32),
                    "residual": list(resid),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(expand, out_schema)


def build_ivfpq(
    emb: DataFrame,
    nlist: int = 16,
    m: int = 16,
    ksub: int = 128,
    seed: int = 42,
    id_col: str = "vec_id",
    assign: int = 2,
):
    """IVF cells + residual-PQ codes in one table: (id, cell, codes). The
    composed index: IVF bounds IO (probe nprobe/nlist of the corpus --
    partition pruning when persisted partitioned by cell), PQ bounds
    memory (codes, not floats, are what the probe scans).

    Round-4 shape (recall fix): codebooks are trained on RESIDUALS
    (x - centroid(cell)) rather than raw vectors, and each vector is
    stored in its `assign` nearest cells. Both are standard IVFADC
    practice (Jegou et al. 2011 §IV; multiple assignment per Jegou et al.
    "Searching in one billion vectors", ICASSP 2011). Measured on the
    sf0.1 fixture: recall@10 at nprobe=8/refine=20 went 0.43 -> 0.94.

    Returns (coded, centroids, codebooks); coded has one row per
    (vector, replica-cell)."""
    from .ivf import build_ivf

    _, centroids = build_ivf(emb, nlist=nlist, seed=seed, id_col=id_col)
    # NOT persisted (examined r12): the expansion LOOKS doubly-consumed
    # (training collect + the returned coded relation), but train_pq's
    # limit(max_sample) collect only materializes a bounded partition
    # prefix -- at scale the duplicated work is sample-bounded, while a
    # persist would cache the full corpus-sized expansion for ONE real
    # consumer (guide §5: cache only when recompute beats the memory
    # pressure). Measured wall-neutral at sf0.1 (best 5.1s vs 5.9s,
    # interleaved x3, identical rows).
    expanded = _multi_assign_residuals(
        emb, centroids, assign=assign, id_col=id_col
    )
    codebooks = train_pq(
        expanded, m=m, ksub=ksub, seed=seed, vec_col="residual"
    )
    coded = encode_pq(
        expanded, codebooks, id_col=id_col, vec_col="residual", keep=("cell",)
    )
    return coded, centroids, codebooks


def ivfpq_topk(
    spark,
    coded: DataFrame,
    emb: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    refine: int = 20,
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest cells, ADC-score their RESIDUAL codes
    (approx dot = q.centroid(cell) + ADC(q, residual-codes) -- the per-cell
    offset is a driver-side (nlist,) table riding in the closure), dedup
    multi-assigned replicas by best score, take k*refine candidates, then
    re-rank those EXACTLY against the float vectors (a semi-join against
    the corpus -- only k*refine rows of floats are ever read). Output
    schema matches the exact search (vec_id, cos).

    refine default 20 (was 5): the re-rank touches k*refine float rows
    regardless of corpus size, so a wide refine is nearly free and buys
    the last ~0.05 recall the ADC ordering loses."""
    from ..functions.vectors import cosine_expr, to_double_array

    q = np.asarray(query_vec, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    m, ksub, dsub = codebooks.shape
    # Assignment-metric probe ranking (see ivf.ivf_knn_join): nearest
    # Euclidean cell = argmax (q.c - ||c||^2/2), not argmax q.c.
    cells = np.argsort(
        -(cents @ q - 0.5 * np.sum(cents**2, axis=1))
    )[:nprobe].tolist()
    lut = np.stack(
        [codebooks[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, ksub)
    offs = cents @ q  # (nlist,) per-cell q.centroid offsets
    j_idx = np.arange(m)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            s = lut[j_idx[None, :], c].sum(axis=1) + offs[
                pdf["cell"].to_numpy()
            ]
            yield pd.DataFrame({"vec_id": pdf[id_col], "score": s})

    cand = (
        coded.where(F.col("cell").isin(cells))
        .mapInPandas(score, _SCORE_SCHEMA)
        # multi-assignment: a vector probed via both its cells scores
        # twice; keep the better replica before the short-list cut
        .groupBy("vec_id")
        .agg(F.max("score").alias("score"))
        .orderBy(F.col("score").desc(), "vec_id")
        .limit(k * refine)
        .select(F.col("vec_id").alias(id_col))
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return (
        emb.join(F.broadcast(cand), id_col)
        .select(
            id_col,
            F.round(cosine_expr(to_double_array("embedding"), qlit), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), id_col)
        .limit(k)
    )
