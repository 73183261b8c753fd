"""Maximal Marginal Relevance (MMR) diversified retrieval — the standard
rerank between a dense retriever and a context window: select k items
maximizing ``lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)``, so
near-duplicate hits don't crowd out coverage (Carbonell & Goldstein '98).

Scale shape: the DISTRIBUTED stage is the existing top-``pool``
retrieval (broadcast query, JVM dot products, TakeOrderedAndProject);
the greedy rerank then runs on the POOL ONLY — k iterations over at most
``pool`` candidates, driver-side numpy bounded by the pool parameter,
never the corpus. This is the same scan-vs-rerank split every production
retrieval stack uses; at 100 TB the pool is still 50 rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mmr_select(
    rel: np.ndarray, sims: np.ndarray, k: int, lam: float
) -> list[int]:
    """Greedy MMR over a candidate pool: ``rel`` (n,) relevance to the
    query, ``sims`` (n, n) pairwise similarity. Returns selected indexes
    in pick order; ties break toward the lower index (deterministic)."""
    n = len(rel)
    k = min(k, n)
    selected: list[int] = []
    max_sim = np.full(n, -np.inf)
    remaining = np.ones(n, dtype=bool)
    for _ in range(k):
        penalty = np.where(np.isfinite(max_sim), max_sim, 0.0)
        score = lam * rel - (1.0 - lam) * penalty
        score[~remaining] = -np.inf
        best = int(np.argmax(score))  # argmax takes the FIRST max: low idx
        selected.append(best)
        remaining[best] = False
        max_sim = np.maximum(max_sim, sims[:, best])
    return selected


def mmr_topk(
    spark: SparkSession,
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Diversified top-k for one query vector: distributed top-``pool``
    cosine retrieval, then greedy MMR on the pool. ``emb`` needs
    (vec_id, embedding). Returns (rank, vec_id, rel, mmr_score); with
    ``lam=1`` this reduces EXACTLY to the plain cosine top-k (the
    pytest-pinned identity)."""
    from ..functions.vectors import cosine_expr, to_double_array

    q = emb.where(F.col("vec_id") == query_vec_id).select(
        to_double_array("embedding").alias("qv")
    )
    pool_rows = (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            to_double_array("embedding").alias("v"),
            F.round(
                cosine_expr(to_double_array("embedding"), F.col("qv")), 6
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(pool)
        .collect()  # bounded by `pool`, never corpus size
    )
    ids = [r.vec_id for r in pool_rows]
    rel = np.array([r.rel for r in pool_rows], dtype=np.float64)
    vecs = np.array([r.v for r in pool_rows], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    sims = np.round(unit @ unit.T, 6)
    picks = mmr_select(rel, sims, k, lam)
    out = []
    max_sim = np.full(len(ids), -np.inf)
    for rank, idx in enumerate(picks, start=1):
        pen = 0.0 if not np.isfinite(max_sim[idx]) else float(max_sim[idx])
        out.append(
            (
                rank,
                int(ids[idx]),
                float(rel[idx]),
                round(lam * float(rel[idx]) - (1 - lam) * pen, 6),
            )
        )
        max_sim = np.maximum(max_sim, sims[:, idx])
    return spark.createDataFrame(
        out, "rank int, vec_id long, rel double, mmr_score double"
    )
