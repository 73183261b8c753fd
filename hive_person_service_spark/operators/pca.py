"""Matrix-free distributed PCA (power iteration) over an embedding column.

The 100 TB shape: the D x D covariance never materializes. One power step
is  v <- normalize( sum_x  x * (x . v) )  -- a per-row dot product against
the broadcast direction (JVM-side zip_with/aggregate), a posexplode, and a
D-group partial-aggregated sum. The driver's state is D floats; iteration
count is small (power iteration converges geometrically in the eigengap).
pyspark.ml's PCA computes the exact same quantity via a Gram-matrix
RowMatrix path; this version exists to keep the engine dependency-light
and the aggregation shape explicit/auditable.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import to_double_array


def _dot_expr(vec_col, v: np.ndarray):
    vlit = F.array(*[F.lit(float(x)) for x in v])
    return F.aggregate(
        F.zip_with(vec_col, vlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def power_iteration_pc1(
    emb: DataFrame, dim: int = 64, iters: int = 6, vec_col: str = "embedding"
) -> np.ndarray:
    """First principal direction (unnormalized data assumed centered-enough;
    fixture embeddings are mean~0 on the sphere). Deterministic: fixed
    uniform seed vector, fixed iteration count. Convergence is geometric
    in the eigengap (λ2/λ1)^k -- near-spherical data (the fixture:
    λ2/λ1 ≈ 0.93) needs more iterations for the exact direction but
    captures most of the top variance immediately (pytest pins both
    regimes); raise ``iters`` when the corpus is known near-isotropic."""
    x = to_double_array(vec_col)
    v = np.full(dim, 1.0 / math.sqrt(dim))
    for _ in range(iters):
        comp = (
            emb.select(x.alias("x"), _dot_expr(x, v).alias("d"))
            .select(
                F.posexplode(
                    F.transform("x", lambda xi: xi * F.col("d"))
                ).alias("pos", "c")
            )
            .groupBy("pos")
            .agg(F.sum("c").alias("s"))
            .collect()
        )
        nxt = np.zeros(dim)
        for r in comp:
            nxt[r["pos"]] = r["s"]
        norm = float(np.linalg.norm(nxt))
        if norm == 0.0:
            break
        v = nxt / norm
    # Sign convention: make the largest-|component| coordinate positive so
    # the direction is reproducible (eigenvectors are sign-ambiguous).
    lead = int(np.argmax(np.abs(v)))
    if v[lead] < 0:
        v = -v
    return v


def pc1_projections(
    emb: DataFrame, dim: int = 64, iters: int = 6, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pc1) -- every row's projection onto the power-iteration PC1."""
    v = power_iteration_pc1(emb, dim=dim, iters=iters, vec_col=vec_col)
    return emb.select(
        id_col,
        F.round(_dot_expr(to_double_array(vec_col), v), 6).alias("pc1"),
    )
