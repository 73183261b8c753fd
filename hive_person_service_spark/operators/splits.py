"""Deterministic train/val/test splitting for training-data pipelines.

randomSplit() depends on partitioning and re-shuffles between runs; a
hash-based split is reproducible row-for-row on any cluster, any
partitioning, any day -- the property that matters when the split decides
what a model never sees. Bucket = xxhash64(id, seed) mod 10_000.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_split(
    df: DataFrame, id_col: str, fractions: Mapping[str, float], seed: int = 42
) -> dict[str, DataFrame]:
    """Partition ``df`` into named, disjoint, exhaustive splits by hashing
    ``id_col``. Fractions must sum to 1 (±1e-9)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_BUCKETS))
    out: dict[str, DataFrame] = {}
    lo = 0
    names = list(fractions)
    for i, name in enumerate(names):
        hi = _BUCKETS if i == len(names) - 1 else lo + round(fractions[name] * _BUCKETS)
        out[name] = df.where((bucket >= lo) & (bucket < hi))
        lo = hi
    return out
