"""Explicit Bloom-filter runtime row pruning for joins.

Spark's own runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter.
enabled`, exercised in tests/test_stream_quality_bloom.py) injects a
`bloom_filter_agg` / `might_contain` pair automatically, but only when its
size heuristics fire and only inside one query plan. This operator makes
the same pattern an explicit, reusable library step for the cases the
optimizer can't see: a dimension too large to broadcast-hash-join (a hash
table needs ~32 bytes/key; a bloom needs ~10 BITS/key, so 1e9 keys fit in
~1.2 GB — broadcastable where the hash relation is not), or a filter built
once and reused across many downstream queries (the classic runtime-filter
amortization a 100 TB pipeline wants).

Build is fully distributed: each partition of the key column folds its
keys into a local bit array inside `mapInPandas` (Arrow-batched numpy, no
Python-per-row), and the driver ORs the per-partition arrays two-at-a-time
from `toLocalIterator` — driver peak memory is two filters, never the
keys. Probe is an Arrow-batched pandas UDF doing k vectorized
splitmix64-derived bit tests. The filter is PROBABILISTIC (false positives
only), so callers always compose it with the exact join afterwards; the
bloom's job is to drop most non-matching rows BEFORE the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SALT = np.uint64(0x6A09E667F3BCC909)  # second-hash tweak (sqrt(2) bits)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (wrapping arithmetic)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing: pos_i = h1 + i*h2 (mod m)."""
    v = keys.astype(np.int64).astype(np.uint64)
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ _SALT) | np.uint64(1)  # odd => full-period stride
    idx = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    return (h1 + idx * h2) % np.uint64(m_bits)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(
        bits,
        (flat >> np.uint64(3)).astype(np.int64),
        (np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8)),
    )


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5) -> bytes:
    """Distributed Bloom build over an integer key column.

    Returns the packed bit array (m_bits/8 bytes). Each input partition
    contributes one partial filter; the driver only ever holds the
    accumulator plus one incoming partial.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def fold(batches):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            vals = pdf[key_col].dropna().to_numpy()
            if len(vals):
                _set_bits(bits, _positions(vals, m_bits, k))
                seen = True
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    partials = df.select(key_col).mapInPandas(fold, "bits binary")
    for row in partials.toLocalIterator():
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc.tobytes()


def bloom_might_contain(bits: bytes, m_bits: int, k: int):
    """Arrow-batched membership probe: Column -> boolean Column factory."""
    barr = np.frombuffer(bits, dtype=np.uint8)

    @pandas_udf("boolean")
    def might(s: pd.Series) -> pd.Series:
        # NULL keys arrive as NaN in a float64 series; casting NaN to int64
        # is undefined, so probe only the non-null values and report False
        # for the rest (a NULL key can never equi-join, so False is exact).
        valid = s.notna().to_numpy()
        ok = np.zeros(len(s), dtype=bool)
        if valid.any():
            vals = s.to_numpy()[valid]
            pos = _positions(vals, m_bits, k)
            hit = np.ones(len(vals), dtype=bool)
            for i in range(k):
                p = pos[i]
                hit &= (
                    barr[(p >> np.uint64(3)).astype(np.int64)]
                    >> (p & np.uint64(7)).astype(np.uint8)
                ) & 1 == 1
            ok[valid] = hit
        return pd.Series(ok)

    return might


def bloom_prefiltered_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Exact left-semi join with a Bloom prefilter on the fact side.

    The bloom drops (most) fact rows whose key cannot match before the
    shuffle; the semi join then removes the false positives, so the result
    is exactly ``fact LEFT SEMI JOIN dim`` regardless of filter quality.
    """
    bits = bloom_build(dim, dim_key, m_bits, k)
    might = bloom_might_contain(bits, m_bits, k)
    pre = fact.where(might(F.col(fact_key)))
    return pre.join(dim, pre[fact_key] == dim[dim_key], "left_semi")
