"""Entity-resolution primitives for person records: Jaro-Winkler string
similarity as an Arrow-batched pandas UDF.

The scorer is the exact textbook Jaro-Winkler (match window
max(|a|,|b|)/2 - 1, transpositions halved, Winkler prefix boost p=0.1 on
up to 4 leading characters, boost applied only when jaro > 0.7, empty
strings score 0.0) -- differential-tested bit-for-bit against DuckDB's
native ``jaro_winkler_similarity`` over random strings
(tests/test_linkage.py), which is what lets queries built on it be
fully oracle-checked rather than rows-only.

Scale shape: the scorer is a per-pair scalar inside one Arrow batch --
no state, no shuffle of its own. The expensive part of entity resolution
is CANDIDATE GENERATION, which stays relational (blocking keys as
equi-join columns) so only same-block pairs ever reach Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost: float = 0.7) -> float:
    """Pure-Python Jaro-Winkler, semantics pinned to DuckDB's builtin."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        j = 1.0
    else:
        match_dist = max(len1, len2) // 2 - 1
        m1 = [False] * len1
        m2 = [False] * len2
        matches = 0
        for i, c in enumerate(s1):
            lo = max(0, i - match_dist)
            hi = min(len2, i + match_dist + 1)
            for jx in range(lo, hi):
                if not m2[jx] and s2[jx] == c:
                    m1[i] = True
                    m2[jx] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(len1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        j = (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0
    if j <= boost:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched pairwise Jaro-Winkler over two string columns."""
    return pd.Series(
        [
            jaro_winkler(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )
