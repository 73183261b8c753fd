"""Text helper expressions -- all built-in higher-order functions (JVM-side,
no Python UDFs in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization (fixture texts are single-space separated)."""
    return F.split(F.col(text_col), " ")


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array.

    ``transform(sequence(1, size-n+1), i -> concat_ws(' ', slice(tokens, i, n)))``
    -- guarded to an empty array when the document has fewer than n tokens
    (Spark's ``sequence(1, 0)`` would count *down*, not produce empty).
    """
    seq = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    sh = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(F.size(tokens) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )
