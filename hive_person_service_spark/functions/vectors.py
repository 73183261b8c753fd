"""Vector helper expressions for the embeddings surface (SURVEY.md §2.J).

Embeddings are L2-normalized (FIXTURES.md) so cosine similarity == dot
product. Dot products run as built-in higher-order functions (zip_with +
aggregate) -- JVM-side, no Python -- in double precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so accumulation runs in f64."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_expr(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (== cosine for unit vectors):
    left-to-right fold, matching DuckDB list_dot_product ordering."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
