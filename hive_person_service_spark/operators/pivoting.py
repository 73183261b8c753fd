"""Dynamic pivot: pivot on values discovered at runtime.

Spark's ``pivot(col)`` without explicit values already does a distinct
scan under the hood but caps at ``spark.sql.pivotMaxValues`` and gives no
control over ordering. This wraps the two-phase pattern explicitly:
distinct-scan -> sorted, bounded value list -> enumerated pivot, so the
output column order is deterministic and the blow-up is guarded.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_dynamic(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    agg_col: str,
    agg: str = "sum",
    max_values: int = 200,
    fill: float | int | None = 0,
) -> DataFrame:
    """groupBy(group_cols).pivot(pivot_col, <discovered>).agg(agg(agg_col)).

    The distinct value scan is the price of not knowing the domain -- one
    extra job over one column (cheap: column-pruned scan + partial
    distinct). Raises if the domain exceeds ``max_values`` (a pivot that
    wide is a modeling bug, not a query)."""
    vals = [
        r[0]
        for r in df.select(pivot_col).distinct().limit(max_values + 1).collect()
    ]
    if len(vals) > max_values:
        raise ValueError(
            f"pivot domain exceeds max_values={max_values}; refusing to "
            f"create that many columns"
        )
    vals = sorted(v for v in vals if v is not None)
    agg_expr = getattr(F, agg)(agg_col)
    out = df.groupBy(*group_cols).pivot(pivot_col, vals).agg(agg_expr)
    if fill is not None:
        out = out.fillna(fill, subset=[str(v) for v in vals])
    return out
