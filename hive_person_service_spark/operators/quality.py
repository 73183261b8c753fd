"""Data-quality gates for 100 TB ingest (expectation checks): each check
returns the VIOLATION rows as a DataFrame (empty == pass) so callers can
count, sample, quarantine, or fail the pipeline -- never a driver-side
boolean that hides the evidence.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_unique_key(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Rows whose key occurs more than once (all duplicate occurrences)."""
    keys = list(key_cols)
    dupes = df.groupBy(*keys).agg(F.count("*").alias("__n")).where(F.col("__n") > 1)
    return df.join(dupes.select(*keys), keys, "left_semi")


def check_non_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows with a NULL in any of the given columns."""
    cond = None
    for c in cols:
        clause = F.col(c).isNull()
        cond = clause if cond is None else (cond | clause)
    return df.where(cond)


def check_in_range(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """Rows where col falls outside [lo, hi] (NULLs excluded -- use
    check_non_null for those)."""
    return df.where(F.col(col).isNotNull() & ~F.col(col).between(lo, hi))


def check_referential_integrity(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose FK has no parent (anti join -- one shuffle, or none
    when the parent broadcast-fits)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )


def profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass column profile: nulls, distincts (approx), min/max --
    the cheap scan you run before trusting a new 100 TB drop."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    return df.agg(*aggs)
