"""Composite join operators Spark SQL lacks natively (SURVEY.md §2.C).

These are library-level compositions over the DataFrame API -- no custom
Catalyst rules (SURVEY.md §4: zero needed). Each states its 100 TB shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_id: str,
    left_ts: str,
    right_ts: str,
    tie_break: str,
    how: str = "left",
) -> DataFrame:
    """As-of join: for each left row (uniquely identified by ``left_id``),
    the single latest right row with ``right_ts <= left_ts`` within the same
    ``on`` key(s).

    Spark has no native ASOF JOIN; this composes left-join + windowed
    latest-pick. Ties on ``right_ts`` break on the largest ``tie_break``
    (must be unique within the right side for determinism) -- matches DuckDB
    ASOF JOIN semantics up to the explicit tie-break.

    Scale: one shuffle of both sides on ``on`` for the join, one shuffle on
    ``left_id`` for the latest-pick window. For huge right sides, pre-reduce
    right to the latest row per (key, coarse time bucket) first so the join
    fan-out stays bounded; AQE skew-join splits oversized key partitions.
    """
    keys = [on] if isinstance(on, str) else list(on)
    joined = left.join(
        right,
        on=[left[k] == right[k] for k in keys] + [right[right_ts] <= left[left_ts]],
        how=how,
    )
    # One row per left row: latest right_ts, then largest tie_break.
    w = Window.partitionBy(left[left_id]).orderBy(
        right[right_ts].desc(), right[tie_break].desc()
    )
    ranked = joined.withColumn("__rn", F.row_number().over(w))
    return ranked.where(F.col("__rn") == 1).drop("__rn")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    cond: Column,
) -> DataFrame:
    """Range/interval join: equi-keys ``on`` plus a non-equi range ``cond``.

    Spark plans this as SMJ/SHJ on the equi keys with the range condition as
    a post-join filter -- the right shape at scale (never a nested loop when
    an equi component exists). Callers with no equi key should bucket the
    time dimension first (add a coarse time-bucket equi key on both sides).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return left.join(right, on=[left[k] == right[k] for k in keys] + [cond], how="inner")


def topk_per_group(
    df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int
) -> DataFrame:
    """Top-k rows per group via ranking window; ``order_by`` must be
    deterministic (include a unique tie-break column).

    Scale: single shuffle on the partition keys; Spark applies a rank-limit
    pushdown (WindowGroupLimit) so each partition keeps only k rows before
    the final filter.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k).drop(
        "__rn"
    )
