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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: for each left row (uniquely identified by ``left_id``),
    ONE right row within the same ``on`` key(s), chosen by ``direction``:

      * ``backward`` (default): latest right with ``right_ts <= left_ts``;
      * ``forward``: earliest right with ``right_ts >= left_ts``;
      * ``nearest``: smallest ``|right_ts - left_ts|`` either side (tie
        between equal distances -> the earlier right row).

    Spark has no native ASOF JOIN; this composes a join + windowed pick.
    Remaining ties break on the largest ``tie_break`` (must be unique
    within the right side for determinism) -- matches DuckDB ASOF JOIN
    semantics (backward/forward) up to the explicit tie-break.

    ``tolerance_us`` bounds the match to within that many microseconds of
    the left timestamp (pandas ``merge_asof(tolerance=...)`` semantics):
    a right row further away is no match even if it is the nearest one.
    The bound is applied INSIDE the join condition, so it also caps the
    per-key fan-out -- at scale this turns the ``nearest`` direction's
    whole-key-group fan-out into a bounded time band.

    Scale: one shuffle of both sides on ``on`` for the join, one shuffle on
    ``left_id`` for the pick window. For huge right sides, pre-reduce
    right to the latest row per (key, coarse time bucket) first so the join
    fan-out stays bounded; AQE skew-join splits oversized key partitions.
    ``nearest`` without a tolerance has no time-side predicate, so its
    fan-out is the whole key group -- pre-bucket the right side or pass
    ``tolerance_us`` when keys are hot.
    """
    from pyspark.sql.types import TimestampType

    keys = [on] if isinstance(on, str) else list(on)

    def us(side: DataFrame, col: str):
        c = side[col]
        if isinstance(side.schema[col].dataType, TimestampType):
            return F.unix_micros(c)
        return c

    if direction == "backward":
        ts_cond = [right[right_ts] <= left[left_ts]]
        if tolerance_us is not None:
            ts_cond.append(
                us(right, right_ts) >= us(left, left_ts) - tolerance_us
            )
        order = [right[right_ts].desc(), right[tie_break].desc()]
    elif direction == "forward":
        ts_cond = [right[right_ts] >= left[left_ts]]
        if tolerance_us is not None:
            ts_cond.append(
                us(right, right_ts) <= us(left, left_ts) + tolerance_us
            )
        order = [right[right_ts].asc(), right[tie_break].desc()]
    elif direction == "nearest":
        ts_cond = []
        delta = F.abs(us(right, right_ts) - us(left, left_ts))
        if tolerance_us is not None:
            ts_cond.append(delta <= tolerance_us)
        order = [delta.asc(), right[right_ts].asc(), right[tie_break].desc()]
    else:
        raise ValueError(f"unknown asof direction: {direction!r}")
    joined = left.join(
        right,
        on=[left[k] == right[k] for k in keys] + ts_cond,
        how=how,
    )
    w = Window.partitionBy(left[left_id]).orderBy(*order)
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
