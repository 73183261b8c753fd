"""Two-phase global ranking primitives (the scale path for global
ORDER BY windows).

A partition-less ``Window.orderBy(...)`` funnels the whole relation
through ONE reduce task -- fine at thousands of rows, fatal at billions.
The classic distributed alternative is two-phase:

1. ``repartitionByRange(order)`` + ``sortWithinPartitions(order)`` gives a
   globally range-sorted layout (partition i holds keys entirely before
   partition i+1) -- one parallel shuffle, exactly what a distributed
   sort costs anyway.
2. ``monotonically_increasing_id()`` evaluated above that sort encodes
   ``(partition_id << 33) | local_row_index`` -- so the per-partition row
   number and the partition id come out of the sorted scan for FREE (no
   second shuffle, no Python).
3. Per-partition counts/sums are a tiny aggregate (one row per shuffle
   partition); the exclusive prefix over THAT bounded relation gives each
   partition its global offset. Spark's ReuseExchange dedupes the range
   shuffle between the main branch and the offsets branch, so the corpus
   is shuffled once.

Requirements: the order must be a TOTAL order (include a unique
tie-break column) -- ties that straddle a range boundary would otherwise
make the local index non-deterministic between the two branches.

The only partition-less window left after this transform runs over the
partition-sizes relation (<= spark.sql.shuffle.partitions rows --
metadata-sized at any corpus scale, same class as the vocab/hour-sized
windows documented in PLANS.md).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOCAL_MASK = (1 << 33) - 1

_PID = "__gr_pid"
_LRN = "__gr_lrn"


def _range_sorted_with_local_rank(
    df: DataFrame, order: Sequence[Column], num_partitions: int | None
) -> DataFrame:
    """Range-sort ``df`` on ``order`` and attach ``__gr_pid`` (shuffle
    partition id) and ``__gr_lrn`` (1-based row number inside the sorted
    partition), both decoded from one monotonically_increasing_id."""
    if num_partitions:
        d = df.repartitionByRange(num_partitions, *order)
    else:
        d = df.repartitionByRange(*order)
    d = d.sortWithinPartitions(*order)
    mid = F.monotonically_increasing_id()
    return (
        d.withColumn("__gr_mid", mid)
        .withColumn(_PID, F.shiftrightunsigned("__gr_mid", 33))
        .withColumn(
            _LRN, F.col("__gr_mid").bitwiseAND(F.lit(_LOCAL_MASK)) + F.lit(1)
        )
        .drop("__gr_mid")
    )


def with_global_row_number(
    df: DataFrame,
    order: Sequence[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row number under a total order, without a global
    window: local rank + broadcast per-partition count offsets."""
    d = _range_sorted_with_local_rank(df, order, num_partitions)
    sizes = d.groupBy(_PID).agg(F.count("*").alias("__gr_cnt"))
    off_w = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        _PID,
        F.coalesce(F.sum("__gr_cnt").over(off_w), F.lit(0)).alias("__gr_off"),
    )
    return (
        d.join(F.broadcast(offsets), _PID)
        .withColumn(out, (F.col("__gr_off") + F.col(_LRN)).cast("long"))
        .drop(_PID, _LRN, "__gr_off")
    )


def with_global_ntile(
    df: DataFrame,
    order: Sequence[Column],
    n: int,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``ntile(n) OVER (ORDER BY order)`` without a global
    window. ntile gives the FIRST ``N mod n`` buckets ``floor(N/n)+1``
    rows and the remaining buckets ``floor(N/n)``; from the global row
    number rn that is bucket ``ceil(rn/(q+1))`` while rn is inside the
    big buckets, else ``r + ceil((rn - r*(q+1))/q)`` (q = N div n,
    r = N mod n). Integer-valued doubles stay exact below 2^53, far
    beyond any row count.

    Both the per-partition offsets AND the grand total ride the ONE tiny
    sizes relation (no separate count branch): the input subtree appears
    exactly twice in the plan, so chaining/joining several ntiles grows
    the plan additively, not multiplicatively."""
    d = _range_sorted_with_local_rank(df, order, num_partitions)
    sizes = d.groupBy(_PID).agg(F.count("*").alias("__gr_cnt"))
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    tot_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = sizes.select(
        _PID,
        F.coalesce(F.sum("__gr_cnt").over(off_w), F.lit(0)).alias("__gr_off"),
        F.sum("__gr_cnt").over(tot_w).alias("__gr_n"),
    )
    joined = d.join(F.broadcast(offsets), _PID)
    rn = F.col("__gr_off") + F.col(_LRN)
    q = F.floor(F.col("__gr_n") / n)
    r = F.col("__gr_n") - q * n
    cut = r * (q + 1)
    bucket = F.when(rn <= cut, F.floor((rn + q) / (q + 1))).otherwise(
        r + F.ceil((rn - cut) / q)
    )
    return joined.withColumn(out, bucket.cast("long")).drop(
        _PID, _LRN, "__gr_off", "__gr_n"
    )


def with_grouped_row_number(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY group ORDER BY order)`` for the
    FEW-GROUPS x HUGE-GROUPS regime (a handful of sources/priorities/
    epochs over a fact table), where a plain partitioned window funnels
    each group through ONE task. Range-sorting on (group, order) makes
    group rows contiguous inside each shuffle partition, so the
    mono-id-decoded local rank restarts per group via ``lrn -
    min(lrn over the (pid, group) cell) + 1``, and the broadcast offsets
    relation is (partitions x groups)-sized -- metadata for few groups.
    With MANY small groups use a plain partitioned window instead (it is
    already parallel there and this offsets relation would grow)."""
    gcols = [F.col(g) for g in group]
    d = _range_sorted_with_local_rank(df, [*gcols, *order], num_partitions)
    sizes = d.groupBy(_PID, *group).agg(
        F.count("*").alias("__gr_cnt"), F.min(_LRN).alias("__gr_first")
    )
    off_w = (
        Window.partitionBy(*group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        _PID,
        *group,
        F.coalesce(F.sum("__gr_cnt").over(off_w), F.lit(0)).alias("__gr_off"),
        "__gr_first",
    )
    return (
        d.join(F.broadcast(offsets), [_PID, *group])
        .withColumn(
            out,
            (
                F.col("__gr_off") + F.col(_LRN) - F.col("__gr_first") + 1
            ).cast("long"),
        )
        .drop(_PID, _LRN, "__gr_off", "__gr_first")
    )


def with_grouped_ntile(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    n: int,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (PARTITION BY group ORDER BY order)`` for the
    few-groups x huge-groups regime (see with_grouped_row_number). Group
    totals ride the same tiny sizes relation as the offsets."""
    gcols = [F.col(g) for g in group]
    d = _range_sorted_with_local_rank(df, [*gcols, *order], num_partitions)
    sizes = d.groupBy(_PID, *group).agg(
        F.count("*").alias("__gr_cnt"), F.min(_LRN).alias("__gr_first")
    )
    off_w = (
        Window.partitionBy(*group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot_w = Window.partitionBy(*group).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = sizes.select(
        _PID,
        *group,
        F.coalesce(F.sum("__gr_cnt").over(off_w), F.lit(0)).alias("__gr_off"),
        F.sum("__gr_cnt").over(tot_w).alias("__gr_n"),
        "__gr_first",
    )
    joined = d.join(F.broadcast(offsets), [_PID, *group])
    rn = F.col("__gr_off") + F.col(_LRN) - F.col("__gr_first") + 1
    q = F.floor(F.col("__gr_n") / n)
    r = F.col("__gr_n") - q * n
    cut = r * (q + 1)
    bucket = F.when(rn <= cut, F.floor((rn + q) / (q + 1))).otherwise(
        r + F.ceil((rn - cut) / q)
    )
    return joined.withColumn(out, bucket.cast("long")).drop(
        _PID, _LRN, "__gr_off", "__gr_n", "__gr_first"
    )


def with_grouped_prefix_sum(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    value: str,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive ``SUM(value) OVER (PARTITION BY group ORDER BY order)``
    for the few-groups x huge-groups regime: in-partition running sum
    windowed by (shuffle partition, group) -- parallel across the range
    partitions -- plus broadcast exclusive prefix of the (partitions x
    groups)-sized per-cell totals."""
    gcols = [F.col(g) for g in group]
    d = _range_sorted_with_local_rank(df, [*gcols, *order], num_partitions)
    local_w = (
        Window.partitionBy(_PID, *group)
        .orderBy(_LRN)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("__gr_lcum", F.sum(value).over(local_w))
    sums = d.groupBy(_PID, *group).agg(F.sum(value).alias("__gr_psum"))
    off_w = (
        Window.partitionBy(*group)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        _PID,
        *group,
        F.coalesce(F.sum("__gr_psum").over(off_w), F.lit(0)).alias("__gr_off"),
    )
    return (
        d.join(F.broadcast(offsets), [_PID, *group])
        .withColumn(out, F.col("__gr_off") + F.col("__gr_lcum"))
        .drop(_PID, _LRN, "__gr_off", "__gr_lcum")
    )


def with_global_prefix_sum(
    df: DataFrame,
    order: Sequence[Column],
    value: str,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global inclusive running ``SUM(value) OVER (ORDER BY order)``
    without a global window: in-partition running sum (window PARTITIONED
    by the range-shuffle partition id -- parallel) + broadcast exclusive
    prefix of the tiny per-partition totals."""
    d = _range_sorted_with_local_rank(df, order, num_partitions)
    local_w = (
        Window.partitionBy(_PID)
        .orderBy(_LRN)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("__gr_lcum", F.sum(value).over(local_w))
    sums = d.groupBy(_PID).agg(F.sum(value).alias("__gr_psum"))
    off_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        _PID,
        F.coalesce(F.sum("__gr_psum").over(off_w), F.lit(0)).alias("__gr_off"),
    )
    return (
        d.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.col("__gr_off") + F.col("__gr_lcum"))
        .drop(_PID, _LRN, "__gr_off", "__gr_lcum")
    )
