"""Slowly-changing-dimension type 2 (SCD2) for person/profile tables: every
attribute change closes the old row and opens a new one, so any historical
point-in-time view of a profile is a filter, not a reconstruction. This is
the core ETL pattern of a profile data service (the reference's domain is a
person service over Hive tables -- SURVEY.md §0) and of any training
pipeline that must reproduce "the corpus metadata as of run X".

History schema = business key + tracked attributes + `effective_from`
(timestamp), `effective_to` (timestamp, NULL while open), `is_current`
(boolean). All operators are pure DataFrame compositions: one shuffle per
step, keyed on the business key, no driver-side loops -- a 100 TB dimension
merges with the same plan shape as a 100 MB one (partition the history by a
key prefix and merge only touched partitions, same note as
maintenance.merge_upsert).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

META_COLS = ("effective_from", "effective_to", "is_current")


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Bootstrap a history table from a plain snapshot: every row opens at
    its `ts_col` and stays current."""
    return (
        snapshot.withColumn("effective_from", F.col(ts_col).cast("timestamp"))
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .drop(ts_col)
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Apply a batch of attribute updates (key + tracked values + change
    timestamp) to an SCD2 history. Semantics:

    - Consecutive no-change updates collapse: an update identical (on the
      tracked columns) to the key's previous update in the same batch, or --
      for the first update of a key -- to the key's open history row, is
      dropped. A profile "update" that changes nothing creates no version.
    - Each surviving update opens a version at its timestamp; a later update
      of the same key (in this or a later batch) closes it.
    - The previously-open history row of an updated key closes at the key's
      first surviving update timestamp.
    - Keys with no surviving update pass through untouched; unknown keys in
      `updates` are inserts.

    Assumes in-order feeds: update timestamps are strictly increasing per
    key and later than the key's open `effective_from` (enforceable upstream
    with dropDuplicatesWithinWatermark + the event-time ordering a
    watermarked stream provides; `scd2_validate` catches violations).

    Plan shape: two window passes and one left join, all partitioned by the
    business key -- a single shuffle key end-to-end, so the exchange is
    reused across the steps (visible in .explain as one Exchange feeding
    Sort/Window/Join)."""
    keys = list(key_cols)
    tracked = list(tracked_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))

    current = history.where(F.col("is_current"))
    closed = history.where(~F.col("is_current"))

    # 1. Collapse consecutive in-batch no-ops; compare the first update of
    #    each key against the open row's tracked values (null-safe: profile
    #    attributes may legitimately be NULL).
    open_vals = current.select(
        *keys,
        F.lit(True).alias("__open_exists"),
        *[F.col(c).alias(f"__cur_{c}") for c in tracked],
    )
    same_as_prev = F.lit(True)
    same_as_open = F.lit(True)
    for c in tracked:
        same_as_prev &= F.col(c).eqNullSafe(F.lag(c).over(w))
        same_as_open &= F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
    surviving = (
        updates.withColumn("__has_prev", F.lag(ts_col).over(w).isNotNull())
        .withColumn("__same_prev", same_as_prev)
        .join(open_vals, keys, "left")
        .where(
            F.when(F.col("__has_prev"), ~F.col("__same_prev")).otherwise(
                ~(F.coalesce(F.col("__open_exists"), F.lit(False)) & same_as_open)
            )
        )
        .select(*keys, *tracked, ts_col)
    )

    # 2. Surviving updates become versions; in-batch successor closes them.
    new_rows = (
        surviving.withColumn("effective_from", F.col(ts_col).cast("timestamp"))
        .withColumn(
            "effective_to", F.lead(ts_col).over(w).cast("timestamp")
        )
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop(ts_col)
    )

    # 3. Close the open row of every key that gained a version.
    first_ts = surviving.groupBy(*keys).agg(
        F.min(ts_col).cast("timestamp").alias("__close_at")
    )
    still_or_closed = (
        current.join(first_ts, keys, "left")
        .withColumn(
            "effective_to", F.coalesce(F.col("__close_at"), F.col("effective_to"))
        )
        .withColumn("is_current", F.col("__close_at").isNull())
        .drop("__close_at")
    )
    return closed.unionByName(still_or_closed).unionByName(new_rows)


def scd2_current(history: DataFrame) -> DataFrame:
    """The live dimension: one row per key."""
    return history.where(F.col("is_current")).drop(*META_COLS)


def scd2_as_of(history: DataFrame, ts: str) -> DataFrame:
    """Point-in-time snapshot: the version of each key that was effective at
    `ts` (half-open intervals [from, to)). A filter, not a window -- at scale
    this prunes on effective_from/effective_to min-max file stats."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("effective_from") <= t)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > t))
    ).drop(*META_COLS)


def scd2_validate(history: DataFrame, key_cols: Sequence[str]) -> dict[str, int]:
    """Invariant audit, one aggregation pass per rule. Returns violation
    counts (all zero for a well-formed history):
    - open_per_key: keys with != 1 open row
    - bad_interval: rows with effective_to <= effective_from
    - overlap_or_gap: consecutive versions of a key where the earlier row's
      effective_to != the later row's effective_from
    - flag_mismatch: is_current disagreeing with effective_to IS NULL
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy("effective_from")
    open_per_key = (
        history.groupBy(*keys)
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .where(F.col("n_open") != 1)
        .count()
    )
    bad_interval = history.where(
        F.col("effective_to").isNotNull()
        & (F.col("effective_to") <= F.col("effective_from"))
    ).count()
    overlap_or_gap = (
        history.withColumn("__next_from", F.lead("effective_from").over(w))
        .where(
            F.col("__next_from").isNotNull()
            & ~F.col("effective_to").eqNullSafe(F.col("__next_from"))
        )
        .count()
    )
    flag_mismatch = history.where(
        F.col("is_current") != F.col("effective_to").isNull()
    ).count()
    return {
        "open_per_key": open_per_key,
        "bad_interval": bad_interval,
        "overlap_or_gap": overlap_or_gap,
        "flag_mismatch": flag_mismatch,
    }
