"""Round-9 lake surfaces: table metadata/history as QUERYABLE relations.

Every open-table format publishes its own history as a table --
``DESCRIBE HISTORY`` (Delta), the ``snapshots`` metadata table
(Iceberg), ``call show_commits`` (Hudi) -- and ops users hit these
daily: "what wrote version 12?", "how many rows did the backfill
touch?".  The in-repo clients (sources/delta_log.py, iceberg.py,
hudi.py) already parse every structure involved; these three queries
expose them as declared relations.

Each history row is JOINED with a time-travel aggregate of the table AS
OF that version/snapshot/instant, so the oracle (over the original
supplier parquet, with the layout's mutation history re-expressed
relationally) certifies BOTH faces at once: the history listing itself
(ordinals, operations, file deltas) and that every listed version is
still exactly readable.

Scale shape: history listing is driver-side metadata work, O(#commits)
-- the same order as opening the table at all; the per-version
aggregates are ordinary pruned parquet scans.  A 1000-commit production
table lists from the log/timeline without touching one data byte.
"""

from __future__ import annotations

import hashlib
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _LAYOUT_ROOT, _atomic_layout
from .registry import declare


def _delta_hist_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a Delta table from
    supplier with a THREE-commit history: append even keys (one file),
    append odd keys (one file), then a deletion-vector DELETE of the
    %10 keys (a DV flip of the even file only -- %10 keys are even)."""
    from ..sources.delta_log import delta_delete, delta_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:deltahist9".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_deltahist_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            delta_write(sup.where(F.col("s_suppkey") % 2 == 0).coalesce(1),
                        tmp)
            delta_write(sup.where(F.col("s_suppkey") % 2 == 1).coalesce(1),
                        tmp)
            delta_delete(spark, tmp, "s_suppkey % 10 = 0")
    return path


@declare(
    "table_delta_history",
    oracle="""
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS version, 'WRITE' AS operation,
             CAST(1 AS BIGINT) AS n_added, CAST(0 AS BIGINT) AS n_removed,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 2 = 0)
                 AS n_rows,
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier
              WHERE s_suppkey % 2 = 0) AS bal
      UNION ALL
      SELECT 1, 'WRITE', 1, 0,
             (SELECT COUNT(*) FROM supplier),
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier)
      UNION ALL
      SELECT 2, 'DELETE', 1, 1,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 <> 0),
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier
              WHERE s_suppkey % 10 <> 0)
    ) ORDER BY version
    """,
)
def table_delta_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY as a relation: one row per Delta commit
    (version, operation, add/remove file deltas from the log JSON) joined
    with a time-travel aggregate AS OF that version.  The DELETE commit
    shows the deletion-vector flip (1 add + 1 remove of the same even
    file, no data rewrite) while its as-of row count drops by exactly
    the %10 keys -- agreement certifies the history listing AND that
    every listed version remains exactly readable."""
    from ..sources.delta_log import delta_history, delta_scan

    path = _delta_hist_layout(spark, sf_dir)
    frames = []
    for h in delta_history(path):
        agg = delta_scan(spark, path, version_as_of=h["version"]).agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        )
        frames.append(
            agg.select(
                F.lit(int(h["version"])).cast("long").alias("version"),
                F.lit(h["operation"]).alias("operation"),
                F.lit(int(h["added"])).cast("long").alias("n_added"),
                F.lit(int(h["removed"])).cast("long").alias("n_removed"),
                F.col("n_rows").cast("long"),
                F.col("bal"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("version")


def _iceberg_hist_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) an Iceberg table from supplier with a
    three-snapshot history: append even keys, append odd keys, then a
    v2 position DELETE of the %10 keys."""
    from ..sources.iceberg import iceberg_delete, iceberg_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:icehist9".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_icehist_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            iceberg_write(sup.where(F.col("s_suppkey") % 2 == 0), tmp)
            iceberg_write(sup.where(F.col("s_suppkey") % 2 == 1), tmp)
            iceberg_delete(spark, tmp, "s_suppkey % 10 = 0")
    return path


@declare(
    "table_iceberg_snapshots",
    oracle="""
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS ord, 'append' AS operation,
             CAST(0 AS BIGINT) AS is_current,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 2 = 0)
                 AS n_rows,
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier
              WHERE s_suppkey % 2 = 0) AS bal
      UNION ALL
      SELECT 1, 'append', 0,
             (SELECT COUNT(*) FROM supplier),
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier)
      UNION ALL
      SELECT 2, 'delete', 1,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 <> 0),
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier
              WHERE s_suppkey % 10 <> 0)
    ) ORDER BY ord
    """,
)
def table_iceberg_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``snapshots`` metadata table as a relation: one row per
    Iceberg snapshot in metadata order (ordinal, summary operation,
    whether it is the current snapshot) joined with a time-travel
    aggregate AT that snapshot id.  The position-delete snapshot's as-of
    aggregate proves the v2 delete-file anti-join applies exactly at
    that snapshot and not before."""
    from ..sources.iceberg import (
        _load_metadata,
        iceberg_scan,
        iceberg_snapshots,
    )

    path = _iceberg_hist_layout(spark, sf_dir)
    current = _load_metadata(path).get("current-snapshot-id")
    frames = []
    for i, s in enumerate(iceberg_snapshots(path)):
        agg = iceberg_scan(spark, path, snapshot_id=s["snapshot_id"]).agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        )
        frames.append(
            agg.select(
                F.lit(i).cast("long").alias("ord"),
                F.lit(s["operation"]).alias("operation"),
                F.lit(1 if s["snapshot_id"] == current else 0)
                .cast("long")
                .alias("is_current"),
                F.col("n_rows").cast("long"),
                F.col("bal"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("ord")


@declare(
    "table_hudi_timeline",
    oracle="""
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS ord, 'commit' AS action,
             'BULK_INSERT' AS operation,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 2 = 0)
                 AS n_rows,
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier
              WHERE s_suppkey % 2 = 0) AS bal
      UNION ALL
      SELECT 1, 'commit', 'UPSERT',
             (SELECT COUNT(*) FROM supplier),
             (SELECT ROUND(SUM(s_acctbal), 2) FROM supplier)
      UNION ALL
      SELECT 2, 'commit', 'UPSERT',
             (SELECT COUNT(*) FROM supplier),
             (SELECT ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                                    THEN s_acctbal + 1000.0
                                    ELSE s_acctbal END), 2) FROM supplier)
    ) ORDER BY ord
    """,
)
def table_hudi_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hudi timeline as a relation (the ``show_commits`` face): one
    row per completed instant in timeline order (ordinal, action,
    operation type from the commit metadata) joined with a time-travel
    aggregate AS OF that instant.  Reuses pipeline50's three-commit CoW
    layout (bulk insert evens, upsert odds, upsert +1000 on %10 keys),
    so the third row's balance shift pins that the upsert's rewritten
    slices serve as-of reads while older instants still see the
    pre-rewrite files."""
    from ..sources.hudi import hudi_scan, hudi_timeline
    from .pipeline50 import _hudi_cow_layout

    path = _hudi_cow_layout(spark, sf_dir)
    frames = []
    for i, t in enumerate(hudi_timeline(path)):
        agg = hudi_scan(spark, path, as_of=t["instant"]).agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        )
        frames.append(
            agg.select(
                F.lit(i).cast("long").alias("ord"),
                F.lit(t["action"]).alias("action"),
                F.lit(t["operation"]).alias("operation"),
                F.col("n_rows").cast("long"),
                F.col("bal"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("ord")
