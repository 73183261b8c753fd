"""Round-4 continuation batch 26: change-data-feed read surface.

Companion to table_time_travel (pipeline25): the versioned-parquet
snapshot table also serves DIFFS between versions -- the CDC read that
lets downstream consumers (index refresh, cache invalidation, audit)
process only what changed instead of re-scanning the table.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


@declare(
    "table_change_feed",
    oracle="""
    SELECT 'removed' AS change, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """,
)
def table_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two snapshots of the versioned table
    (operators/snapshots.py::diff, bag semantics via exceptAll): version
    1 -> 2 of the orders snapshot (built by table_time_travel; the v2
    write purged all 'F' rows), summarized per change type. The diff is
    computed from the two versions' files only -- no transaction log
    replay, no full-history scan -- and exceptAll's bag semantics
    surface duplicate-count changes an EXCEPT would hide. The oracle
    derives the expected feed (exactly the purged 'F' rows, nothing
    added) from the immutable fixture. At 100 TB a consumer reads the
    two version manifests and diffs only files that differ; unchanged
    files cancel structurally."""
    from ..operators.snapshots import SnapshotTable

    # Same snapshot root as table_time_travel (shared fixture identity).
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:tt".encode()
    ).hexdigest()[:12]
    root = os.path.join(_LAYOUT_ROOT, f"orders_snap_{digest}")
    if len(SnapshotTable(spark, root).history()) < 2:
        from .pipeline25 import table_time_travel

        table_time_travel(spark, sf_dir)  # builds v1/v2 (idempotent)
    snap = SnapshotTable(spark, root)
    feed = snap.diff(1, 2)
    return feed.groupBy(
        F.col("__change").alias("change"), "o_orderstatus"
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
