"""Table sinks (SURVEY.md §2.A): INSERT OVERWRITE, Hive-style partitioned
layouts, bucketed tables for shuffle-free sort-merge joins.

These are the 100 TB layout primitives:
  * partitionBy(col) -> directory-per-value; predicates on the partition
    column become PartitionFilters (no data read for pruned partitions);
  * bucketBy(n, key) + sortBy(key) via saveAsTable -> both sides of a
    fact-fact equi-join pre-shuffled: SortMergeJoin with NO Exchange.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def insert_overwrite_parquet(df: DataFrame, path: str) -> None:
    """Hive INSERT OVERWRITE DIRECTORY analog."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Hive partitioned-table layout (dynamic partition insert analog).
    Keep partition columns low-cardinality (date/region), never a key --
    millions of tiny directories kill the driver's file listing."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int
) -> None:
    """Bucketed + sorted managed table (Hive CLUSTERED BY ... SORTED BY ...
    INTO n BUCKETS): enables shuffle-free SMB joins between tables bucketed
    the same way.

    Drops any previous table AND its warehouse location first: with the
    default in-memory catalog, a table written in an earlier session leaves
    an orphan directory the catalog no longer knows about, and saveAsTable
    fails with LOCATION_ALREADY_EXISTS."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = Path(urlparse(warehouse).path or warehouse) / table.lower()
    if loc.exists():
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
