"""Round-9 lake planning: Hudi COLUMN-STATS data skipping.

Closes the round-8 verdict's top gap: Delta and Iceberg both prune data
files from per-file min/max statistics (``skip_filters``), but the Hudi
client planned every slice of the touched partitions.  Real Hudi serves
this from the metadata table's ``column_stats`` partition;
``hudi_build_column_stats`` (sources/hudi.py) materializes the same
shape -- per (file, column) min/max/null-count, parquet FOOTERS only
for base files, block decode for the KB-scale logs -- maintained
transactionally by every later commit exactly like the files index, and
``hudi_scan(skip_filters=...)`` prunes file slices from it BEFORE Spark
lists them.

The layout mirrors the Delta/Iceberg skipping twins (pipeline46): orders
bucketed into a price-BAND partition column, so each partition's files
carry tight ``o_totalprice`` ranges; the skip filter is on the raw price
column (NOT the partition field), so the pruning proof runs through the
column-stats index, not partition values.  tests/test_hudi_skipping.py
pins that the pruned plan lists strictly fewer files while producing
identical results, that MOR slices whose LOG may match survive a
non-matching base, and that delete-only logs never resurrect a slice.

100 TB shape: the index is O(#files x #indexed columns) of metadata
appended transactionally per commit; a selective predicate prunes whole
file slices driver-side from KBs of JSON before any object-store LIST
or parquet footer read happens on the data path.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _LAYOUT_ROOT, _atomic_layout
from .registry import declare


def _hudi_banded_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a CoW Hudi table holding
    orders partitioned by PRICE BAND (floor(price/100k) as the Hudi
    partition field, 2 buckets per band) with the column-stats index
    built -- the banded layout that makes per-file price ranges tight."""
    from ..sources.hudi import hudi_build_column_stats, hudi_write

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudiband9".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"orders_hudiband_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            orders = load_table(spark, sf_dir, "orders").withColumn(
                "band",
                F.floor(F.col("o_totalprice") / 100000.0)
                .cast("int")
                .cast("string"),
            )
            hudi_write(spark, tmp, orders, record_key="o_orderkey",
                       partition_field="band", n_buckets=2)
            hudi_build_column_stats(tmp)
    return path


@declare(
    "table_hudi_stats_skipping",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           MIN(o_orderkey) AS min_key
    FROM orders
    WHERE o_totalprice < 5000
    GROUP BY o_orderpriority
    """,
)
def table_hudi_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-value orders from the banded Hudi table: the COLUMN-STATS
    index (the metadata table's ``column_stats`` shape) prunes every
    file slice whose per-file minimum price is already at-or-above the
    cutoff BEFORE Spark lists it -- only the lowest band's slices
    survive planning.  Same lossless-pruning proof shape as the
    Delta/Iceberg twins: the skip filter is a hint on a NON-partition
    column, the real predicate still applies, and the oracle filters
    raw orders."""
    from ..sources.hudi import hudi_scan

    path = _hudi_banded_layout(spark, sf_dir)
    df = hudi_scan(
        spark, path, skip_filters=[("o_totalprice", "<", 5000.0)]
    )
    return (
        df.where(F.col("o_totalprice") < 5000)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.min("o_orderkey").alias("min_key"),
        )
    )


# ---------------------------------------------------------------------------
# Hive ACID transactional tables (sources/hive_acid.py)
# ---------------------------------------------------------------------------


def _acid_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a Hive ACID table from
    supplier across three write ids: insert evens (delta_1_1), insert
    odds (delta_2_2), then DELETE the %10 keys (delete_delta_3_3)."""
    from ..sources.hive_acid import (
        hive_acid_delete,
        hive_acid_insert,
    )

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hiveacid9".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_acid_{digest}")
    if not os.path.isdir(os.path.join(path, "delta_1_1")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hive_acid_insert(spark, tmp,
                             sup.where(F.col("s_suppkey") % 2 == 0),
                             key_col="s_suppkey")
            hive_acid_insert(spark, tmp,
                             sup.where(F.col("s_suppkey") % 2 == 1),
                             key_col="s_suppkey")
            hive_acid_delete(spark, tmp, "row.s_suppkey % 10 = 0")
    return path


@declare(
    "table_hive_acid_scan",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal,
           MAX(s_suppkey) AS max_key
    FROM supplier
    WHERE s_suppkey % 10 <> 0
    GROUP BY s_nationkey
    """,
)
def table_hive_acid_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ACID snapshot read -- the reference's OWN transactional
    format (base_N / delta_M_N / delete_delta_M_N directories, ROW__ID
    columns, bucket_0000i ORC files): two insert deltas unioned, the
    delete-delta's ROW__IDs folded out via a broadcast anti-join on
    (originalTransaction, bucket, rowId).  The oracle filters the
    original parquet to the undeleted keys, so agreement proves the
    directory resolution, the ORC round-trip, and the delete-delta merge
    are all exact."""
    from ..sources.hive_acid import hive_acid_scan

    path = _acid_layout(spark, sf_dir)
    s = hive_acid_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.max("s_suppkey").alias("max_key"),
    )


def _acid_merge_layout(spark: SparkSession, sf_dir: str) -> str:
    """ACID table with an UPDATE applied: every %7 key's balance becomes
    CAST(key AS DOUBLE) (exactly representable -- no rounding divergence
    can enter the oracle). Hive implements the update as delete +
    re-insert under one write id."""
    from ..sources.hive_acid import hive_acid_insert, hive_acid_update

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hiveacidm9".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_acidm_{digest}")
    if not os.path.isdir(os.path.join(path, "delta_1_1")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hive_acid_insert(spark, tmp, sup, key_col="s_suppkey")
            hive_acid_update(
                spark, tmp, "row.s_suppkey % 7 = 0",
                {"s_acctbal": "CAST(s_suppkey AS DOUBLE)"},
                key_col="s_suppkey",
            )
    return path


@declare(
    "table_hive_acid_merge",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 7 = 0
                          THEN CAST(s_suppkey AS DOUBLE)
                          ELSE s_acctbal END), 2) AS bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def table_hive_acid_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ACID UPDATE semantics: the %7 keys' balances rewritten via
    delete + re-insert under ONE write id (a delete_delta of the old
    ROW__IDs plus a delta of the new rows -- exactly Hive's update
    implementation).  Row counts must NOT change and untouched rows keep
    their original values; the oracle replays the update as a CASE over
    the original parquet."""
    from ..sources.hive_acid import hive_acid_scan

    path = _acid_merge_layout(spark, sf_dir)
    s = hive_acid_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )
