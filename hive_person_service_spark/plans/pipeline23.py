"""Round-4 continuation: multi-format ingest as DECLARED surface.

CSV / JSON / ORC reads (the Hive SerDe analog, SURVEY.md §2.A) were
pytest-only round-trips until now. These queries put the two
production-critical formats behind oracle checks the driver can sample:
each materializes a format-converted copy of a fixture table ONCE per
fixture generation (identity-cached layout, the partitioned.py
discipline), reads it back through the explicit-schema reader, and
aggregates; the ORACLE runs on the ORIGINAL parquet -- agreement proves
the format round-trip holds exactly the source rows, types included.

At 100 TB the cache stands in for the landing zone a real deployment
maintains; the read path (explicit schema, no inference scan) is the part
that ships.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import SCHEMAS, load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def _format_layout(
    spark: SparkSession, sf_dir: str, table: str, fmt: str
) -> str:
    """Materialize (once) `table` converted to `fmt`; returns its path.
    Cache key includes the source file identity so a regenerated fixture
    rebuilds instead of serving stale rows."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"{table}_{fmt}_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = load_table(spark, sf_dir, table)
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", "true").csv(path)
        elif fmt == "orc":
            writer.orc(path)
        else:
            raise ValueError(fmt)
    return path


@declare(
    "source_orc_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key,
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS first_day
    FROM orders GROUP BY o_orderstatus
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC read path (Hive's native columnar format): orders converted to
    ORC once, read back with the declared schema, rolled up by status.
    The oracle aggregates the ORIGINAL parquet -- agreement proves the
    ORC round-trip preserves every row and type (keys, doubles,
    timestamps). ORC supports the same predicate/column pushdown as
    parquet, so the read plan shape is identical."""
    path = _format_layout(spark, sf_dir, "orders", "orc")
    from ..sources.io_formats import read_orc

    o = read_orc(spark, path, SCHEMAS["orders"])
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.min(F.to_date("o_orderdate")).cast("string").alias("first_day"),
    )


@declare(
    "source_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS bal,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM customer GROUP BY c_mktsegment
    """,
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV read path (Hive LazySimpleSerDe analog): customer converted to
    headered CSV once, read back with the declared schema (no inference
    scan), aggregated by segment. Oracle runs on the original parquet:
    agreement proves quoting/escaping survived the text round-trip
    (c_comment contains commas) and every typed column parsed back
    exactly."""
    path = _format_layout(spark, sf_dir, "customer", "csv")
    from ..sources.io_formats import read_csv

    c = read_csv(spark, path, SCHEMAS["customer"])
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


def _range_layout_orders(spark: SparkSession, sf_dir: str, n_files: int = 16) -> str:
    """Materialize (once) orders range-partitioned by o_totalprice into
    n_files parquet files -- the clustered layout that makes the footer
    stats index selective (each file covers a narrow price band)."""
    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:r{n_files}".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"orders_pricerange_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "orders")
            .repartitionByRange(n_files, "o_totalprice")
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


@declare(
    "scan_stats_skipping",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
    GROUP BY o_orderstatus
    """,
)
def scan_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping over plain parquet (the Delta/Iceberg
    stats-pruning idea, operators/skipping.py): orders is laid out
    range-clustered on o_totalprice (once per fixture identity), a
    min/max stats index is built from parquet FOOTERS only, and the
    price-band scan opens just the stats-overlapping files with the exact
    predicate as a residual filter. The oracle runs the same aggregate
    over the ORIGINAL un-clustered table -- agreement proves pruning
    lost nothing. The pruned-file count is pinned strictly below the
    layout's file count by tests/test_skipping_declared.py. At 100 TB the
    index build moves footer KBs (not the table) and the scan IO is
    proportional to the band, not the corpus."""
    from ..operators.skipping import build_stats_index, skipping_scan

    path = _range_layout_orders(spark, sf_dir)
    stats = build_stats_index(spark, path, ["o_totalprice"])
    scan = skipping_scan(
        spark, path, stats, "o_totalprice", 100_000.0, 200_000.0
    )
    return scan.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )
