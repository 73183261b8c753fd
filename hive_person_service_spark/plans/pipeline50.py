"""Round-7 sources: Apache Hudi interop (the THIRD open-table format).

A user of a Hive-era lake migrating tables through Hudi (the original
"transactional Hive" project) gets the same treatment Delta and Iceberg
got in rounds 5-6: a minimal public-layout client (sources/hudi.py --
timeline replay, file-group/file-slice resolution, bucket-index routing,
MOR log-format decode) with the data path always a plain pruned parquet
scan.  Six faces declared here:

* ``table_hudi_scan``        -- CoW snapshot across 3 commits (2 inserts
                                + 1 upsert rewrite);
* ``table_hudi_time_travel`` -- the same table as-of its first commit;
* ``table_hudi_incremental`` -- the incremental pull of exactly the
                                records the upsert commit wrote;
* ``table_hudi_mor_read``    -- MERGE_ON_READ snapshot: base parquet +
                                Avro log blocks (update + DELETE blocks)
                                merged per record key;
* ``table_hudi_read_optimized`` -- MOR's cheap-but-stale tier: base
                                files only, pinned to the pre-log state;
* ``stream_hudi_tail``       -- streaming FROM the timeline through a
                                Python DataSource (sources/hudi_stream.py).

Every oracle runs on the ORIGINAL supplier parquet with the table's
mutation history re-expressed relationally, so agreement proves
snapshot/merge reconstruction is exact -- the same proof structure as
``table_delta_scan`` / ``table_iceberg_v2_deletes``.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _LAYOUT_ROOT, _atomic_layout
from .registry import declare


def _hudi_cow_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a COPY_ON_WRITE Hudi table
    from supplier in THREE commits: even keys, odd keys, then an upsert
    adding 1000 to the balance of every suppkey divisible by 10 (a
    bucket-targeted base-file rewrite)."""
    from ..sources.hudi import hudi_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudicow8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_hudicow_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hudi_write(spark, tmp, sup.where(F.col("s_suppkey") % 2 == 0),
                       record_key="s_suppkey")
            hudi_write(spark, tmp, sup.where(F.col("s_suppkey") % 2 == 1),
                       record_key="s_suppkey")
            upd = sup.where(F.col("s_suppkey") % 10 == 0).withColumn(
                "s_acctbal", F.col("s_acctbal") + 1000.0
            )
            hudi_write(spark, tmp, upd, record_key="s_suppkey")
    return path


def _hudi_mor_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) a MERGE_ON_READ Hudi table: one base commit
    holding all suppliers, an AVRO_DATA log block negating the balance of
    every suppkey divisible by 7, then a DELETE log block removing every
    suppkey divisible by 13.  No compaction -- the logs stay live so the
    snapshot/read-optimized split is observable."""
    from ..sources.hudi import hudi_delete, hudi_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudimor8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_hudimor_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hudi_write(spark, tmp, sup, record_key="s_suppkey",
                       table_type="mor")
            upd = sup.where(F.col("s_suppkey") % 7 == 0).withColumn(
                "s_acctbal", -F.col("s_acctbal")
            )
            hudi_write(spark, tmp, upd, record_key="s_suppkey",
                       table_type="mor")
            victims = [
                str(r[0])
                for r in sup.where(F.col("s_suppkey") % 13 == 0)
                .select("s_suppkey")
                .collect()
            ]  # bounded: 1-in-13 of a dimension table
            hudi_delete(spark, tmp, victims)
    return path


@declare(
    "table_hudi_scan",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                          THEN s_acctbal + 1000.0
                          ELSE s_acctbal END), 2) AS bal,
           MAX(s_suppkey) AS max_key
    FROM supplier GROUP BY s_nationkey
    """,
)
def table_hudi_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi CoW snapshot at HEAD through the minimal public-layout client
    (sources/hudi.py): timeline replay + file-slice resolution pick the
    newest committed base file per file group; the upsert commit rewrote
    only the buckets holding %10 keys, so agreement proves both the
    rewrite's merge (incoming wins per record key) and that untouched
    buckets still serve their older slices."""
    from ..sources.hudi import hudi_scan

    path = _hudi_cow_layout(spark, sf_dir)
    s = hudi_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.max("s_suppkey").alias("max_key"),
    )


@declare(
    "table_hudi_time_travel",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    WHERE s_suppkey % 2 = 0
    GROUP BY s_nationkey
    """,
)
def table_hudi_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi time travel: the CoW table read as-of its FIRST commit (the
    even-key insert) -- slice resolution simply ignores every younger
    instant, including the upsert's rewritten base files, so a match
    proves versioned reads see exactly the historical file set."""
    from ..sources.hudi import hudi_scan, hudi_timeline

    path = _hudi_cow_layout(spark, sf_dir)
    first = hudi_timeline(path)[0]["instant"]
    s = hudi_scan(spark, path, as_of=first)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


@declare(
    "table_hudi_incremental",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_chg,
           ROUND(SUM(s_acctbal + 1000.0), 2) AS bal
    FROM supplier
    WHERE s_suppkey % 10 = 0
    GROUP BY s_nationkey
    """,
)
def table_hudi_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi incremental pull (the change-capture query): records written
    by commits AFTER the second insert -- i.e. exactly the upsert's %10
    rows at their NEW balance.  Planning prunes to the file groups the
    window's commits touched (from commit metadata, no full-table diff),
    then filters on the _hoodie_commit_time meta column; carried-over
    rows in the rewritten files keep their original commit time and drop
    out, which is the semantics that makes incremental ETL exact."""
    from ..sources.hudi import hudi_incremental, hudi_timeline

    path = _hudi_cow_layout(spark, sf_dir)
    second = hudi_timeline(path)[1]["instant"]
    s = hudi_incremental(spark, path, begin=second)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_chg"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


@declare(
    "table_hudi_mor_read",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 7 = 0
                          THEN -s_acctbal
                          ELSE s_acctbal END), 2) AS bal
    FROM supplier
    WHERE s_suppkey % 13 <> 0
    GROUP BY s_nationkey
    """,
)
def table_hudi_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE_ON_READ snapshot: base parquet + two generations of log
    blocks -- an AVRO_DATA update block (balance negated for %7 keys) and
    a DELETE block (%13 keys) -- merged per record key, newest commit
    winning, executor-side (mapInPandas over the HoodieLogFormat
    framing).  A %91 key is updated THEN deleted, so agreement also pins
    the merge ordering between block generations."""
    from ..sources.hudi import hudi_scan

    path = _hudi_mor_layout(spark, sf_dir)
    s = hudi_scan(spark, path, mode="snapshot")
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


@declare(
    "table_hudi_read_optimized",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def table_hudi_read_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOR's read-optimized tier: base files ONLY, so the un-compacted
    log updates and deletes are intentionally invisible and the result
    equals the original insert -- the freshness/cost trade every real
    MOR deployment leans on.  (tests/test_hudi.py pins that after
    hudi_compact the read-optimized view catches up to the snapshot.)"""
    from ..sources.hudi import hudi_scan

    path = _hudi_mor_layout(spark, sf_dir)
    s = hudi_scan(spark, path, mode="read_optimized")
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


def _hudi_stream_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) a CoW Hudi table fed by THREE insert commits of
    disjoint orders thirds -- the append-shaped history a streaming tail
    consumes."""
    from ..sources.hudi import hudi_write

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudistream8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"orders_hudistream_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            orders = load_table(spark, sf_dir, "orders")
            for third in range(3):
                hudi_write(
                    spark, tmp,
                    orders.where(F.col("o_orderkey") % 3 == third),
                    record_key="o_orderkey",
                )
    return path


@declare(
    "stream_hudi_tail",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def stream_hudi_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FROM Hudi -- the third leg of the lakehouse circle
    (delta_tail and iceberg_tail are rounds 5-6): orders written across
    three Hudi commits stream back OUT through the hudi_tail Python
    DataSource (offsets = timeline instants, per-commit rows filtered on
    _hoodie_commit_time so CoW carried-over rows never re-stream; real
    availableNow drain into a scratch sink), then aggregate.  The oracle
    aggregates the ORIGINAL orders table: agreement proves the timeline
    round trip served every record exactly once."""
    import tempfile
    import uuid as _uuid

    from ..sources.hudi_stream import register_hudi_tail

    table = _hudi_stream_layout(spark, sf_dir)
    register_hudi_tail(spark)
    scratch = os.path.join(
        tempfile.gettempdir(), f"hudi_tail_drain_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        spark.readStream.format("hudi_tail")
        .option("table", table)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise TimeoutError("hudi_tail drain did not finish in 120s")
    t = spark.read.parquet(os.path.join(scratch, "out"))
    return t.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast(
                "double"
            )
            / 100.0
        ).alias("revenue"),
        F.max("o_orderkey").alias("max_key"),
    )


def _hudi_part_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) a CoW Hudi table of orders PARTITIONED by
    o_orderstatus (3 partitions, non-hive-style value dirs)."""
    from ..sources.hudi import hudi_write

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudipart8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"orders_hudipart_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            orders = load_table(spark, sf_dir, "orders")
            hudi_write(spark, tmp, orders, record_key="o_orderkey",
                       partition_field="o_orderstatus")
    return path


@declare(
    "table_hudi_partition_pruned",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def table_hudi_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi PARTITIONED table (orders by o_orderstatus) read with
    partition pruning: slice resolution drops the other partitions
    DRIVER-SIDE, so Spark never lists their files (inputFiles pinned to
    the one partition dir in tests/test_hudi.py) -- the planning
    property that matters at 100 TB, where a status predicate must not
    touch two-thirds of the lake.  Oracle filters the original orders
    to the same partition; agreement proves the partitioned layout
    holds every row of exactly that partition."""
    from ..sources.hudi import hudi_scan

    path = _hudi_part_layout(spark, sf_dir)
    s = hudi_scan(spark, path, partitions=["F"])
    return s.groupBy(F.year("o_orderdate").cast("long").alias("yr")).agg(
        F.count("*").alias("n_orders"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("double")
            / 100.0
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# round 8: record-index deletes + CDC read
# ---------------------------------------------------------------------------


def _hudi_keydel_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) a PARTITIONED CoW Hudi table of suppliers
    (partition = s_nationkey), build its RECORD INDEX, then delete
    every %9 suppkey BY KEY ONLY -- the operation that needs the
    global key->partition mapping."""
    from ..sources.hudi import (
        hudi_build_record_index,
        hudi_delete,
        hudi_write,
    )

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudikeydel8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_hudikeydel_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hudi_write(spark, tmp, sup, record_key="s_suppkey",
                       partition_field="s_nationkey")
            hudi_build_record_index(spark, tmp)
            victims = [
                str(r[0])
                for r in sup.where(F.col("s_suppkey") % 9 == 0)
                .select("s_suppkey")
                .collect()
            ]  # bounded: 1-in-9 of a dimension table
            if victims:
                hudi_delete(spark, tmp, victims)
    return path


@declare(
    "table_hudi_key_delete",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal,
           MAX(s_suppkey) AS max_key
    FROM supplier
    WHERE s_suppkey % 9 <> 0
    GROUP BY s_nationkey
    """,
)
def table_hudi_key_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-ONLY deletes on a PARTITIONED Hudi table through the RECORD
    INDEX (the public metadata-table record-index shape): the bucket
    index alone cannot locate a key's partition, so hudi_delete resolves
    victims via a broadcast join against the persisted key->partition
    index (bounded by the victim count, never a table scan), then
    routes per (partition, bucket) file group.  The oracle removes the
    same keys relationally; agreement proves every victim was found in
    its partition and nothing else was touched.  Closes the round-7
    gate at sources/hudi.py:688."""
    from ..sources.hudi import hudi_scan

    path = _hudi_keydel_layout(spark, sf_dir)
    s = hudi_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.max("s_suppkey").alias("max_key"),
    )


def _hudi_cdc_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the CDC fixture: insert all suppliers, upsert
    %10 balances +1000, delete %13 keys (CoW, non-partitioned)."""
    from ..sources.hudi import hudi_delete, hudi_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudicdc8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_hudicdc_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hudi_write(spark, tmp, sup, record_key="s_suppkey")
            upd = sup.where(F.col("s_suppkey") % 10 == 0).withColumn(
                "s_acctbal", F.col("s_acctbal") + 1000.0
            )
            hudi_write(spark, tmp, upd, record_key="s_suppkey")
            victims = [
                str(r[0])
                for r in sup.where(F.col("s_suppkey") % 13 == 0)
                .select("s_suppkey")
                .collect()
            ]
            if victims:
                hudi_delete(spark, tmp, victims)
    return path


@declare(
    "table_hudi_cdc",
    oracle="""
    SELECT * FROM (
      SELECT 'update_preimage' AS _change_type,
             CAST(COUNT(*) AS BIGINT) AS n_chg,
             ROUND(SUM(s_acctbal), 2) AS bal,
             MAX(s_suppkey) AS max_key
      FROM supplier WHERE s_suppkey % 10 = 0 HAVING COUNT(*) > 0
      UNION ALL
      SELECT 'update_postimage',
             CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(s_acctbal + 1000.0), 2),
             MAX(s_suppkey)
      FROM supplier WHERE s_suppkey % 10 = 0 HAVING COUNT(*) > 0
      UNION ALL
      SELECT 'delete',
             CAST(COUNT(*) AS BIGINT),
             ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                            THEN s_acctbal + 1000.0
                            ELSE s_acctbal END), 2),
             MAX(s_suppkey)
      FROM supplier WHERE s_suppkey % 13 = 0 HAVING COUNT(*) > 0
    )
    """,
)
def table_hudi_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi CDC read with BEFORE/AFTER images (the Delta CDF precedent,
    plans/pipeline44.py): the upsert commit emits update_preimage rows
    at the ORIGINAL balance and update_postimage rows at +1000; the
    delete commit emits delete pre-images at the post-upsert state (a
    %130 key deleted after being updated carries +1000 -- ordering
    between commits pinned).  Per commit, only the touched file groups'
    previous and current slices are read, and the diff is one shuffle
    on the record key over that bounded footprint."""
    from ..sources.hudi import hudi_cdc, hudi_timeline

    path = _hudi_cdc_layout(spark, sf_dir)
    first = hudi_timeline(path)[0]["instant"]
    c = hudi_cdc(spark, path, begin=first)
    return c.groupBy("_change_type").agg(
        F.count("*").alias("n_chg"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.max("s_suppkey").alias("max_key"),
    )
