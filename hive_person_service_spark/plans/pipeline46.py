"""Round-6 batch 46: the lakehouse tier.

* Exactly-once streaming ingest INTO Delta (Structured Streaming
  foreachBatch -> Delta commits with ``txn`` idempotence).
* Iceberg partitioned scans with manifest-level pruning, bounds-based
  data skipping (both formats), Delta MERGE INTO, schema evolution, and
  timestamp time travel.

The skipping queries exercise the PLANNING tier that matters at 100 TB:
``skip_filters`` prunes files from KB-scale manifest/log metadata BEFORE
Spark lists them, and the declared queries always re-apply the real
predicate to the pruned frame -- pruning is an optimization the oracle
then proves lossless (a wrongly-pruned file would drop rows and fail
the hash compare).
"""

from __future__ import annotations

import datetime
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _atomic_layout
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def _delta_stream_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a Delta table fed by a REAL
    Structured Streaming run: the orders table split into a 3-file landing
    zone, drained micro-batch by micro-batch (maxFilesPerTrigger=1,
    availableNow) through the exactly-once txn sink
    (streaming/jobs.py::stream_into_delta). The ingest is run TWICE from a
    fresh checkpoint on purpose -- the second run replays every batch and
    the txn versions must make it a no-op, so the layout itself re-proves
    idempotence each time it is built."""
    from ..sources.delta_log import delta_history
    from ..streaming.jobs import stream_into_delta

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:deltastream".encode()
    ).hexdigest()[:12]
    root = os.path.join(_LAYOUT_ROOT, f"orders_deltastream_{digest}")
    table = os.path.join(root, "table")
    if not os.path.isdir(os.path.join(table, "_delta_log")):
        landing = os.path.join(root, "landing")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        for i in range(3):
            orders.where(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(landing, f"part{i}.parquet"))

        def stream():
            return (
                spark.readStream.schema(
                    "o_orderkey long, o_custkey long, o_orderstatus string,"
                    " o_totalprice double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{landing}/part*.parquet")
            )

        stream_into_delta(stream(), table, os.path.join(root, "ckpt"),
                          app_id="orders-ingest")
        n_versions = len(delta_history(table))
        # replay from a LOST checkpoint: txn idempotence must no-op it
        stream_into_delta(stream(), table, os.path.join(root, "ckpt2"),
                          app_id="orders-ingest")
        assert len(delta_history(table)) == n_versions, (
            "txn idempotence failed: replayed batches re-committed"
        )
    return table


@declare(
    "stream_delta_ingest",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def stream_delta_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest into Delta (the lakehouse landing
    pattern): a real Structured-Streaming drain commits each micro-batch
    with the protocol's txn action; redelivered/replayed batches are
    skipped by delta_txn_version, so the drained table holds the source
    exactly once -- which is what lets the oracle aggregate the ORIGINAL
    orders table and hash-match. Money sums in integer cents (the repo's
    accumulation-order discipline)."""
    from ..sources.delta_log import delta_scan

    table = _delta_stream_layout(spark, sf_dir)
    t = delta_scan(spark, table)
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

# bumping this re-materializes every layout below (writer behavior is
# part of the fixture identity: field ids, footer stats, partition spec)
_WRITER_TAG = "lake46a"


def _digest(sf_dir: str, table: str, tag: str) -> str:
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    return hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{tag}:{_WRITER_TAG}".encode()
    ).hexdigest()[:12]


def _iceberg_stream_layout(spark: SparkSession, sf_dir: str) -> str:
    """Iceberg twin of _delta_stream_layout: the same 3-file orders
    landing zone drained through the exactly-once txn sink
    (streaming/jobs.py::stream_into_iceberg), run TWICE from a fresh
    checkpoint -- the replay must no-op via the ingest.<app_id> property
    so the layout re-proves idempotence on every build."""
    from ..sources.iceberg import iceberg_snapshots
    from ..streaming.jobs import stream_into_iceberg

    root = os.path.join(
        _LAYOUT_ROOT, f"orders_icestream_{_digest(sf_dir, 'orders', 'stream')}"
    )
    table = os.path.join(root, "table")
    if not os.path.isdir(os.path.join(table, "metadata")):
        landing = os.path.join(root, "landing")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        for i in range(3):
            orders.where(F.col("o_orderkey") % 3 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(landing, f"part{i}.parquet"))

        def stream():
            return (
                spark.readStream.schema(
                    "o_orderkey long, o_custkey long, o_orderstatus string,"
                    " o_totalprice double"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{landing}/part*.parquet")
            )

        stream_into_iceberg(stream(), table, os.path.join(root, "ckpt"),
                            app_id="orders-ingest")
        n_snaps = len(iceberg_snapshots(table))
        stream_into_iceberg(stream(), table, os.path.join(root, "ckpt2"),
                            app_id="orders-ingest")
        assert len(iceberg_snapshots(table)) == n_snaps, (
            "iceberg txn idempotence failed: replayed batches re-committed"
        )
    return table


@declare(
    "stream_iceberg_ingest",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def stream_iceberg_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest into ICEBERG (the second lakehouse
    landing path): each micro-batch appends a snapshot carrying
    txn=(app_id, batch_id); redelivered/replayed batches are skipped via
    iceberg_txn_version (snapshot summaries + the ingest.<app_id> table
    property, which survives expire_snapshots). Same oracle as the Delta
    twin: the drained table must hash-match the original orders."""
    from ..sources.iceberg import iceberg_scan

    t = iceberg_scan(spark, _iceberg_stream_layout(spark, sf_dir))
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


# ---------------------------------------------------------------------------
# Iceberg: partitioned events table (day + bucket transforms)
# ---------------------------------------------------------------------------


def _iceberg_events_partitioned(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(
        _LAYOUT_ROOT, f"events_icepart_{_digest(sf_dir, 'events', 'icepart')}"
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        from ..sources.iceberg import iceberg_write

        with _atomic_layout(path) as tmp:
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "ts", "user_id", "event_type", "value"
            )
            iceberg_write(
                ev,
                tmp,
                partition_spec=[
                    {"name": "ts_day", "transform": "day", "source": "ts"},
                    {"name": "uid_bucket", "transform": "bucket[8]",
                     "source": "user_id"},
                ],
            )
    return path


@declare(
    "table_iceberg_partitioned_scan",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    WHERE CAST(ts AS DATE) <=
          (SELECT CAST(MIN(ts) AS DATE) + INTERVAL 2 DAY FROM events)
    GROUP BY 1, 2
    """,
)
def table_iceberg_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-three-days rollup over an Iceberg table PARTITIONED by
    day(ts) + bucket[8](user_id) (sources/iceberg.py). The day cutoff is
    resolved driver-side from source min stats, passed to the scan as a
    ``skip_filters`` literal -- the file list is pruned from MANIFEST
    METADATA alone (partition values projected through the day
    transform), then the same predicate re-applies to the rows. The
    oracle recomputes the rollup on the raw events table, so agreement
    proves manifest pruning dropped no qualifying file and the
    partitioned write preserved every row. File-count pruning evidence
    is pinned in tests/test_lake_part_stats.py."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_events_partitioned(spark, sf_dir)
    cutoff = (
        load_table(spark, sf_dir, "events")
        .agg(F.date_add(F.to_date(F.min("ts")), 2).alias("d"))
        .first()["d"]
    )
    cutoff_days = (cutoff - datetime.date(1970, 1, 1)).days
    df = iceberg_scan(spark, path, skip_filters=[("ts_day", "<=", cutoff_days)])
    return (
        df.where(F.to_date("ts") <= F.lit(cutoff))
        .groupBy(
            F.to_date("ts").cast("string").alias("event_date"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# Iceberg + Delta: bounds/stats-based data skipping on a range layout
# ---------------------------------------------------------------------------


def _iceberg_orders_ranged(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(
        _LAYOUT_ROOT, f"orders_icerange_{_digest(sf_dir, 'orders', 'icerange')}"
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        from ..sources.iceberg import iceberg_write

        with _atomic_layout(path) as tmp:
            o = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            )
            iceberg_write(o.repartitionByRange(16, "o_totalprice"), tmp)
    return path


@declare(
    "table_iceberg_stats_skipping",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders
    WHERE o_totalprice >= 400000
    GROUP BY o_orderpriority
    """,
)
def table_iceberg_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-value orders from an Iceberg table laid out by price range:
    the scan's ``skip_filters`` prunes files whose manifest
    ``upper_bounds[o_totalprice]`` (spec single-value serialization,
    harvested from parquet footers at write) proves no row reaches the
    threshold -- file skipping from metadata, the Iceberg answer to
    "don't open files that can't match". The oracle filters the raw
    orders table; agreement proves skipping is lossless."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_orders_ranged(spark, sf_dir)
    df = iceberg_scan(
        spark, path, skip_filters=[("o_totalprice", ">=", 400000.0)]
    )
    return (
        df.where(F.col("o_totalprice") >= 400000)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


def _delta_events_generated(spark: SparkSession, sf_dir: str) -> str:
    """Delta events table partitioned on a GENERATED column
    p_date = CAST(ts AS DATE), built in two commits so the scan exercises
    the multi-commit-root partition-attach path AND append-time
    recomputation of the generated column."""
    path = os.path.join(
        _LAYOUT_ROOT, f"events_dltgen_{_digest(sf_dir, 'events', 'gen')}"
    )
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        from ..sources.delta_log import delta_write

        with _atomic_layout(path) as tmp:
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "ts", "user_id", "event_type", "value"
            )
            delta_write(
                ev.where(F.col("event_id") % 2 == 0), tmp,
                partition_by=["p_date"],
                generated={"p_date": "CAST(ts AS DATE)"},
            )
            delta_write(ev.where(F.col("event_id") % 2 == 1), tmp)
    return path


@declare(
    "table_delta_generated_partitions",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    WHERE CAST(ts AS DATE) <=
          (SELECT CAST(MIN(ts) AS DATE) + INTERVAL 2 DAY FROM events)
    GROUP BY 1, 2
    """,
)
def table_delta_generated_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED-column partition pruning on Delta (the Delta twin of
    Iceberg transform projection): the table is partitioned on
    p_date = CAST(ts AS DATE) recorded as delta.generationExpression;
    the scan's skip_filters on the SOURCE ts column project through the
    date truncation and prune partitions from the log alone. The same
    first-three-days rollup + oracle as table_iceberg_partitioned_scan,
    so the two formats' planning tiers are pinned to identical results.
    The generated column never reaches the result (dropped before the
    rollup); partition values are re-attached from the log across both
    commit roots (tests/test_lake_part_stats.py pins value == CAST(ts AS
    DATE) row-by-row)."""
    from ..sources.delta_log import delta_scan

    path = _delta_events_generated(spark, sf_dir)
    cutoff = (
        load_table(spark, sf_dir, "events")
        .agg(F.date_add(F.to_date(F.min("ts")), 2).alias("d"))
        .first()["d"]
    )
    df = delta_scan(
        spark, path,
        skip_filters=[("ts", "<=", f"{cutoff}T23:59:59.999999")],
    )
    return (
        df.where(F.to_date("ts") <= F.lit(cutoff))
        .groupBy(
            F.to_date("ts").cast("string").alias("event_date"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


def _delta_orders_ranged(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(
        _LAYOUT_ROOT, f"orders_dltrange_{_digest(sf_dir, 'orders', 'dltrange')}"
    )
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        from ..sources.delta_log import delta_write

        with _atomic_layout(path) as tmp:
            o = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            )
            delta_write(o.repartitionByRange(16, "o_totalprice"), tmp)
    return path


@declare(
    "table_delta_stats_skipping",
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
def table_delta_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Low-value orders from a Delta table laid out by price range: the
    add-actions' per-file ``stats`` (numRecords/minValues/maxValues --
    the Delta spec's data-skipping payload, written from parquet footers)
    prune files whose minimum price is already above the cutoff, BEFORE
    Spark lists them. Same lossless-pruning proof shape as the Iceberg
    twin: the oracle filters raw orders."""
    from ..sources.delta_log import delta_scan

    path = _delta_orders_ranged(spark, sf_dir)
    df = delta_scan(spark, path, skip_filters=[("o_totalprice", "<", 5000.0)])
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
# Delta MERGE INTO (upsert via deletion vectors)
# ---------------------------------------------------------------------------


def _delta_supplier_merged(spark: SparkSession, sf_dir: str) -> str:
    """Supplier Delta table with one MERGE applied: every key divisible
    by 10 gets +1000 balance (update), plus three synthetic suppliers in
    nation -1 (inserts). Deterministic, so the oracle can replay it in
    SQL."""
    path = os.path.join(
        _LAYOUT_ROOT, f"supplier_dltmerge_{_digest(sf_dir, 'supplier', 'merge')}"
    )
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        from ..sources.delta_log import delta_merge, delta_write

        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier").select(
                "s_suppkey", "s_nationkey", "s_acctbal"
            )
            delta_write(sup.repartition(4), tmp)
            # updated balance = CAST(key AS DOUBLE): exactly representable,
            # so no half-cent rounding divergence can enter the oracle
            updates = sup.where(F.col("s_suppkey") % 10 == 0).withColumn(
                "s_acctbal", F.col("s_suppkey").cast("double")
            )
            inserts = spark.createDataFrame(
                [(-101, -1, 100.0), (-102, -1, 200.0), (-103, -1, 300.0)],
                "s_suppkey long, s_nationkey int, s_acctbal double",
            )
            delta_merge(
                spark, tmp, updates.unionByName(inserts), keys=["s_suppkey"]
            )
    return path


@declare(
    "table_delta_merge",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                          THEN CAST(s_suppkey AS DOUBLE)
                          ELSE s_acctbal END), 2) AS bal,
           MAX(s_suppkey) AS max_key
    FROM supplier GROUP BY s_nationkey
    UNION ALL
    SELECT CAST(-1 AS INTEGER), CAST(3 AS BIGINT), 600.0, CAST(-101 AS BIGINT)
    """,
)
def table_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE INTO`` on the Delta client (delta_merge): matched keys
    (every 10th supplier) are deletion-vector deleted and re-appended
    with +1000 balance; three unmatched source rows insert into a
    synthetic nation -1. The oracle REPLAYS the merge arithmetic over
    the raw supplier table plus a literal row for the inserts --
    agreement proves matched rows were updated exactly once, unmatched
    target rows untouched, and inserts landed exactly once (the DV
    delete + append pair is atomic per key)."""
    from ..sources.delta_log import delta_scan

    path = _delta_supplier_merged(spark, sf_dir)
    return (
        delta_scan(spark, path)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
            F.max("s_suppkey").alias("max_key"),
        )
    )


@declare(
    "stream_delta_tail",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def stream_delta_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FROM Delta -- the full lakehouse circle: orders were
    streamed INTO the Delta table exactly-once (stream_delta_ingest's
    layout, txn actions), and this query streams them back OUT through
    the delta_tail Python DataSource (offsets = log versions, real
    availableNow drain into a scratch sink), then aggregates the drained
    rows. The oracle aggregates the ORIGINAL orders table, so agreement
    proves the in-and-out round trip preserved every row exactly once."""
    import tempfile
    import uuid as _uuid

    from ..sources.delta_stream import register_delta_tail

    table = _delta_stream_layout(spark, sf_dir)
    register_delta_tail(spark)
    scratch = os.path.join(
        tempfile.gettempdir(), f"delta_tail_drain_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        spark.readStream.format("delta_tail")
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
        raise TimeoutError("delta_tail drain did not finish in 120s")
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


@declare(
    "stream_iceberg_tail",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def stream_iceberg_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming FROM Iceberg -- the Iceberg side of the lakehouse
    circle: orders streamed INTO the table exactly-once
    (stream_iceberg_ingest's layout) are streamed back OUT through the
    iceberg_tail Python DataSource (offsets = snapshot-log positions,
    real availableNow drain), then aggregated against the original
    orders oracle. Proves the snapshot log supports incremental
    consumption with no dup/loss across the in-and-out round trip."""
    import tempfile
    import uuid as _uuid

    from ..sources.delta_stream import register_iceberg_tail

    table = _iceberg_stream_layout(spark, sf_dir)
    register_iceberg_tail(spark)
    scratch = os.path.join(
        tempfile.gettempdir(), f"iceberg_tail_drain_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        spark.readStream.format("iceberg_tail")
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
        raise TimeoutError("iceberg_tail drain did not finish in 120s")
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


@declare(
    "table_delta_cdf",
    oracle="""
    SELECT 'delete' AS change_type,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                AS BIGINT) AS n,
           ROUND((SELECT SUM(s_acctbal) FROM supplier
                  WHERE s_suppkey % 10 = 0), 2) AS bal
    UNION ALL
    SELECT 'insert',
           CAST((SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                + 3 AS BIGINT),
           ROUND((SELECT SUM(s_acctbal) FROM supplier)
                 + (SELECT SUM(CAST(s_suppkey AS DOUBLE)) FROM supplier
                    WHERE s_suppkey % 10 = 0)
                 + 600.0, 2)
    """,
)
def table_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED reconstructed from the Delta log
    (delta_changes): over the merged supplier table, the feed must hold
    the v0 inserts (every supplier), the merge's deletes (every 10th
    key's pre-image, via deletion-vector set difference) and its inserts
    (the updated images + three nation -1 rows). The oracle REPLAYS that
    arithmetic over the raw supplier table -- agreement proves the
    log-reconstruction attributes every changed row to the right change
    type exactly once, which is what an incremental downstream consumer
    relies on."""
    from ..sources.delta_log import delta_changes

    path = _delta_supplier_merged(spark, sf_dir)
    ch = delta_changes(spark, path)
    return ch.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


def _iceberg_supplier_merged(spark: SparkSession, sf_dir: str) -> str:
    """Iceberg twin of the Delta merge layout: same base, same updates
    (every 10th key re-imaged with balance = CAST(key AS DOUBLE)), same
    three nation -1 inserts -- executed as ONE equality-delete commit +
    ONE append (the Flink upsert shape)."""
    path = os.path.join(
        _LAYOUT_ROOT, f"supplier_icemerge_{_digest(sf_dir, 'supplier', 'merge')}"
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        from ..sources.iceberg import iceberg_merge, iceberg_write

        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier").select(
                "s_suppkey",
                F.col("s_nationkey").cast("int").alias("s_nationkey"),
                "s_acctbal",
            )
            iceberg_write(sup.repartition(4), tmp)
            updates = sup.where(F.col("s_suppkey") % 10 == 0).withColumn(
                "s_acctbal", F.col("s_suppkey").cast("double")
            )
            inserts = spark.createDataFrame(
                [(-101, -1, 100.0), (-102, -1, 200.0), (-103, -1, 300.0)],
                "s_suppkey long, s_nationkey int, s_acctbal double",
            )
            iceberg_merge(
                spark, tmp, updates.unionByName(inserts), keys=["s_suppkey"]
            )
    return path


@declare(
    "table_iceberg_merge",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                          THEN CAST(s_suppkey AS DOUBLE)
                          ELSE s_acctbal END), 2) AS bal,
           MAX(s_suppkey) AS max_key
    FROM supplier GROUP BY s_nationkey
    UNION ALL
    SELECT CAST(-1 AS INTEGER), CAST(3 AS BIGINT), 600.0, CAST(-101 AS BIGINT)
    """,
)
def table_iceberg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE INTO`` on the Iceberg client (iceberg_merge): one
    EQUALITY-DELETE commit on the source keys (content=2 delete file,
    applied only to data files at strictly smaller sequence numbers)
    followed by one append of all source images -- exactly the CDC/upsert
    shape Flink's Iceberg sink emits. Same deterministic merge arithmetic
    and oracle shape as table_delta_merge, so the two formats' MERGE
    semantics are pinned identical."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_supplier_merged(spark, sf_dir)
    return (
        iceberg_scan(spark, path)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
            F.max("s_suppkey").alias("max_key"),
        )
    )


@declare(
    "table_iceberg_changelog",
    oracle="""
    SELECT 'delete' AS change_type,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                AS BIGINT) AS n,
           ROUND((SELECT SUM(s_acctbal) FROM supplier
                  WHERE s_suppkey % 10 = 0), 2) AS bal
    UNION ALL
    SELECT 'insert',
           CAST((SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                + 3 AS BIGINT),
           ROUND((SELECT SUM(s_acctbal) FROM supplier)
                 + (SELECT SUM(CAST(s_suppkey AS DOUBLE)) FROM supplier
                    WHERE s_suppkey % 10 = 0)
                 + 600.0, 2)
    """,
)
def table_iceberg_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CHANGELOG read on Iceberg (iceberg_changes -- the
    create_changelog_view surface): over the merged supplier table the
    feed must hold the first snapshot's inserts (every supplier), the
    equality-delete's deletes (every 10th key's pre-image, resolved
    against the rows live at the prior snapshot) and the append's
    inserts (updated images + three nation -1 rows). SAME oracle as
    table_delta_cdf -- the two formats' change feeds are pinned to
    identical content for the identical logical merge."""
    from ..sources.iceberg import iceberg_changes

    path = _iceberg_supplier_merged(spark, sf_dir)
    ch = iceberg_changes(spark, path)
    return ch.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


# ---------------------------------------------------------------------------
# Iceberg schema evolution (field-id resolution, no rewrite)
# ---------------------------------------------------------------------------


def _iceberg_supplier_evolved(spark: SparkSession, sf_dir: str) -> str:
    """Two-schema Iceberg supplier table: even keys written as
    (s_suppkey, s_acctbal); then s_acctbal RENAMED to balance and an int
    nation column ADDED; odd keys written under the new schema."""
    path = os.path.join(
        _LAYOUT_ROOT, f"supplier_icevo_{_digest(sf_dir, 'supplier', 'evo')}"
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        from ..sources.iceberg import iceberg_alter, iceberg_write

        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            iceberg_write(
                sup.where(F.col("s_suppkey") % 2 == 0).select(
                    "s_suppkey", "s_acctbal"
                ),
                tmp,
            )
            iceberg_alter(
                tmp,
                rename_columns={"s_acctbal": "balance"},
                add_columns=[("nation", "int")],
            )
            iceberg_write(
                sup.where(F.col("s_suppkey") % 2 == 1).select(
                    "s_suppkey",
                    F.col("s_acctbal").alias("balance"),
                    F.col("s_nationkey").cast("int").alias("nation"),
                ),
                tmp,
            )
    return path


@declare(
    "table_iceberg_schema_evolution",
    oracle="""
    SELECT s_suppkey % 2 AS written_under,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS balance_sum,
           CAST(SUM(CASE WHEN s_suppkey % 2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS with_nation
    FROM supplier
    GROUP BY s_suppkey % 2
    """,
)
def table_iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution WITHOUT data rewrites: the table's first commit
    wrote (s_suppkey, s_acctbal); the column was then RENAMED to balance
    and a nation column ADDED; the second commit wrote the new shape.
    The scan resolves old files by parquet FIELD ID (the Iceberg spec's
    mechanism), so the renamed column's old data surfaces under the new
    name and nation null-backfills. The oracle reads the raw supplier
    table -- the balance_sum per write-generation matches only if the
    rename re-mapped old files losslessly, and with_nation counts only
    rows written under the evolved schema (nation non-null exactly
    there)."""
    from ..sources.iceberg import iceberg_scan

    df = iceberg_scan(spark, _iceberg_supplier_evolved(spark, sf_dir))
    return df.groupBy((F.col("s_suppkey") % 2).alias("written_under")).agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("balance"), 2).alias("balance_sum"),
        F.count("nation").alias("with_nation"),
    )


# ---------------------------------------------------------------------------
# timestamp time travel (both formats)
# ---------------------------------------------------------------------------


@declare(
    "table_iceberg_ts_travel",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    WHERE s_suppkey % 2 = 0
    GROUP BY s_nationkey
    """,
)
def table_iceberg_ts_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FOR TIMESTAMP AS OF`` on Iceberg: resolve the FIRST snapshot's
    commit timestamp from the snapshot log, read the table as of that
    instant, and aggregate -- the even-key commit, exactly what the
    snapshot-id form (table_iceberg_time_travel) reads, but resolved
    through the timestamp rule (latest snapshot at or before t)."""
    from ..sources.iceberg import iceberg_scan, iceberg_snapshots
    from .pipeline44 import _iceberg_layout

    path = _iceberg_layout(spark, sf_dir)
    t0 = iceberg_snapshots(path)[0]["timestamp_ms"]
    s = iceberg_scan(spark, path, as_of_timestamp_ms=t0)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


@declare(
    "table_delta_ts_travel",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    WHERE s_suppkey % 2 = 0
    GROUP BY s_nationkey
    """,
)
def table_delta_ts_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TIMESTAMP AS OF`` on Delta: version 0's commitInfo timestamp,
    read back through the latest-commit-at-or-before-t rule -- must
    reconstruct exactly the even-key first commit."""
    import json as _json
    from pathlib import Path as _Path

    from ..sources.delta_log import delta_scan
    from .pipeline44 import _delta_layout

    path = _delta_layout(spark, sf_dir)
    lines = _Path(
        path, "_delta_log", "00000000000000000000.json"
    ).read_text().splitlines()
    ts0 = next(
        _json.loads(ln)["commitInfo"]["timestamp"]
        for ln in lines
        if "commitInfo" in ln
    )
    s = delta_scan(spark, path, timestamp_as_of_ms=ts0)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


# ---------------------------------------------------------------------------
# Iceberg: partition-spec EVOLUTION (round 8)
# ---------------------------------------------------------------------------


def _iceberg_spec_evo_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) an events table whose partition spec CHANGED
    mid-history: even event_ids written under spec 0 = day(ts), then
    iceberg_update_spec to month(ts) + bucket[8](user_id), then odd
    event_ids written under spec 1 -- the mixed-spec manifest history
    every long-lived Iceberg table accumulates."""
    path = os.path.join(
        _LAYOUT_ROOT, f"events_icespecevo_{_digest(sf_dir, 'events', 'icespecevo8')}"
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        from ..sources.iceberg import iceberg_update_spec, iceberg_write

        with _atomic_layout(path) as tmp:
            ev = load_table(spark, sf_dir, "events").select(
                "event_id", "ts", "user_id", "event_type", "value"
            )
            iceberg_write(
                ev.where(F.col("event_id") % 2 == 0),
                tmp,
                partition_spec=[
                    {"name": "ts_day", "transform": "day", "source": "ts"},
                ],
            )
            iceberg_update_spec(
                tmp,
                [
                    {"name": "ts_month", "transform": "month", "source": "ts"},
                    {"name": "uid_bucket", "transform": "bucket[8]",
                     "source": "user_id"},
                ],
            )
            iceberg_write(ev.where(F.col("event_id") % 2 == 1), tmp)
    return path


@declare(
    "table_iceberg_spec_evolution",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    WHERE CAST(ts AS DATE) <=
          (SELECT CAST(MIN(ts) AS DATE) + INTERVAL 2 DAY FROM events)
    GROUP BY 1, 2
    """,
)
def table_iceberg_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read across a PARTITION-SPEC CHANGE: half the events sit in
    manifests written under spec 0 = day(ts), half under spec 1 =
    month(ts) + bucket[8](user_id) (iceberg_update_spec -- metadata-only,
    no rewrite).  The first-three-days predicate is passed as a
    skip_filter on the SOURCE column ts, so the planner must project it
    through EACH manifest's own transform (day for spec-0 files, month
    for spec-1 files) -- resolving partition tuples per
    ``partition_spec_id``, never the current default.  The oracle
    recomputes the rollup relationally over all events; agreement proves
    per-spec pruning dropped no qualifying file from either era and the
    mixed-spec snapshot is complete.  Pruning-shape evidence is pinned in
    tests/test_iceberg_spec_evolution.py."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_spec_evo_layout(spark, sf_dir)
    cutoff = (
        load_table(spark, sf_dir, "events")
        .agg(F.date_add(F.to_date(F.min("ts")), 2).alias("d"))
        .first()["d"]
    )
    end_micros = (
        (cutoff - datetime.date(1970, 1, 1)).days + 1
    ) * 86_400_000_000 - 1
    df = iceberg_scan(spark, path, skip_filters=[("ts", "<=", end_micros)])
    return (
        df.where(F.to_date("ts") <= F.lit(cutoff))
        .groupBy(
            F.to_date("ts").cast("string").alias("event_date"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )
