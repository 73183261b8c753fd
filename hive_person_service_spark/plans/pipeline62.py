"""Round-10 Iceberg metadata tables: ``files`` and ``partitions``.

Round 9 shipped the ``snapshots`` relation (pipeline58); these close
the remaining metadata relations every Iceberg user queries
(``SELECT * FROM t.files`` / ``t.partitions``): per-file manifest
records and per-partition aggregates, both served from MANIFEST
METADATA alone -- no data file is opened.  At 100 TB the cost is the
same O(#manifest entries) driver-side walk as planning a scan; the
relations are KB-scale frames.

Correctness shape: the files relation's per-partition record sums must
equal a raw-source aggregate (record counts in manifests are exact, so
agreement proves every manifest entry is surfaced exactly once); the
partitions relation on a deleted-from table must additionally report
the position-delete record counts the DML wrote.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _LAYOUT_ROOT, _atomic_layout
from .registry import declare


@declare(
    "table_iceberg_files",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS ts_day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS has_files
    FROM events
    GROUP BY 1
    """,
)
def table_iceberg_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``files`` metadata table over the day+bucket partitioned
    events layout (pipeline46): every live data-file manifest entry
    with its partition values and exact record_count.  Summed per
    ts_day partition value, the counts must reproduce the raw events
    per-day histogram -- every manifest entry surfaced exactly once,
    record counts exact, partition values correctly projected through
    the day transform."""
    from ..sources.iceberg import iceberg_files
    from .pipeline46 import _iceberg_events_partitioned

    path = _iceberg_events_partitioned(spark, sf_dir)
    rows = [
        (int(r["partition"]["ts_day"]), int(r["record_count"]),
         int(r["file_size_in_bytes"] or 0))
        for r in iceberg_files(path)
        if r["content"] == 0
    ]
    df = spark.createDataFrame(
        rows, "ts_day long, record_count long, size long"
    )
    return df.groupBy("ts_day").agg(
        F.sum("record_count").alias("n_rows"),
        (F.min("size") > 0).alias("has_files"),
    )


def _digest(sf_dir: str, table: str, tag: str) -> str:
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    return hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{tag}".encode()
    ).hexdigest()[:12]


def _iceberg_rollback_layout(spark: SparkSession, sf_dir: str) -> str:
    """Iceberg history with a ROLLBACK: append evens (s1), append odds
    (s2, tagged ``v1`` at s1), position-delete the %10 keys (s3), then
    rollback_to_snapshot(s2) -- main's head moves back, s3 stays in the
    table but is no longer a current ancestor."""
    from ..sources.iceberg import (
        iceberg_delete,
        iceberg_rollback,
        iceberg_set_ref,
        iceberg_snapshots,
        iceberg_write,
    )

    path = os.path.join(
        _LAYOUT_ROOT,
        f"supplier_icerb_{_digest(sf_dir, 'supplier', 'icerollback10')}",
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            s1 = iceberg_write(sup.where(F.col("s_suppkey") % 2 == 0), tmp)
            s2 = iceberg_write(sup.where(F.col("s_suppkey") % 2 == 1), tmp)
            iceberg_set_ref(tmp, "v1", ref_type="tag", snapshot_id=s1)
            iceberg_delete(spark, tmp, "s_suppkey % 10 = 0")
            iceberg_rollback(tmp, s2)
            assert [s["snapshot_id"] for s in iceberg_snapshots(tmp)][1] == s2
    return path


@declare(
    "table_iceberg_history",
    oracle="""
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS is_ancestor,
             CAST(0 AS BIGINT) AS has_parent,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 2 = 0)
                 AS n_rows
      UNION ALL
      SELECT 1, 1, 1, (SELECT COUNT(*) FROM supplier)
      UNION ALL
      SELECT 2, 0, 1,
             (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 <> 0)
      UNION ALL
      SELECT 3, 1, 1, (SELECT COUNT(*) FROM supplier)
    ) ORDER BY ord
    """,
)
def table_iceberg_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``history`` metadata table over a ROLLED-BACK history: one
    record per head move (snapshot-log), each joined with a time-travel
    count at that snapshot.  The delete snapshot (ord 2) must read
    is_current_ancestor=FALSE after the rollback while staying exactly
    readable by id; the rollback itself appears as a second head move
    to the append snapshot (ord 3).  Parent ids pin the lineage chain
    (only the first snapshot has none)."""
    from functools import reduce

    from ..sources.iceberg import iceberg_history, iceberg_scan

    path = _iceberg_rollback_layout(spark, sf_dir)
    frames = []
    for i, h in enumerate(iceberg_history(path)):
        cnt = iceberg_scan(
            spark, path, snapshot_id=h["snapshot_id"]
        ).agg(F.count("*").alias("n_rows"))
        frames.append(
            cnt.select(
                F.lit(i).cast("long").alias("ord"),
                F.lit(1 if h["is_current_ancestor"] else 0)
                .cast("long").alias("is_ancestor"),
                F.lit(1 if h["parent_id"] is not None else 0)
                .cast("long").alias("has_parent"),
                F.col("n_rows").cast("long"),
            )
        )
    return reduce(DataFrame.unionByName, frames).orderBy("ord")


@declare(
    "table_iceberg_refs_relation",
    oracle="""
    SELECT 'main' AS name, 'branch' AS rtype,
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'v1', 'tag',
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 2 = 0)
                AS BIGINT)
    """,
)
def table_iceberg_refs_relation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ``refs`` metadata table AS A RELATION (pipeline47's
    table_iceberg_refs reads THROUGH refs; this one lists them): every
    named ref plus the implicit main branch, each joined with a count
    at its snapshot.  After the rollback main reads the full two-append
    state (the delete snapshot is off the main line) while the ``v1``
    tag still pins the first append -- refs survive head moves
    untouched."""
    from functools import reduce

    from ..sources.iceberg import iceberg_refs, iceberg_scan

    path = _iceberg_rollback_layout(spark, sf_dir)
    frames = []
    for r in iceberg_refs(path):
        cnt = iceberg_scan(
            spark, path, snapshot_id=r["snapshot_id"]
        ).agg(F.count("*").alias("n_rows"))
        frames.append(
            cnt.select(
                F.lit(r["name"]).alias("name"),
                F.lit(r["type"]).alias("rtype"),
                F.col("n_rows").cast("long"),
            )
        )
    return reduce(DataFrame.unionByName, frames)


@declare(
    "table_iceberg_partitions",
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM supplier) AS BIGINT)
               AS data_records,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                AS BIGINT) AS pos_delete_records,
           CAST(0 AS BIGINT) AS eq_delete_records
    """,
)
def table_iceberg_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``partitions`` metadata table over the three-snapshot
    supplier history (pipeline58: two appends + a v2 position delete of
    the %10 keys): data record counts are NOT reduced by deletes (the
    spec -- they count rows in data files), while the delete files
    report their own record counts.  Agreement pins both sides of that
    contract, plus that delete manifests aggregate under content=1."""
    from ..sources.iceberg import iceberg_partitions
    from .pipeline58 import _iceberg_hist_layout

    path = _iceberg_hist_layout(spark, sf_dir)
    parts = iceberg_partitions(path)
    agg = {
        "data_records": sum(p["record_count"] for p in parts),
        "pos_delete_records": sum(
            p["position_delete_record_count"] for p in parts
        ),
        "eq_delete_records": sum(
            p["equality_delete_record_count"] for p in parts
        ),
    }
    return spark.createDataFrame(
        [(agg["data_records"], agg["pos_delete_records"],
          agg["eq_delete_records"])],
        "data_records long, pos_delete_records long, eq_delete_records long",
    )


@declare(
    "stream_delta_cdf_tail",
    oracle="""
    SELECT 'delete' AS change_type,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                + (SELECT COUNT(*) FROM supplier
                   WHERE s_suppkey % 7 = 0 AND s_suppkey % 10 <> 0)
                AS BIGINT) AS n,
           ROUND((SELECT SUM(s_acctbal) FROM supplier
                  WHERE s_suppkey % 10 = 0)
                 + (SELECT SUM(s_acctbal) FROM supplier
                    WHERE s_suppkey % 7 = 0 AND s_suppkey % 10 <> 0),
                 2) AS bal
    UNION ALL
    SELECT 'insert',
           CAST((SELECT COUNT(*) FROM supplier)
                + (SELECT COUNT(*) FROM supplier
                   WHERE s_suppkey % 7 = 0 AND s_suppkey % 10 <> 0)
                AS BIGINT),
           ROUND((SELECT SUM(s_acctbal) FROM supplier)
                 + (SELECT SUM(CAST(s_suppkey AS DOUBLE)) FROM supplier
                    WHERE s_suppkey % 7 = 0 AND s_suppkey % 10 <> 0),
                 2)
    """,
)
def stream_delta_cdf_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM the Change Data Feed (delta-spark's readChangeFeed
    streaming face): the delta_cdf_tail Python DataSource tails the
    CDF-enabled supplier table -- offsets are log versions, each
    micro-batch serves _cdf_pieces' plan for the pending range (cdc
    files verbatim for the DML commits, reconstruction for appends),
    one executor task per piece, real availableNow drain into a scratch
    sink.  The drained rows aggregate to the same DML replay the batch
    feed answers, so agreement proves the STREAMING face loses and
    duplicates nothing across the cdc and reconstruction paths."""
    import tempfile
    import uuid as _uuid

    from ..sources.delta_stream import register_delta_cdf_tail
    from .pipeline61 import _delta_cdf_files_layout

    table = _delta_cdf_files_layout(spark, sf_dir)
    register_delta_cdf_tail(spark)
    scratch = os.path.join(
        tempfile.gettempdir(), f"cdf_tail_drain_{_uuid.uuid4().hex[:8]}"
    )
    q = (
        spark.readStream.format("delta_cdf_tail")
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
        raise TimeoutError("delta_cdf_tail drain did not finish in 120s")
    t = spark.read.parquet(os.path.join(scratch, "out"))
    return t.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


@declare(
    "table_iceberg_manifests",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS content, CAST(2 AS BIGINT) AS n_manifests,
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT) AS live_records
    UNION ALL
    SELECT 1, 1,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 10 = 0)
                AS BIGINT)
    """,
)
def table_iceberg_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``manifests`` metadata table over the three-snapshot supplier
    history: two data manifests (one per append, carried forward by the
    delete snapshot's manifest list) and one delete manifest, with live
    record tallies read from manifest metadata alone.  Counts pin that
    appends CARRY earlier manifests forward instead of rewriting them
    and that the delete manifest accounts for exactly the %10 keys."""
    from ..sources.iceberg import iceberg_manifests
    from .pipeline58 import _iceberg_hist_layout

    path = _iceberg_hist_layout(spark, sf_dir)
    rows = [
        (m["content"], m["n_live_entries"], m["live_record_count"],
         m["length"])
        for m in iceberg_manifests(path)
    ]
    df = spark.createDataFrame(
        rows, "content long, n_entries long, records long, length long"
    )
    return df.groupBy("content").agg(
        F.count("*").alias("n_manifests"),
        F.sum("records").alias("live_records"),
    )


@declare(
    "table_hudi_fsview",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_groups, CAST(4 AS BIGINT) AS n_base,
           CAST((SELECT COUNT(*) FROM supplier WHERE s_suppkey % 13 <> 0)
                AS BIGINT) AS n_rows,
           ROUND((SELECT SUM(CASE WHEN s_suppkey % 7 = 0
                                  THEN -s_acctbal ELSE s_acctbal END)
                  FROM supplier WHERE s_suppkey % 13 <> 0), 2) AS bal
    """,
)
def table_hudi_fsview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hudi file-system view as a relation (the ``show_fsview``
    face) joined with the MOR snapshot it describes: the un-compacted
    MERGE_ON_READ layout resolves to exactly four file groups (the
    writer's bucket count), every group keeps its base file with log
    blocks stacked on top, and the snapshot aggregate proves those
    slices merge to the post-update post-delete supplier state."""
    from ..sources.hudi import hudi_fsview, hudi_scan
    from .pipeline50 import _hudi_mor_layout

    path = _hudi_mor_layout(spark, sf_dir)
    view = hudi_fsview(path)
    n_groups = len(view)
    n_base = sum(1 for g in view if g["has_base"])
    agg = hudi_scan(spark, path).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )
    return agg.select(
        F.lit(n_groups).cast("long").alias("n_groups"),
        F.lit(n_base).cast("long").alias("n_base"),
        F.col("n_rows").cast("long"),
        F.col("bal"),
    )


def _hudi_restore_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) a CoW Hudi table whose history exercised the
    full disaster-recovery cycle: even-key insert, a %10 balance upsert,
    a SAVEPOINT pinning that state, a third (bad) commit zeroing %4
    balances, then RESTORE back to the savepoint -- so the stable layout
    IS the post-restore snapshot."""
    from ..sources.hudi import (
        hudi_restore,
        hudi_savepoint,
        hudi_timeline,
        hudi_write,
    )

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudirestore11".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_hudirestore_{digest}")
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            hudi_write(spark, tmp, sup.where(F.col("s_suppkey") % 2 == 0),
                       record_key="s_suppkey")
            hudi_write(
                spark, tmp,
                sup.where(F.col("s_suppkey") % 10 == 0).withColumn(
                    "s_acctbal", F.col("s_acctbal") + 1000.0
                ),
                record_key="s_suppkey",
            )
            good = hudi_timeline(tmp)[-1]["instant"]
            hudi_savepoint(tmp, good, comment="known-good v2")
            hudi_write(
                spark, tmp,
                sup.where(F.col("s_suppkey") % 4 == 0).withColumn(
                    "s_acctbal", F.lit(-1.0)
                ),
                record_key="s_suppkey",
            )
            res = hudi_restore(tmp, good)
            assert res["restored_to"] == good and len(res["rolled_back"]) == 1
    return path


@declare(
    "table_hudi_restore",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                          THEN s_acctbal + 1000.0
                          ELSE s_acctbal END), 2) AS bal
    FROM supplier
    WHERE s_suppkey % 2 = 0
    GROUP BY s_nationkey
    """,
)
def table_hudi_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi SAVEPOINT + RESTORE (four-format disaster-recovery parity
    with table_delta_restore / iceberg rollback_to_snapshot): the layout
    savepointed its known-good second commit, took a corrupting third
    commit, and restored -- rolling the timeline back and physically
    deleting the bad commit's files.  The oracle states the SECOND
    commit's snapshot, so agreement proves the restore landed exactly on
    the savepoint (the corrupting -1.0 balances are gone) and that the
    restore action itself stays invisible to snapshot resolution."""
    from ..sources.hudi import hudi_scan, hudi_timeline

    path = _hudi_restore_layout(spark, sf_dir)
    assert len(hudi_timeline(path)) == 2  # third commit rolled back
    s = hudi_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


def _hudi_ingest_layout(spark: SparkSession, sf_dir: str) -> str:
    """CoW Hudi table fed by a REAL Structured Streaming run through the
    exactly-once ingest sink (streaming/jobs.py::stream_into_hudi --
    replay markers in commit metadata).  The ingest is run TWICE from a
    fresh checkpoint on purpose: the second run replays every batch and
    the markers must no-op them, so the layout re-proves idempotence
    each time it is built."""
    from ..sources.hudi import hudi_timeline
    from ..streaming.jobs import stream_into_hudi

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:hudiingest11".encode()
    ).hexdigest()[:12]
    root = os.path.join(_LAYOUT_ROOT, f"orders_hudiingest_{digest}")
    table = os.path.join(root, "table")
    if not os.path.isdir(os.path.join(table, ".hoodie")):
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

        stream_into_hudi(stream(), table, os.path.join(root, "ckpt"),
                         record_key="o_orderkey", app_id="orders-ingest")
        n_commits = len(hudi_timeline(table))
        # replay from a LOST checkpoint: markers must no-op every batch
        stream_into_hudi(stream(), table, os.path.join(root, "ckpt2"),
                         record_key="o_orderkey", app_id="orders-ingest")
        if len(hudi_timeline(table)) != n_commits:
            raise RuntimeError(
                "hudi ingest idempotence failed: replay re-committed"
            )
    return table


@declare(
    "stream_hudi_ingest",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def stream_hudi_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingest INTO Hudi -- completing ingest+tail
    symmetry across all four formats (Delta, Iceberg, Hive ACID MM, now
    Hudi): each micro-batch upserts with an ingest marker in its commit
    metadata (the deltastreamer-checkpoint slot), so replayed batches
    are skipped table-side.  The layout replays the whole stream from a
    fresh checkpoint and asserts zero re-commits; the oracle aggregates
    the ORIGINAL orders, so agreement proves the streamed rows landed
    exactly once."""
    from ..sources.hudi import hudi_scan

    table = _hudi_ingest_layout(spark, sf_dir)
    t = hudi_scan(spark, table)
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


def _delta_row_tracking_layout(spark: SparkSession, sf_dir: str) -> str:
    """Row-tracking Delta table (delta.enableRowTracking=true): even-key
    suppliers written as ONE sorted file (so fresh row ids = suppkey
    rank), then an UPDATE of the %10 keys -- DV delete + post-image
    re-insert whose materialized _row_id column preserves the victims'
    original ids (the spec's stable-row-id contract)."""
    from ..sources.delta_log import delta_update, delta_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:deltarowtrack11".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_deltart_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier").where(
                F.col("s_suppkey") % 2 == 0
            )
            delta_write(
                sup.repartition(1).sortWithinPartitions("s_suppkey"),
                tmp,
                configuration={"delta.enableRowTracking": "true"},
            )
            delta_update(
                spark, tmp, "s_suppkey % 10 = 0",
                {"s_acctbal": "s_acctbal + 1000.0"},
            )
    return path


@declare(
    "table_delta_row_tracking",
    oracle="""
    SELECT s_suppkey,
           CAST(ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS BIGINT)
               AS _row_id,
           CAST(CASE WHEN s_suppkey % 10 = 0 THEN 2 ELSE 0 END AS BIGINT)
               AS _row_commit_version,
           ROUND(CASE WHEN s_suppkey % 10 = 0
                      THEN s_acctbal + 1000.0
                      ELSE s_acctbal END, 2) AS bal
    FROM supplier WHERE s_suppkey % 2 = 0
    """,
)
def table_delta_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ROW TRACKING read side (the newest protocol feature real
    delta-spark tables increasingly carry): _row_id = a materialized
    _row_id parquet column when the file has one, else the add's
    baseRowId + in-file position; _row_commit_version = the add's
    defaultRowCommitVersion.  The layout wrote one sorted file (fresh
    ids = suppkey rank) then UPDATEd the %10 keys, so the oracle's
    rank-derived ids certify BOTH halves: updated rows kept their
    original row ids through the DV-delete + re-insert (stability) and
    carry commit version 2 (the updating commit), untouched rows keep
    version 0."""
    from ..sources.delta_log import delta_scan

    path = _delta_row_tracking_layout(spark, sf_dir)
    s = delta_scan(spark, path, with_row_tracking=True)
    return s.select(
        "s_suppkey",
        F.col("_row_id"),
        F.col("_row_commit_version"),
        F.round("s_acctbal", 2).alias("bal"),
    )


def _iceberg_row_lineage_layout(spark: SparkSession, sf_dir: str) -> str:
    """v3 row-lineage Iceberg table: even-key suppliers as ONE sorted
    file (fresh row ids = suppkey rank), a position DELETE of the %10
    keys (files untouched -- survivors keep ids naturally), then
    rewrite-data-files compaction, which MATERIALIZES each survivor's
    _row_id / _last_updated_sequence_number into the rewritten file per
    the spec's lineage-preservation rule."""
    from ..sources.iceberg import (
        iceberg_compact,
        iceberg_delete,
        iceberg_write,
    )

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:iceberglineage11".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_iceberg_rl_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier").where(
                F.col("s_suppkey") % 2 == 0
            )
            iceberg_write(
                sup.repartition(1).sortWithinPartitions("s_suppkey"),
                tmp, row_lineage=True,
            )
            iceberg_delete(spark, tmp, "s_suppkey % 10 = 0")
            iceberg_compact(spark, tmp)
    return path


@declare(
    "table_iceberg_row_lineage",
    oracle="""
    WITH base AS (
      SELECT s_suppkey, s_acctbal,
             ROW_NUMBER() OVER (ORDER BY s_suppkey) - 1 AS rid
      FROM supplier WHERE s_suppkey % 2 = 0)
    SELECT s_suppkey, CAST(rid AS BIGINT) AS _row_id,
           CAST(1 AS BIGINT) AS _last_updated_sequence_number,
           ROUND(s_acctbal, 2) AS bal
    FROM base WHERE s_suppkey % 10 <> 0
    """,
)
def table_iceberg_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 ROW LINEAGE (the format-v3 twin of
    table_delta_row_tracking): _row_id = the manifest entry's
    first_row_id + in-file position, or the materialized _row_id column
    after a rewrite; _last_updated_sequence_number likewise.  The layout
    wrote one sorted file (ids = suppkey rank), position-deleted the %10
    keys, then COMPACTED -- so the oracle's rank-derived ids certify
    that (a) survivors kept their original ids through both the delete
    and the rewrite, and (b) the materialized sequence number still says
    1 (the commit that last wrote the rows), not the compaction's own
    sequence."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_row_lineage_layout(spark, sf_dir)
    s = iceberg_scan(spark, path, with_row_lineage=True)
    return s.select(
        "s_suppkey",
        F.col("_row_id"),
        F.col("_last_updated_sequence_number"),
        F.round("s_acctbal", 2).alias("bal"),
    )


@declare(
    "table_hudi_savepoints",
    oracle="""
    SELECT CAST(1 AS BIGINT) AS n_savepoints,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                          THEN s_acctbal + 1000.0
                          ELSE s_acctbal END), 2) AS bal
    FROM supplier WHERE s_suppkey % 2 = 0
    """,
)
def table_hudi_savepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The savepoints metadata face (show_savepoints): the restore
    layout carries exactly ONE savepoint -- the known-good pin the
    restore landed on -- and the query joins the savepoint listing with
    the snapshot read AS OF the savepointed instant, so one oracle
    certifies both the listing and that the pinned snapshot still
    serves (the cleaner honored the pin)."""
    from ..sources.hudi import _savepoints, hudi_scan

    path = _hudi_restore_layout(spark, sf_dir)
    sps = _savepoints(path)
    assert all(
        p.get("savepointDataFile")
        for m in sps.values()
        for p in (m.get("partitionMetadata") or {}).values()
    ), "savepoint metadata must name pinned files"
    [instant] = sps
    agg = hudi_scan(spark, path, as_of=instant).agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )
    return agg.select(
        F.lit(len(sps)).cast("long").alias("n_savepoints"),
        F.col("n_supp").cast("long"),
        F.col("bal"),
    )
