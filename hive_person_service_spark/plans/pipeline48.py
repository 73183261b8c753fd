"""Round-6 batch 48: Iceberg format-version 3 — deletion vectors in
Puffin files.

v3 replaces v2's position-delete parquet files with per-data-file
roaring bitmaps stored as ``deletion-vector-v1`` blobs in Puffin files
(sources/puffin.py implements both public specs in-repo). The declared
query proves the WHOLE path — bitmap serialization, Puffin framing,
manifest pointer fields, the replacement rule (a new DV supersedes all
earlier deletes of its file, so the writer folds prior v2 positions into
each bitmap), and the distributed positional anti-join — against an
oracle on the ORIGINAL parquet.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _atomic_layout
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def _iceberg_v3_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) an Iceberg table whose
    deletes arrive in TWO generations: first a v2 POSITION-DELETE commit
    (negative balances), then a v3 DELETION-VECTOR commit (nation 5).
    The DV writer must fold the v2 positions of every file it touches
    into the replacement bitmaps (the spec's "a DV replaces all previous
    deletes" rule), and the reader must ignore position-delete rows for
    DV-covered files -- this layout makes both halves observable."""
    from ..sources.iceberg import iceberg_delete, iceberg_delete_dv, iceberg_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:icebergv3dv".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_icebergv3_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            iceberg_write(sup.where(F.col("s_suppkey") % 2 == 0), tmp)
            iceberg_write(sup.where(F.col("s_suppkey") % 2 == 1), tmp)
            iceberg_delete(spark, tmp, "s_acctbal < 0")
            iceberg_delete_dv(spark, tmp, "s_nationkey = 5")
    return path


@declare(
    "table_iceberg_v3_dv_scan",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal,
           MAX(s_suppkey) AS max_key
    FROM supplier
    WHERE NOT (s_acctbal < 0) AND s_nationkey <> 5
    GROUP BY s_nationkey
    """,
)
def table_iceberg_v3_dv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 DELETION-VECTOR read path: negative-balance suppliers
    were position-deleted (v2 parquet delete file), then nation 5 was
    deleted as roaring bitmaps framed as ``deletion-vector-v1`` Puffin
    blobs (v3), upgrading the table to format-version 3. Files touched by
    the DV commit carry bitmaps that FOLD IN their earlier v2 positions
    (the replacement rule), and the scan ignores position-delete rows for
    DV-covered files while still applying them to uncovered ones. The
    oracle filters the ORIGINAL parquet by both predicates, so a match
    proves the bitmap codec, the Puffin framing, the manifest pointer
    fields AND the supersede semantics are all exact."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_v3_layout(spark, sf_dir)
    s = iceberg_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
        F.max("s_suppkey").alias("max_key"),
    )


def _uniform_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a Delta table of supplier
    (two appends) converted UniForm-style: Iceberg metadata written next
    to the Delta log, referencing the SAME parquet files. The conversion
    runs after the first commit AND again after the second, so the layout
    exercises the incremental re-sync, not just first contact."""
    from ..sources.convert import iceberg_from_delta
    from ..sources.delta_log import delta_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:uniform".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_uniform_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            delta_write(sup.where(F.col("s_suppkey") % 2 == 0), tmp, mode="append")
            iceberg_from_delta(tmp)
            delta_write(sup.where(F.col("s_suppkey") % 2 == 1), tmp, mode="append")
            iceberg_from_delta(tmp)
    return path


@declare(
    "table_uniform_iceberg_read",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def table_uniform_iceberg_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta UniForm read path (sources/convert.py): the table was
    written as DELTA commits, then Iceberg metadata was generated
    metadata-only against the same parquet files -- and this query reads
    it through the ICEBERG client. A hash match against the original
    supplier parquet proves the converted metadata references exactly the
    live Delta file set (the re-sync after the second commit included).
    No data file was copied: the conversion is KBs of JSON/Avro, the
    property that makes UniForm viable at 100 TB."""
    from ..sources.iceberg import iceberg_scan

    path = _uniform_layout(spark, sf_dir)
    s = iceberg_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


def _convert_to_delta_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) an Iceberg table of
    supplier (two append snapshots) converted to Delta (``CONVERT TO
    DELTA``): a version-0 Delta commit referencing the same parquet
    files, with footer-derived per-file stats."""
    from ..sources.convert import delta_from_iceberg
    from ..sources.iceberg import iceberg_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:conv2delta".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_conv2delta_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            iceberg_write(sup.where(F.col("s_suppkey") % 2 == 0), tmp)
            iceberg_write(sup.where(F.col("s_suppkey") % 2 == 1), tmp)
            delta_from_iceberg(tmp)
    return path


@declare(
    "table_convert_to_delta",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def table_convert_to_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CONVERT TO DELTA`` read path (sources/convert.py): the table was
    written as ICEBERG snapshots, a metadata-only Delta log was generated
    over the same parquet files, and this query reads it through the
    DELTA client. The oracle over the original supplier parquet proves
    the converted log references exactly the Iceberg snapshot's live
    file set."""
    from ..sources.delta_log import delta_scan

    path = _convert_to_delta_layout(spark, sf_dir)
    s = delta_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


def _delta_v2ckpt_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a Delta table of supplier
    whose snapshot must be reconstructed THROUGH a V2 (UUID-named)
    checkpoint: three commits, a V2 checkpoint (manifest + two sidecars),
    then one more commit replaying on top."""
    from ..sources.delta_log import delta_write, write_checkpoint_v2

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:deltav2ckpt".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_v2ckpt_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            for k in range(3):
                delta_write(sup.where(F.col("s_suppkey") % 4 == k), tmp,
                            mode="append")
            write_checkpoint_v2(tmp, n_sidecars=2)
            delta_write(sup.where(F.col("s_suppkey") % 4 == 3), tmp,
                        mode="append")
    return path


@declare(
    "table_delta_v2_checkpoint_scan",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def table_delta_v2_checkpoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta V2-checkpoint read path (the modern UUID-named layout:
    ``<v>.checkpoint.<uuid>.parquet`` manifest + add actions in
    ``_delta_log/_sidecars/`` parts): the scan reconstructs the snapshot
    from the manifest's sidecar pointers, then replays the one JSON
    commit issued AFTER the checkpoint. The oracle over the full original
    supplier table proves no file was lost or duplicated across the
    sidecar split and the post-checkpoint replay."""
    from ..sources.delta_log import delta_scan

    path = _delta_v2ckpt_layout(spark, sf_dir)
    s = delta_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


def _delta_clone_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) a SHALLOW CLONE of the
    shared supplier Delta layout (pipeline44's ``_delta_layout`` -- the
    clone must reference the source at its FINAL path, since absolute
    add paths are the clone mechanism), then DV-delete the negative
    balances IN THE CLONE ONLY: the bitmaps land in the clone dir while
    the data files stay shared with (and untouched in) the source."""
    from ..sources.delta_log import delta_clone, delta_delete
    from .pipeline44 import _delta_layout

    srcdir = _delta_layout(spark, sf_dir)
    st = os.stat(os.path.join(sf_dir, "supplier.parquet"))
    digest = hashlib.sha1(
        f"{srcdir}:{st.st_mtime_ns}:{st.st_size}:deltaclone".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_clone_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            delta_clone(srcdir, tmp)
            delta_delete(spark, tmp, "s_acctbal < 0")
    return path


@declare(
    "table_delta_shallow_clone",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    WHERE NOT (s_acctbal < 0)
    GROUP BY s_nationkey
    """,
)
def table_delta_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE read path: the clone's log references the source's
    data files by absolute path (zero bytes copied), and the
    negative-balance DELETE committed to the CLONE wrote deletion vectors
    in the clone dir against the shared files. The oracle filtering the
    original supplier parquet proves the clone sees exactly the source
    rows minus its own deletes -- while tests pin that the source table
    itself still serves every row (copy-on-write isolation)."""
    from ..sources.delta_log import delta_scan

    path = _delta_clone_layout(spark, sf_dir)
    s = delta_scan(spark, path)
    return s.groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("bal"),
    )


_TWS_SESSIONS_ORACLE = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
FROM (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     <= INTERVAL 30 MINUTE
                THEN 0 ELSE 1 END AS new_sess
    FROM events))
GROUP BY user_id, session_id
"""


@declare("stream_tws_sessions", oracle=_TWS_SESSIONS_ORACLE)
def stream_tws_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (30 min) as ARBITRARY STATEFUL streaming on
    transformWithStateInPandas: the per-user event-time buffer lives in a
    typed ListState on RocksDB, the session list is recomputed from the
    full buffer each update (exact under any micro-batch split AND
    out-of-order arrival -- a late early event that merges two sessions
    is handled, where incremental merge logic breaks), and every update
    emits the user's current session list stamped with its strictly
    increasing buffered-event count. Keeping each user's max-count
    emission relationally selects the FINAL session list, which must
    equal the batch window-function sessionization -- the same oracle as
    events_sessionize minus the session ordinal. This is the §2.I
    capstone: ListState + real micro-batch replay + the vendored
    protobuf side channel, oracle-checked."""
    from ..session import configure
    from ..streaming.jobs import read_events_stream, run_to_memory_sink
    from ..streaming.stateful_v2 import rocksdb_state_provider, sessionize_v2

    configure(spark)  # arms the protobuf shim for this session's workers
    events = read_events_stream(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tsu")
    )
    with rocksdb_state_provider(spark):
        out = run_to_memory_sink(
            sessionize_v2(events), spark, output_mode="update"
        )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    final = (
        out.withColumn("__mx", F.max("n_total").over(w))
        .where(F.col("n_total") == F.col("__mx"))
        .drop("__mx")
        .distinct()
    )
    return final.select(
        "user_id",
        "n_events",
        F.date_format(
            F.timestamp_micros("start_us"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("session_start"),
        F.date_format(
            F.timestamp_micros("end_us"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("session_end"),
    )


def _iceberg_stats_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) an Iceberg supplier table
    with a PUBLISHED statistics file: per-column KMV NDV sketches as
    Puffin blobs registered in the metadata ``statistics`` field."""
    from ..sources.iceberg import iceberg_write, iceberg_write_stats

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:icestats".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_icestats_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            iceberg_write(sup, tmp)
            iceberg_write_stats(
                spark, tmp, ["s_suppkey", "s_nationkey", "s_name"], k=64
            )
    return path


@declare(
    "table_iceberg_puffin_stats",
    oracle="""
    WITH vals AS (
      SELECT 's_suppkey' AS col, CAST(s_suppkey AS VARCHAR) AS v FROM supplier
      UNION ALL
      SELECT 's_nationkey', CAST(s_nationkey AS VARCHAR) FROM supplier
      UNION ALL
      SELECT 's_name', s_name FROM supplier),
    d AS (SELECT DISTINCT col, v FROM vals WHERE v IS NOT NULL),
    hv AS (SELECT col, v,
                  ('0x' || substr(md5(v), 1, 8))::UBIGINT AS h FROM d),
    rk AS (SELECT col, h,
                  row_number() OVER (PARTITION BY col ORDER BY h, v) AS rn,
                  COUNT(*) OVER (PARTITION BY col) AS n
           FROM hv)
    SELECT col AS column,
           CASE WHEN n >= 64
                THEN ROUND(63.0 * 4294967296.0 / h, 4)
                ELSE CAST(n AS DOUBLE) END AS ndv
    FROM rk
    WHERE rn = CASE WHEN n >= 64 THEN 64 ELSE n END
    """,
)
def table_iceberg_puffin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg TABLE STATISTICS round trip: per-column KMV NDV sketches
    published as Puffin blobs (one per column, the k minimum 32-bit
    hashes as the mergeable state) and registered in the metadata
    ``statistics`` field; this query reads the estimates back
    METADATA-ONLY via ``iceberg_ndv`` (a Puffin footer read -- the CBO
    consumption path, no data touched). The deterministic md5-KMV
    estimator makes the estimate itself oracle-checkable: the DuckDB
    oracle replays hash -> k-th minimum -> (k-1)*2^32/h per column
    (exact-count branch when a column has fewer than k distinct values,
    which s_nationkey exercises). Proves the sketch build, the Puffin
    blob framing, the metadata registration AND the footer read-back in
    one hash compare."""
    from ..sources.iceberg import iceberg_ndv

    path = _iceberg_stats_layout(spark, sf_dir)
    ndv = iceberg_ndv(path)
    return spark.createDataFrame(
        sorted(ndv.items()), "column string, ndv double"
    )
