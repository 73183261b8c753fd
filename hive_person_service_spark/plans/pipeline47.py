"""Batch 22 — transformWithStateInPandas EXECUTED end-to-end + WARC
(Common-Crawl) ingestion.

The arbitrary-stateful row of SURVEY.md §2.I, previously pytest-pinned up
to execution (the state side channel needs a protobuf runtime the
container doesn't ship), now runs for real: the vendored pure-Python wire
shim (vendor/protobuf_shim) serves the worker<->JVM state-server protocol,
and these queries drive the v2 typed-state API (ValueState / MapState on
RocksDB) through the STREAMING engine and oracle-check the drained result
against DuckDB.

Scale shape: one shuffle on the grouping key, O(keys) state partitioned
across executors in RocksDB, per-key Arrow batches to Python — the same
plan at 100 TB with checkpointing giving exactly-once state updates.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")

_TWS_TOTALS_ORACLE = """
SELECT user_id,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@declare("stream_tws_totals", oracle=_TWS_TOTALS_ORACLE)
def stream_tws_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, sum) held in a typed ValueState via
    transformWithStateInPandas, executed by the STREAMING engine (file
    source -> RocksDB-backed state -> update-mode memory sink, drained
    with availableNow). Each update row carries the key's running totals;
    the final state per key is the max-(n_events) update (n_events is
    strictly increasing per key). Equals the batch groupBy — which is the
    oracle. The applyInPandasWithState twin is stream_live_stateful; this
    row pins the SUCCESSOR API end-to-end, protobuf side channel included."""
    from ..session import configure
    from ..streaming.jobs import read_events_stream, run_to_memory_sink
    from ..streaming.stateful_v2 import (
        rocksdb_state_provider,
        running_user_totals_v2,
    )

    configure(spark)  # arms the protobuf shim for this session's workers
    events = read_events_stream(spark, sf_dir)
    with rocksdb_state_provider(spark):
        out = run_to_memory_sink(
            running_user_totals_v2(events), spark, output_mode="update"
        )
    final = (
        out.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("m"))
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.round(F.col("m.total_value"), 4).alias("total_value"),
        )
    )
    return final.orderBy("user_id")


_TWS_MAP_ORACLE = """
SELECT user_id,
       event_type,
       COUNT(*)::BIGINT AS n
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


@declare("stream_tws_map_counts", oracle=_TWS_MAP_ORACLE)
def stream_tws_map_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event_type -> count held in a typed MapState (the per-entity
    attribute-counter shape: quota meters, per-channel frequency caps).
    Every micro-batch the processor emits the key's full current map; the
    newest emission per (user, type) — max n, counts only grow — is the
    final state, which must equal the two-key batch groupBy oracle. Runs
    the MapState protocol surface (containsKey / getValue / updateValue /
    iterator) through the state server end-to-end."""
    from ..session import configure
    from ..streaming.jobs import read_events_stream, run_to_memory_sink
    from ..streaming.stateful_v2 import (
        event_type_counts_v2,
        rocksdb_state_provider,
    )

    configure(spark)  # arms the protobuf shim for this session's workers
    events = read_events_stream(spark, sf_dir)
    with rocksdb_state_provider(spark):
        out = run_to_memory_sink(
            event_type_counts_v2(events), spark, output_mode="update"
        )
    final = (
        out.groupBy("user_id", "event_type")
        .agg(F.max("n").alias("n"))
        .orderBy("user_id", "event_type")
    )
    return final


def _warc_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per fixture identity) the documents table as a
    directory of .warc.gz conversion archives — the atomic temp-dir+rename
    build pipeline44 uses, keyed on the source parquet's identity."""
    from .pipeline44 import _atomic_layout
    from ..sources import load_table
    from ..sources.warc import write_warc_files

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:warc-cdx".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"documents_warc_{digest}")
    if not os.path.isdir(path):
        with _atomic_layout(path) as tmp:
            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", "text", "lang", "source"
            )
            write_warc_files(docs, tmp, n_files=8, cdx=True)
    return path


_WARC_ORACLE = """
SELECT doc_id,
       lang,
       LENGTH(text)::BIGINT AS n_chars
FROM documents
ORDER BY doc_id
"""


@declare("source_warc_roundtrip", oracle=_WARC_ORACLE)
def source_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped ingestion: the documents corpus serialized as
    gzip-member-per-record WARC/1.1 conversion archives (ISO 28500, the
    WET shape) and read back through the ``warc`` Python DataSource —
    file-per-partition parallelism, binary payloads decoded only in this
    projection. Every document must survive byte-exactly: doc id from the
    extension header, text length recomputed FROM THE PAYLOAD, both
    matching the source-of-truth parquet row (the oracle). At 100 TB the
    identical plan reads ~100k archive files as ~100k tasks; planning cost
    is a file listing, payload bytes cross Arrow exactly once."""
    from ..sources.warc import register_warc_source

    path = _warc_layout(spark, sf_dir)
    register_warc_source(spark)
    recs = spark.read.format("warc").option("path", path).load()
    return (
        recs.select(
            F.element_at("headers", "WARC-X-Doc-Id")
            .cast("bigint")
            .alias("doc_id"),
            F.element_at("headers", "WARC-X-Lang").alias("lang"),
            F.length(F.col("payload").cast("string")).alias("n_chars"),
        )
        .orderBy("doc_id")
    )


_CDX_ORACLE = """
SELECT doc_id,
       LENGTH(text)::BIGINT AS n_chars
FROM documents
WHERE doc_id % 17 = 3
ORDER BY doc_id
"""


@declare("source_warc_cdx_fetch", oracle=_CDX_ORACLE)
def source_warc_cdx_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-driven RANDOM ACCESS into the WARC tier: the .cdxj capture
    index (SURT key + offset/length per gzip member — the Common-Crawl
    index shape) joined against a broadcast fetch list; each task seeks
    straight to its hit members, so bytes read scale with the HITS, never
    the corpus (pinned in tests/test_warc.py). The fetched payloads'
    recomputed lengths must match the source-of-truth parquet rows — at
    100 TB this is the \"re-pull these 10k documents\" shape that full
    archive scans can't serve."""
    from ..sources.warc import read_warc_records_by_index

    path = _warc_layout(spark, sf_dir)
    wanted = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .where(F.col("doc_id") % 17 == 3)
        .select("doc_id")
    )
    recs = read_warc_records_by_index(spark, path, wanted)
    return recs.select(
        "doc_id",
        F.length(F.col("payload").cast("string")).alias("n_chars"),
    ).orderBy("doc_id")


def _delta_restore_layout(spark: SparkSession, sf_dir: str) -> str:
    """Supplier as Delta across four commits: v0 even keys, v1 append odd
    keys, v2 DELETE negative balances, v3 RESTORE to v1 — so HEAD must
    hold the FULL relation again iff restore exactly undid the delete."""
    from .pipeline44 import _atomic_layout
    from ..sources import load_table
    from ..sources.delta_log import delta_delete, delta_restore, delta_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:delta-restore".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_delta_restore_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            delta_write(sup.where(F.col("s_suppkey") % 2 == 0), tmp)
            delta_write(sup.where(F.col("s_suppkey") % 2 == 1), tmp)
            delta_delete(spark, tmp, "s_acctbal < 0")
            delta_restore(tmp, 1)
    return path


@declare(
    "table_delta_restore",
    oracle="""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           CAST(SUM(CASE WHEN s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def table_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta RESTORE (roll the table back to an earlier version as a NEW
    commit — delta-spark's RestoreTableCommand shape): after a DELETE
    removed every negative balance, RESTORE TO VERSION 1 must bring those
    rows back by re-adding the retired files in one metadata-only commit.
    HEAD's aggregate therefore equals the FULL supplier relation —
    including per-nation negative-balance counts, which are exactly the
    rows the delete dropped; any under-restore flips n_negative. Time
    travel above the restore still sees the deleted state (pytest-pinned
    with the history's RESTORE row, tests/test_lake_refs_restore.py)."""
    from ..sources.delta_log import delta_scan

    path = _delta_restore_layout(spark, sf_dir)
    s = delta_scan(spark, path)
    return (
        s.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum(
                F.when(F.col("s_acctbal") < 0, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_negative"),
            F.round(F.sum("s_acctbal"), 2).alias("bal"),
        )
        .orderBy("s_nationkey")
    )


def _iceberg_refs_layout(spark: SparkSession, sf_dir: str) -> str:
    """Supplier as Iceberg with a release TAG and an experiment BRANCH:
    base commit (keys %3==0) tagged 'rel1'; main advances with %3==1;
    branch 'exp' forks from the tag and appends %3==2 — three refs,
    three DIFFERENT live row sets in one table."""
    from .pipeline44 import _atomic_layout
    from ..sources import load_table
    from ..sources.iceberg import iceberg_set_ref, iceberg_write

    src = os.path.join(sf_dir, "supplier.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:iceberg-refs".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"supplier_iceberg_refs_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            sup = load_table(spark, sf_dir, "supplier")
            base = iceberg_write(sup.where(F.col("s_suppkey") % 3 == 0), tmp)
            iceberg_set_ref(tmp, "rel1", "tag", base)
            iceberg_set_ref(tmp, "exp", "branch", base)
            iceberg_write(sup.where(F.col("s_suppkey") % 3 == 1), tmp)
            iceberg_write(
                sup.where(F.col("s_suppkey") % 3 == 2), tmp, branch="exp"
            )
    return path


@declare(
    "table_iceberg_refs",
    oracle="""
    SELECT 'exp' AS ref_name,
           CAST(COUNT(*) AS BIGINT) AS n_supp,
           ROUND(SUM(s_acctbal), 2) AS bal
    FROM supplier WHERE s_suppkey % 3 IN (0, 2)
    UNION ALL
    SELECT 'main', CAST(COUNT(*) AS BIGINT), ROUND(SUM(s_acctbal), 2)
    FROM supplier WHERE s_suppkey % 3 IN (0, 1)
    UNION ALL
    SELECT 'rel1', CAST(COUNT(*) AS BIGINT), ROUND(SUM(s_acctbal), 2)
    FROM supplier WHERE s_suppkey % 3 = 0
    ORDER BY ref_name
    """,
)
def table_iceberg_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg refs (the spec's ``refs`` map): a release TAG pinning the
    base snapshot, MAIN advanced past it, and an experiment BRANCH forked
    from the tag whose append moved ONLY the branch head. Reading all
    three through ``iceberg_scan(ref=...)`` must yield three different
    row sets from one table — branch isolation both ways (main doesn't
    see the branch append; the branch doesn't see main's). This is the
    write-audit-publish workflow every production Iceberg lake runs."""
    from ..sources.iceberg import iceberg_scan

    path = _iceberg_refs_layout(spark, sf_dir)

    def agg(ref: str) -> DataFrame:
        return (
            iceberg_scan(spark, path, ref=ref)
            .agg(
                F.count("*").alias("n_supp"),
                F.round(F.sum("s_acctbal"), 2).alias("bal"),
            )
            .select(F.lit(ref).alias("ref_name"), "n_supp", "bal")
        )

    return (
        agg("exp").unionAll(agg("main")).unionAll(agg("rel1"))
        .orderBy("ref_name")
    )


@declare(
    "multimodal_jpeg_hier",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(16 + doc_id % 8 AS BIGINT) AS width,
           CAST(16 + doc_id % 5 AS BIGINT) AS height,
           TRUE AS hier_exact,
           TRUE AS sof11_exact,
           TRUE AS smaller
    FROM documents
    WHERE doc_id % 4 = 1
    """,
)
def multimodal_jpeg_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE T.81 frame matrix through the engine: HIERARCHICAL
    sequences (Annex J — DHP header, lossless SOF3 and lossy SOF0 initial
    frames, EXP upsampling; operators/jpeg_hier.py) whose DIFFERENTIAL
    coding process rotates by asset id across all six kinds — SOF7
    (lossless Huffman), SOF15 (lossless arithmetic), and the lossy
    SOF5/SOF6/SOF13/SOF14 DCT refinements with their final lossless
    correction stage (operators/jpeg_diff.py) — plus LOSSLESS ARITHMETIC
    standalone frames (SOF11, Annex H.2 QM coder;
    operators/jpeg_arith.py). Per sampled document: synthesize the
    deterministic pixel pattern, then assert (a) ``hier_exact`` — BOTH
    hierarchical arrangements decode bit-exactly through
    decode_jpeg_gray's dispatch whatever the differential kind,
    (b) ``sof11_exact`` — the arithmetic lossless round trip is
    bit-exact, (c) ``smaller`` — the adaptive QM coder beat the Huffman
    SOF3 twin. The DuckDB oracle predicts all three flags TRUE plus the
    id-derived dimensions, so every SOF family the spec defines
    (0-3, 5-7, 9-11, 13-15) is oracle-CHECKED. Arrow-batched
    mapInPandas, one Python pass per blob."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from ..operators.jpeg import decode_jpeg_gray, encode_jpeg_lossless_gray
    from ..operators.jpeg_arith import encode_jpeg_arith_lossless_gray
    from ..operators.jpeg_hier import encode_jpeg_hier_gray
    from ..sources import load_table

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 1)
        .select(F.col("doc_id").alias("asset_id"))
        .repartition(spark.sparkContext.defaultParallelism)
    )
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("hier_exact", BooleanType()),
            StructField("sof11_exact", BooleanType()),
            StructField("smaller", BooleanType()),
        ]
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid in pdf["asset_id"].astype("int64"):
                w = 16 + int(aid) % 8
                h = 16 + int(aid) % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((3 * x + 7 * y + int(aid)) % 256).astype(np.uint8)
                # rotate (initial frame, differential kind) by asset id:
                # 12 combos cover the FULL frame matrix corpus-wide
                # (SOF7 / SOF15 exact stages; SOF5/6/13/14 lossy stages
                # + final lossless correction) at one pyramid per asset
                kinds = ("lossless", "lossless_arith", "dct", "dct_prog",
                         "arith", "arith_prog")
                combo = int(aid) % (2 * len(kinds))
                hier = encode_jpeg_hier_gray(
                    px,
                    levels=2,
                    base="lossless" if combo < len(kinds) else "dct",
                    diff_kind=kinds[combo % len(kinds)],
                )
                arith = encode_jpeg_arith_lossless_gray(px)
                huff = encode_jpeg_lossless_gray(px)
                hier_ok = bool(np.array_equal(decode_jpeg_gray(hier), px))
                sof11_ok = bool(
                    np.array_equal(decode_jpeg_gray(arith), px)
                )
                out.append(
                    (int(aid), w, h, hier_ok, sof11_ok, len(arith) < len(huff))
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "width",
                    "height",
                    "hier_exact",
                    "sof11_exact",
                    "smaller",
                ],
            )

    return d.mapInPandas(work, schema)
