"""Round-8 continuation: the STORAGE-MAINTENANCE lifecycle, one query.

``table_lake_maintenance`` runs the full maintenance story every lake
operator schedules nightly -- layout optimization THEN retention
cleanup -- on all three open table formats, and proves data integrity
through it cross-engine:

* Delta:   write -> DELETE WHERE -> OPTIMIZE (file compaction) ->
           VACUUM (retain 0) reclaiming every unreferenced file ->
           V2 checkpoint + LOG-RETENTION cleanup truncating the
           checkpoint-covered commit prefix;
* Iceberg: 2 writes -> position DELETE -> rewrite_manifests (merge
           small manifests, per-entry sequence numbers pinned) ->
           compact -> expire_snapshots(keep_last=1) dropping old
           manifests + orphan data files;
* Hudi:    2 inserts -> bucket-targeted upsert ->
           clean(KEEP_LATEST_FILE_VERSIONS=1) reclaiming the stranded
           pre-upsert base files.

Each layout builder RAISES if its retention pass reclaims nothing, so
the declared query itself certifies that maintenance really deleted
files -- and the DuckDB oracle (same final states re-expressed
relationally over the original parquet) certifies that it deleted only
the RIGHT ones.  At 100 TB these services are what bound storage under
continuous DML; the scan side stays a plain pruned parquet scan.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .pipeline44 import _LAYOUT_ROOT, _atomic_layout
from .registry import declare


def _digest(sf_dir: str, tag: str) -> str:
    src = os.path.join(sf_dir, "part.parquet")
    st = os.stat(src)
    return hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:{tag}".encode()
    ).hexdigest()[:12]


def _delta_maint_layout(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.delta_log import (
        delta_cleanup_log,
        delta_delete,
        delta_optimize,
        delta_vacuum,
        delta_write,
        write_checkpoint_v2,
    )

    path = os.path.join(
        _LAYOUT_ROOT, f"part_delta_maint_{_digest(sf_dir, 'deltamaint8b')}"
    )
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        with _atomic_layout(path) as tmp:
            part = load_table(spark, sf_dir, "part")
            delta_write(part.where(F.col("p_partkey") % 3 == 0), tmp)
            delta_delete(spark, tmp, "p_size < 10")
            delta_optimize(spark, tmp, target_files=1)
            removed = delta_vacuum(spark, tmp, retain_ms=0)
            if not removed:
                raise RuntimeError(
                    "lake maintenance layout: delta vacuum reclaimed nothing"
                )
            write_checkpoint_v2(tmp)
            if not delta_cleanup_log(tmp):
                raise RuntimeError(
                    "lake maintenance layout: delta log cleanup removed nothing"
                )
    return path


def _iceberg_maint_layout(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.iceberg import (
        iceberg_compact,
        iceberg_delete,
        iceberg_expire_snapshots,
        iceberg_rewrite_manifests,
        iceberg_write,
    )

    path = os.path.join(
        _LAYOUT_ROOT, f"part_iceberg_maint_{_digest(sf_dir, 'icemaint8b')}"
    )
    if not os.path.isdir(os.path.join(path, "metadata")):
        with _atomic_layout(path) as tmp:
            part = load_table(spark, sf_dir, "part")
            third = part.where(F.col("p_partkey") % 3 == 1)
            iceberg_write(third.where(F.col("p_partkey") % 2 == 0), tmp)
            iceberg_write(third.where(F.col("p_partkey") % 2 == 1), tmp)
            iceberg_delete(spark, tmp, "p_size >= 40")
            rw = iceberg_rewrite_manifests(tmp)
            if rw["manifests_after"] >= rw["manifests_before"]:
                raise RuntimeError(
                    "lake maintenance layout: manifest rewrite merged nothing"
                )
            iceberg_compact(spark, tmp, target_files=1)
            res = iceberg_expire_snapshots(spark, tmp, keep_last=1)
            if not res.get("files_deleted") and not res.get("expired"):
                raise RuntimeError(
                    "lake maintenance layout: iceberg expire reclaimed nothing"
                )
    return path


def _hudi_maint_layout(spark: SparkSession, sf_dir: str) -> str:
    from ..sources.hudi import hudi_clean, hudi_write

    path = os.path.join(
        _LAYOUT_ROOT, f"part_hudi_maint_{_digest(sf_dir, 'hudimaint8')}"
    )
    if not os.path.isdir(os.path.join(path, ".hoodie")):
        with _atomic_layout(path) as tmp:
            part = load_table(spark, sf_dir, "part").where(
                F.col("p_partkey") % 3 == 2
            )
            hudi_write(spark, tmp, part.where(F.col("p_partkey") % 2 == 0),
                       record_key="p_partkey")
            hudi_write(spark, tmp, part.where(F.col("p_partkey") % 2 == 1),
                       record_key="p_partkey")
            upd = part.where(F.col("p_partkey") % 10 == 2).withColumn(
                "p_retailprice", F.col("p_retailprice") + 1000.0
            )
            hudi_write(spark, tmp, upd, record_key="p_partkey")
            rcpt = hudi_clean(spark, tmp, keep_versions=1)
            if not rcpt["files_deleted"]:
                raise RuntimeError(
                    "lake maintenance layout: hudi clean reclaimed nothing"
                )
    return path


_MAINT_ORACLE = """
SELECT 'delta' AS format, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(p_size), 4) AS avg_size,
       ROUND(SUM(p_retailprice), 2) AS retail_sum
FROM part WHERE p_partkey % 3 = 0 AND NOT p_size < 10
UNION ALL
SELECT 'hudi' AS format, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(p_size), 4) AS avg_size,
       ROUND(SUM(CASE WHEN p_partkey % 10 = 2
                      THEN p_retailprice + 1000.0
                      ELSE p_retailprice END), 2) AS retail_sum
FROM part WHERE p_partkey % 3 = 2
UNION ALL
SELECT 'iceberg' AS format, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(p_size), 4) AS avg_size,
       ROUND(SUM(p_retailprice), 2) AS retail_sum
FROM part WHERE p_partkey % 3 = 1 AND p_size < 40
"""


@declare("table_lake_maintenance", oracle=_MAINT_ORACLE)
def table_lake_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-maintenance snapshots of three live tables (Delta after
    DELETE+OPTIMIZE+VACUUM, Iceberg after delete+compact+expire, Hudi
    after upsert+clean), aggregated per format.  Every layout builder
    raises unless its retention pass physically reclaimed files, so a
    passing row proves BOTH that maintenance deleted storage AND (via
    the oracle on the original parquet) that the surviving snapshot is
    exactly right."""
    from ..sources.delta_log import delta_scan
    from ..sources.hudi import hudi_scan
    from ..sources.iceberg import iceberg_scan

    d = delta_scan(spark, _delta_maint_layout(spark, sf_dir))
    i = iceberg_scan(spark, _iceberg_maint_layout(spark, sf_dir))
    h = hudi_scan(spark, _hudi_maint_layout(spark, sf_dir))

    def agg(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_size"), 4).alias("avg_size"),
            F.round(F.sum("p_retailprice"), 2).alias("retail_sum"),
        ).select(F.lit(name).alias("format"), "n_parts", "avg_size",
                 "retail_sum")

    return agg(d, "delta").unionByName(agg(h, "hudi")).unionByName(
        agg(i, "iceberg")
    )
