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
