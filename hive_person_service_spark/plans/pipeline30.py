"""Round-4 continuation batch 30: Python DataSource WRITER declared
surface.

The custom-source family (sources/pyds.py) already covers batch and
streaming READS; this closes the loop with the write path -- the Spark 4
DataSourceWriter protocol (executor-side staged writes, driver-side
two-phase commit) that a bespoke sink (internal service, non-standard
format) implements.
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


@declare(
    "sink_python_datasource",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS bal,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key
    FROM customer GROUP BY c_mktsegment
    """,
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python SINK round-trip (Spark 4 DataSourceWriter): customer
    is written through the json_lines_sink data source -- every task
    streams its partition to a staging file and sends a commit message;
    the DRIVER's commit() alone publishes the staged files and the
    _SUCCESS marker (two-phase commit: a failed task's staging file is
    aborted, never published) -- then read back with an explicit schema
    and aggregated. The oracle runs on the ORIGINAL parquet: agreement
    proves the custom sink preserved every row and every double
    bit-exactly (json.dumps shortest-round-trip floats). The write
    happens once per fixture identity; the protocol structure (staged
    write -> manifest commit) is exactly what an object-store sink
    implements at 100 TB."""
    from ..sources.pyds import register_json_lines_sink

    src = os.path.join(sf_dir, "customer.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:pysink".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"customer_pysink_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        register_json_lines_sink(spark)
        (
            load_table(spark, sf_dir, "customer")
            .write.format("json_lines_sink")
            .option("path", path)
            .mode("append")
            .save()
        )
    back = spark.read.schema(SCHEMAS["customer"]).json(
        os.path.join(path, "part-*.jsonl")
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("bal"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
