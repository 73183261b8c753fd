"""Round-6 batch 46: exactly-once streaming ingest INTO an open table
format -- the lakehouse landing pattern (Structured Streaming foreachBatch
-> Delta commits with ``txn`` idempotence), driver-verifiable because the
drained table's content is a deterministic function of the source.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = "/tmp/spark_graft_layouts"


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
        from .pipeline44 import _atomic_layout

        # atomic build: a crash/timeout mid-stream must not cache a
        # partial table as "complete" (the guard above checks existence)
        with _atomic_layout(root) as tmp_root:
            tmp_table = os.path.join(tmp_root, "table")
            landing = os.path.join(tmp_root, "landing")
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

            stream_into_delta(stream(), tmp_table, os.path.join(tmp_root, "ckpt"),
                              app_id="orders-ingest")
            n_versions = len(delta_history(tmp_table))
            # replay from a LOST checkpoint: txn idempotence must no-op it
            stream_into_delta(stream(), tmp_table, os.path.join(tmp_root, "ckpt2"),
                              app_id="orders-ingest")
            assert len(delta_history(tmp_table)) == n_versions, (
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
