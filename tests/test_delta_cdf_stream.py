"""delta_cdf_tail (round 10): stream the Change Data Feed. The drained
stream must equal the batch feed exactly, across cdc-file commits,
DV-diff reconstruction, retired files, and incremental catch-up."""

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from hive_person_service_spark.sources.delta_log import (
    delta_changes,
    delta_delete,
    delta_update,
    delta_write,
)
from hive_person_service_spark.sources.delta_stream import (
    register_delta_cdf_tail,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


def _mk(spark, t, cdf):
    cfg = {"delta.enableChangeDataFeed": "true"} if cdf else None
    delta_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id long, v double"
        ),
        t,
        configuration=cfg,
    )
    delta_delete(spark, t, "id % 5 = 0")
    delta_update(spark, t, "id = 7", {"v": "CAST(77.0 AS DOUBLE)"})
    delta_write(
        spark.createDataFrame([(50, 5.0)], "id long, v double"), t,
        mode="overwrite",
    )


def _rows(df):
    return sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in df.collect()
    )


def _drain(spark, t):
    scratch = os.path.join(
        tempfile.gettempdir(), f"cdf_tail_{uuid.uuid4().hex[:8]}"
    )
    q = (
        spark.readStream.format("delta_cdf_tail")
        .option("table", t)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "cdf tail drain timed out"
    out = spark.read.parquet(os.path.join(scratch, "out"))
    return out, scratch


def test_stream_equals_batch_feed_cdc(spark, tmp_path):
    t = _fresh(tmp_path, "cdfstream1")
    _mk(spark, t, cdf=True)
    register_delta_cdf_tail(spark)
    out, scratch = _drain(spark, t)
    assert _rows(out) == _rows(delta_changes(spark, t))
    shutil.rmtree(scratch, ignore_errors=True)


def test_stream_equals_batch_feed_reconstruction(spark, tmp_path):
    t = _fresh(tmp_path, "cdfstream2")
    _mk(spark, t, cdf=False)
    register_delta_cdf_tail(spark)
    out, scratch = _drain(spark, t)
    assert _rows(out) == _rows(delta_changes(spark, t))
    shutil.rmtree(scratch, ignore_errors=True)


def test_stream_incremental_catchup(spark, tmp_path):
    """A second availableNow run from the same checkpoint serves ONLY
    the commits that landed in between -- exactly-once, no replays."""
    t = _fresh(tmp_path, "cdfstream3")
    delta_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), t,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    register_delta_cdf_tail(spark)
    out_dir, scratch = None, os.path.join(
        tempfile.gettempdir(), f"cdf_tail_{uuid.uuid4().hex[:8]}"
    )

    def drain():
        q = (
            spark.readStream.format("delta_cdf_tail")
            .option("table", t)
            .load()
            .writeStream.format("parquet")
            .option("path", os.path.join(scratch, "out"))
            .option("checkpointLocation", os.path.join(scratch, "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(os.path.join(scratch, "out"))

    assert _rows(drain()) == [(1, 1.0, "insert", 0)]
    delta_delete(spark, t, "id = 1")  # v1: cdc commit
    got = _rows(drain())
    assert got == [(1, 1.0, "delete", 1), (1, 1.0, "insert", 0)]
    shutil.rmtree(scratch, ignore_errors=True)


def test_batch_face_matches(spark, tmp_path):
    t = _fresh(tmp_path, "cdfstream4")
    _mk(spark, t, cdf=True)
    register_delta_cdf_tail(spark)
    batch = spark.read.format("delta_cdf_tail").option("table", t).load()
    assert _rows(batch) == _rows(delta_changes(spark, t))
