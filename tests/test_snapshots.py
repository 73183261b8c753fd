from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.snapshots import SnapshotTable
from hive_person_service_spark.sources import load_table


def test_snapshot_write_read_rollback(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "orders_snap"))
    o = load_table(spark, SF_SMALL, "orders")

    v1 = t.write(o.where(F.col("o_orderstatus") == "F"), note="closed only")
    v2 = t.write(o, note="full")
    assert (v1, v2) == (1, 2)

    assert t.read().count() == o.count()  # current == v2
    n_closed = o.where(F.col("o_orderstatus") == "F").count()
    assert t.read(version=1).count() == n_closed  # time travel

    t.rollback(1)
    assert t.read().count() == n_closed
    assert [e["version"] for e in t.history()] == [1, 2]
    assert t.history()[0]["rows"] == n_closed

    with pytest.raises(ValueError):
        t.read(version=99)
