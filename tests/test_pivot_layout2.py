"""Dynamic pivot + quantile-mode Z-order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.layout import zorder_write
from hive_person_service_spark.operators.pivoting import pivot_dynamic
from hive_person_service_spark.sources import load_table
from tests.test_layout import _file_spans


def test_pivot_dynamic_matches_static(spark):
    ev = load_table(spark, SF_SMALL, "events")
    dyn = pivot_dynamic(ev, ["user_id"], "event_type", "value", agg="count")
    types = ["click", "error", "purchase", "signup", "view"]
    static = (
        ev.groupBy("user_id").pivot("event_type", types).agg(F.count("value"))
        .fillna(0, subset=types)
    )
    assert sorted(dyn.columns) == sorted(static.columns)
    a = sorted(map(tuple, dyn.collect()))
    b = sorted(map(tuple, static.collect()))
    assert a == b


def test_pivot_dynamic_guards_blowup(spark):
    ev = load_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="pivot domain"):
        pivot_dynamic(ev, ["event_type"], "user_id", "value", max_values=5)


def test_zorder_quantile_mode_clusters(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "zq")
    li.repartition(8).write.parquet(plain)
    zorder_write(li, zpath, ["l_orderkey", "l_partkey"], bits=8, n_files=8,
                 mode="quantile")
    assert spark.read.parquet(zpath).count() == li.count()
    for col in ("l_orderkey", "l_partkey"):
        assert _file_spans(zpath, col) < 0.7 * _file_spans(plain, col), col
