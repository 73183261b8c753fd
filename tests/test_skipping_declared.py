"""Declared data-skipping query: the stats index must actually prune files
(the whole point), and the pruned scan must equal the full-scan filter."""

from __future__ import annotations

from hive_person_service_spark.operators.skipping import (
    _list_parquet_files,
    build_stats_index,
    prune_files,
)
from hive_person_service_spark.plans.pipeline23 import _range_layout_orders

SF = "/root/testdata/sf0.01"


def test_stats_skipping_prunes_files(spark):
    path = _range_layout_orders(spark, SF)
    total = len(_list_parquet_files(path))
    stats = build_stats_index(spark, path, ["o_totalprice"])
    keep = prune_files(stats, "o_totalprice", 100_000.0, 200_000.0)
    assert 0 < len(keep) < total, (len(keep), total)

    # pruned scan == full-scan filter, row for row
    full = (
        spark.read.parquet(path)
        .where("o_totalprice BETWEEN 100000 AND 200000")
        .count()
    )
    pruned = (
        spark.read.parquet(*keep)
        .where("o_totalprice BETWEEN 100000 AND 200000")
        .count()
    )
    assert pruned == full
