"""Pin the 2-D Z-order pruning payoff behind scan_zorder_2d
(plans/pipeline28.py): the band predicate must open strictly fewer files
than the layout holds, and single-column pruning alone must be weaker
than the 2-D intersection (the reason Z-order exists)."""

from __future__ import annotations

from hive_person_service_spark.plans.pipeline28 import (
    zorder_2d_pruned_scan,
    zorder_orders_layout,
)

from conftest import SF_SMALL


def test_zorder_2d_prunes_files(spark):
    df, kept, total = zorder_2d_pruned_scan(spark, SF_SMALL)
    assert total == 16
    assert 0 < kept < total, f"2-D prune must skip files: kept {kept}/{total}"
    # Pruned scan equals the straight filter over the same layout.
    full = (
        spark.read.parquet(zorder_orders_layout(spark, SF_SMALL))
        .where(
            "o_custkey BETWEEN 100 AND 400 "
            "AND o_totalprice BETWEEN 50000 AND 150000"
        )
        .count()
    )
    assert df.count() == full


def test_zorder_2d_beats_single_column(spark):
    from hive_person_service_spark.operators.skipping import (
        build_stats_index,
        prune_files,
    )

    path = zorder_orders_layout(spark, SF_SMALL)
    stats = build_stats_index(spark, path, ["o_custkey", "o_totalprice"])
    keep_cust = set(prune_files(stats, "o_custkey", 100.0, 400.0))
    keep_price = set(prune_files(stats, "o_totalprice", 50_000.0, 150_000.0))
    both = keep_cust & keep_price
    # The intersection must be at most each single-column keep, and
    # strictly smaller than at least one of them (2-D selectivity).
    assert both <= keep_cust and both <= keep_price
    assert len(both) < max(len(keep_cust), len(keep_price))
