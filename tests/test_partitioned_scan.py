"""Physical evidence for the declared partitioned-scan surface
(plans/partitioned.py): the date predicate must become PartitionFilters
and the executed scan must read strictly fewer files than the layout
holds (real pruning, not just a plan annotation)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from hive_person_service_spark.plans.partitioned import (
    events_by_day_layout,
    scan_partition_pruned,
)
from tests.conftest import SF_SMALL


def _scan_num_files(df) -> int:
    """numFiles metric of the (single) file scan after execution."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    return int(leaves.apply(0).metrics().apply("numFiles").value())


def test_partition_filters_and_file_pruning(spark):
    path = events_by_day_layout(spark, SF_SMALL)
    full = spark.read.parquet(path)
    n_days = full.select("event_date").distinct().count()
    assert n_days > 3  # the fixture spans a month; pruning must matter

    cutoff = full.agg(F.min("event_date")).first()[0]
    pruned = full.where(F.col("event_date") <= F.lit(cutoff))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    m = re.search(r"PartitionFilters: \[(.+?)\]", buf.getvalue())
    assert m and "event_date" in m.group(1), buf.getvalue()

    total_files = _scan_num_files(full)
    pruned_files = _scan_num_files(pruned)
    assert 0 < pruned_files < total_files, (pruned_files, total_files)


def test_declared_query_matches_raw_events(spark):
    got = scan_partition_pruned(spark, SF_SMALL)
    # cross-check against the raw (unpartitioned) source computed in Spark
    from hive_person_service_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events")
    cutoff = ev.agg(F.date_add(F.to_date(F.min("ts")), 2).alias("d")).first()["d"]
    want = (
        ev.where(F.to_date("ts") <= F.lit(cutoff))
        .groupBy(
            F.to_date("ts").cast("string").alias("event_date"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
    )
    got_counts = {
        (r["event_date"], r["event_type"]): r["n_events"]
        for r in got.collect()
    }
    want_counts = {
        (r["event_date"], r["event_type"]): r["n_events"]
        for r in want.collect()
    }
    assert got_counts == want_counts and got_counts


def test_ivf_persisted_probe_prunes_files(spark):
    """The persisted IVF index (vectors written partitioned by cell): a
    cell-filtered probe must show cell in PartitionFilters and execute a
    scan over strictly fewer files than the full index -- partition
    pruning IS the index lookup (operators/ivf.write_ivf_index)."""
    from hive_person_service_spark.plans.vector_pipeline import (
        ivf_persisted_index,
    )

    root = ivf_persisted_index(spark, SF_SMALL)
    full = spark.read.parquet(f"{root}/vectors")
    pruned = full.where(F.col("cell").isin([0, 1]))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    m = re.search(r"PartitionFilters: \[(.+?)\]", buf.getvalue())
    assert m and "cell" in m.group(1), buf.getvalue()

    total_files = _scan_num_files(full)
    pruned_files = _scan_num_files(pruned)
    assert 0 < pruned_files < total_files, (pruned_files, total_files)


def test_dpp_expression_in_fact_scan(spark):
    """scan_partition_dpp: the partitioned fact's scan must carry a
    dynamicpruningexpression PartitionFilter (runtime pruning from the
    dim's broadcast values) -- the predicate does not exist statically on
    the fact side."""
    from hive_person_service_spark.plans.partitioned import scan_partition_dpp

    df = scan_partition_dpp(spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan, plan
    # and the result equals the plain (unpartitioned) filter computed in Spark
    from hive_person_service_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events")
    want = {
        (r["event_type"], r["n_events"])
        for r in ev.where(F.dayofmonth(F.to_date("ts")) % 5 == 1)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    got = {(r["event_type"], r["n_events"]) for r in df.collect()}
    assert got == want and got
