"""Multi-file layout parity (round-2 roadmap item): the driver fixtures are
single-file/single-row-group parquet, which caps scan parallelism at one
task; production lakes are many files. Pin that (a) a multi-file rewrite of
a table is read back with real scan parallelism, and (b) query results are
layout-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_person_service_spark.sources import load_table
from tests.conftest import SF_SMALL


def _rewrite_multifile(spark, table: str, out: str, nfiles: int) -> None:
    load_table(spark, SF_SMALL, table).repartition(nfiles).write.mode(
        "overwrite"
    ).parquet(out)


def test_multifile_scan_parallelism_and_parity(spark, tmp_path):
    out = str(tmp_path / "lineitem.parquet")
    _rewrite_multifile(spark, "lineitem", out, 8)

    mf = spark.read.parquet(out)
    # 8 files -> at least 8 input splits (single-file fixture gives 1).
    assert mf.rdd.getNumPartitions() >= 8
    assert mf.select(F.input_file_name()).distinct().count() == 8

    single = load_table(spark, SF_SMALL, "lineitem")
    agg = lambda df: (  # noqa: E731
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round("l_extendedprice", 2).cast("decimal(18,2)")).alias("s"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    assert agg(mf).collect() == agg(single).collect()
    assert mf.count() == single.count()


def test_multifile_pushdown_still_applies(spark, tmp_path):
    out = str(tmp_path / "orders.parquet")
    _rewrite_multifile(spark, "orders", out, 4)
    plan = (
        spark.read.parquet(out)
        .where(F.col("o_orderkey") == 42)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)" in plan
