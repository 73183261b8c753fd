"""§2.A surface: multi-format ingest round-trips, INSERT OVERWRITE,
partitioned layout + partition pruning, bucketed tables + shuffle-free SMB
join."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.sinks import (
    insert_overwrite_parquet,
    write_bucketed_table,
    write_partitioned_parquet,
)
from hive_person_service_spark.sources import load_table
from hive_person_service_spark.sources.io_formats import read_csv, read_json, read_orc


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_json_orc_roundtrip(spark):
    src = load_table(spark, SF_SMALL, "customer")
    with tempfile.TemporaryDirectory() as d:
        src.write.mode("overwrite").option("header", "true").csv(f"{d}/csv")
        src.write.mode("overwrite").json(f"{d}/json")
        src.write.mode("overwrite").orc(f"{d}/orc")
        want = _sorted_rows(src)
        assert _sorted_rows(read_csv(spark, f"{d}/csv", src.schema)) == want
        assert _sorted_rows(read_json(spark, f"{d}/json", src.schema)) == want
        assert _sorted_rows(read_orc(spark, f"{d}/orc", src.schema)) == want


def test_insert_overwrite_replaces(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    with tempfile.TemporaryDirectory() as d:
        insert_overwrite_parquet(li.limit(100), f"{d}/t")
        assert spark.read.parquet(f"{d}/t").count() == 100
        insert_overwrite_parquet(li.limit(10), f"{d}/t")  # overwrite, not append
        assert spark.read.parquet(f"{d}/t").count() == 10


def test_partition_pruning(spark):
    o = load_table(spark, SF_SMALL, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    with tempfile.TemporaryDirectory() as d:
        write_partitioned_parquet(o, f"{d}/orders_by_year", ["order_year"])
        back = spark.read.parquet(f"{d}/orders_by_year")
        q = back.where(F.col("order_year") == 1996)
        plan = _explain(q)
        # predicate must prune at the directory level, not post-scan filter
        assert "PartitionFilters: [isnotnull(order_year" in plan, plan
        want = o.where(F.col("order_year") == 1996).count()
        assert q.count() == want


def test_bucketed_smb_join_no_shuffle(spark):
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed_table(o, "orders_b", "o_orderkey", 8)
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
        "o_orderkey", 8,
    )
    # hint forces SMJ (the fixture tables are under the broadcast threshold;
    # at real scale the planner picks SMJ on its own)
    joined = (
        spark.table("orders_b")
        .hint("merge")
        .join(spark.table("lineitem_b"), "o_orderkey")
    )
    plan = _explain(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-bucketed -> shuffle-free
    assert joined.count() == li.count()


def test_bucketed_join3_plan(spark, duck):
    """End-to-end bucketed headliner (VERDICT r2 item 6): the fact-fact
    SMJ over co-bucketed orders/lineitem plans with NO Exchange below the
    join -- the only exchange left is the post-aggregation one -- and the
    result matches both the unbucketed query and the DuckDB oracle."""
    from hive_person_service_spark.plans.joins import (
        join3_revenue,
        join3_revenue_bucketed,
        setup_bucketed_join3,
    )

    setup_bucketed_join3(spark, SF_SMALL, n_buckets=4)
    q = join3_revenue_bucketed(spark, SF_SMALL)
    plan = _explain(q)
    assert "SortMergeJoin" in plan, plan
    # the SMJ is exchange-free: no shuffle on either join key anywhere in
    # the plan (the only exchanges left are the broadcast dims and the
    # post-aggregation hashpartitioning(n_name))
    assert "hashpartitioning(l_orderkey" not in plan, plan
    assert "hashpartitioning(o_orderkey" not in plan, plan
    got = {(r.n_name, r.revenue) for r in q.collect()}
    want = {
        (r.n_name, r.revenue)
        for r in join3_revenue(spark, SF_SMALL).collect()
    }
    assert got == want


def test_dynamic_partition_pruning(spark):
    """DPP: joining a partitioned fact to a selectively-filtered dim must
    inject a runtime partition filter (the dim's surviving keys) into the
    fact scan -- at 100 TB this is what keeps a star join from reading
    every date partition."""
    ev = load_table(spark, SF_SMALL, "events")
    with tempfile.TemporaryDirectory() as d:
        write_partitioned_parquet(ev, f"{d}/events_by_type", ["event_type"])
        fact = spark.read.parquet(f"{d}/events_by_type")
        # the dim must be an OPAQUE source: a derived `when(event_type=...)`
        # column gets constraint-propagated into a STATIC partition filter
        # (verified -- Catalyst folds it, no runtime pruning needed), so
        # write the mapping to parquet and read it back
        ev.select("event_type").distinct().withColumn(
            "type_group",
            F.when(F.col("event_type") == "purchase", "money").otherwise("other"),
        ).write.parquet(f"{d}/type_dim")
        dim = spark.read.parquet(f"{d}/type_dim")
        q = fact.join(
            dim.where(F.col("type_group") == "money"), "event_type"
        ).agg(F.count("*").alias("n"))
        plan = _explain(q)
        assert "dynamicpruning" in plan.lower(), plan
        want = ev.where(F.col("event_type") == "purchase").count()
        assert q.collect()[0]["n"] == want


def test_csv_malformed_row_policies(spark, tmp_path):
    """Landing-zone breakage policy (sources/io_formats.read_csv_tolerant):
    PERMISSIVE quarantines raw bad lines in _corrupt_record, DROPMALFORMED
    skips them, FAILFAST raises -- and good rows parse identically under
    all three."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from hive_person_service_spark.sources.io_formats import read_csv_tolerant

    p = tmp_path / "landing.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,1.5\n"
        "not_a_long,beta,2.5\n"      # type breakage in id
        "3,gamma,xyz\n"              # type breakage in score
        "4,delta,4.5\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )

    perm = read_csv_tolerant(spark, str(p), schema).cache()
    assert perm.count() == 4
    bad = perm.where(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 2
    assert {r.name for r in bad.collect()} == {"beta", "gamma"}
    good_ids = {
        r.id for r in perm.where(F.col("_corrupt_record").isNull()).collect()
    }
    assert good_ids == {1, 4}
    perm.unpersist()

    dropped = read_csv_tolerant(spark, str(p), schema, mode="DROPMALFORMED")
    assert {r.id for r in dropped.collect()} == {1, 4}

    with pytest.raises(Exception):
        read_csv_tolerant(spark, str(p), schema, mode="FAILFAST").collect()
