"""Two-phase global rank primitives (operators/global_rank.py): value
equality against Spark's own single-task global windows, plus plan
shape -- the customer-cardinality queries they back (orders_rfm_segments,
sql_pareto_customers) must contain NO partition-less Window over a
full-cardinality relation (VERDICT r2 item 1)."""

from __future__ import annotations

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_person_service_spark.operators.global_rank import (
    with_global_ntile,
    with_global_prefix_sum,
    with_global_row_number,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_global_row_number_matches_window(spark):
    o = _orders(spark).select("o_orderkey", "o_totalprice")
    got = with_global_row_number(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], out="rn"
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    want = o.withColumn("rn", F.row_number().over(w).cast("long"))
    assert got.count() == o.count()
    diff = got.join(want, ["o_orderkey"], "inner").where(
        got["rn"] != want["rn"]
    )
    assert diff.count() == 0


def test_global_ntile_matches_window(spark):
    o = _orders(spark).select("o_orderkey", "o_totalprice")
    for n in (3, 5, 7):
        got = with_global_ntile(
            o, [F.col("o_totalprice"), F.col("o_orderkey")], n, "b"
        )
        w = Window.orderBy("o_totalprice", "o_orderkey")
        want = o.withColumn("b", F.ntile(n).over(w).cast("long"))
        joined = got.select("o_orderkey", "b").join(
            want.select("o_orderkey", F.col("b").alias("b2")), "o_orderkey"
        )
        assert joined.where(F.col("b") != F.col("b2")).count() == 0


def test_global_prefix_sum_matches_window(spark):
    # Integer-cent values make the comparison exact regardless of
    # float-summation grouping.
    o = _orders(spark).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("p")
    ).withColumn("cents", (F.col("p") * 100).cast("long"))
    got = with_global_prefix_sum(
        o, [F.col("o_orderkey")], "cents", "cum"
    )
    w = (
        Window.orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = o.withColumn("cum", F.sum("cents").over(w))
    joined = got.select("o_orderkey", "cum").join(
        want.select("o_orderkey", F.col("cum").alias("cum2")), "o_orderkey"
    )
    assert joined.where(F.col("cum") != F.col("cum2")).count() == 0


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _assert_no_full_cardinality_global_window(plan: str) -> None:
    """Every partition-less Window in the plan must be the broadcast-
    offsets window over the per-shuffle-partition sizes relation
    (sums __gr_cnt / __gr_psum; <= shuffle-partitions rows)."""
    for m in re.finditer(r"Arguments: \[(.*?)\], \[\], \[", plan):
        args = m.group(1)
        assert "__gr_cnt" in args or "__gr_psum" in args, (
            "partition-less Window over a non-metadata relation:\n" + args
        )


def test_rfm_and_pareto_plans_have_no_global_window(spark):
    from hive_person_service_spark.plans.pipeline12 import sql_pareto_customers
    from hive_person_service_spark.plans.pipeline15 import orders_rfm_segments

    rfm = orders_rfm_segments(spark, SF)
    plan = _formatted_plan(rfm)
    assert "ntile" not in plan, plan
    _assert_no_full_cardinality_global_window(plan)

    pareto = sql_pareto_customers(spark, SF)
    _assert_no_full_cardinality_global_window(_formatted_plan(pareto))


def test_global_rank_edge_cases(spark):
    """Exactness across awkward sizes: N < n buckets, N == 1, N == 0, and
    bucket counts that don't divide N. Compared against Spark's own
    single-task global window on the same data."""
    for n_rows, n_buckets in [(1, 5), (4, 7), (7, 3), (100, 7), (11, 11)]:
        df = spark.range(n_rows).select(
            F.col("id"), (F.col("id") * 37 % 13).alias("v")
        )
        got = with_global_ntile(
            df, [F.col("v"), F.col("id")], n_buckets, "b", num_partitions=3
        )
        w = Window.orderBy("v", "id")
        want = df.withColumn("b", F.ntile(n_buckets).over(w).cast("long"))
        j = got.select("id", "b").join(
            want.select("id", F.col("b").alias("b2")), "id"
        )
        assert j.where(F.col("b") != F.col("b2")).count() == 0, (
            n_rows, n_buckets,
        )

    empty = spark.range(0).select(F.col("id"), F.col("id").alias("v"))
    assert with_global_ntile(empty, [F.col("v"), F.col("id")], 5, "b").count() == 0
    assert with_global_row_number(empty, [F.col("id")], out="rn").count() == 0
    assert (
        with_global_prefix_sum(empty, [F.col("id")], "v", "cum").count() == 0
    )


def test_grouped_variants_match_partitioned_windows(spark):
    """Grouped two-phase rank/ntile/prefix-sum equal Spark's partitioned
    windows exactly (the few-groups x huge-groups scale path)."""
    o = _orders(spark).select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        (F.col("o_orderkey") % 7).alias("qty"),
    )
    from hive_person_service_spark.operators.global_rank import (
        with_grouped_ntile,
        with_grouped_prefix_sum,
        with_grouped_row_number,
    )

    order = [F.col("o_totalprice"), F.col("o_orderkey")]
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )

    got_rn = with_grouped_row_number(o, ["o_orderpriority"], order, out="rn")
    want_rn = o.withColumn("rn", F.row_number().over(w).cast("long"))
    j = got_rn.select("o_orderkey", "rn").join(
        want_rn.select("o_orderkey", F.col("rn").alias("rn2")), "o_orderkey"
    )
    assert j.where(F.col("rn") != F.col("rn2")).count() == 0

    got_nt = with_grouped_ntile(o, ["o_orderpriority"], order, 8, "t")
    want_nt = o.withColumn("t", F.ntile(8).over(w).cast("long"))
    j = got_nt.select("o_orderkey", "t").join(
        want_nt.select("o_orderkey", F.col("t").alias("t2")), "o_orderkey"
    )
    assert j.where(F.col("t") != F.col("t2")).count() == 0

    got_ps = with_grouped_prefix_sum(
        o, ["o_orderpriority"], order, "qty", "cum"
    )
    want_ps = o.withColumn(
        "cum", F.sum("qty").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    j = got_ps.select("o_orderkey", "cum").join(
        want_ps.select("o_orderkey", F.col("cum").alias("cum2")), "o_orderkey"
    )
    assert j.where(F.col("cum") != F.col("cum2")).count() == 0


def test_rewritten_grouped_queries_have_no_fact_windows(spark):
    """agg_equidepth_hist / agg_weighted_median plans: every Window left
    operates on the tiny per-(partition, group) offsets relation (its
    expressions mention __gr_ columns), never the fact table."""
    import re

    from hive_person_service_spark.plans.extras5 import agg_equidepth_hist
    from hive_person_service_spark.plans.pipeline8 import agg_weighted_median

    for q in (agg_equidepth_hist(spark, SF), agg_weighted_median(spark, SF)):
        plan = _formatted_plan(q)
        blocks = re.findall(
            r"\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan
        )
        assert blocks, plan
        for args in blocks:
            assert "__gr_" in args, args
