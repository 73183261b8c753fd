"""Incremental additive materialized-view maintenance: folding deltas must
equal the full recompute (the continuous-aggregate correctness contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.matview import AdditiveMatView
from hive_person_service_spark.sources import load_table


MEASURES = {
    "n": ("l_quantity", "count"),
    "qty": ("l_quantity", "sum"),
    "max_price": ("l_extendedprice", "max"),
    "min_disc": ("l_discount", "min"),
}


def _full(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("l_quantity").alias("n"),
        F.sum("l_quantity").alias("qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_discount").alias("min_disc"),
    )


def _norm(df):
    return sorted(
        (r.l_returnflag, r.l_linestatus, r.n, round(r.qty, 4),
         round(r.max_price, 4), round(r.min_disc, 4))
        for r in df.collect()
    )


def test_matview_deltas_equal_full_recompute(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem")
    cut1 = "1997-01-01"
    cut2 = "1999-01-01"
    mv = AdditiveMatView(
        str(tmp_path / "mv"), ["l_returnflag", "l_linestatus"], MEASURES
    )
    mv.init(li.where(F.col("l_shipdate") < cut1))
    mv.merge_delta(
        li.where((F.col("l_shipdate") >= cut1) & (F.col("l_shipdate") < cut2))
    )
    mv.merge_delta(li.where(F.col("l_shipdate") >= cut2))
    assert _norm(mv.read(spark)) == _norm(_full(spark))


def test_matview_empty_delta_is_noop(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem")
    mv = AdditiveMatView(
        str(tmp_path / "mv"), ["l_returnflag", "l_linestatus"], MEASURES
    )
    mv.init(li)
    before = _norm(mv.read(spark))
    mv.merge_delta(li.where(F.lit(False)))
    assert _norm(mv.read(spark)) == before


def test_matview_rejects_non_mergeable():
    with pytest.raises(ValueError):
        AdditiveMatView("/tmp/x", ["k"], {"a": ("v", "avg")})
