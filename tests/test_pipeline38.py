"""Behavioral pins for batch 38: the pandas-on-Spark chain stays lazy and
distributed; crosstab cells reconcile with group counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_pandas_api_returns_lazy_spark_plan(spark):
    from hive_person_service_spark.plans.pipeline38 import api_pandas_on_spark

    df = api_pandas_on_spark(spark, SF_SMALL)
    # It is a plain Spark DataFrame (lazy), not a local pandas object.
    from pyspark.sql import DataFrame

    assert isinstance(df, DataFrame)
    assert df.columns == ["c_mktsegment", "n", "bal_total", "bal_mean"]
    rows = df.collect()
    assert sum(r.n for r in rows) > 0


def test_crosstab_reconciles_with_groupby(spark):
    from hive_person_service_spark.plans.pipeline38 import stat_crosstab
    from hive_person_service_spark.sources import load_table

    ct = stat_crosstab(spark, SF_SMALL).collect()
    seg_cols = [c for c in stat_crosstab(spark, SF_SMALL).columns
                if c != "c_nationkey_c_mktsegment"]
    total_cells = sum(sum(r[c] for c in seg_cols) for r in ct)
    n_customers = load_table(spark, SF_SMALL, "customer").count()
    assert total_cells == n_customers  # every customer lands in one cell
