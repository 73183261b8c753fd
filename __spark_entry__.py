"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``hive_person_service_spark``; queries are declared
in ``hive_person_service_spark/plans/`` (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hive_person_service_spark import plans
from hive_person_service_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the pricing-summary hash
    aggregate (scan + filter + groupBy + agg) -- BASELINE q_pricing_summary
    shape."""
    configure(spark)
    return plans.aggregates.agg_groupby(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per oracle-checkable query; rows-only queries
    (LSH, Spark-specific hashes, partition-layout ops) are omitted."""
    return plans.all_oracles()
