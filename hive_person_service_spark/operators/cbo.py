"""Cost-based optimization surface (SURVEY.md §4 "join reordering (CBO)"):
the Spark equivalent of Hive's `ANALYZE TABLE` + Calcite cost model.

Catalyst's CBO (`CostBasedJoinReorder`, stats-driven broadcast selection)
is opt-in and only fires on CATALOG tables carrying statistics -- path-based
parquet reads get size-only estimates. So the engine's flow for stats-aware
plans is:

    persist_and_analyze(spark, df, "lineitem")   # managed table + ANALYZE
    enable_cbo(spark)                            # cbo + joinReorder confs
    spark.table("lineitem").join(...)            # planner sees rowCounts

At 100 TB this is not optional tuning: join order on star schemas and
broadcast-vs-shuffle decisions hinge on row counts and column NDVs the
planner cannot guess from file sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CBO_CONFS: dict[str, str] = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    "spark.sql.cbo.planStats.enabled": "true",
    # histogram collection makes ANALYZE slower but range-predicate
    # selectivity far better; worth it for repeatedly-queried tables
    "spark.sql.statistics.histogram.enabled": "true",
}


def enable_cbo(spark: SparkSession) -> None:
    """Turn on cost-based optimization (runtime-settable confs)."""
    for k, v in CBO_CONFS.items():
        spark.conf.set(k, v)


def persist_and_analyze(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Save ``df`` as a managed parquet table and collect statistics:
    table-level (row count, size) always; column-level (NDV, min/max,
    null count, histogram) for ``columns`` if given, else all columns.

    Returns the catalog-backed DataFrame whose optimized plan carries the
    stats (verify with ``plan_stats``)."""
    if not spark.catalog.tableExists(table):
        # In-memory catalogs (no Hive metastore) forget tables between
        # sessions but leave their warehouse directories behind; a stale
        # location fails saveAsTable even in overwrite mode. Clear it.
        import shutil
        from pathlib import Path

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = Path(warehouse.removeprefix("file:")) / table.lower()
        if loc.exists():
            shutil.rmtree(loc)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    cols = columns if columns is not None else spark.table(table).columns
    col_list = ", ".join(cols)
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {col_list}")
    return spark.table(table)


def plan_stats(df: DataFrame) -> tuple[int | None, int]:
    """(rowCount, sizeInBytes) the optimizer attributes to this plan --
    None rowCount means only size-based estimation is available."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    rc = stats.rowCount()
    return (int(str(rc.get())) if not rc.isEmpty() else None), int(
        stats.sizeInBytes()
    )
