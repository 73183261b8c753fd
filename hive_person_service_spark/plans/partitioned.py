"""Date-partitioned table surface (SURVEY.md §2.A partitioned scan +
pruning; VERDICT r3 item 3): the Hive-core idiom -- a fact table laid out
as one directory per day, queries carrying a date predicate that becomes
PartitionFilters and skips whole directories at file-listing time.

Round 3 proved pruning only inside writer tests; this module puts a
date-partitioned layout behind a DECLARED, oracle-checked query so the
driver exercises it every round, and tests/test_partitioned_scan.py pins
the physical evidence (PartitionFilters in the plan + the scan's numFiles
metric strictly below the unpruned count).

At 100 TB: events is written partitioned by event_date (30 dirs/month,
low cardinality -- never a key); a 3-day query then lists and reads 3
directories regardless of corpus size. The layout is built once per
fixture generation (cache keyed on the source parquet's path+mtime+size,
same identity discipline as loader._events_ts_kind) under /tmp, standing
in for the warehouse table a real deployment maintains.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

_LAYOUT_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_layouts")


def events_by_day_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the date-partitioned events layout for sf_dir;
    returns its path. Cache key includes the source file identity so a
    regenerated fixture rebuilds instead of serving stale partitions."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"events_by_day_{digest}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from ..sinks.writers import write_partitioned_parquet

        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        write_partitioned_parquet(ev, path, ["event_date"])
    return path


@declare(
    "scan_partition_pruned",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    WHERE CAST(ts AS DATE) <=
          (SELECT CAST(MIN(ts) AS DATE) + INTERVAL 2 DAY FROM events)
    GROUP BY 1, 2
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup over the FIRST THREE DAYS of a date-partitioned events
    layout. The date cutoff is resolved driver-side from parquet min
    statistics (a metadata-cheap scalar), then applied as a LITERAL
    partition predicate -- static pruning, so the file listing itself
    skips every other day's directory. The oracle computes the same
    cutoff with a scalar subquery over the raw events table: agreement
    proves the partitioned layout holds exactly the source rows.
    Physical pruning evidence (PartitionFilters + numFiles) is pinned by
    tests/test_partitioned_scan.py."""
    path = events_by_day_layout(spark, sf_dir)
    cutoff = (
        load_table(spark, sf_dir, "events")
        .agg(F.date_add(F.to_date(F.min("ts")), 2).alias("d"))
        .first()["d"]
    )
    part = spark.read.parquet(path).where(F.col("event_date") <= F.lit(cutoff))
    return part.groupBy(
        F.col("event_date").cast("string").alias("event_date"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


@declare(
    "scan_partition_dpp",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    WHERE EXTRACT(DAY FROM CAST(ts AS DATE)) % 5 = 1
    GROUP BY event_type
    """,
)
def scan_partition_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the date-partitioned fact is joined to a
    dimension whose filter (day-of-month % 5 == 1) is only known at run
    time -- no static date literal exists for the fact side, so Catalyst
    installs a dynamicpruningexpression in the fact scan's
    PartitionFilters (the dim's qualifying dates are broadcast and the
    file listing prunes to exactly those directories). This is THE
    mechanism that makes star-schema date-dim joins read days, not years,
    at warehouse scale. The dim here derives from the RAW events table
    (distinct dates), so the partitioned fact genuinely cannot see the
    predicate statically; the oracle is the equivalent plain filter.
    Plan evidence pinned by tests/test_partitioned_scan.py."""
    path = events_by_day_layout(spark, sf_dir)
    fact = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("event_date"))
        .distinct()
        .where(F.dayofmonth("event_date") % 5 == 1)
    )
    return (
        fact.join(dim, "event_date")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


@declare(
    "table_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey,
             c_acctbal + 100.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 3
      UNION ALL
      SELECT 10000000 + k,
             'NewCust#' || CAST(k AS VARCHAR),
             CAST(k % 25 AS INTEGER),
             CAST(k AS DOUBLE),
             'NEWSEG'
      FROM (SELECT unnest(generate_series(1, 50)) AS k)),
    merged AS (
      SELECT COALESCE(u.c_custkey, t.c_custkey) AS c_custkey,
             COALESCE(u.c_name, t.c_name) AS c_name,
             COALESCE(u.c_nationkey, t.c_nationkey) AS c_nationkey,
             CASE WHEN u.c_custkey IS NOT NULL
                  THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
             COALESCE(u.c_mktsegment, t.c_mktsegment) AS c_mktsegment
      FROM customer t FULL OUTER JOIN updates u USING (c_custkey))
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(c_acctbal), 2) AS total_bal,
           MIN(c_custkey) AS min_key,
           MAX(c_custkey) AS max_key
    FROM merged GROUP BY c_mktsegment
    """,
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ACID MERGE INTO analog over plain parquet
    (operators/maintenance.merge_upsert -- one full-outer join on the
    key, staged write, atomic directory swap): matched customers get an
    updated balance, unmatched update rows insert, everyone else carries
    over. The query materializes a FRESH copy of the target each call
    (merge mutates its target; a declared query must be idempotent),
    merges a deterministic updates relation, and aggregates the merged
    table -- the oracle replays the same MERGE semantics as a FULL OUTER
    JOIN, so the staged-swap write path itself is what the comparison
    proves. At scale the merge touches only key-partitioned slices; the
    atomic swap is the same primitive the CMS/SCD2 maintenance jobs use."""
    import shutil
    import tempfile

    from ..operators.maintenance import merge_upsert

    c = load_table(spark, sf_dir, "customer")
    work = tempfile.mkdtemp(prefix="merge_target_")
    try:
        return _merge_and_aggregate(spark, c, work)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _merge_and_aggregate(spark, c, work):
    from ..operators.maintenance import merge_upsert

    c.write.mode("overwrite").parquet(work)

    updates = c.where(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        spark.range(1, 51).select(
            (F.col("id") + 10_000_000).alias("c_custkey"),
            F.concat(F.lit("NewCust#"), F.col("id").cast("string")).alias(
                "c_name"
            ),
            (F.col("id") % 25).cast("int").alias("c_nationkey"),
            F.col("id").cast("double").alias("c_acctbal"),
            F.lit("NEWSEG").alias("c_mktsegment"),
        )
    )
    merge_upsert(spark, work, updates, ["c_custkey"])
    merged = spark.read.parquet(work)
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        # materialize before returning: the temp target would otherwise
        # need to outlive the lazy plan
        .localCheckpoint(eager=True)
    )
