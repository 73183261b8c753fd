"""Fifth extras batch: correlated LATERAL subquery (per-row dependent TOP-N,
a distinct Catalyst operator -- LateralJoin with a DomainJoin rewrite), a
time-interval RANGE window frame over event time (the sliding-sum shape
`win_range_frame` covers only for numeric ranges), the aggregate FILTER
clause, and max_by/min_by argmax aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@declare(
    "sql_lateral_topk",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c_nationkey = 5
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's two largest orders. The
    same result as a window top-k, but exercising the LATERAL join path --
    Catalyst decorrelates the per-row ORDER BY ... LIMIT via DomainJoin into
    a join + per-key limit, so no per-customer re-scan happens at scale
    (verify with .explain: no nested-loop over orders). Ties break on
    o_orderkey for cross-engine determinism."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c_nationkey = 5
        """
    )


@declare(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS rolling_1h
    FROM events
    WHERE user_id < 50
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour sum via a RANGE frame keyed on event time --
    the event-time analog of a numeric RANGE frame, and the batch twin of the
    sliding streaming window (stream_sliding aggregates per bucket; this
    keeps one row per event). Values sum as exact integer cents inside the
    frame (value has 2-decimal payload; ROUND(value*100) is bit-identical in
    both engines), so frame-internal accumulation order -- which DuckDB's
    segment tree and Spark's running evaluator genuinely do differently --
    cannot produce float drift. One shuffle on user_id; frames evaluate
    partition-locally."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id, ts, value,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / 100.0 AS rolling_1h
        FROM events
        WHERE user_id < 50
        """
    )


@declare(
    "agg_filter_clause",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
           CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT))
                  FILTER (WHERE c_mktsegment = 'AUTOMOBILE')
                AS DOUBLE) / 100.0 AS auto_bal
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2003 aggregate FILTER clause: several differently-filtered
    aggregates in ONE grouped pass (the alternative -- N filtered scans
    unioned -- reads the table N times). Spark evaluates these as
    conditional aggregates inside the same HashAggregate, so the cost is one
    scan + one shuffle no matter how many FILTER variants ride along.
    Money sums use floor-cents (engine-proof, see tpch_final)."""
    from ..sources import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_nationkey,
               COUNT(*) AS n_cust,
               COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
               CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT))
                      FILTER (WHERE c_mktsegment = 'AUTOMOBILE')
                    AS DOUBLE) / 100.0 AS auto_bal
        FROM customer GROUP BY c_nationkey
        """
    )


@declare(
    "agg_max_by",
    oracle="""
    SELECT o_orderpriority,
           MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000
               + o_orderkey) % 10000000000 AS biggest_order,
           MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000000
               + o_orderkey) % 10000000000 AS smallest_order,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates: the order key that carries each group's
    extreme price, in one pass -- no self-join back onto the max and no
    window + filter. Plain max_by/min_by leave the arg ENGINE-DEPENDENT
    when the extreme value ties (the sf1 synthesis replicates prices, so
    ties are real data, not a corner case); packing (cents, orderkey)
    into one BIGINT makes the tiebreak explicit -- largest key at the
    max, smallest key at the min -- while keeping the single
    (value, arg)-pair state that partial-aggregates map-side like any
    max. Cents*1e10 + key is collision-free to keys < 1e10 and cents
    < 9.2e8 (both hold past sf100)."""
    o = load_table(spark, sf_dir, "orders")
    packed = F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(
        10_000_000_000
    ) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        (F.max(packed) % 10_000_000_000).alias("biggest_order"),
        (F.min(packed) % 10_000_000_000).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@declare(
    "reshape_unpivot",
    oracle="""
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             p_retailprice AS price
      FROM part WHERE p_partkey <= 200)
    UNPIVOT (val FOR metric IN (size, price))
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide columns to (key, metric, value) long form -- the
    inverse of agg_pivot and the standard prep step for per-metric
    aggregation or plotting. Spark's DataFrame unpivot (SQL stack()) emits
    the long rows inline during the scan: no shuffle, no join, output is
    n_rows x n_metrics. Both metrics cast to one DOUBLE value column
    (unpivot requires a common type; DuckDB's UNPIVOT does the same)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("price"),
    ).unpivot(["p_partkey"], ["size", "price"], "metric", "val")


_RECURSIVE_SQL = """
    WITH RECURSIVE chain AS (
      SELECT c_custkey,
             CAST(FLOOR(c_custkey / 10.0) AS BIGINT) AS ancestor,
             0 AS depth
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CAST(FLOOR(ancestor / 10.0) AS BIGINT) AS ancestor,
             depth + 1
      FROM chain WHERE ancestor > 0)
    SELECT c_custkey, MAX(depth) AS chain_depth, COUNT(*) AS chain_len
    FROM chain GROUP BY c_custkey
"""


@declare("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4.x): transitive closure over a derived
    referral hierarchy (parent = custkey/10, so chains are ~log10(N) deep).
    Each iteration is one self-referencing micro-plan unioned into the loop
    result -- iteration count scales with GRAPH DEPTH, not table size, so a
    100 TB customer table still terminates in ~7 rounds; each round is an
    ordinary shuffled plan AQE optimizes independently. FLOOR(x/10.0) keeps
    parent derivation identical across engines (DuckDB's double->int CAST
    rounds; Spark's truncates). Spark's cteRecursionRowLimit (default 1M,
    a runaway-recursion debugging guard, NOT a memory bound) counts TOTAL
    rows across rounds -- ~N*log10(N), which trips at sf1's 150k customers
    -- so the query raises it for ITS OWN materialization only: the result
    (one row per customer) is localCheckpoint-ed under the override and the
    previous limit restored in a finally, so the session-wide
    runaway-recursion guard stays intact for every later query."""
    _views(spark, sf_dir, "customer")
    prev = spark.conf.get("spark.sql.cteRecursionRowLimit", None)
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(200_000_000))
    try:
        return spark.sql(_RECURSIVE_SQL).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.cteRecursionRowLimit")
        else:
            spark.conf.set("spark.sql.cteRecursionRowLimit", prev)


@declare(
    "events_rollup_2level",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type,
             COUNT(*) AS n,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2)
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS d, event_type,
           SUM(n) AS n_events,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value,
           COUNT(*) AS hours_active
    FROM hourly GROUP BY 1, 2
    """,
)
def events_rollup_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical reaggregation (the hypertable / continuous-aggregate
    pattern): daily totals computed FROM the hourly rollup, not from raw
    events -- sums of sums and counts of hours re-aggregate exactly because
    the hourly grain carries additive state (integer cents, counts). At
    scale the hourly table is the materialized view streaming ingest
    maintains; daily/weekly/monthly grains all derive from it, reading
    24/168/720 rows per key instead of the raw stream."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH hourly AS (
          SELECT date_trunc('hour', ts) AS h, event_type,
                 COUNT(*) AS n,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
          FROM events GROUP BY 1, 2)
        SELECT date_format(date_trunc('day', h), 'yyyy-MM-dd') AS d, event_type,
               SUM(n) AS n_events,
               CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value,
               COUNT(*) AS hours_active
        FROM hourly GROUP BY 1, 2
        """
    )


@declare(
    "agg_share_of_total",
    oracle="""
    WITH nat AS (
      SELECT c_nationkey,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS cents
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_nationkey)
    SELECT c_nationkey,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           ROUND(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER () AS DOUBLE), 6) AS share
    FROM nat
    """,
)
def agg_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: window over an aggregate (SUM() OVER () on the
    grouped result). The global-total window runs on the 25-row nation
    aggregate, not the fact table, so the unpartitioned frame -- normally a
    single-partition hazard -- is free here; the heavy lifting stays in the
    partial+final grouped sum. Shares divide exact integer-cent sums, so
    the ratio is bit-identical across engines before the display round."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    nat = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    return nat.select(
        "c_nationkey",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(W.partitionBy()).cast("double"),
            6,
        ).alias("share"),
    )
