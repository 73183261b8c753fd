"""Third TPC-H-analog batch: Q5, Q10, Q13, Q18, Q22 adapted to the fixture
schema (no partsupp table; no commitdate/receiptdate/shipmode columns, so
Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21 are out of scope by data model).

These exercise the composite shapes the earlier batches did not:
region-filtered 6-table join (Q5), grouped top-k over a 3-table join (Q10),
outer-join-with-join-condition + double aggregation (Q13), HAVING over a
grouped join feeding a second join (Q18), scalar-subquery filter + anti-join
(Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


def _money_sum(term=None):
    """Accumulation-order-proof money sum: round each term to cents
    (bit-identical per row across engines -- IEEE products of identical
    doubles), sum EXACTLY as DECIMAL, surface as DOUBLE. Plain
    round(sum(double), 2) flakes when a sum lands on a half-cent boundary
    (observed at sf0.001: 261471.225 rounding both ways).

    ONLY safe when each term is already an exact 2-decimal value (fixture
    money columns like c_acctbal): there ROUND is a no-op in both engines.
    For PRODUCTS (extprice * (1-disc)) the per-row ROUND itself diverges on
    half-cent landings (Spark HALF_UP on exact binary vs DuckDB shortest-
    decimal; hit q5/q10 at sf0.1) -- use _money_sum_cents for those."""
    if term is None:
        term = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return F.sum(F.round(term, 2).cast("decimal(18,2)")).cast("double")


def _money_sum_cents(term=None):
    """Engine-proof money sum for computed terms: truncate each term to
    cents (FLOOR over the bit-identical IEEE product -- no rounding mode in
    play), sum the exact BIGINT cents, surface as DOUBLE dollars. Matches
    the q19/q9/q11 discipline; the SQL twin is
    SUM(CAST(FLOOR(term * 100) AS BIGINT)) / 100.0."""
    if term is None:
        term = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return F.sum(F.floor(term * 100).cast("long")).cast("double") / 100.0


@declare(
    "sql_tpch_q5",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue where customer and supplier
    share a nation, one region, one order year. The fact-fact joins shuffle
    on their keys; nation and region broadcast, and the region filter prunes
    nations before the big join (Catalyst pushes it through the broadcast)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_money_sum_cents().alias("revenue"))
    )


@declare(
    "sql_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name, c_acctbal,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by revenue lost to
    returns in one quarter. c_acctbal passes through the group-by raw (per-row
    double, no accumulation); LIMIT ties break on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(_money_sum_cents().alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@declare(
    "sql_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): outer join with an extra
    join-side predicate (NOT a post-filter -- customers whose only orders are
    urgent must still count as 0), then a second aggregation over the first's
    output. COUNT(col) skips the nulls the outer join introduces."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@declare(
    "sql_tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           o_totalprice, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 200
    """,
)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity tops a
    threshold, with customer attribution. One grouped aggregation keyed by the
    order (customer cols are functionally dependent so they ride in the key --
    no second join needed, unlike the spec's IN-subquery formulation)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .where(F.col("qty_raw") > 200)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            F.round("qty_raw", 2).alias("total_qty"),
        )
    )


@declare(
    "sql_tpch_q22",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_nationkey
    """,
)
def sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) adapted: nation stands in for the
    spec's phone country code. Rich-but-not-yet-fulfilled customers: balance
    above the positive-balance average (uncorrelated scalar subquery ->
    broadcast single-row cross join) and no fulfilled order (NOT EXISTS ->
    left_anti join, which at scale shuffles on the same c_custkey an inner
    join would use anyway). Every fixture customer has SOME order, so the
    spec's bare no-orders predicate would select nothing; the status filter
    keeps the anti-join meaningfully selective."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    avg_bal = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )
