"""§2.A/2.B -- scans, projection, filters, predicates, DISTINCT.

Scale notes: every query here compiles to a single WholeStageCodegen stage
over the vectorized parquet scan with the predicate and projection pushed
into the scan (verify: .explain('formatted') shows PushedFilters/ReadSchema).
No shuffles except DISTINCT (hash-partial + exchange, AQE-coalesced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection with derived expressions (column pruning:
    only 6 of 11 lineitem columns reach the scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charge"),
    )


@declare(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE l_quantity > 30 AND (l_discount < 0.02 OR l_returnflag = 'A')
          AND NOT l_linestatus = 'F'
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter with comparison + AND/OR/NOT; pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 30)
        & ((F.col("l_discount") < 0.02) | (F.col("l_returnflag") == "A"))
        & ~(F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


@declare(
    "filter_between",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND o_totalprice BETWEEN 1000 AND 50000
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range predicates on a timestamp and a double column."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
        & F.col("o_totalprice").between(1000, 50000)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


@declare(
    "filter_in",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE') AND c_nationkey IN (0, 5, 10, 24)
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership predicates (string + int)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE")
        & F.col("c_nationkey").isin(0, 5, 10, 24)
    ).select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")


@declare(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_name LIKE '%bolt%' OR regexp_matches(p_name, '^(cold|large) ')
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and RLIKE pattern predicates."""
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%bolt%") | F.col("p_name").rlike("^(cold|large) ")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@declare(
    "proj_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'big'
                WHEN o_totalprice >= 25000 THEN 'mid'
                ELSE 'small' END AS price_bucket,
           CASE WHEN o_orderstatus = 'F' THEN 'closed' ELSE 'open-ish' END AS status_label
    FROM orders
    """,
)
def proj_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection (multi-branch + simple)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000, "big")
        .when(F.col("o_totalprice") >= 25000, "mid")
        .otherwise("small")
        .alias("price_bucket"),
        F.when(F.col("o_orderstatus") == "F", "closed")
        .otherwise("open-ish")
        .alias("status_label"),
    )


@declare(
    "proj_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
           CAST(l_linenumber AS DOUBLE) AS line_dbl
    FROM lineitem
    """,
)
def proj_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST conversions: double->int (floor first: Spark truncates, DuckDB
    rounds -- FLOOR makes both exact), int->string, timestamp->date->string,
    int->double."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.floor(F.col("l_quantity")).cast("long").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
    )


@declare(
    "filter_null",
    oracle="""
    SELECT c_custkey, segment_or_null
    FROM (SELECT c_custkey,
                 CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS segment_or_null
          FROM customer)
    WHERE segment_or_null IS NOT NULL AND c_custkey IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL predicates over a derived nullable column."""
    c = load_table(spark, sf_dir, "customer")
    derived = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment_or_null"),
    )
    return derived.where(
        F.col("segment_or_null").isNotNull() & F.col("c_custkey").isNotNull()
    )


@declare(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT: hash-partial dedup before the exchange (map-side combine),
    AQE coalesces the post-shuffle partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").distinct()
