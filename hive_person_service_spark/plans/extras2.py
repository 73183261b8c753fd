"""Second coverage batch: nested structs, bitwise ops, TRY-functions
(ANSI-safe error handling), extended datetime, TPC-H-style analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           {'custkey': o_custkey, 'status': o_orderstatus,
            'price': o_totalprice}.custkey AS s_custkey,
           {'custkey': o_custkey, 'status': o_orderstatus,
            'price': o_totalprice}.status AS s_status,
           {'custkey': o_custkey, 'status': o_orderstatus,
            'price': o_totalprice}.price * 2 AS s_price2
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested STRUCT columns (Hive STRUCT<...>): build, carry, field-access
    -- the oracle is the round-trip identity on each field."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    return o.select(
        "o_orderkey",
        s["custkey"].alias("s_custkey"),
        s["status"].alias("s_status"),
        (s["price"] * 2).alias("s_price2"),
    )


@declare(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS and8,
           l_orderkey | 15 AS or4,
           xor(l_orderkey, l_linenumber) AS xorv,
           CAST(l_linenumber AS BIGINT) << 3 AS shl3,
           l_orderkey >> 2 AS shr2
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family: AND/OR/XOR/shifts."""
    li = load_table(spark, sf_dir, "lineitem")
    k, n = F.col("l_orderkey"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(F.lit(255)).alias("and8"),
        k.bitwiseOR(F.lit(15)).alias("or4"),
        k.bitwiseXOR(n.cast("long")).alias("xorv"),
        F.shiftleft(n.cast("long"), 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
    )


@declare(
    "fn_try",
    oracle="""
    SELECT doc_id,
           try_cast(substr(text, 1, 3) AS BIGINT) AS bad_int,
           try_cast(CAST(n_chars AS VARCHAR) AS BIGINT) AS good_int,
           n_chars / nullif(CAST(doc_id % 3 AS BIGINT), 0) AS guarded_div
    FROM documents
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: try_cast returns NULL instead of raising
    (Spark 4 runs ANSI mode by default -- plain CAST('abc' AS INT) throws);
    try_divide guards division by zero the same way DuckDB's
    x / nullif(y, 0) does."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.try_to_number(F.substring("text", 1, 3), F.lit("999"))
        .cast("long")
        .alias("bad_int"),
        F.col("n_chars").cast("string").try_cast("long").alias("good_int"),
        F.try_divide(F.col("n_chars"), (F.col("doc_id") % 3).cast("long")).alias(
            "guarded_div"
        ),
    )


@declare(
    "fn_datetime2",
    oracle="""
    SELECT o_orderkey,
           dayname(CAST(o_orderdate AS DATE)) AS day_name,
           monthname(CAST(o_orderdate AS DATE)) AS month_name,
           CAST(week(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
           strftime(make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1),
                    '%Y-%m-%d') AS year_start
    FROM orders
    """,
)
def fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended datetime family: day/month names, ISO week, make_date."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "EEEE").alias("day_name"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_format(
            F.make_date(F.year(d), F.lit(1), F.lit(1)), "yyyy-MM-dd"
        ).alias("year_start"),
    )


@declare(
    "agg_bool_bit",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_qty_pos,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           bit_and(l_linenumber) AS lines_and,
           bit_or(l_linenumber) AS lines_or,
           bit_xor(CAST(l_orderkey AS BIGINT)) AS keys_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean + bitwise aggregate family (bool_and/bool_or/bit_and/
    bit_or/bit_xor) -- order-insensitive by construction, so no rounding
    discipline needed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_qty_pos"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.expr("bit_and(l_linenumber)").alias("lines_and"),
        F.expr("bit_or(l_linenumber)").alias("lines_or"),
        F.expr("bit_xor(CAST(l_orderkey AS BIGINT))").alias("keys_xor"),
    )


@declare("stat_sketches", oracle=None)  # rows-only: sketch/sample-based
def stat_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame stat sketches: frequent-items (misra-gries style) and
    seeded stratified sampling -- the quick-profiling surface a pipeline
    uses before committing to a full scan. pytest checks the frequent set
    contains the true heavy hitters and strata are within bounds."""
    ev = load_table(spark, sf_dir, "events")
    freq = ev.stat.freqItems(["event_type"], support=0.1)
    strata = ev.sampleBy(
        "event_type", {"click": 0.5, "purchase": 0.1}, seed=42
    ).groupBy("event_type").agg(F.count("*").alias("n_sampled"))
    f = freq.select(
        F.array_join(
            F.sort_array(F.col("event_type_freqItems")), ","
        ).alias("frequent_event_types")
    )
    return strata.crossJoin(F.broadcast(f))


@declare(
    "sql_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority) adapted to the fixture columns:
    segment-filtered 3-table join, grouped revenue, deterministic top-10."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@declare(
    "sql_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) analog: bilateral trade volume between a
    nation pair by supplier-nation x customer-nation x year. Both nation
    dims broadcast; the nation filter reaches the dim scans. Revenue
    accumulates as DECIMAL(18,6) (scale-invariant money discipline --
    the plain-double form flipped a penny on one row at sf1 when
    partial-sum order diverged; see sql_market_share_exact)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2.n_nationkey"))
        .where(
            ((F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2"))
            | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
        )
    )
    return joined.groupBy(
        F.col("n1.n_name").alias("supp_nation"),
        F.col("n2.n_name").alias("cust_nation"),
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )


@declare(
    "sql_tpch_q14",
    oracle="""
    SELECT strftime(date_trunc('month', CAST(l_shipdate AS DATE)), '%Y-%m') AS month,
           ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_share,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect) analog: monthly promo revenue share.
    The ratio divides the two unrounded sums (rounding the parts first
    would compound float drift), then rounds to 6."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                6,
            ).alias("promo_share"),
            F.count("*").alias("n"),
        )
    )


@declare(
    "sql_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate;
    every predicate pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )
