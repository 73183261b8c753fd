"""SQL entry point (§3.1) + subquery surface: queries expressed as SQL
strings over catalog-registered views -- the "Spark SQL over Hive tables"
shape of the reference. Catalyst decorrelates the subqueries into the same
semi/anti/scalar-join plans the DataFrame API produces.

Views are registered with per-call unique names so concurrent queries with
different sf_dirs never collide in the shared session catalog.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..sources import load_table
from .registry import declare


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    vname = f"{name}_{uuid.uuid4().hex[:10]}"
    load_table(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@declare(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (orders above 2x the mean price);
    Catalyst plans the subquery once and broadcasts the scalar."""
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {o}
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM {o})
        """
    )


@declare(
    "subquery_correlated",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery; RewritePredicateSubquery turns it into a
    left-semi join (same physical plan as join_semi)."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name FROM {c}
        WHERE EXISTS (SELECT 1 FROM {o}
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        """
    )


@declare(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           ROUND(SUM(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form under ROLLUP/CUBE)."""
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               ROUND(SUM(l_extendedprice), 2) AS total
        FROM {li}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@declare(
    "fn_posexplode",
    oracle="""
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS tokens
                 FROM documents WHERE doc_id < 50),
    ex AS (SELECT doc_id,
                  unnest([{'pos': i - 1, 'token': tokens[i]}
                          FOR i IN range(1, len(tokens) + 1)]) AS u
           FROM tok)
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.token AS token FROM ex
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (Hive LATERAL VIEW posexplode): token with 0-based
    position; oracle reconstructs positions via a lateral series."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


@udtf(returnType="pos: bigint, token: string")
class _SplitTokens:
    """Python UDTF (Spark 4; Hive GenericUDTF analog): one text -> one row
    per token with its position."""

    def eval(self, text: str):  # noqa: D102
        if text is not None:
            for i, tok in enumerate(text.split(" ")):
                yield i, tok


@declare(
    "udtf_python",
    oracle="""
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS tokens
                 FROM documents WHERE doc_id < 20),
    ex AS (SELECT doc_id,
                  unnest([{'pos': i - 1, 'token': tokens[i]}
                          FOR i IN range(1, len(tokens) + 1)]) AS u
           FROM tok)
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.token AS token FROM ex
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF called via LATERAL: same contract as posexplode, but the
    row generator runs in an Arrow-fed Python worker -- the extension point
    for tokenizers that aren't expressible as built-ins."""
    spark.udtf.register("split_tokens", _SplitTokens)
    d = _view(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        SELECT d.doc_id, s.pos, s.token
        FROM {d} d, LATERAL split_tokens(d.text) s
        WHERE d.doc_id < 20
        """
    )


@declare(
    "sql_market_share",
    oracle="""
    WITH rev AS (
      SELECT r_name, year(o_orderdate) AS yr,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, year(o_orderdate))
    SELECT r_name, CAST(yr AS BIGINT) AS yr, ROUND(revenue, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY yr), 6) AS share
    FROM rev
    """,
)
def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite analytics query through the SQL entry point: 5-table join
    -> grouped revenue -> windowed share-of-year. The share division uses
    the unrounded sum on both sides (rounding before dividing would
    compound engine float differences), and the money sum accumulates as
    DECIMAL(18,6) -- the scale-invariant discipline (see
    sql_market_share_exact's docstring for the rationale; the plain-double
    form this query used until round 5 flipped its last ROUND digit on
    3 rows at sf1 when partial-sum order diverged)."""
    li = _view(spark, sf_dir, "lineitem")
    o = _view(spark, sf_dir, "orders")
    c = _view(spark, sf_dir, "customer")
    n = _view(spark, sf_dir, "nation")
    r = _view(spark, sf_dir, "region")
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT r_name, year(o_orderdate) AS yr,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          FROM {li}
          JOIN {o} ON l_orderkey = o_orderkey
          JOIN {c} ON o_custkey = c_custkey
          JOIN {n} ON c_nationkey = n_nationkey
          JOIN {r} ON n_regionkey = r_regionkey
          GROUP BY r_name, year(o_orderdate))
        SELECT r_name, CAST(yr AS BIGINT) AS yr, ROUND(revenue, 2) AS revenue,
               ROUND(revenue / SUM(revenue) OVER (PARTITION BY yr), 6) AS share
        FROM rev
        """
    )


@declare(
    "sql_top_spenders",
    oracle="""
    SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS spend,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    HAVING COUNT(*) >= 5
    ORDER BY spend DESC, c_custkey
    LIMIT 25
    """,
)
def sql_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: join + agg + HAVING + deterministic top-25."""
    c = _view(spark, sf_dir, "customer")
    o = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS spend,
               COUNT(*) AS n_orders
        FROM {c} JOIN {o} ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        HAVING COUNT(*) >= 5
        ORDER BY spend DESC, c_custkey
        LIMIT 25
        """
    )


@declare(
    "sql_market_share_exact",
    oracle="""
    WITH rev AS (
      SELECT r_name, year(o_orderdate) AS yr,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, year(o_orderdate))
    SELECT r_name, CAST(yr AS BIGINT) AS yr, ROUND(revenue, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY yr), 6) AS share
    FROM rev
    """,
)
def sql_market_share_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sql_market_share with SCALE-INVARIANT digits: the money sum
    accumulates as DECIMAL(18,6) (exact, order-independent addition --
    the per-row product has <= 4 true decimal digits, so the 6-digit cast
    is tie-free) instead of double. The plain-double variant's last
    ROUND digit can flip between engines once partial-sum order diverges
    (observed at sf1: 3 rows off by one cent, SELFCHECK_sf1_r4.json);
    this form is bit-identical at EVERY scale -- the exemplar for any
    contract that demands scale-invariant money digits. Cost: decimal
    aggregation is modestly slower than double (no SIMD), which is why
    both variants exist."""
    li = _view(spark, sf_dir, "lineitem")
    o = _view(spark, sf_dir, "orders")
    c = _view(spark, sf_dir, "customer")
    n = _view(spark, sf_dir, "nation")
    r = _view(spark, sf_dir, "region")
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT r_name, year(o_orderdate) AS yr,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          FROM {li}
          JOIN {o} ON l_orderkey = o_orderkey
          JOIN {c} ON o_custkey = c_custkey
          JOIN {n} ON c_nationkey = n_nationkey
          JOIN {r} ON n_regionkey = r_regionkey
          GROUP BY r_name, year(o_orderdate))
        SELECT r_name, CAST(yr AS BIGINT) AS yr, ROUND(revenue, 2) AS revenue,
               ROUND(revenue / SUM(revenue) OVER (PARTITION BY yr), 6) AS share
        FROM rev
        """
    )
