"""Quickstart: the engine as a library -- what a user of the reference
service would write after switching.

Run: python examples/quickstart.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from hive_person_service_spark.operators.dedup import near_duplicates_minhash
from hive_person_service_spark.operators.joins import asof_join, topk_per_group
from hive_person_service_spark.session import get_spark
from hive_person_service_spark.sources import load_table, register_views


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. DataFrame API over the lake
    orders = load_table(spark, sf_dir, "orders")
    top = topk_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=1,
    )
    print("top order per customer:", top.count(), "rows")

    # 2. SQL over catalog views (the Hive-tables surface)
    register_views(spark, sf_dir)
    print(
        spark.sql(
            """
            SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY rev DESC LIMIT 3
            """
        ).toPandas()
    )

    # 3. Event-time: latest click before each purchase, per user
    purchases = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    clicks = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    attributed = asof_join(
        purchases, clicks, on="user_id", left_id="event_id",
        left_ts="ts", right_ts="ts", tie_break="event_id",
    )
    print("attributed purchases:", attributed.count())

    # 4. LLM pipeline: near-duplicate docs
    docs = load_table(spark, sf_dir, "documents")
    print("near-dup pairs (MinHash-LSH):", near_duplicates_minhash(docs).count())

    # 5. Lexical retrieval: BM25 top-5 for a term query (declared query
    # surface — every entry in plans/ is callable the same way)
    from hive_person_service_spark.plans.pipeline43 import text_bm25_search

    print("BM25 top-5:")
    print(text_bm25_search(spark, sf_dir).limit(5).toPandas())

    # 6. Feature store: purchase facts joined to the SCD2 balance
    # dimension AS OF each fact's event time (no future leakage)
    from hive_person_service_spark.plans.pipeline34 import (
        scd2_point_in_time_join,
    )

    pit = scd2_point_in_time_join(spark, sf_dir)
    print("point-in-time features:", pit.count(), "users")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
