"""Data-quality gates, incremental near-dup, AQE runtime behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.dedup import (
    doc_shingles,
    near_duplicates_incremental,
)
from hive_person_service_spark.operators.quality import (
    check_in_range,
    check_non_null,
    check_referential_integrity,
    check_unique_key,
    profile,
)
from hive_person_service_spark.sources import load_table


def test_quality_checks_clean_fixture(spark):
    o = load_table(spark, SF_SMALL, "orders")
    c = load_table(spark, SF_SMALL, "customer")
    assert check_unique_key(o, ["o_orderkey"]).count() == 0
    assert check_non_null(o, ["o_orderkey", "o_custkey"]).count() == 0
    assert check_referential_integrity(o, "o_custkey", c, "c_custkey").count() == 0
    li = load_table(spark, SF_SMALL, "lineitem")
    assert check_in_range(li, "l_discount", 0.0, 0.10).count() == 0
    assert check_in_range(li, "l_quantity", 1.0, 49.0).count() > 0  # max is 50


def test_quality_checks_catch_violations(spark):
    bad = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None), (3, "c")], "id long, v string"
    )
    assert check_unique_key(bad, ["id"]).count() == 2  # both id=1 rows
    assert check_non_null(bad, ["v"]).count() == 1
    parent = spark.createDataFrame([(1,), (2,)], "id long")
    assert check_referential_integrity(bad, "id", parent, "id").count() == 1  # id=3


def test_profile_one_pass(spark):
    d = load_table(spark, SF_SMALL, "documents")
    row = profile(d, ["lang", "n_chars"]).collect()[0]
    assert row["lang__nulls"] == 0
    assert 4 <= row["lang__ndv"] <= 6  # 5 langs, approx
    assert int(row["n_chars__min"]) >= 40


def test_incremental_near_dup_finds_known_duplicate(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    corpus = docs.where(F.col("doc_id") < 400)
    corpus_sh = doc_shingles(corpus)
    # new batch: unseen docs + one exact copy of corpus doc 7
    copy = corpus.where(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    new_batch = docs.where(F.col("doc_id") >= 400).unionByName(copy)
    pairs = near_duplicates_incremental(new_batch, corpus_sh, threshold=0.7)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (7, 10007) in got
    # pairs are corpus-vs-new only (id_b always from the new batch)
    assert all(b >= 400 for _, b in got)


def test_aqe_coalesces_small_shuffle(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    out = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    out.collect()
    # 3 groups through a 8-partition shuffle -> AQE coalesces to ~1
    n_parts = out.rdd.getNumPartitions()
    assert n_parts <= 3, n_parts
