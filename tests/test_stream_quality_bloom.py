"""Streaming corpus-quality gate (batch==stream equivalence) and the
runtime Bloom-filter join optimization (the shuffle-join pre-filter Spark
injects for selective dim sides -- a 100 TB lever the engine must not
accidentally disable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.plans.pipeline5 import gopher_keep
from hive_person_service_spark.sources import load_table
from hive_person_service_spark.streaming import (
    read_documents_stream,
    run_to_memory_sink,
    stream_quality_gate,
)


def test_stream_quality_gate_equals_batch(spark):
    stream = stream_quality_gate(read_documents_stream(spark, SF_SMALL))
    got = run_to_memory_sink(stream, spark)
    batch = (
        load_table(spark, SF_SMALL, "documents")
        .where(gopher_keep())
        .select("doc_id", "lang", "source", "n_chars")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # the gate actually gates (fixture corpus fails some rules)
    total = load_table(spark, SF_SMALL, "documents").count()
    assert 0 < got.count() < total


def test_runtime_bloom_filter_join(spark):
    """With a selective non-broadcast dim side, Spark should inject a
    bloom_filter_agg on the creation side and probe it before the shuffle;
    results must equal the unoptimized join."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def build():
        li = load_table(spark, SF_SMALL, "lineitem")
        o = load_table(spark, SF_SMALL, "orders").where(
            F.col("o_totalprice") > 500000
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = build()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan  # creation side present
        with_bloom = sorted(map(tuple, j.collect()))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    without = sorted(map(tuple, build().collect()))
    assert with_bloom == without
