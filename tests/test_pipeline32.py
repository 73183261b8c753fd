"""Behavioral pins for the batch-32 queries (oracle agreement is covered
generically by test_oracle.py): bloom selectivity + exactness, observe
metrics capture, compaction file-count collapse, A-ES sample properties,
polymorphic UDTF schema."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_bloom_prefilter_is_selective_and_exact(spark):
    from hive_person_service_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from hive_person_service_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    dim = (
        load_table(spark, SF_SMALL, "supplier")
        .where(F.col("s_acctbal") >= 1000)
        .select("s_suppkey")
    )
    keys = {r.s_suppkey for r in dim.collect()}
    m_bits, k = 1 << 16, 5
    bits = bloom_build(dim, "s_suppkey", m_bits, k)
    might = bloom_might_contain(bits, m_bits, k)

    total = li.count()
    match = li.where(F.col("l_suppkey").isin(keys)).count()
    pre = li.where(might(F.col("l_suppkey"))).count()
    # No false negatives: every true match survives the prefilter.
    assert pre >= match
    # Selective: with 64 Kbits over a handful of keys the false-positive
    # rate is ~0, so the prefilter should drop (almost) all non-matches.
    assert pre <= match + max(1, int(0.01 * total))
    assert match < total  # the filter had something to do


def test_bloom_probe_null_keys_false(spark):
    """A standalone probe over a nullable key column: NULL keys must come
    back False (a NULL key can never equi-join), not garbage from an
    undefined NaN->int64 cast."""
    from hive_person_service_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    m_bits, k = 1 << 16, 5
    dim = spark.createDataFrame([(7,), (13,), (42,)], "key long")
    bits = bloom_build(dim, "key", m_bits, k)
    might = bloom_might_contain(bits, m_bits, k)
    probe = spark.createDataFrame(
        [(1, 7), (2, None), (3, 999), (4, None), (5, 42)],
        "id int, key long",
    )
    got = {r.id: r.hit for r in probe.select(
        "id", might(F.col("key")).alias("hit")).collect()}
    assert got[1] is True and got[5] is True  # members survive
    assert got[2] is False and got[4] is False  # NULL keys: exact False


def test_bloom_no_false_negatives_bulk():
    from hive_person_service_spark.operators.bloom import _positions, _set_bits

    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**40), 2**40, size=2000)
    m_bits, k = 1 << 16, 5
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    _set_bits(bits, _positions(keys, m_bits, k))
    pos = _positions(keys, m_bits, k)
    for i in range(k):
        p = pos[i]
        hit = (
            bits[(p >> np.uint64(3)).astype(np.int64)]
            >> (p & np.uint64(7)).astype(np.uint8)
        ) & 1
        assert bool(hit.all())


def test_observe_metrics_captured(spark):
    from hive_person_service_spark.plans import pipeline32
    from hive_person_service_spark.sources import load_table

    df = pipeline32.obs_pipeline_metrics(spark, SF_SMALL)
    df.collect()
    obs = pipeline32.LAST_OBSERVATION["obs_pipeline_metrics"]
    got = obs.get
    li = load_table(spark, SF_SMALL, "lineitem")
    expected_rows = li.count()
    assert got["input_rows"] == expected_rows  # pre-filter input accounting
    assert got["input_qty"] == pytest.approx(
        li.agg(F.sum("l_quantity")).first()[0]
    )


def test_compaction_collapses_files(spark):
    from pathlib import Path

    from hive_person_service_spark.plans.pipeline32 import (
        _compacted_orders_layout,
    )

    path = _compacted_orders_layout(spark, SF_SMALL)
    files = list(Path(path).glob("*.parquet"))
    # 48 splinter files compacted to the size-targeted count (tiny table
    # => a single file).
    assert len(files) == 1


def test_weighted_sample_prefers_heavy_docs(spark):
    """A-ES keys must be <= 0 (ln of u in (0,1)) and the selected docs
    should skew heavier than the corpus average: weight = n_chars/558."""
    from hive_person_service_spark.plans.pipeline32 import sample_weighted_topk
    from hive_person_service_spark.sources import load_table

    rows = sample_weighted_topk(spark, SF_SMALL).collect()
    assert len(rows) == 20
    assert all(r.es_key <= 0 for r in rows)
    d = load_table(spark, SF_SMALL, "documents")
    corpus_avg = d.agg(F.avg("n_chars")).first()[0]
    sample_avg = sum(r.n_chars for r in rows) / len(rows)
    assert sample_avg > corpus_avg


def test_udtf_schema_is_computed_at_analyze_time(spark):
    from hive_person_service_spark.plans.pipeline32 import udtf_ngrams_analyze

    udtf_ngrams_analyze(spark, SF_SMALL)  # registers char_ngrams
    out = spark.sql(
        "SELECT * FROM char_ngrams(TABLE(SELECT CAST(1 AS BIGINT) AS doc_id,"
        " 'abcdef' AS text), 4)"
    )
    # Column name derives from the literal argument: gram4, not gram3.
    assert out.columns == ["doc_id", "gram4"]
    assert [r.gram4 for r in out.collect()] == ["abcd", "bcde", "cdef"]


def test_match_recognize_counts_nonoverlapping(spark):
    from hive_person_service_spark.plans.pipeline32 import events_match_recognize

    df = events_match_recognize(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.n_funnels >= 1 for r in rows)
    assert all(r.n_events >= 2 * r.n_funnels for r in rows)  # each match >= 2 events
