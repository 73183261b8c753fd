"""Behavioral pins for batch 35: native HLL accuracy + merge algebra,
dedup cascade accounting, URL parse edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_hll_native_error_bounds_and_union(spark):
    from hive_person_service_spark.plans.pipeline35 import sketch_hll_native

    rows = sketch_hll_native(spark, SF_SMALL).collect()
    per_type = [r for r in rows if r.event_type != "ALL(union)"]
    union = [r for r in rows if r.event_type == "ALL(union)"]
    assert per_type and len(union) == 1
    # lgK=12 HLL: relative standard error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5σ.
    for r in rows:
        assert abs(r.hll_users - r.exact_users) <= max(1, 0.09 * r.exact_users)
    # Union estimate covers the distinct-user union, which is at least the
    # largest single part and at most the sum of parts.
    biggest = max(r.hll_users for r in per_type)
    assert union[0].hll_users >= 0.9 * biggest
    assert union[0].hll_users <= sum(r.hll_users for r in per_type) * 1.1


def test_hll_union_is_associative(spark):
    """Merging (A∪B)∪C must estimate the same as A∪(B∪C) — the property
    that makes daily-rollup sketches re-aggregatable in any order."""
    from hive_person_service_spark.sources import load_table

    e = load_table(spark, SF_SMALL, "events")
    sk = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk")
    )
    types = sorted(r.event_type for r in sk.select("event_type").collect())
    a, rest = types[0], types[1:]

    def est(df):
        return df.agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))")).first()[0]

    left_first = est(sk.where(F.col("event_type").isin([a, rest[0]])))
    # order of union must not matter for the full merge
    all_fwd = est(sk)
    all_rev = est(
        sk.orderBy(F.col("event_type").desc())
    )
    assert all_fwd == all_rev
    assert left_first <= all_fwd + 1


def test_cascade_report_accounting(spark):
    from hive_person_service_spark.plans.pipeline35 import dedup_cascade_report
    from hive_person_service_spark.plans.text_pipeline import dedup_exact
    from hive_person_service_spark.sources import load_table

    r = dedup_cascade_report(spark, SF_SMALL).first()
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert r.n_input == n_docs
    assert r.n_input - r.n_exact_dropped - r.n_near_dropped == r.n_final
    # Stage 1 must agree with the standalone exact-dedup query's survivor
    # count (cascade composes, it must not redefine).
    exact_survivors = dedup_exact(spark, SF_SMALL).count()
    assert r.n_input - r.n_exact_dropped == exact_survivors
    assert r.n_near_dropped >= 0 and r.n_final > 0


def test_parse_url_edge_semantics(spark):
    """Missing query key -> NULL; port excluded from HOST — the parts the
    regex oracle must mirror."""
    df = spark.sql(
        "SELECT parse_url('https://h.io:8443/p?a=1', 'HOST') AS host,"
        " parse_url('https://h.io/p?a=1', 'QUERY', 'missing') AS q"
    ).first()
    assert df.host == "h.io"
    assert df.q is None
