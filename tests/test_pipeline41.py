"""Behavioral pins for batch 41: rules fire on demand, readability
orders sanely, the cache plan actually uses the cache."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_alert_rules_are_data_driven(spark):
    """Adding a rule row fires new alerts with NO query change — the
    rules-engine property itself."""
    from hive_person_service_spark.plans.pipeline41 import (
        _ALERT_RULES,
        events_alert_rules,
    )
    from hive_person_service_spark.sources import load_table

    base = events_alert_rules(spark, SF_SMALL).collect()
    fired_rules = {r.rule_id for r in base}
    assert fired_rules, "some rule fires on the fixture"
    # re-run the same engine logic with one extra always-true rule
    e = load_table(spark, SF_SMALL, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("double").alias("value")
    ).select("day", F.lit("events_total").alias("metric"), "value")
    rules = spark.createDataFrame(
        [*_ALERT_RULES, (99, "events_total", ">", -1.0, "info")],
        "rule_id INT, metric STRING, op STRING, bound DOUBLE, severity STRING",
    )
    fired = (
        daily.join(F.broadcast(rules), "metric")
        .where(
            ((F.col("op") == ">") & (F.col("value") > F.col("bound")))
            | ((F.col("op") == "<") & (F.col("value") < F.col("bound")))
        )
    )
    n_days = daily.count()
    assert fired.where(F.col("rule_id") == 99).count() == n_days


def test_readability_orders_simple_before_dense(spark):
    from hive_person_service_spark.plans.pipeline41 import text_readability

    rows = text_readability(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.sentences >= 1 and r.words >= 1 and r.syllables >= 1
        # grade and ease move in opposite directions by construction
    import statistics

    ease = [r.flesch_ease for r in rows]
    grade = [r.fk_grade for r in rows]
    # anti-correlated across the corpus (shared words/sentence and
    # syllables/word terms with opposite signs)
    n = len(rows)
    me, mg = sum(ease) / n, sum(grade) / n
    cov = sum((e - me) * (g - mg) for e, g in zip(ease, grade)) / n
    assert cov < 0


def test_cache_table_plan_reads_cache(spark):
    from hive_person_service_spark.plans.pipeline41 import sql_cache_table

    df = sql_cache_table(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "In-memory table" in plan or "InMemoryRelation" in plan
    df.collect()
    spark.sql("UNCACHE TABLE IF EXISTS _ct_small_lines")
