"""Behavioral pins for batch 43: BM25 ranking properties, logistic
scoring calibration range."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_bm25_ranking_properties(spark):
    from hive_person_service_spark.plans.pipeline43 import (
        _BM25_QUERY,
        text_bm25_search,
    )
    from hive_person_service_spark.sources import load_table

    rows = text_bm25_search(spark, SF_SMALL).collect()
    assert rows and len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.bm25 > 0 for r in rows)
    assert all(1 <= r.n_terms_hit <= len(_BM25_QUERY) for r in rows)
    # every returned doc really contains at least one query term
    d = load_table(spark, SF_SMALL, "documents")
    ids = [r.doc_id for r in rows]
    hits = (
        d.where(F.col("doc_id").isin(ids))
        .where(
            F.arrays_overlap(
                F.split(F.lower("text"), " "),
                F.array(*[F.lit(t) for t in _BM25_QUERY]),
            )
        )
        .count()
    )
    assert hits == len(ids)


def test_logistic_scores_are_probabilities(spark):
    from hive_person_service_spark.plans.pipeline43 import ml_score_logistic
    from hive_person_service_spark.sources import load_table

    rows = ml_score_logistic(spark, SF_SMALL).collect()
    n_cust = load_table(spark, SF_SMALL, "customer").count()
    assert len(rows) == n_cust  # left join: every customer scored
    assert all(0 < r.p < 1 for r in rows)
    assert all(r.predicted == (r.p >= 0.5) for r in rows)
    # both classes present: the weights aren't degenerate on this data
    preds = {r.predicted for r in rows}
    assert preds == {True, False}
