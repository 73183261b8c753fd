"""The driver-mirror correctness gate as pytest: every declared query vs its
DuckDB oracle at sf0.001 (SURVEY.md §5.2.1). tools/selfcheck.py runs the
same comparison standalone (and at sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.selfcheck import compare

from hive_person_service_spark import plans

ORACLES = plans.all_oracles()
ALL = plans.all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = ALL[name](spark, SF_SMALL).toPandas()
    ddf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_rows_only_runs(name, spark):
    df = ALL[name](spark, SF_SMALL)
    assert df.count() >= 0  # materializes without error, stable schema
    assert len(df.schema.fields) > 0
