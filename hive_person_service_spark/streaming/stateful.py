"""Arbitrary stateful streaming (SURVEY.md §2.I): custom per-key state
machines via applyInPandasWithState -- the Hive-less operator Spark provides
for logic that windowed aggregation can't express (custom sessionization,
fraud counters, CDC merge).

State lives per key in the StateStore (checkpointed, partitioned across
executors); the user function sees Arrow batches per key per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as explicit state --
    emits the updated totals every micro-batch the user appears in.

    The same skeleton carries any per-key state machine: read prior state,
    fold the batch, write state back, emit. Use update output mode."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update, _OUT, _STATE, "update", GroupStateTimeout.NoTimeout
    )
