"""transformWithStateInPandas (Spark 4): the successor API to
applyInPandasWithState -- typed state variables (ValueState/ListState/
MapState), TTL, timers -- this module carries the same running-totals
semantics as stateful.py on the new API so both stateful surfaces are
covered.

Environment note: executing this operator requires the python `protobuf`
runtime (the state-store side channel speaks protobuf); this container
ships a broken google.protobuf, so tests skip execution here and pin the
applyInPandasWithState twin (stateful.py) instead. The code path is the
production surface on any normally-provisioned cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
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


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key ValueState fold: (count, sum) updated each micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """Same semantics as stateful.running_user_totals, on the
    transformWithStateInPandas API (update mode, processing-time)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotalsProcessor(), _OUT, "update", "none"
        )
    )
