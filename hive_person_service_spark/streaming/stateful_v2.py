"""transformWithStateInPandas (Spark 4): the successor API to
applyInPandasWithState -- typed state variables (ValueState/ListState/
MapState), TTL, timers -- this module carries the same running-totals
semantics as stateful.py on the new API so both stateful surfaces are
covered.

Runtime note: the state-store side channel between the Python worker and
the JVM state server speaks protobuf. This container ships no protobuf
wheel, so the session builder injects the repo's pure-Python wire-format
shim (vendor/protobuf_shim) onto the worker PYTHONPATH when the real
runtime is absent -- transformWithStateInPandas then EXECUTES end-to-end
(pinned in tests/test_stateful_v2_exec.py). On a normally-provisioned
cluster the real wheel wins and the shim never activates.

Execution requires the RocksDB state-store provider (Spark's documented
requirement for transformWithState); ``rocksdb_state_provider`` scopes
that conf to the query being started.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def rocksdb_state_provider(spark: SparkSession):
    """Temporarily select the RocksDB state store (required by
    transformWithState; the provider is captured when a query STARTS, so
    scoping the conf to the .start() call leaves other streams on the
    session default)."""
    try:
        prev = spark.conf.get(_PROVIDER_KEY)
    except Exception:
        prev = None
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev)

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


_MAP_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
    ]
)


class EventTypeCountsProcessor(StatefulProcessor):
    """Per-key MapState: event_type -> running count. Each micro-batch
    emits the key's FULL current map (update semantics downstream keep the
    newest row per (user, type)); the map is the natural shape for
    per-entity attribute counters that windowed aggs can't hold open."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts",
            StructType([StructField("event_type", StringType())]),
            StructType([StructField("n", LongType())]),
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            for etype, cnt in pdf["event_type"].value_counts().items():
                prev = (
                    self._counts.getValue((etype,))[0]
                    if self._counts.containsKey((etype,))
                    else 0
                )
                self._counts.updateValue((etype,), (prev + int(cnt),))
        users, types, ns = [], [], []
        for (etype,), (n,) in self._counts.iterator():
            users.append(key[0])
            types.append(etype)
            ns.append(n)
        yield pd.DataFrame({"user_id": users, "event_type": types, "n": ns})

    def close(self) -> None:
        pass


def event_type_counts_v2(events: DataFrame) -> DataFrame:
    """Per-user per-event-type running counts on MapState."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            EventTypeCountsProcessor(), _MAP_OUT, "update", "none"
        )
    )


class RecentValuesProcessor(StatefulProcessor):
    """Per-key ListState: every value appended; emits (count, sum) computed
    FROM THE LIST each batch, so the test cross-checks list contents (not
    just an accumulator) against the batch aggregate."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._vals = handle.getListState(
            "vals", StructType([StructField("v", DoubleType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            self._vals.appendList(
                [(float(v),) for v in pdf["value"].tolist()]
            )
        total, n = 0.0, 0
        for (v,) in self._vals.get():
            total += v
            n += 1
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
            }
        )

    def close(self) -> None:
        pass


def recent_values_totals_v2(events: DataFrame) -> DataFrame:
    """ListState-backed totals (count+sum recomputed from the stored list)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RecentValuesProcessor(), _OUT, "update", "none"
        )
    )


_TIMED_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("kind", StringType()),
        StructField("n", LongType()),
    ]
)


class TimedCountsProcessor(StatefulProcessor):
    """Processing-time timers: every batch emits the running count AND
    (re-)arms a near-immediate timer for the key, exercising the full timer
    protocol (listTimers -> deleteTimer -> registerTimer); when a later
    batch fires the timer, handleExpiredTimer emits a ``kind='timer'`` row
    carrying the state at expiry — the inactivity-flush shape (session
    finalization, abandoned-cart emission)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._count = handle.getValueState(
            "count", StructType([StructField("n", LongType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        # re-arm: drop stale timers, then register one just past "now" so
        # the NEXT micro-batch (strictly later processing time) fires it
        for ts in self._handle.listTimers():
            self._handle.deleteTimer(ts)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + 1
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "kind": ["input"], "n": [n]}
        )

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        yield pd.DataFrame(
            {"user_id": [key[0]], "kind": ["timer"], "n": [n]}
        )

    def close(self) -> None:
        pass


def timed_counts_v2(events: DataFrame) -> DataFrame:
    """Running counts + timer-driven flush rows (processing-time mode).

    Caveat: in processing-time mode Spark conservatively schedules another
    micro-batch whenever timers may be pending, so trigger(availableNow)
    NEVER terminates on this stream — run it with a live trigger and stop
    it explicitly (tests/test_stateful_v2_exec.py does exactly that)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TimedCountsProcessor(), _TIMED_OUT, "update", "processingtime"
        )
    )


class EventTimeFlushProcessor(StatefulProcessor):
    """EVENT-time timers: each batch re-arms a timer just past the
    current watermark; when a later batch's WATERMARK passes it (event
    time, not wall clock), handleExpiredTimer emits the key's state —
    the watermark-driven session-finalization shape. Late data cannot
    resurrect a flushed key below the watermark, which is what makes
    this correct under out-of-order arrival at 100 TB/day."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._count = handle.getValueState(
            "count", StructType([StructField("n", LongType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        for ts in self._handle.listTimers():
            self._handle.deleteTimer(ts)
        wm = timerValues.getCurrentWatermarkInMs()
        self._handle.registerTimer(max(wm, 0) + 1)
        yield pd.DataFrame(
            {"user_id": [key[0]], "kind": ["input"], "n": [n]}
        )

    def handleExpiredTimer(
        self, key, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        yield pd.DataFrame(
            {"user_id": [key[0]], "kind": ["timer"], "n": [n]}
        )

    def close(self) -> None:
        pass


def event_time_flush_v2(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Running counts + watermark-driven flush rows (event-time mode);
    input must carry the ``ts`` event-time column."""
    return (
        events.withWatermark("ts", watermark)
        .select("ts", "user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            EventTimeFlushProcessor(), _TIMED_OUT, "update", "eventtime"
        )
    )


class SeededTotalsProcessor(RunningTotalsProcessor):
    """RunningTotals + handleInitialState: state seeded per key from an
    initial-state relation before the first batch (the migration shape:
    carry totals over from a previous system/table into live state)."""

    def handleInitialState(self, key, initialState, timerValues) -> None:
        self._totals.update(
            (int(initialState["n"].iloc[0]), float(initialState["total"].iloc[0]))
        )


def seeded_totals_v2(events: DataFrame, initial: DataFrame) -> DataFrame:
    """Totals with per-key initial state (initial: user_id, n, total)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SeededTotalsProcessor(),
            _OUT,
            "update",
            "none",
            initialState=initial.groupBy("user_id"),
        )
    )


_SESS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("n_total", LongType()),
    ]
)

_SESSION_GAP_US = 30 * 60 * 1_000_000


class SessionizeProcessor(StatefulProcessor):
    """Exact 30-minute-gap sessionization under ARBITRARY batch splits
    and out-of-order arrival: the per-user event-time buffer lives in a
    typed ListState and the session list is recomputed from the full
    buffer on every update, so a late early event that MERGES two
    sessions is handled exactly (incremental designs get this wrong).
    Each update emits the user's complete current session list stamped
    with n_total (buffered event count, strictly increasing) -- the
    consumer keeps each user's max-n_total emission, which IS the final
    session list. The production variant evicts buffer entries below the
    watermark once their session is final; kept unbounded here because
    the declared query drains a bounded replay."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getListState(
            "tsbuf", StructType([StructField("tsu", LongType())])
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        new = [
            int(v)
            for pdf in rows
            for v in pdf["tsu"].tolist()
        ]
        if new:
            self._buf.appendList([(v,) for v in new])
        ts = sorted(int(r[0]) for r in self._buf.get())
        if not ts:
            return
        starts, ends, counts = [], [], []
        s = ts[0]
        prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > _SESSION_GAP_US:
                starts.append(s)
                ends.append(prev)
                counts.append(n)
                s, n = t, 1
            else:
                n += 1
            prev = t
        starts.append(s)
        ends.append(prev)
        counts.append(n)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(starts),
                "start_us": starts,
                "end_us": ends,
                "n_events": counts,
                "n_total": [len(ts)] * len(starts),
            }
        )

    def close(self) -> None:
        pass


def sessionize_v2(events: DataFrame) -> DataFrame:
    """Gap sessionization on transformWithStateInPandas; input must carry
    ``user_id`` and ``tsu`` (event time in epoch microseconds)."""
    return (
        events.select("user_id", "tsu")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionizeProcessor(), _SESS_OUT, "update", "none"
        )
    )
