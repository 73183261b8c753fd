"""Incremental additive materialized-view maintenance.

The hypertable-rollup / continuous-aggregate pattern at lake scale: a
grouped SUM/COUNT view is maintained by folding in DELTAS (new partitions,
new stream batches) instead of recomputing over the full fact history.
Correct for any commutative-monoid measure (sum, count, min, max); AVG is
derived as sum/count at read time -- never stored, or it stops merging.

Storage is plain parquet with stage-then-swap atomicity (same discipline
as operators/maintenance.py and the CMS sketch maintainer); the state
relation has one row per group key, so each merge shuffles only
|delta groups| + |state groups| rows -- churn-proportional, like the
stats-index refresh.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .maintenance import _swap_in


class AdditiveMatView:
    """Grouped additive view: key columns + {out_name: (src_col, fn)}
    measures where fn in {'sum', 'count', 'min', 'max'}."""

    def __init__(self, path: str, keys: list[str],
                 measures: dict[str, tuple[str, str]]):
        for name, (_, fn) in measures.items():
            if fn not in ("sum", "count", "min", "max"):
                raise ValueError(f"non-mergeable measure {name}: {fn}")
        self.path = Path(path)
        self.keys = keys
        self.measures = measures

    # -- aggregation ---------------------------------------------------

    def _agg(self, df: DataFrame) -> DataFrame:
        aggs = []
        for name, (col, fn) in self.measures.items():
            aggs.append(getattr(F, fn)(col).alias(name))
        return df.groupBy(*self.keys).agg(*aggs)

    def _merge_fn(self, name: str) -> str:
        fn = self.measures[name][1]
        # partial states merge with the monoid op; counts merge by SUM
        return "sum" if fn in ("sum", "count") else fn

    # -- lifecycle -----------------------------------------------------

    def init(self, facts: DataFrame) -> None:
        """Full build from the initial fact set."""
        staging = self.path.with_name(
            self.path.name + f".staging-{uuid.uuid4().hex[:8]}"
        )
        self._agg(facts).write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, self.path)

    def merge_delta(self, delta: DataFrame) -> None:
        """Fold a batch of NEW fact rows into the view: aggregate the delta,
        union with current state, re-merge per key. Only group-cardinality
        rows move -- never the fact history. Deltas must be append-only
        (retractions need signed measures: feed negated rows)."""
        spark = delta.sparkSession
        state = spark.read.parquet(str(self.path))
        delta_agg = self._agg(delta)
        merged = (
            state.unionByName(delta_agg)
            .groupBy(*self.keys)
            .agg(
                *[
                    getattr(F, self._merge_fn(n))(n).alias(n)
                    for n in self.measures
                ]
            )
        )
        staging = self.path.with_name(
            self.path.name + f".staging-{uuid.uuid4().hex[:8]}"
        )
        merged.write.mode("overwrite").parquet(str(staging))
        _swap_in(staging, self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(str(self.path))
