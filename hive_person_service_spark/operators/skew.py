"""Skew-handling join (SURVEY.md §4): explicit key salting for the case AQE
skew-split can't fix -- a single hot key whose rows exceed one executor's
memory on the *build* side of an SMJ.

Mechanics: the left (large, skewed) side gets a deterministic salt in
[0, n) derived from a unique column; the right side is replicated n times
with every salt value; the join runs on (key, salt) so the hot key spreads
over n partitions. Right-side rows are duplicated n-fold -- keep n modest
and the right side the smaller input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
    merge_hint: bool = False,
) -> DataFrame:
    """Equi-join with salted keys. ``left_unique_col`` seeds the salt
    deterministically (reruns produce identical partitioning -- F.rand would
    not survive task retries at scale). ``merge_hint=True`` pins the
    shuffle-join plan shape (SMJ on (key, salt)) even when the replicated
    right side would auto-broadcast at test scale -- the plan under test
    is the one a 100 TB run gets."""
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(left_unique_col)), F.lit(n_salts))
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    if merge_hint:
        salted_left = salted_left.hint("merge")
        salted_right = salted_right.hint("merge")
    out = salted_left.join(salted_right, on=keys + ["__salt"], how=how)
    return out.drop("__salt")
