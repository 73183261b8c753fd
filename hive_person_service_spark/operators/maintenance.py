"""Table-maintenance operators a 100 TB pipeline needs around the query
engine: CDC merge-upsert (Hive ACID MERGE analog over plain parquet) and
small-file compaction.

Both use stage-then-swap: Spark cannot lazily read and overwrite the same
path, and a mid-job failure must never leave a half-written table. The
staging directory is written fully, then swapped in with directory renames
(atomic per-directory on a real filesystem; on object stores use a
manifest/table format instead -- same operator shape).
"""

from __future__ import annotations

import shutil
import uuid
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _swap_in(staging: Path, target: Path) -> None:
    old = target.with_name(target.name + f".old-{uuid.uuid4().hex[:8]}")
    if target.exists():
        target.rename(old)
    staging.rename(target)
    if old.exists():
        shutil.rmtree(old)


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> None:
    """MERGE INTO target USING updates: update matched keys with the new
    row, insert unmatched ones, keep the rest. One full-outer join shuffled
    on the key -- at scale, partition the target by a key prefix and merge
    only the touched partitions."""
    target = spark.read.schema(updates.schema).parquet(target_path)
    keys = list(key_cols)
    t = target.alias("t")
    u = updates.alias("u")
    cond = [t[k] == u[k] for k in keys]
    take_update = u[keys[0]].isNotNull()
    merged = t.join(u, cond, "full_outer").select(
        *[
            F.when(take_update, u[c]).otherwise(t[c]).alias(c)
            for c in updates.columns
        ]
    )
    staging = Path(target_path).with_name(
        Path(target_path).name + f".staging-{uuid.uuid4().hex[:8]}"
    )
    merged.write.mode("overwrite").parquet(str(staging))
    _swap_in(staging, Path(target_path))


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a directory of small parquet files into ~target-size files
    (the small-files problem: each file costs a task + a listing entry +
    a footer read). Returns the new file count."""
    p = Path(path)
    total = sum(f.stat().st_size for f in p.rglob("*.parquet"))
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(path)
    staging = p.with_name(p.name + f".staging-{uuid.uuid4().hex[:8]}")
    df.coalesce(n_files).write.mode("overwrite").parquet(str(staging))
    _swap_in(staging, p)
    return n_files


def delete_where(spark: SparkSession, path: str, condition) -> int:
    """Hive ACID ``DELETE FROM t WHERE cond`` over plain parquet: staged
    rewrite of the survivors + atomic directory swap (same crash contract
    as merge_upsert). Returns the number of rows deleted. At scale,
    partition the table so the rewrite touches only partitions the
    predicate can reach (partition pruning bounds the write, not the
    table size)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    before = df.count()
    # SQL DELETE removes only rows where the predicate is TRUE; rows where
    # it evaluates to NULL (nullable columns) must survive the rewrite.
    kept = df.where(~F.coalesce(condition, F.lit(False)))
    p = Path(path)
    staging = p.with_name(p.name + f".staging-{uuid.uuid4().hex[:8]}")
    kept.write.mode("overwrite").parquet(str(staging))
    _swap_in(staging, p)
    return before - spark.read.parquet(path).count()


def update_set(spark: SparkSession, path: str, condition, assignments: dict) -> int:
    """Hive ACID ``UPDATE t SET col = expr WHERE cond``: staged rewrite
    applying each assignment under the condition (rows outside it pass
    through untouched), atomic swap. Returns the number of rows matched.
    Copy-on-write semantics -- the delete/update/merge trio shares one
    crash-safe write path."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    matched = df.where(condition).count()
    out = df
    for col, expr in assignments.items():
        out = out.withColumn(col, F.when(condition, expr).otherwise(F.col(col)))
    p = Path(path)
    staging = p.with_name(p.name + f".staging-{uuid.uuid4().hex[:8]}")
    out.write.mode("overwrite").parquet(str(staging))
    _swap_in(staging, p)
    return matched
