"""Person-data governance operators: GDPR erasure, pseudonymization,
masked exports. The reference is a person/profile service -- right-to-be-
forgotten deletes and privacy-preserving derived tables are first-class
operations on such data, not afterthoughts.

Scale/design notes:
- Erasure is an anti-join rewrite + atomic swap (stage-then-swap, same
  machinery as maintenance.merge_upsert). At lake scale, pair with
  file-level stats (operators/skipping.py) so the rewrite touches only
  files whose min/max span a deleted key -- everything else is renamed,
  not rewritten.
- Pseudonymization must be STABLE (same subject -> same pseudo key across
  tables and runs, so joins still work) yet non-reversible without the
  salt. Salted sha256 gives both; the salt lives outside the data path.
"""

from __future__ import annotations

import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .maintenance import _swap_in


def erase_rows(
    spark: SparkSession,
    target_path: str,
    keys: DataFrame,
    key_col: str,
) -> dict:
    """Right-to-be-forgotten: remove every row of the parquet table at
    ``target_path`` whose ``key_col`` appears in ``keys``. Anti-join
    rewrite, staged then atomically swapped; idempotent (erasing already-
    absent keys is a no-op rewrite). Returns before/after row counts so
    the caller can log an erasure receipt."""
    target = Path(target_path)
    current = spark.read.parquet(str(target))
    before = current.count()
    remaining = current.join(
        F.broadcast(keys.select(key_col).distinct()), key_col, "left_anti"
    )
    staging = target.with_name(target.name + f".staging-{uuid.uuid4().hex[:8]}")
    remaining.write.mode("overwrite").parquet(str(staging))
    _swap_in(staging, target)
    after = spark.read.parquet(str(target)).count()
    return {"rows_before": before, "rows_after": after, "erased": before - after}


def pseudonymize_key(col, salt: str):
    """Stable non-reversible subject key: sha256(salt || ':' || key).
    Identical expression exists in DuckDB (sha256) -- oracle-checkable."""
    return F.sha2(F.concat(F.lit(salt), F.lit(":"), F.col(col).cast("string")), 256)


def pseudonymize(
    df: DataFrame, key_col: str, salt: str, drop: list[str] | None = None
) -> DataFrame:
    """Replace the subject key with its salted hash and drop direct
    identifiers. Same (key, salt) -> same pseudo key in every table, so
    referential joins survive pseudonymization."""
    out = df.withColumn("pseudo_id", pseudonymize_key(key_col, salt)).drop(key_col)
    for c in drop or []:
        out = out.drop(c)
    return out
