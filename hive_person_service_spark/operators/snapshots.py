"""Snapshot-versioned parquet tables (time-travel lite).

A minimal table-format layer in the spirit of Iceberg/Delta, built on plain
parquet + a JSON manifest -- what a 100 TB pipeline needs from versioning
before adopting a full table format:

    layout:  <root>/manifest.json        {"current": N, "versions": [...]}
             <root>/v=1/ ... v=N/        immutable parquet snapshot dirs

Writers: write the new snapshot dir fully, then flip the manifest (a
single-file atomic rename) -- readers never observe a half-written version.
Each version records its row count and the writer-supplied note for audit.
This intentionally does NOT do concurrent multi-writer coordination; that
is the point at which you adopt Iceberg/Delta, same operator shape.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    @property
    def _manifest_path(self) -> Path:
        return self.root / "manifest.json"

    def _manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"current": 0, "versions": []}
        return json.loads(self._manifest_path.read_text())

    def write(self, df: DataFrame, note: str = "") -> int:
        """Write a new immutable snapshot; returns its version number."""
        m = self._manifest()
        version = m["current"] + 1
        vdir = self.root / f"v={version}"
        df.write.mode("errorifexists").parquet(str(vdir))
        n_rows = self.spark.read.parquet(str(vdir)).count()
        m["versions"].append({"version": version, "rows": n_rows, "note": note})
        m["current"] = version
        tmp = self.root / f".manifest-{uuid.uuid4().hex[:8]}.json"
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)  # atomic flip
        return version

    def read(self, version: int | None = None) -> DataFrame:
        """Read the current (or a pinned historical) snapshot."""
        m = self._manifest()
        v = m["current"] if version is None else version
        known = {e["version"] for e in m["versions"]}
        if v not in known:
            raise ValueError(f"unknown version {v}; have {sorted(known)}")
        return self.spark.read.parquet(str(self.root / f"v={v}"))

    def rollback(self, version: int) -> None:
        """Point current back at an earlier snapshot (data is immutable --
        rollback is a manifest flip, instant at any size)."""
        m = self._manifest()
        if version not in {e["version"] for e in m["versions"]}:
            raise ValueError(f"unknown version {version}")
        m["current"] = version
        tmp = self.root / f".manifest-{uuid.uuid4().hex[:8]}.json"
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)

    def history(self) -> list[dict]:
        return self._manifest()["versions"]

    def expire(self, keep_last: int = 2) -> list[int]:
        """Retention: drop snapshot data older than the newest ``keep_last``
        versions (the current version is always kept, wherever it points).
        Data deletion is physical; the manifest prunes the expired entries
        atomically AFTER the directories are gone, so a crash mid-expire
        leaves readable state. Returns the expired version numbers -- time
        travel back past the horizon now raises, by design."""
        import shutil

        m = self._manifest()
        versions = sorted(e["version"] for e in m["versions"])
        keep = set(versions[-keep_last:]) | {m["current"]}
        doomed = [v for v in versions if v not in keep]
        for v in doomed:
            shutil.rmtree(self.root / f"v={v}", ignore_errors=True)
        m["versions"] = [e for e in m["versions"] if e["version"] in keep]
        tmp = self.root / f".manifest-{uuid.uuid4().hex[:8]}.json"
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self._manifest_path)
        return doomed

    def diff(self, v_from: int, v_to: int) -> DataFrame:
        """Change data feed between two snapshots: full rows tagged
        'added' (in v_to only) or 'removed' (in v_from only) -- bag
        semantics via exceptAll, so duplicate-count changes surface too."""
        from pyspark.sql import functions as F

        old, new = self.read(v_from), self.read(v_to)
        added = new.exceptAll(old).withColumn("__change", F.lit("added"))
        removed = old.exceptAll(new).withColumn("__change", F.lit("removed"))
        return added.unionByName(removed)
