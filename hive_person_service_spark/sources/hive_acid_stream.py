"""Streaming FROM a Hive ACID table: a Spark 4 Python DataSource whose
stream offsets are WRITE IDS -- ``spark.readStream.format("hive_acid_tail")
.option("table", path)`` tails the delta directories, serving each
micro-batch from the insert deltas committed since the last offset.

The natural subject is an insert-only (MM) transactional table -- the
layout Hive's own streaming ingest produces -- but full-ACID tables
tail too (their delta files carry the five ACID columns; the reader
projects ``row.*``).  Commits that CHANGE existing data gate the
stream precisely, mirroring delta_tail's contract: a ``delete_delta``
or a mid-stream ``base_N`` (compaction rewrites history) raises unless
``skipChangeCommits=true`` skips them whole.

Scale posture (the delta_tail shape): latestOffset()/partitions() are
DRIVER-side directory listings only -- never opening a data file --
and each bucket file becomes one ``InputPartition``; rows decode with
pyarrow's ORC reader on the EXECUTORS, so streamed bytes never funnel
through the driver.  Offsets are exact and replayable:
``partitions(start, end)`` re-plans any (start, end] write-id range
deterministically, which gives the downstream checkpoint exactly-once.

Partition columns re-attach from the Hive ``col=val`` directory names,
typed from the declared schema (strings as stored; numeric partition
values cast on the executor).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .hive_acid import (
    _BASE_RE,
    _DELETE_RE,
    _DELTA_RE,
    _aborted_wids,
    _bucket_of,
    _is_insert_only,
    _part_kv,
    _partitions,
)


def _acid_versions(table: str) -> list[int]:
    """Every write id visible on disk (insert deltas, delete deltas,
    bases), ascending.  Delete/base ids MUST advance the offset too --
    otherwise a trailing change commit would sit invisible below
    latestOffset and the gate below could never fire.  Aborted write ids
    still advance the offset (their directories are invisible data, not
    invisible history) so the stream never stalls under one."""
    wids: set[int] = set()
    for pdir in _partitions(table).values():
        for name in os.listdir(pdir):
            if not os.path.isdir(os.path.join(pdir, name)):
                continue
            m = _DELTA_RE.match(name) or _DELETE_RE.match(name)
            if m:
                wids.add(int(m.group(2)))
                continue
            m = _BASE_RE.match(name)
            if m:
                wids.add(int(m.group(1)))
    return sorted(wids)


def _acid_schema_fields(table: str) -> tuple[list[dict], bool]:
    """(schema fields incl. the partition column, insert_only?) --
    derived from one data file's footer (driver-side, KB read)."""
    import pyarrow as pa
    import pyarrow.orc as pao
    from pyspark.sql.pandas.types import from_arrow_schema

    insert_only = _is_insert_only(table)
    parts = _partitions(table)
    first = None
    for pname in sorted(parts):
        pdir = parts[pname]
        for name in sorted(os.listdir(pdir)):
            full = os.path.join(pdir, name)
            if os.path.isdir(full) and _DELTA_RE.match(name):
                for f in sorted(os.listdir(full)):
                    if f.startswith("bucket_"):
                        first = os.path.join(full, f)
                        break
            if first:
                break
        if first:
            break
    if first is None:
        raise ValueError(f"hive_acid_tail: no delta data in {table!r}")
    arrow = pao.ORCFile(first).schema.remove_metadata()
    if not insert_only and "row" in arrow.names:
        arrow = pa.schema(list(arrow.field("row").type))
    fields = from_arrow_schema(arrow).jsonValue()["fields"]
    partitioned = "" not in parts
    if partitioned:
        pcol = _part_kv(sorted(parts)[0])[0]
        fields = fields + [
            {"name": pcol, "type": "string", "nullable": True,
             "metadata": {}}
        ]
    return fields, insert_only


def _acid_tail_payloads(
    table: str, lo: int, hi: int, fields: list[dict],
    insert_only: bool, skip_change: bool,
) -> list[dict]:
    """Driver half: the bucket files of insert deltas with write id in
    (lo, hi], one payload per file.  delete_deltas and bases appearing
    in the range gate (change commits) unless skip_change -- and a
    skipped change commit skips WHOLE: the same-write-id insert delta
    (an UPDATE's post-image re-inserts) is skipped with it, matching
    delta-spark's whole-commit skip semantics.

    A minor-compacted ``delta_lo_hi`` whose lo falls at or below the
    committed offset merged already-streamed history into one
    directory; replaying it verbatim would double-deliver.  Full-ACID
    rows carry ``originalTransaction``, so such a directory streams
    with a row filter to write ids in (lo, hi] (exactly-once kept);
    insert-only deltas have no per-row write id and gate like a
    mid-stream base (compaction rewrote history)."""
    payloads: list[dict] = []
    parts = _partitions(table)
    partitioned = "" not in parts
    names = [f["name"] for f in fields]
    data_names = names[:-1] if partitioned else names
    # aborted write ids (the valid-write-id subtraction): their
    # published directories are invisible to the stream entirely
    aborted = _aborted_wids(table)

    def _is_aborted(m) -> bool:
        return m.group(1) == m.group(2) and int(m.group(1)) in aborted

    # pass 1 (all partitions -- write ids are table-global): the write
    # ids of single-commit change actions being skipped, so their
    # same-commit insert deltas skip too
    skip_wids: set[int] = set()
    if skip_change:
        for pdir in parts.values():
            for name in os.listdir(pdir):
                if not os.path.isdir(os.path.join(pdir, name)):
                    continue
                m = _DELETE_RE.match(name)
                if m and m.group(1) == m.group(2) \
                        and lo < int(m.group(2)) <= hi \
                        and not _is_aborted(m):
                    skip_wids.add(int(m.group(2)))
                    continue
                m = _BASE_RE.match(name)
                if m and lo < int(m.group(1)) <= hi \
                        and int(m.group(1)) not in aborted:
                    skip_wids.add(int(m.group(1)))
    for pname in sorted(parts):
        pdir = parts[pname]
        for name in sorted(os.listdir(pdir)):
            full = os.path.join(pdir, name)
            if not os.path.isdir(full):
                continue
            m = _DELETE_RE.match(name)
            if m and _is_aborted(m):
                continue
            m_b = _BASE_RE.match(name)
            if m_b and int(m_b.group(1)) in aborted:
                continue
            m_d = _DELTA_RE.match(name)
            if m_d and _is_aborted(m_d):
                continue
            m = _DELETE_RE.match(name)
            if m and lo < int(m.group(2)) <= hi:
                if skip_change:
                    continue
                raise ValueError(
                    f"hive_acid_tail: write id {m.group(2)} deletes "
                    "existing data; streaming requires insert-only "
                    "commits (set skipChangeCommits=true to skip them)"
                )
            m = _BASE_RE.match(name)
            if m and lo < int(m.group(1)) <= hi:
                if skip_change:
                    continue
                raise ValueError(
                    f"hive_acid_tail: base_{m.group(1)} rewrites history "
                    "inside the stream range (compaction); set "
                    "skipChangeCommits=true to skip it"
                )
            m = _DELTA_RE.match(name)
            if not m or not (lo < int(m.group(2)) <= hi):
                continue
            d_lo, d_hi = int(m.group(1)), int(m.group(2))
            if d_lo == d_hi and d_hi in skip_wids:
                continue  # insert half of a skipped UPDATE/base commit
            wid_range = None
            if d_lo <= lo:
                # merged directory straddling the committed boundary
                if not insert_only:
                    wid_range = (lo, hi)
                elif skip_change:
                    continue
                else:
                    raise ValueError(
                        f"hive_acid_tail: minor-compacted {name} merged "
                        f"already-streamed write ids <= {lo}; insert-only "
                        "rows carry no per-row write id to filter by "
                        "(set skipChangeCommits=true to skip it)"
                    )
            files = [f for f in sorted(os.listdir(full))
                     if f.startswith("bucket_")]
            for i, f in enumerate(files):
                payloads.append({
                    "file": os.path.join(full, f),
                    "names": data_names,
                    "acid": not insert_only,
                    "part_val": _part_kv(pname)[1] if partitioned else None,
                    "wid_range": wid_range,
                })
    return payloads


def _acid_payload_rows(p: dict):
    """Executor half: stream one bucket file's stripes to row tuples."""
    import pyarrow.orc as pao

    orc = pao.ORCFile(p["file"])
    names = p["names"]
    extra = (p["part_val"],) if p["part_val"] is not None else ()
    wid_range = p.get("wid_range")
    for i in range(orc.nstripes):
        rb = orc.read_stripe(i)
        if p["acid"]:
            rows = rb.column("row")
            cols = {
                n: rows.field(n).to_pylist() for n in names
            }
            n_rows = len(rows)
            if wid_range is not None:
                # merged delta straddling the committed offset: deliver
                # only rows whose originating write id is in (lo, hi]
                w_lo, w_hi = wid_range
                wids = rb.column("originalTransaction").to_pylist()
                for j in range(n_rows):
                    if w_lo < wids[j] <= w_hi:
                        yield tuple(cols[n][j] for n in names) + extra
                continue
        else:
            cols = {n: rb.column(n).to_pylist() for n in names}
            n_rows = rb.num_rows
        for j in range(n_rows):
            yield tuple(cols[n][j] for n in names) + extra


class HiveAcidTailStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table = options.get("table")
        if not self.table:
            raise ValueError(
                "hive_acid_tail requires .option('table', <path>)"
            )
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.starting = int(options.get("startingWriteId", "0"))
        self.max_wids = int(options.get("maxWriteIdsPerBatch", "1000000"))
        self.fields, self.insert_only = _acid_schema_fields(self.table)
        self._committed = self.starting

    def initialOffset(self):
        return {"wid": self.starting}

    def latestOffset(self):
        pending = [
            w for w in _acid_versions(self.table) if w > self._committed
        ][: self.max_wids]
        return {"wid": pending[-1] if pending else self._committed}

    def partitions(self, start, end):
        payloads = _acid_tail_payloads(
            self.table, start["wid"], end["wid"], self.fields,
            self.insert_only, self.skip_change,
        )
        return [InputPartition(p) for p in payloads] or [
            InputPartition(None)
        ]

    def read(self, partition):
        if partition.value is None:
            return iter(())
        return _acid_payload_rows(partition.value)

    def commit(self, end):
        self._committed = max(self._committed, end["wid"])


class HiveAcidTailBatchReader(DataSourceReader):
    def __init__(self, options):
        self.table = options.get("table")
        self.skip_change = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self.fields, self.insert_only = _acid_schema_fields(self.table)

    def partitions(self):
        head = max(_acid_versions(self.table), default=0)
        payloads = _acid_tail_payloads(
            self.table, 0, head, self.fields, self.insert_only,
            self.skip_change,
        )
        return [InputPartition(p) for p in payloads] or [
            InputPartition(None)
        ]

    def read(self, partition):
        if partition.value is None:
            return iter(())
        return _acid_payload_rows(partition.value)


class HiveAcidTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hive_acid_tail"

    def schema(self):
        fields, _ = _acid_schema_fields(self.options["table"])
        return StructType.fromJson({"type": "struct", "fields": fields})

    def reader(self, schema):
        return HiveAcidTailBatchReader(self.options)

    def streamReader(self, schema):
        return HiveAcidTailStreamReader(self.options)


def register_hive_acid_tail(spark) -> None:
    """Idempotent registration of the hive_acid_tail source."""
    spark.dataSource.register(HiveAcidTailDataSource)
