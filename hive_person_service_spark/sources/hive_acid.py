"""Hive ACID transactional table layout (the reference's OWN format).

Reader/writer over Hive's PUBLIC full-ACID transactional table layout
(https://cwiki.apache.org/confluence/display/Hive/Hive+Transactions):

  * ``<part>=<val>/``    -- optional Hive-style partition directories
                            (single level); every tier below nests per
                            partition and write-ids stay TABLE-wide,
                            exactly Hive's allocation;
  * ``base_N/``          -- the full snapshot through write-id N (from a
                            major compaction or the initial load);
  * ``delta_M_N/``       -- rows INSERTED by write-ids M..N;
  * ``delete_delta_M_N/``-- ROW-IDS deleted by write-ids M..N (ACID v2
                            splits deletes from inserts so deltas stay
                            insert-only and merge cheaply);
  * ``00000i_0``         -- ORIGINAL files: a pre-ACID table converted
                            in place (ALTER TABLE .. 'transactional' =
                            'true') keeps its plain ORC files at the
                            partition root; readers synthesize ROW__IDs
                            for them (write-id 0, bucket from the file
                            name, rowId = row ordinal within the file,
                            one original file per bucket -- Hive's
                            conversion rules);
  * per-bucket data files named ``bucket_0000i`` inside each directory;
  * the ``_orc_acid_version`` marker file (contents ``2``);
  * the ``_insert_only`` marker: insert-only (MM) transactional tables,
    whose delta files carry NO acid columns (plain user rows) and which
    reject DELETE/UPDATE -- Hive's 'transactional_properties' =
    'insert_only' shape.

Every full-ACID data row carries the five ACID columns at the head,
exactly the ROW__ID shape Hive's AcidInputFormat materializes --
``operation`` (0 insert / 1 update / 2 delete), ``originalTransaction``
(the write id that created the row), ``bucket``, ``rowId`` (unique
within (originalTransaction, bucket) per partition),
``currentTransaction`` -- with the user row nested as a ``row`` STRUCT,
Hive's physical layout.  UPDATE is delete + re-insert under ONE write
id (new rowIds, original write id as the deleted row's reference),
which is precisely how Hive implements it.  Files are ORC, the only
format Hive ACID supports.

Snapshot read semantics (``hive_acid_scan``), per partition:
  1. pick the newest ``base_N``; ignore every delta covered by it AND
     every original file (a compaction folds originals away);
  2. union the surviving insert deltas (and originals) on top;
  3. anti-join the delete-delta row-ids on (partition,
     originalTransaction, bucket, rowId) -- broadcast, delete sets are
     KBs-to-MBs;
  4. project ``row.*`` plus the partition column parsed from the
     directory name.

``partition_filters`` prune partition DIRECTORIES driver-side before
any file listing -- the same recipe as the Hudi/Delta/Iceberg partition
pruning here.

Simplifications vs full Hive, each explicit: write-id allocation is
``max(existing)+1`` from the directory names (no metastore txn manager
-- single-writer, the same discipline as the Delta/Hudi clients here);
aborted write-id filtering is a table-side ``_aborted_write_ids``
marker (``hive_acid_abort``) standing in for the metastore's
valid-write-id list -- readers/streams/compaction subtract it, major
compaction GCs it (open-txn tracking beyond abort is out of scope);
the v2 bucket codec's statement-id bits are not modeled (bucket = the
plain bucket ordinal); streaming-ingest side files (_flush_length) are
out of scope; partitioning is single-level; one original file per
bucket (the seeder enforces it, so synthesized rowIds never collide).

Scale shape: directory resolution is driver-side metadata, O(#dirs),
after partition pruning; the data path is one mapInArrow ORC scan (one
input partition per bucket file) and delete application is a broadcast
anti-join; DELETE/UPDATE victims never funnel through the driver -- the
delete-delta is a distributed select + bucketed write.  At 100 TB the
reader's cost is the ORC scan itself, the same bound the real
AcidInputFormat achieves after its own delete-delta in-memory registry.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BASE_RE = re.compile(r"^base_(\d+)$")
_DELTA_RE = re.compile(r"^delta_(\d+)_(\d+)$")
_DELETE_RE = re.compile(r"^delete_delta_(\d+)_(\d+)$")
_ORIGINAL_RE = re.compile(r"^(\d+)_\d+(_copy_\d+)?$")

_ACID_COLS = [
    "operation",
    "originalTransaction",
    "bucket",
    "rowId",
    "currentTransaction",
]

OP_INSERT, OP_UPDATE, OP_DELETE = 0, 1, 2


# ---------------------------------------------------------------------------
# directory resolution (driver-side metadata)
# ---------------------------------------------------------------------------


def _partitions(table: str) -> dict[str, str]:
    """{partition dir name: path} for a partitioned table, or
    {'': table} for a flat one.  Partition dirs are Hive-style
    ``col=value`` names (single level)."""
    out: dict[str, str] = {}
    for name in sorted(os.listdir(table)):
        full = os.path.join(table, name)
        if os.path.isdir(full) and "=" in name and not name.startswith("."):
            out[name] = full
    return out or {"": table}


def _part_kv(pname: str) -> tuple[str, str]:
    col, _, val = pname.partition("=")
    return col, unquote(val)


def _part_match(pname: str, filters: list[tuple]) -> bool:
    """Driver-side partition predicate: (col, op, value) with op in
    = < <= > >= in.  Values compare numerically when both sides parse
    as numbers (directory values are strings), else as strings."""
    col, val = _part_kv(pname)
    for fcol, op, fval in filters:
        if fcol != col:
            continue
        if op == "in":
            cands = list(fval)
            if not any(_cmp_eq(val, c) for c in cands):
                return False
            continue
        a: object = val
        b: object = fval
        try:
            a, b = float(val), float(fval)  # type: ignore[arg-type]
        except (TypeError, ValueError):
            b = str(fval)
        ok = {
            "=": a == b,
            "<": a < b,
            "<=": a <= b,
            ">": a > b,
            ">=": a >= b,
        }.get(op)
        if ok is None:
            raise ValueError(f"unsupported partition op {op!r}")
        if not ok:
            return False
    return True


def _cmp_eq(a: str, b) -> bool:
    try:
        return float(a) == float(b)
    except (TypeError, ValueError):
        return a == str(b)


def _prune_partitions(
    parts: dict[str, str], filters: list[tuple] | None
) -> dict[str, str]:
    if not filters or "" in parts:
        return parts
    return {p: d for p, d in parts.items() if _part_match(p, filters)}


def _list_dirs(
    root: str,
    aborted: frozenset[int] = frozenset(),
) -> tuple[
    int,
    list[tuple[int, int, str]],
    list[tuple[int, int, str]],
    list[tuple[int, int, str]],
    list[str],
]:
    """Resolve one directory's tiers: (base write-id or -1, base dirs,
    insert deltas, delete deltas, original files), deltas as
    (min_wid, max_wid, path) sorted by range, excluding everything a
    base already folded (a base also folds the original files).

    ``aborted`` is the table's aborted-write-id set (Hive's
    valid-write-id semantics, modeled by the ``_aborted_write_ids``
    marker): a published single-commit directory whose write id was
    aborted is INVISIBLE -- readers skip it, compaction refuses to fold
    it.  Merged directories never contain aborted ids
    (``hive_acid_abort`` refuses to abort committed/folded history)."""
    if not os.path.isdir(root):
        raise ValueError(f"not a directory: {root}")
    base_n, base_dir = -1, None
    deltas, deletes, originals = [], [], []
    for name in sorted(os.listdir(root)):
        full = os.path.join(root, name)
        if os.path.isdir(full):
            m = _BASE_RE.match(name)
            if m and int(m.group(1)) > base_n \
                    and int(m.group(1)) not in aborted:
                base_n, base_dir = int(m.group(1)), full
            m = _DELTA_RE.match(name)
            if m and not (m.group(1) == m.group(2)
                          and int(m.group(1)) in aborted):
                deltas.append((int(m.group(1)), int(m.group(2)), full))
            m = _DELETE_RE.match(name)
            if m and not (m.group(1) == m.group(2)
                          and int(m.group(1)) in aborted):
                deletes.append((int(m.group(1)), int(m.group(2)), full))
        elif _ORIGINAL_RE.match(name):
            originals.append(full)
    # a base folds every directory whose max write-id it covers, and
    # every original file (major compaction rewrites them into the base)
    deltas = sorted(d for d in deltas if d[1] > base_n)
    deletes = sorted(d for d in deletes if d[1] > base_n)
    if base_n >= 0:
        originals = []
    base_dirs = [] if base_dir is None else [(0, base_n, base_dir)]
    return base_n, base_dirs, deltas, deletes, originals


_ABORTED_MARKER = "_aborted_write_ids"


def _aborted_marker_path(table: str) -> str:
    return os.path.join(table, _ABORTED_MARKER)


def _aborted_wids(table: str) -> frozenset[int]:
    """The table's aborted write ids (empty when the marker is absent) --
    the minimal model of the metastore's valid-write-id list: readers
    subtract it, compaction refuses to fold it, major compaction GCs it."""
    p = _aborted_marker_path(table)
    if not os.path.exists(p):
        return frozenset()
    with open(p, encoding="utf-8") as fh:
        return frozenset(int(w) for w in json.load(fh))


def _write_aborted_marker(table: str, wids: set[int]) -> None:
    p = _aborted_marker_path(table)
    if not wids:
        if os.path.exists(p):
            os.remove(p)
        return
    tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(sorted(wids), fh)
    os.rename(tmp, p)


def hive_acid_abort(table: str, write_id: int) -> dict:
    """ABORT a write id (Hive's metastore-side txn abort, modeled
    table-side): the writer's already-PUBLISHED ``delta_W_W`` /
    ``delete_delta_W_W`` directories stay on disk but become invisible
    to every reader, stream, and compaction -- the valid-write-id
    filtering real Hive readers get from the metastore.  Refuses to
    abort history a base or merged directory already folded (those
    write ids are committed; Hive can only abort OPEN transactions).
    The marker is GC'd by major compaction once the aborted directories
    are reclaimed."""
    write_id = int(write_id)
    if write_id <= 0:
        raise ValueError(f"hive_acid_abort: invalid write id {write_id}")
    for pdir in _partitions(table).values():
        for name in os.listdir(pdir):
            if not os.path.isdir(os.path.join(pdir, name)):
                continue
            m = _BASE_RE.match(name)
            if m and int(m.group(1)) >= write_id:
                raise ValueError(
                    f"hive_acid_abort: write id {write_id} is committed "
                    f"history (folded into {name}); only open "
                    "transactions can abort"
                )
            m = _DELTA_RE.match(name) or _DELETE_RE.match(name)
            if m and m.group(1) != m.group(2) \
                    and int(m.group(1)) <= write_id <= int(m.group(2)):
                raise ValueError(
                    f"hive_acid_abort: write id {write_id} is committed "
                    f"history (merged into {name}); only open "
                    "transactions can abort"
                )
    wids = set(_aborted_wids(table))
    wids.add(write_id)
    _write_aborted_marker(table, wids)
    return {"aborted": write_id, "marker": sorted(wids)}


def _gc_aborted_marker(table: str) -> list[int]:
    """Drop marker entries whose directories no longer exist anywhere
    (major compaction reclaimed them); returns the GC'd write ids."""
    wids = set(_aborted_wids(table))
    if not wids:
        return []
    live: set[int] = set()
    for pdir in _partitions(table).values():
        for name in os.listdir(pdir):
            if not os.path.isdir(os.path.join(pdir, name)):
                continue
            m = _DELTA_RE.match(name) or _DELETE_RE.match(name)
            if m and m.group(1) == m.group(2):
                live.add(int(m.group(1)))
            m = _BASE_RE.match(name)
            if m:
                live.add(int(m.group(1)))
    gone = sorted(wids - live)
    if gone:
        _write_aborted_marker(table, wids & live)
    return gone


def _next_write_id(table: str) -> int:
    wid = 0
    for pdir in _partitions(table).values():
        for name in os.listdir(pdir):
            m = _BASE_RE.match(name)
            if m:
                wid = max(wid, int(m.group(1)))
            for rx in (_DELTA_RE, _DELETE_RE):
                m = rx.match(name)
                if m:
                    wid = max(wid, int(m.group(2)))
    return wid + 1


def _bucket_of(path: str, idx: int) -> int:
    """Bucket ordinal of a data file: ``bucket_0000i``, the original
    ``00000i_0`` prefix, else the enumeration index."""
    name = os.path.basename(path)
    if name.startswith("bucket_"):
        return int(name.split("_", 1)[1])
    m = _ORIGINAL_RE.match(name)
    if m:
        return int(m.group(1))
    return idx


def _is_insert_only(table: str) -> bool:
    return os.path.exists(os.path.join(table, "_insert_only"))


def _mark_table(table: str, insert_only: bool = False) -> None:
    os.makedirs(table, exist_ok=True)
    marker = os.path.join(table, "_orc_acid_version")
    if not os.path.exists(marker):
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("2")
    if insert_only:
        mm = os.path.join(table, "_insert_only")
        if not os.path.exists(mm):
            with open(mm, "w", encoding="utf-8") as fh:
                fh.write("1")


# ---------------------------------------------------------------------------
# distributed ORC scan (executor-side pyarrow decode)
# ---------------------------------------------------------------------------


def _scan_mixed(
    spark: SparkSession,
    acid_items: list[tuple[str, str]],
    raw_items: list[tuple[str, str, int, int]],
):
    """Distributed read of ACID bucket files and/or raw (original / MM)
    files into ONE frame with the five ACID columns, the nested ``row``
    struct, and ``__part`` (partition dir name, '' when flat).

    Spark's native ORC path CANNOT read full-ACID files: the ORC library
    reserves the exact ACID root schema for its internal event
    processing, and any column-pruned read through it miscompiles the
    column mapping -- the same reason vanilla Spark requires compaction
    or a connector for Hive ACID tables.  So rows decode EXECUTOR-SIDE
    via pyarrow's ORC reader inside one mapInArrow stage: the driver
    ships only (path, partition, write-id, bucket, raw?) tuples -- one
    input partition per bucket file, a 1000-file table is 1000 parallel
    tasks -- and each task streams its file stripe-by-stripe as Arrow
    batches.  Raw files synthesize their ROW__IDs on the fly (write-id
    from the tuple, rowId = in-file ordinal): Hive's original-file
    conversion rules.  Bytes on disk stay exactly Hive's layout."""
    if not acid_items and not raw_items:
        return None
    import pyarrow as pa
    import pyarrow.orc as pao
    from pyspark.sql.pandas.types import from_arrow_schema

    # one canonical Arrow schema for the whole scan: the row struct from
    # an ACID file when one exists, else from a raw file's user schema
    if acid_items:
        s = pao.ORCFile(acid_items[0][1]).schema.remove_metadata()
        row_field = s.field("row")
        head = [s.field(c) for c in _ACID_COLS]
    else:
        rs = pao.ORCFile(raw_items[0][1]).schema.remove_metadata()
        row_field = pa.field("row", pa.struct(list(rs)))
        head = [
            pa.field("operation", pa.int32()),
            pa.field("originalTransaction", pa.int64()),
            pa.field("bucket", pa.int32()),
            pa.field("rowId", pa.int64()),
            pa.field("currentTransaction", pa.int64()),
        ]
    # pyarrow's ORC reader surfaces timestamps as NANOSECOND, which
    # Spark's Arrow bridge rejects -- normalize to microseconds (the
    # stripes cast on read; Hive timestamps carry no sub-us here)
    def _norm_type(t):
        if pa.types.is_timestamp(t) and t.unit == "ns":
            return pa.timestamp("us", tz=t.tz)
        if pa.types.is_struct(t):
            return pa.struct(
                [
                    pa.field(t.field(j).name, _norm_type(t.field(j).type),
                             t.field(j).nullable)
                    for j in range(t.num_fields)
                ]
            )
        if pa.types.is_list(t):
            return pa.list_(_norm_type(t.value_type))
        return t

    row_field = pa.field(
        row_field.name, _norm_type(row_field.type), row_field.nullable
    )
    core = pa.schema(head + [row_field])
    target = pa.schema(head + [row_field, pa.field("__part", pa.string())])
    row_schema = pa.schema(list(row_field.type))
    schema = from_arrow_schema(target)

    rows = [(p, part, -1, -1, False) for part, p in acid_items] + [
        (p, part, wid, bkt, True) for part, p, wid, bkt in raw_items
    ]
    paths = spark.createDataFrame(
        rows,
        "__path string, __part string, __wid long, __bucket int, "
        "__raw boolean",
    ).repartition(len(rows), "__path")

    def read_files(batches):
        import pyarrow as pa
        import pyarrow.orc as pao

        for batch in batches:
            for rec in batch.to_pylist():
                p, part = rec["__path"], rec["__part"]
                orc = pao.ORCFile(p)
                off = 0
                for i in range(orc.nstripes):
                    rb = orc.read_stripe(i)
                    n = rb.num_rows
                    if rec["__raw"]:
                        t = pa.Table.from_batches([rb])
                        if t.schema.remove_metadata() != row_schema:
                            t = t.cast(row_schema)
                        t = t.combine_chunks()
                        row_arr = pa.StructArray.from_arrays(
                            [
                                t.column(j).chunk(0)
                                if t.column(j).num_chunks
                                else pa.array([], t.column(j).type)
                                for j in range(t.num_columns)
                            ],
                            fields=list(row_field.type),
                        )
                        wid = rec["__wid"]
                        out = pa.Table.from_arrays(
                            [
                                pa.array([OP_INSERT] * n, pa.int32()),
                                pa.array([wid] * n, pa.int64()),
                                pa.array(
                                    [rec["__bucket"]] * n, pa.int32()
                                ),
                                pa.array(range(off, off + n), pa.int64()),
                                pa.array([wid] * n, pa.int64()),
                                row_arr,
                                pa.array([part] * n, pa.string()),
                            ],
                            schema=target,
                        )
                        off += n
                    else:
                        t = pa.Table.from_batches([rb])
                        if t.schema.remove_metadata() != core:
                            t = t.cast(core)
                        out = t.append_column(
                            "__part", pa.array([part] * n, pa.string())
                        )
                    yield from out.to_batches()

    return paths.mapInArrow(read_files, schema)


def _scan_tier(spark: SparkSession, dirs: list[tuple[int, int, str]]):
    """Flat read of one ACID directory tier (compaction's merge path):
    no partition column, files in name order."""
    files = []
    for _lo, _hi, d in dirs:
        files.extend(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.startswith("bucket_")
        )
    df = _scan_mixed(spark, [("", f) for f in files], [])
    return None if df is None else df.drop("__part")


# ---------------------------------------------------------------------------
# snapshot read
# ---------------------------------------------------------------------------


def hive_acid_scan(
    spark: SparkSession,
    table: str,
    with_row_id: bool = False,
    partition_filters: list[tuple] | None = None,
) -> DataFrame:
    """Snapshot read: per partition, newest base + surviving insert
    deltas + original files, minus the delete-delta row-ids (broadcast
    anti-join on (partition, ROW__ID triple)), projected to the user
    columns plus the partition column (or ROW__ID-prefixed when
    ``with_row_id`` -- the face UPDATE/DELETE match-finding uses).
    ``partition_filters`` prune partition directories BEFORE listing."""
    all_parts = _partitions(table)
    parts = _prune_partitions(all_parts, partition_filters)
    if not parts:
        # every partition pruned: keep one so the scan still yields a
        # typed (empty, after the caller's real predicate) frame
        first = sorted(all_parts)[0]
        parts = {first: all_parts[first]}
    insert_only = _is_insert_only(table)
    aborted = _aborted_wids(table)
    acid_items: list[tuple[str, str]] = []
    raw_items: list[tuple[str, str, int, int]] = []
    del_items: list[tuple[str, str]] = []
    for pname in sorted(parts):
        pdir = parts[pname]
        _n, base_dirs, deltas, deletes, originals = _list_dirs(
            pdir, aborted
        )
        for _lo, hi, d in base_dirs + deltas:
            files = [
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.startswith("bucket_")
            ]
            if insert_only:
                raw_items.extend(
                    (pname, f, hi, _bucket_of(f, i))
                    for i, f in enumerate(files)
                )
            else:
                acid_items.extend((pname, f) for f in files)
        raw_items.extend(
            (pname, f, 0, _bucket_of(f, i))
            for i, f in enumerate(originals)
        )
        for _lo, _hi, d in deletes:
            del_items.extend(
                (pname, os.path.join(d, f))
                for f in sorted(os.listdir(d))
                if f.startswith("bucket_")
            )
    live = _scan_mixed(spark, acid_items, raw_items)
    if live is None:
        raise ValueError(f"hive_acid: no base or delta data in {table!r}")
    dels = _scan_mixed(spark, del_items, [])
    if dels is not None:
        victims = dels.select(
            F.col("__part").alias("__dp"),
            F.col("originalTransaction").alias("__dot"),
            F.col("bucket").alias("__db"),
            F.col("rowId").alias("__dr"),
        )
        live = live.join(
            F.broadcast(victims),
            (live["__part"] == victims["__dp"])
            & (live["originalTransaction"] == victims["__dot"])
            & (live["bucket"] == victims["__db"])
            & (live["rowId"] == victims["__dr"]),
            "left_anti",
        )
    partitioned = "" not in parts
    pcol = _part_kv(sorted(parts)[0])[0] if partitioned else None
    if with_row_id:
        if partitioned:
            # surface the parsed partition column so predicates can
            # reference it (the value is the directory string)
            live = live.withColumn(
                pcol, F.substring_index(F.col("__part"), "=", -1)
            )
        return live
    cols = [F.col("row." + c).alias(c) for c in live.select("row.*").columns]
    if partitioned:
        cols.append(
            F.substring_index(F.col("__part"), "=", -1).alias(pcol)
        )
    return live.select(*cols)


# ---------------------------------------------------------------------------
# writers (staging + rename, single-writer discipline)
# ---------------------------------------------------------------------------


def _rename_staged(
    staging: str, dest: str, fname, markers: list[str] | None = None
) -> set[int]:
    """Assemble staged ``__b=<b>`` outputs into ``dest`` as per-bucket
    data files named by ``fname(b)``.  When ``dest`` does not exist yet
    (delta / delete_delta / base directories) the files AND any marker
    files are assembled in a temp directory and published with ONE
    atomic rename -- a crashed writer never leaves a partially-visible
    directory, and ingest markers are atomic with the data they cover.
    An existing ``dest`` (original files at a table/partition root)
    receives files one by one (pre-ACID layouts have no directory to
    swap)."""
    dest = os.path.normpath(dest)
    entries: list[tuple[int, str]] = []
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("__b="):
            continue
        b = int(entry.split("=", 1)[1])
        parts = [
            f
            for f in os.listdir(os.path.join(staging, entry))
            if f.endswith(".orc")
        ]
        if len(parts) != 1:  # repartition(col) guarantees one; be loud
            raise RuntimeError(
                f"hive_acid: expected 1 file for bucket {b}, got {parts}"
            )
        entries.append((b, os.path.join(staging, entry, parts[0])))
    wrote: set[int] = set()
    if os.path.isdir(dest):
        for b, src in entries:
            os.rename(src, os.path.join(dest, fname(b)))
            wrote.add(b)
        for m in markers or []:
            open(os.path.join(dest, m), "w").close()
        return wrote
    assemble = dest + f".assemble-{uuid.uuid4().hex[:8]}"
    os.makedirs(assemble)
    for b, src in entries:
        os.rename(src, os.path.join(assemble, fname(b)))
        wrote.add(b)
    for m in markers or []:
        open(os.path.join(assemble, m), "w").close()
    os.rename(assemble, dest)
    return wrote


def _bucket_fname(b: int) -> str:
    return f"bucket_{b:05d}"


def _write_bucketed(
    df: DataFrame, dest: str, fname=_bucket_fname, keep_bucket: bool = True,
    markers: list[str] | None = None,
) -> None:
    """Write one data file per bucket value under ``dest`` (staging +
    rename; Spark does the data movement, the driver only renames).
    ``keep_bucket=False`` drops the routing column from the file
    payload (raw original / MM files carry only user columns)."""
    spark = df.sparkSession
    staging = dest + f".staging-{uuid.uuid4().hex[:8]}"
    staged = df.withColumn("__b", F.col("bucket"))
    if not keep_bucket:
        staged = staged.drop("bucket")
    (
        staged.repartition(F.col("__b"))
        .write.mode("overwrite")
        .partitionBy("__b")
        .orc(staging)
    )
    wrote = _rename_staged(staging, dest, fname, markers)
    shutil.rmtree(staging, ignore_errors=True)
    if not wrote:  # empty frame still needs a valid directory
        empty = spark.createDataFrame(
            [], staged.drop("__b").schema
        )
        empty.coalesce(1).write.mode("overwrite").orc(staging)
        for f in os.listdir(staging):
            if f.endswith(".orc"):
                os.makedirs(dest, exist_ok=True)
                os.rename(os.path.join(staging, f),
                          os.path.join(dest, fname(0)))
                break
        for m in markers or []:
            open(os.path.join(dest, m), "w").close()
        shutil.rmtree(staging, ignore_errors=True)


def _write_bucketed_tree(
    df: DataFrame, table: str, dirname: str, fname=_bucket_fname,
    keep_bucket: bool = True, markers: list[str] | None = None,
) -> None:
    """Partitioned variant: ``df`` carries ``__part`` (the partition
    dir name); write ``<table>/<part>/<dirname>/<bucket file>`` for
    every partition value present.  One distributed write job staged by
    (partition, bucket); the driver only renames."""
    staging = os.path.join(
        table, f".staging-{uuid.uuid4().hex[:8]}"
    )
    staged = (
        df.withColumn("__p", F.col("__part"))
        .withColumn("__b", F.col("bucket"))
        .drop("__part")
    )
    if not keep_bucket:
        staged = staged.drop("bucket")
    (
        staged.repartition(F.col("__p"), F.col("__b"))
        .write.mode("overwrite")
        .partitionBy("__p", "__b")
        .orc(staging)
    )
    for entry in sorted(os.listdir(staging)):
        if not entry.startswith("__p="):
            continue
        pname = unquote(entry.split("=", 1)[1])
        dest = os.path.join(table, pname, dirname)
        _rename_staged(os.path.join(staging, entry), dest, fname, markers)
    shutil.rmtree(staging, ignore_errors=True)


def _with_acid_cols(
    df: DataFrame,
    wid: int,
    n_buckets: int,
    key_col: str,
    partition_col: str | None = None,
) -> DataFrame:
    """Attach the five ACID columns: bucket by key hash, rowId =
    per-(partition, bucket) ordinal within this write, row = the user
    struct (partition column EXCLUDED -- Hive never stores it in data
    files)."""
    data_cols = [c for c in df.columns if c != partition_col]
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                    F.lit(n_buckets)).cast("int")
    out = df.withColumn("bucket", bucket)
    keys = ["bucket"]
    if partition_col is not None:
        out = out.withColumn(
            "__part",
            F.concat(F.lit(partition_col + "="),
                     F.col(partition_col).cast("string")),
        )
        keys = ["__part", "bucket"]
    w = Window.partitionBy(*keys).orderBy(F.col(key_col).cast("string"))
    cols = [
        F.lit(OP_INSERT).alias("operation"),
        F.lit(wid).cast("long").alias("originalTransaction"),
        F.col("bucket"),
        (F.row_number().over(w) - 1).cast("long").alias("rowId"),
        F.lit(wid).cast("long").alias("currentTransaction"),
        F.struct(*[F.col(c) for c in data_cols]).alias("row"),
    ]
    if partition_col is not None:
        cols.append(F.col("__part"))
    return out.select(*cols)


def hive_acid_insert(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key_col: str | None = None,
    n_buckets: int = 2,
    partition_col: str | None = None,
) -> int:
    """INSERT: write ``delta_N_N/bucket_*`` at the next write id
    (creating the table layout on first use), under one partition
    directory per distinct ``partition_col`` value when given (ONE
    write id covers every partition touched -- Hive allocates write ids
    per table, not per partition). Returns the write id."""
    _mark_table(table)
    if _is_insert_only(table):
        raise ValueError(
            "hive_acid: full-ACID insert into an insert-only (MM) table; "
            "use hive_acid_insert_only"
        )
    existing = _partitions(table)
    if partition_col is None and "" not in existing:
        raise ValueError(
            "hive_acid: table is partitioned; pass partition_col"
        )
    if partition_col is not None and "" in existing and any(
        _DELTA_RE.match(n) or _BASE_RE.match(n) or _ORIGINAL_RE.match(n)
        for n in os.listdir(table)
    ):
        raise ValueError(
            "hive_acid: table already has unpartitioned data"
        )
    key_col = key_col or df.columns[0]
    wid = _next_write_id(table)
    acid = _with_acid_cols(df, wid, n_buckets, key_col, partition_col)
    dirname = f"delta_{wid}_{wid}"
    if partition_col is None:
        _write_bucketed(acid, os.path.join(table, dirname))
    else:
        _write_bucketed_tree(acid, table, dirname)
    return wid


def hive_acid_insert_only(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key_col: str | None = None,
    n_buckets: int = 2,
    partition_col: str | None = None,
    ingest: tuple[str, int] | None = None,
) -> int:
    """Insert-only (MM) transactional table INSERT: ``delta_N_N``
    directories whose bucket files carry the PLAIN user rows -- no ACID
    columns (Hive's 'transactional_properties'='insert_only' layout,
    what CTAS/legacy-managed tables become on upgrade).  Readers
    synthesize ROW__IDs from the directory write id; DELETE/UPDATE are
    rejected, exactly Hive's MM contract."""
    _mark_table(table, insert_only=True)
    key_col = key_col or df.columns[0]
    wid = _next_write_id(table)
    data_cols = [c for c in df.columns if c != partition_col]
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                    F.lit(n_buckets)).cast("int")
    out = df.withColumn("bucket", bucket)
    dirname = f"delta_{wid}_{wid}"
    markers = (
        [f"_ingest_{ingest[0]}_{int(ingest[1])}"] if ingest else None
    )
    if partition_col is None:
        _write_bucketed(out.select("bucket", *data_cols),
                        os.path.join(table, dirname),
                        keep_bucket=False, markers=markers)
    else:
        out = out.withColumn(
            "__part",
            F.concat(F.lit(partition_col + "="),
                     F.col(partition_col).cast("string")),
        )
        _write_bucketed_tree(
            out.select("bucket", "__part", *data_cols), table, dirname,
            keep_bucket=False, markers=markers,
        )
    return wid


def hive_acid_seed_originals(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key_col: str | None = None,
    n_buckets: int = 2,
    partition_col: str | None = None,
) -> int:
    """Lay down a PRE-ACID table: plain ORC files named ``00000i_0``
    (no ACID columns) at the table/partition root -- the state ALTER
    TABLE .. SET ('transactional'='true') converts in place.  Call
    ``hive_acid_convert`` afterwards to mark the table ACID; the reader
    then synthesizes ROW__IDs (write-id 0, bucket from the file name,
    rowId = in-file ordinal).  One file per bucket, Hive's conversion
    assumption here. Returns the number of files written."""
    key_col = key_col or df.columns[0]
    data_cols = [c for c in df.columns if c != partition_col]
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                    F.lit(n_buckets)).cast("int")
    # deterministic in-file order -> stable synthesized rowIds
    out = df.withColumn("bucket", bucket).sortWithinPartitions(
        F.col(key_col).cast("string")
    )
    fname = lambda b: f"{b:06d}_0"  # noqa: E731
    if partition_col is None:
        os.makedirs(table, exist_ok=True)
        _write_bucketed(out.select("bucket", *data_cols), table,
                        fname=fname, keep_bucket=False)
        return len([f for f in os.listdir(table)
                    if _ORIGINAL_RE.match(f)])
    out = out.withColumn(
        "__part",
        F.concat(F.lit(partition_col + "="),
                 F.col(partition_col).cast("string")),
    )
    # originals live at the PARTITION root: dirname '' collapses away
    staging_df = out.select("bucket", "__part", *data_cols)
    _write_bucketed_tree(staging_df, table, "", fname=fname,
                         keep_bucket=False)
    return sum(
        len([f for f in os.listdir(p) if _ORIGINAL_RE.match(f)])
        for p in _partitions(table).values()
    )


def hive_acid_convert(table: str, insert_only: bool = False) -> None:
    """Mark a directory of plain ORC files as an ACID table (the
    metadata half of ALTER TABLE .. SET ('transactional'='true')) --
    the files stay byte-identical; readers synthesize their ROW__IDs."""
    _mark_table(table, insert_only=insert_only)


def hive_acid_txn_version(table: str, app_id: str) -> int:
    """Max streaming-ingest batch id committed for ``app_id``, or -1.
    Ingest markers (``_ingest_<app>_<batch>``) are published INSIDE the
    delta directory by the same atomic rename as the data, so marker
    presence <=> data presence -- the table-side dedup that turns
    at-least-once redelivery into exactly-once (the role Hive's
    metastore txn registry plays for its streaming ingest). Compaction
    carries the per-app maximum forward into the merged directory."""
    best = -1
    for pdir in _partitions(table).values():
        for name in os.listdir(pdir):
            full = os.path.join(pdir, name)
            if not os.path.isdir(full):
                continue
            if not (_DELTA_RE.match(name) or _BASE_RE.match(name)):
                continue
            for f in os.listdir(full):
                if f.startswith("_ingest_"):
                    app, _, bid = f[len("_ingest_"):].rpartition("_")
                    if app == app_id:
                        try:
                            best = max(best, int(bid))
                        except ValueError:
                            continue
    return best


def _carry_ingest_markers(src_dirs: list[str], dest: str) -> None:
    """Compaction folds delta directories away; their ingest markers
    must survive into the merged directory (per-app maximum), else a
    replayed stream after compaction would re-ingest old batches."""
    best: dict[str, int] = {}
    for d in src_dirs:
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if f.startswith("_ingest_"):
                app, _, bid = f[len("_ingest_"):].rpartition("_")
                try:
                    best[app] = max(best.get(app, -1), int(bid))
                except ValueError:
                    continue
    for app, bid in best.items():
        open(os.path.join(dest, f"_ingest_{app}_{bid}"), "w").close()


def hive_acid_insert_overwrite(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key_col: str | None = None,
    n_buckets: int = 2,
) -> int:
    """INSERT OVERWRITE on a transactional table: Hive writes a new
    ``base_N`` directly (the overwrite IS a full snapshot through the
    new write id), obsoleting every delta and original file beneath it
    -- readers flip atomically when the base directory appears.  The
    obsoleted directories are left for the cleaner (readers resolve the
    newest base first, so they are already invisible). Flat tables only
    (Hive's IOW on partitioned tables overwrites per partition spec --
    out of scope here). Returns the write id."""
    _mark_table(table)
    if "" not in _partitions(table):
        raise ValueError(
            "hive_acid: INSERT OVERWRITE on partitioned tables "
            "unsupported by this minimal client"
        )
    key_col = key_col or df.columns[0]
    wid = _next_write_id(table)
    if _is_insert_only(table):
        bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                        F.lit(n_buckets)).cast("int")
        out = df.withColumn("bucket", bucket)
        _write_bucketed(out, os.path.join(table, f"base_{wid}"),
                        keep_bucket=False)
    else:
        acid = _with_acid_cols(df, wid, n_buckets, key_col)
        _write_bucketed(acid, os.path.join(table, f"base_{wid}"))
    return wid


# ---------------------------------------------------------------------------
# DML: delete / update (full-ACID only)
# ---------------------------------------------------------------------------


def _delete_events(matched: DataFrame, wid: int) -> DataFrame:
    """Project matched snapshot rows (with ROW__ID) into ACID v2 delete
    events (operation=2, null row) -- a pure DataFrame transformation so
    victims never funnel through the driver: a broad DELETE/UPDATE on a
    100 TB table stays a distributed select + bucketed write."""
    row_type = matched.schema["row"].dataType
    cols = [
        F.lit(OP_DELETE).alias("operation"),
        F.col("originalTransaction"),
        F.col("bucket"),
        F.col("rowId"),
        F.lit(wid).cast("long").alias("currentTransaction"),
        F.lit(None).cast(row_type).alias("row"),
    ]
    if "__part" in matched.columns:
        cols.append(F.col("__part"))
    return matched.select(*cols)


def _reject_mm_dml(table: str, verb: str) -> None:
    if _is_insert_only(table):
        raise ValueError(
            f"hive_acid: {verb} is not supported on insert-only (MM) "
            "tables -- Hive's MM contract"
        )


def hive_acid_delete(spark: SparkSession, table: str, predicate: str) -> int:
    """DELETE WHERE predicate: find matching ROW__IDs in the current
    snapshot (the predicate may reference ``row.*`` and the partition
    column), write them as a ``delete_delta_N_N`` (operation=2, null
    row -- the ACID v2 delete event shape) via a distributed bucketed
    write (no driver-side victim collect). Returns rows deleted."""
    _reject_mm_dml(table, "DELETE")
    wid = _next_write_id(table)
    snap = hive_acid_scan(spark, table, with_row_id=True)
    matched = snap.where(F.expr(predicate)).persist()
    try:
        n = matched.count()
        if n == 0:
            return 0
        events = _delete_events(matched, wid)
        dirname = f"delete_delta_{wid}_{wid}"
        if "__part" in events.columns and "" not in _partitions(table):
            _write_bucketed_tree(events, table, dirname)
        else:
            _write_bucketed(events.drop("__part"),
                            os.path.join(table, dirname))
    finally:
        matched.unpersist()
    return n


def hive_acid_update(
    spark: SparkSession,
    table: str,
    predicate: str,
    set_exprs: dict[str, str],
    key_col: str | None = None,
    n_buckets: int = 2,
) -> int:
    """UPDATE WHERE predicate SET col=expr: Hive implements update as
    DELETE + re-INSERT under ONE write id -- a ``delete_delta_N_N`` of
    the old ROW__IDs and a ``delta_N_N`` of the rewritten rows (fresh
    rowIds, originalTransaction = N). Partition columns cannot be
    SET (no partition moves -- Hive's rule too). Returns rows updated."""
    _reject_mm_dml(table, "UPDATE")
    wid = _next_write_id(table)
    snap = hive_acid_scan(spark, table, with_row_id=True)
    partitioned = "" not in _partitions(table)
    pcol = None
    if partitioned:
        pcol = _part_kv(sorted(_partitions(table))[0])[0]
        if pcol in set_exprs:
            raise ValueError(
                f"hive_acid: cannot SET partition column {pcol!r}"
            )
    matched = snap.where(F.expr(predicate)).persist()
    try:
        n = matched.count()
        if n == 0:
            return 0
        dirname = f"delete_delta_{wid}_{wid}"
        events = _delete_events(matched, wid)
        if partitioned:
            _write_bucketed_tree(events, table, dirname)
            new_rows = matched.select("row.*", pcol)
        else:
            _write_bucketed(events.drop("__part") if "__part" in
                            events.columns else events,
                            os.path.join(table, dirname))
            new_rows = matched.select("row.*")
        for col, expr in set_exprs.items():
            new_rows = new_rows.withColumn(col, F.expr(expr))
        key_col = key_col or new_rows.columns[0]
        acid = _with_acid_cols(new_rows, wid, n_buckets, key_col,
                               partition_col=pcol)
        acid = acid.withColumn("operation", F.lit(OP_UPDATE))
        if partitioned:
            _write_bucketed_tree(acid, table, f"delta_{wid}_{wid}")
        else:
            _write_bucketed(acid, os.path.join(table, f"delta_{wid}_{wid}"))
    finally:
        matched.unpersist()
    return n


# ---------------------------------------------------------------------------
# compaction table service
# ---------------------------------------------------------------------------


def hive_acid_compact(
    spark: SparkSession, table: str, mode: str = "major",
    partition: str | None = None,
) -> dict:
    """Compaction table service.  ``major``: fold base + deltas +
    delete-deltas + original files into a new ``base_N`` (surviving
    rows KEEP their ROW__IDs -- Hive's contract, so later delete-deltas
    written against pre-compaction ids still apply; originals keep
    their SYNTHESIZED ids).  ``minor``: merge the delta directories
    into one ``delta_M_N`` (and delete-deltas into one
    ``delete_delta_M_N``) without touching the base or applying
    deletes.  Partitioned tables compact PER PARTITION (Hive's unit of
    compaction); pass ``partition`` ('col=val') to compact one.
    Obsoleted directories are removed after the new one is in place
    (readers resolve the newest base first, so the window is benign
    under the single-writer discipline). Returns {mode, write_id,
    folded} -- for partitioned tables, plus {partitions: {name:
    result}}; a minor compaction with nothing to merge returns
    {noop: True}."""
    parts = _partitions(table)
    if "" not in parts:
        names = [partition] if partition is not None else sorted(parts)
        results = {}
        for pname in names:
            if pname not in parts:
                raise ValueError(f"hive_acid: no partition {pname!r}")
            if partition is None and mode == "minor":
                # table-wide minor compaction: partitions compact
                # INDEPENDENTLY (Hive's unit), so one with nothing to
                # merge is a per-partition no-op, not an error
                _n, _b, deltas, deletes, _o = _list_dirs(
                    parts[pname], _aborted_wids(table)
                )
                if not deltas and not deletes:
                    results[pname] = {"mode": mode, "write_id": None,
                                      "folded": 0, "merged": {},
                                      "noop": True}
                    continue
            results[pname] = _compact_one(
                spark, table, parts[pname], pname, mode
            )
        merged = [r for r in results.values() if not r.get("noop")]
        return {
            "mode": mode,
            "write_id": max((r["write_id"] for r in merged), default=None),
            "folded": sum(r["folded"] for r in results.values()),
            "partitions": results,
            "noop": not merged,
        }
    return _compact_one(spark, table, table, "", mode)


def _compact_one(
    spark: SparkSession, table: str, pdir: str, pname: str, mode: str
) -> dict:
    aborted = _aborted_wids(table)
    base_n, base_dirs, deltas, deletes, originals = _list_dirs(
        pdir, aborted
    )
    insert_only = _is_insert_only(table)
    if mode == "major":
        hi = max(
            [base_n] + [d[1] for d in deltas] + [d[1] for d in deletes]
            + ([0] if originals else [])
        )
        if hi < 0:
            raise ValueError(f"hive_acid: nothing to compact in {pdir!r}")
        if not deltas and not deletes and not originals:
            # nothing beyond the base itself: re-folding would rewrite
            # base_N onto its own name and then delete it -- explicit
            # no-op instead (Hive's compactor also declines)
            return {"mode": mode, "write_id": None, "folded": 0,
                    "noop": True}
        pf = (
            [(_part_kv(pname)[0], "=", _part_kv(pname)[1])]
            if pname else None
        )
        live = hive_acid_scan(spark, table, with_row_id=True,
                              partition_filters=pf)
        if pname:
            live = live.where(F.col("__part") == pname)
        dest = os.path.join(pdir, f"base_{hi}")
        if insert_only:
            # MM base files stay RAW (no acid columns), Hive's MM shape
            user_cols = live.select("row.*").columns
            _write_bucketed(
                live.select("bucket",
                            *[F.col("row." + c).alias(c)
                              for c in user_cols]),
                dest, keep_bucket=False,
            )
        else:
            drop = [c for c in ("__part",) if c in live.columns]
            extra = [
                c for c in live.columns
                if c not in _ACID_COLS + ["row"] + drop
            ]
            _write_bucketed(live.drop(*drop, *extra), dest)
        folded = [d for _l, _h, d in base_dirs + deltas + deletes]
        _carry_ingest_markers(
            [d for _l, _h, d in base_dirs + deltas], dest
        )
        for f in originals:
            os.remove(f)
        for d in folded:
            shutil.rmtree(d, ignore_errors=True)
        # aborted directories at-or-below the new base are trash the
        # compactor reclaims (Hive's cleaner does the same); the marker
        # GCs once no aborted directory survives anywhere
        aborted_gc: list[int] = []
        if aborted:
            for name in sorted(os.listdir(pdir)):
                m = (_DELTA_RE.match(name) or _DELETE_RE.match(name)
                     or _BASE_RE.match(name))
                if m and int(m.group(1)) in aborted \
                        and int(m.group(1)) <= hi:
                    shutil.rmtree(os.path.join(pdir, name),
                                  ignore_errors=True)
            aborted_gc = _gc_aborted_marker(table)
        return {"mode": mode, "write_id": hi,
                "folded": len(folded) + len(originals), "noop": False,
                "aborted_gc": aborted_gc}
    if mode == "minor":
        if not deltas and not deletes:
            raise ValueError(f"hive_acid: no deltas to compact in {pdir!r}")
        folded = []
        merged_ranges: dict[str, tuple[int, int]] = {}
        for tier, rx_name in ((deltas, "delta"), (deletes, "delete_delta")):
            if len(tier) < 2:  # nothing to merge in this tier
                continue
            lo = min(d[0] for d in tier)
            t_hi = max(d[1] for d in tier)
            if insert_only:
                items = []
                for _lo2, hi2, d in tier:
                    fs = [os.path.join(d, f) for f in sorted(os.listdir(d))
                          if f.startswith("bucket_")]
                    items.extend(
                        (("", f, hi2, _bucket_of(f, i)))
                        for i, f in enumerate(fs)
                    )
                raw = _scan_mixed(spark, [], items)
                user_cols = raw.select("row.*").columns
                merged = raw.select(
                    "bucket",
                    *[F.col("row." + c).alias(c) for c in user_cols],
                )
            else:
                merged = _scan_tier(spark, tier)
            dest = os.path.join(pdir, f"{rx_name}_{lo}_{t_hi}")
            _write_bucketed(merged, dest,
                            keep_bucket=not insert_only)
            if rx_name == "delta":
                _carry_ingest_markers([d for _l, _h, d in tier], dest)
            folded.extend(d for _l, _h, d in tier)
            merged_ranges[rx_name] = (lo, t_hi)
        if not merged_ranges:  # every tier had <2 dirs: explicit no-op
            return {"mode": mode, "write_id": None, "folded": 0,
                    "merged": {}, "noop": True}
        hi = max(r[1] for r in merged_ranges.values())
        for d in folded:
            shutil.rmtree(d, ignore_errors=True)
        return {"mode": mode, "write_id": hi, "folded": len(folded),
                "merged": merged_ranges, "noop": False}
    raise ValueError(f"hive_acid: unknown compaction mode {mode!r}")
