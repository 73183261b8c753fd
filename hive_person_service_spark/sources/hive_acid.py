"""Hive ACID transactional table layout (the reference's OWN format).

Minimal reader/writer over Hive's PUBLIC full-ACID transactional table
layout (https://cwiki.apache.org/confluence/display/Hive/Hive+Transactions):

  * ``base_N/``          -- the full snapshot through write-id N (from a
                            major compaction or the initial load);
  * ``delta_M_N/``       -- rows INSERTED by write-ids M..N;
  * ``delete_delta_M_N/``-- ROW-IDS deleted by write-ids M..N (ACID v2
                            splits deletes from inserts so deltas stay
                            insert-only and merge cheaply);
  * per-bucket data files named ``bucket_0000i`` inside each directory;
  * the ``_orc_acid_version`` marker file (contents ``2``).

Every data row carries the five ACID columns at the head, exactly the
ROW__ID shape Hive's AcidInputFormat materializes --
``operation`` (0 insert / 1 update / 2 delete), ``originalTransaction``
(the write id that created the row), ``bucket``, ``rowId`` (unique
within (originalTransaction, bucket)), ``currentTransaction`` -- with
the user row nested as a ``row`` STRUCT, Hive's physical layout.
UPDATE is delete + re-insert under ONE write id (new rowIds, original
write id as the deleted row's reference), which is precisely how Hive
implements it.  Files are ORC, the only format Hive ACID supports.

Snapshot read semantics (``hive_acid_scan``):
  1. pick the newest ``base_N``; ignore every delta covered by it
     (a compaction obsoletes the directories it folded);
  2. union the surviving insert deltas on top;
  3. anti-join the delete-delta row-ids on (originalTransaction,
     bucket, rowId) -- broadcast, delete sets are KBs-to-MBs;
  4. project ``row.*``.

Simplifications vs full Hive, each explicit: write-id allocation is
``max(existing)+1`` from the directory names (no metastore txn manager
-- single-writer, the same discipline as the Delta/Hudi clients here);
no open/aborted write-id filtering (everything on disk is committed);
the v2 bucket codec's statement-id bits are not modeled (bucket = the
plain bucket ordinal); streaming-ingest side files (_flush_length) are
out of scope.

Scale shape: directory resolution is driver-side metadata, O(#dirs);
the data path is one multi-file ORC scan per tier with pushdown and
pruning intact, and delete application is a broadcast anti-join -- at
100 TB the reader's cost is the ORC scan itself, the same bound the
real AcidInputFormat achieves after its own delete-delta in-memory
registry.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BASE_RE = re.compile(r"^base_(\d+)$")
_DELTA_RE = re.compile(r"^delta_(\d+)_(\d+)$")
_DELETE_RE = re.compile(r"^delete_delta_(\d+)_(\d+)$")

_ACID_COLS = [
    "operation",
    "originalTransaction",
    "bucket",
    "rowId",
    "currentTransaction",
]

OP_INSERT, OP_UPDATE, OP_DELETE = 0, 1, 2


def _list_dirs(
    table: str,
) -> tuple[
    int,
    list[tuple[int, int, str]],
    list[tuple[int, int, str]],
    list[tuple[int, int, str]],
]:
    """Resolve the directory tiers: (base write-id or -1, base dirs,
    insert deltas, delete deltas), deltas as (min_wid, max_wid, path)
    sorted by range, excluding everything a base already folded."""
    if not os.path.isdir(table):
        raise ValueError(f"not a directory: {table}")
    base_n, base_dir = -1, None
    deltas, deletes = [], []
    for name in sorted(os.listdir(table)):
        full = os.path.join(table, name)
        if not os.path.isdir(full):
            continue
        m = _BASE_RE.match(name)
        if m and int(m.group(1)) > base_n:
            base_n, base_dir = int(m.group(1)), full
        m = _DELTA_RE.match(name)
        if m:
            deltas.append((int(m.group(1)), int(m.group(2)), full))
        m = _DELETE_RE.match(name)
        if m:
            deletes.append((int(m.group(1)), int(m.group(2)), full))
    # a base folds every directory whose max write-id it covers
    deltas = sorted(d for d in deltas if d[1] > base_n)
    deletes = sorted(d for d in deletes if d[1] > base_n)
    base_dirs = [] if base_dir is None else [(0, base_n, base_dir)]
    return base_n, base_dirs, deltas, deletes


def _next_write_id(table: str) -> int:
    wid = 0
    for name in os.listdir(table):
        for rx in (_BASE_RE,):
            m = rx.match(name)
            if m:
                wid = max(wid, int(m.group(1)))
        for rx in (_DELTA_RE, _DELETE_RE):
            m = rx.match(name)
            if m:
                wid = max(wid, int(m.group(2)))
    return wid + 1


def _write_bucketed(df: DataFrame, dest: str) -> None:
    """Write one ``bucket_0000i`` ORC file per bucket value under
    ``dest`` (staging + rename, the same single-writer discipline as the
    Hudi client; Spark does the data movement, the driver only
    renames)."""
    spark = df.sparkSession
    staging = dest + f".staging-{uuid.uuid4().hex[:8]}"
    (
        df.withColumn("__b", F.col("bucket"))
        .repartition(F.col("__b"))
        .write.mode("overwrite")
        .partitionBy("__b")
        .orc(staging)
    )
    os.makedirs(dest, exist_ok=True)
    wrote = set()
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
        os.rename(
            os.path.join(staging, entry, parts[0]),
            os.path.join(dest, f"bucket_{b:05d}"),
        )
        wrote.add(b)
    shutil.rmtree(staging, ignore_errors=True)
    if not wrote:  # empty frame still needs a valid directory
        empty = spark.createDataFrame([], df.schema)
        empty.coalesce(1).write.mode("overwrite").orc(staging)
        for f in os.listdir(staging):
            if f.endswith(".orc"):
                os.rename(os.path.join(staging, f),
                          os.path.join(dest, "bucket_00000"))
                break
        shutil.rmtree(staging, ignore_errors=True)


def _with_acid_cols(df: DataFrame, wid: int, n_buckets: int,
                    key_col: str) -> DataFrame:
    """Attach the five ACID columns: bucket by key hash, rowId =
    per-(bucket) ordinal within this write, row = the user struct."""
    data_cols = df.columns
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")),
                    F.lit(n_buckets)).cast("int")
    out = df.withColumn("bucket", bucket)
    w = Window.partitionBy("bucket").orderBy(
        F.col(key_col).cast("string")
    )
    return out.select(
        F.lit(OP_INSERT).alias("operation"),
        F.lit(wid).cast("long").alias("originalTransaction"),
        F.col("bucket"),
        (F.row_number().over(w) - 1).cast("long").alias("rowId"),
        F.lit(wid).cast("long").alias("currentTransaction"),
        F.struct(*[F.col(c) for c in data_cols]).alias("row"),
    )


def hive_acid_insert(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    key_col: str | None = None,
    n_buckets: int = 2,
) -> int:
    """INSERT: write ``delta_N_N/bucket_*`` at the next write id
    (creating the table layout on first use). Returns the write id."""
    os.makedirs(table, exist_ok=True)
    marker = os.path.join(table, "_orc_acid_version")
    if not os.path.exists(marker):
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("2")
    key_col = key_col or df.columns[0]
    wid = _next_write_id(table)
    acid = _with_acid_cols(df, wid, n_buckets, key_col)
    _write_bucketed(acid, os.path.join(table, f"delta_{wid}_{wid}"))
    return wid


def _scan_tier(spark: SparkSession, dirs: list[tuple[int, int, str]]):
    """Distributed read of one directory tier's bucket files.

    Spark's native ORC path CANNOT read these files: the ORC library
    reserves the exact ACID root schema (operation..currentTransaction,
    row) for its internal event processing, and any column-pruned read
    through it miscompiles the column mapping -- the same reason vanilla
    Spark requires compaction or a connector for Hive ACID tables. So
    the rows decode EXECUTOR-SIDE via pyarrow's ORC reader inside one
    mapInArrow stage: the driver ships only file paths (one input
    partition per bucket file -- a 1000-file table is 1000 parallel
    tasks), each task streams its file stripe-by-stripe as Arrow
    batches. Bytes on disk stay exactly Hive's layout."""
    files = []
    for _lo, _hi, d in dirs:
        files.extend(
            os.path.join(d, f)
            for f in sorted(os.listdir(d))
            if f.startswith("bucket_")
        )
    if not files:
        return None
    import pyarrow.orc as pao
    from pyspark.sql.pandas.types import from_arrow_schema

    # one canonical Arrow schema for the whole tier: files written by
    # different engines/sessions may disagree on nullability flags or
    # footer metadata, and mapInArrow requires every batch identical
    target = pao.ORCFile(files[0]).schema.remove_metadata()
    schema = from_arrow_schema(target)
    paths = spark.createDataFrame(
        [(f,) for f in files], "__path string"
    ).repartition(len(files), "__path")

    def read_files(batches):
        import pyarrow as pa
        import pyarrow.orc as pao

        for batch in batches:
            for p in batch.column("__path").to_pylist():
                orc = pao.ORCFile(p)
                for i in range(orc.nstripes):
                    rb = orc.read_stripe(i)
                    if rb.schema != target:
                        tbl = pa.Table.from_batches(
                            [rb], schema=rb.schema
                        ).cast(target)
                        yield from tbl.to_batches()
                    else:
                        yield rb

    return paths.mapInArrow(read_files, schema)


def hive_acid_scan(
    spark: SparkSession, table: str, with_row_id: bool = False
) -> DataFrame:
    """Snapshot read: newest base + surviving insert deltas, minus the
    delete-delta row-ids (broadcast anti-join on the ROW__ID triple),
    projected to the user columns (or ROW__ID-prefixed when
    ``with_row_id`` -- the face UPDATE/DELETE match-finding uses)."""
    _base_n, base_dirs, deltas, deletes = _list_dirs(table)
    live = _scan_tier(spark, base_dirs + deltas)
    if live is None:
        raise ValueError(f"hive_acid: no base or delta data in {table!r}")
    dels = _scan_tier(spark, deletes)
    if dels is not None:
        victims = dels.select(
            F.col("originalTransaction").alias("__dot"),
            F.col("bucket").alias("__db"),
            F.col("rowId").alias("__dr"),
        )
        live = live.join(
            F.broadcast(victims),
            (live["originalTransaction"] == victims["__dot"])
            & (live["bucket"] == victims["__db"])
            & (live["rowId"] == victims["__dr"]),
            "left_anti",
        )
    if with_row_id:
        return live
    return live.select("row.*")


def hive_acid_delete(spark: SparkSession, table: str, predicate: str) -> int:
    """DELETE WHERE predicate: find matching ROW__IDs in the current
    snapshot, write them as a ``delete_delta_N_N`` (operation=2, null
    row -- the ACID v2 delete event shape). Returns rows deleted."""
    wid = _next_write_id(table)
    snap = hive_acid_scan(spark, table, with_row_id=True)
    hits = (
        snap.where(F.expr(predicate))
        .select("originalTransaction", "bucket", "rowId")
        .collect()
    )  # bounded by delete cardinality -- the same driver footprint as
    # the other clients' match lists
    if not hits:
        return 0
    victims = spark.createDataFrame(
        [
            (OP_DELETE, r["originalTransaction"], r["bucket"], r["rowId"],
             wid, None)
            for r in hits
        ],
        schema=snap.schema,
    )
    _write_bucketed(victims, os.path.join(table, f"delete_delta_{wid}_{wid}"))
    return len(hits)


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
    rowIds, originalTransaction = N). Returns rows updated."""
    wid = _next_write_id(table)
    snap = hive_acid_scan(spark, table, with_row_id=True)
    matched = snap.where(F.expr(predicate))
    hits = matched.select("originalTransaction", "bucket", "rowId").collect()
    if not hits:
        return 0
    victims = spark.createDataFrame(
        [
            (OP_DELETE, r["originalTransaction"], r["bucket"], r["rowId"],
             wid, None)
            for r in hits
        ],
        schema=snap.schema,
    )
    _write_bucketed(victims, os.path.join(table, f"delete_delta_{wid}_{wid}"))
    new_rows = matched.select("row.*")
    for col, expr in set_exprs.items():
        new_rows = new_rows.withColumn(col, F.expr(expr))
    key_col = key_col or new_rows.columns[0]
    acid = _with_acid_cols(new_rows, wid, n_buckets, key_col)
    acid = acid.withColumn("operation", F.lit(OP_UPDATE))
    _write_bucketed(acid, os.path.join(table, f"delta_{wid}_{wid}"))
    return len(hits)


def hive_acid_compact(
    spark: SparkSession, table: str, mode: str = "major"
) -> dict:
    """Compaction table service.  ``major``: fold base + deltas +
    delete-deltas into a new ``base_N`` (surviving rows KEEP their
    original ROW__IDs -- Hive's contract, so later delete-deltas written
    against pre-compaction ids still apply).  ``minor``: merge the delta
    directories into one ``delta_M_N`` (and delete-deltas into one
    ``delete_delta_M_N``) without touching the base or applying deletes.
    Obsoleted directories are removed after the new one is in place
    (readers resolve the newest base first, so the window is benign
    under the single-writer discipline). Returns {mode, write_id,
    folded}."""
    base_n, base_dirs, deltas, deletes = _list_dirs(table)
    if mode == "major":
        hi = max(
            [base_n] + [d[1] for d in deltas] + [d[1] for d in deletes]
        )
        if hi < 0:
            raise ValueError(f"hive_acid: nothing to compact in {table!r}")
        live = hive_acid_scan(spark, table, with_row_id=True)
        dest = os.path.join(table, f"base_{hi}")
        _write_bucketed(live, dest)
        folded = [d for _l, _h, d in base_dirs + deltas + deletes]
    elif mode == "minor":
        if not deltas and not deletes:
            raise ValueError(f"hive_acid: no deltas to compact in {table!r}")
        folded = []
        hi = 0
        for tier, rx_name in ((deltas, "delta"), (deletes, "delete_delta")):
            if len(tier) < 2:
                continue
            lo = min(d[0] for d in tier)
            hi = max(d[1] for d in tier)
            merged = _scan_tier(spark, tier)
            dest = os.path.join(table, f"{rx_name}_{lo}_{hi}")
            _write_bucketed(merged, dest)
            folded.extend(d for _l, _h, d in tier)
    else:
        raise ValueError(f"hive_acid: unknown compaction mode {mode!r}")
    for d in folded:
        shutil.rmtree(d, ignore_errors=True)
    return {"mode": mode, "write_id": hi, "folded": len(folded)}
