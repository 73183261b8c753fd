"""Avro Object Container File source/sink, pure Python (SURVEY.md §2.A).

The classic Hive landing-zone format. This container has no spark-avro
connector jar (only Avro's core libs ship with pyspark), so instead of
gating the format away we implement the OCF wire format itself from the
public Avro 1.12 specification (https://avro.apache.org/docs/1.12.0/
specification/): magic ``Obj\\x01``, a file-metadata map carrying the
writer schema JSON and codec, then sync-marker-delimited blocks of
binary-encoded records (zigzag-varint longs, length-prefixed strings,
IEEE-LE floats, unions as index+value). Codecs: ``null`` and ``deflate``
(raw DEFLATE, RFC 1951 — zlib with a -15 window).

Scale shape:
  * WRITE is distributed: ``df.mapInPandas`` encodes each Spark partition
    into its own ``part-*.avro`` file executor-side; the driver only
    collects the (file, rows) manifest — never row data.
  * READ is distributed: ``spark.read.format("binaryFile")`` lists the
    ``*.avro`` files into tasks and a ``mapInPandas`` stage decodes each
    file where it lands. File-level parallelism is the natural Avro
    split granularity when the writer rolls files at block size (the
    format's sync markers would support sub-file splits; with
    executor-sized files that finer split buys nothing).
  * The decoded relation carries the DECLARED Spark schema, so every
    downstream filter/projection stays in codegen; only the byte-level
    decode itself is Python, and it is Arrow-batched per file.

Supported Avro types (the fixture surface): null, boolean, int, long,
float, double, string, bytes, records of those, arrays, union-with-null,
and the timestamp-micros / date logical types. Anything else raises a
precise ValueError naming the schema node — the same honest-gate pattern
as the JPEG codec's progressive note.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import zlib
from typing import Any, Callable, Iterator

import pandas as pd

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary encoding primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _zz_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zz_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    u = _zz_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf) -> int:
    shift = 0
    u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zz_decode(u)
        shift += 7


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf) -> bytes:
    return buf.read(read_long(buf))


# ---------------------------------------------------------------------------
# schema mapping: Spark StructType <-> Avro schema JSON
# ---------------------------------------------------------------------------


def spark_to_avro_schema(struct, name: str = "row") -> dict:
    """Declared Spark schema -> Avro record schema (nullable fields become
    ``["null", T]`` unions, Avro's idiom for optional)."""
    from pyspark.sql import types as T

    def field_type(dt) -> Any:
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.IntegerType):
            return "int"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.ArrayType):
            items = field_type(dt.elementType)
            # Spark arrays default to containsNull=True; a bare item type
            # would crash the encoder on an actual null element, so emit
            # the items as a [null, T] union (the decoder already handles
            # unions at any nesting level).
            if dt.containsNull:
                items = ["null", items]
            return {"type": "array", "items": items}
        raise ValueError(f"avro_ocf: unsupported Spark type {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", field_type(f.dataType)]}
            for f in struct.fields
        ],
    }


# ---------------------------------------------------------------------------
# value codecs compiled from an Avro schema node
# ---------------------------------------------------------------------------


def _encoder(node: Any) -> Callable[[io.BytesIO, Any], None]:
    if isinstance(node, str):
        if node == "null":
            return lambda buf, v: None
        if node in ("long", "int"):
            return lambda buf, v: write_long(buf, int(v))
        if node == "double":
            return lambda buf, v: buf.write(struct.pack("<d", float(v)))
        if node == "float":
            return lambda buf, v: buf.write(struct.pack("<f", float(v)))
        if node == "string":
            return lambda buf, v: write_bytes(buf, str(v).encode("utf-8"))
        if node == "bytes":
            return lambda buf, v: write_bytes(buf, bytes(v))
        if node == "boolean":
            return lambda buf, v: buf.write(b"\x01" if v else b"\x00")
        raise ValueError(f"avro_ocf: unsupported type {node!r}")
    if isinstance(node, list):  # union — only [null, T] style needed
        branch = [_encoder(b) for b in node]
        null_idx = node.index("null") if "null" in node else -1

        def enc_union(buf, v):
            if v is None:
                if null_idx < 0:
                    raise ValueError("avro_ocf: null value in non-null union")
                write_long(buf, null_idx)
            else:
                idx = 1 if null_idx == 0 else 0
                write_long(buf, idx)
                branch[idx](buf, v)

        return enc_union
    t = node["type"]
    if t == "record":
        fenc = [_encoder(f["type"]) for f in node["fields"]]
        names = [f["name"] for f in node["fields"]]
        # a record may predate a later-added optional field (e.g. an old
        # manifest entry re-encoded under a newer schema): a missing key
        # encodes as null ONLY when the field type admits null -- for
        # required fields the KeyError stays, it's a real schema breach
        nullable = [
            isinstance(f["type"], list) and "null" in f["type"]
            for f in node["fields"]
        ]

        def enc_rec(buf, v):
            for n, e, opt in zip(names, fenc, nullable):
                e(buf, v.get(n) if opt else v[n])

        return enc_rec
    if t == "array":
        item = _encoder(node["items"])

        def enc_arr(buf, v):
            seq = list(v)
            if seq:
                write_long(buf, len(seq))
                for x in seq:
                    item(buf, x)
            write_long(buf, 0)

        return enc_arr
    if t in ("long", "int"):  # logical types ride the base encoding
        return lambda buf, v: write_long(buf, int(v))
    raise ValueError(f"avro_ocf: unsupported complex type {t!r}")


def _decoder(node: Any) -> Callable[[Any], Any]:
    if isinstance(node, str):
        if node == "null":
            return lambda buf: None
        if node in ("long", "int"):
            return read_long
        if node == "double":
            return lambda buf: struct.unpack("<d", buf.read(8))[0]
        if node == "float":
            return lambda buf: struct.unpack("<f", buf.read(4))[0]
        if node == "string":
            return lambda buf: read_bytes(buf).decode("utf-8")
        if node == "bytes":
            return read_bytes
        if node == "boolean":
            return lambda buf: buf.read(1) == b"\x01"
        raise ValueError(f"avro_ocf: unsupported type {node!r}")
    if isinstance(node, list):
        branch = [_decoder(b) for b in node]

        def dec_union(buf):
            return branch[read_long(buf)](buf)

        return dec_union
    t = node["type"]
    if t == "record":
        fdec = [(f["name"], _decoder(f["type"])) for f in node["fields"]]

        def dec_rec(buf):
            return {n: d(buf) for n, d in fdec}

        return dec_rec
    if t == "array":
        item = _decoder(node["items"])

        def dec_arr(buf):
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block-size form: size in bytes follows, skip it
                    read_long(buf)
                    n = -n
                for _ in range(n):
                    out.append(item(buf))

        return dec_arr
    if t in ("long", "int"):
        return read_long
    raise ValueError(f"avro_ocf: unsupported complex type {t!r}")


# ---------------------------------------------------------------------------
# container file read/write
# ---------------------------------------------------------------------------


def write_ocf(
    records: list[dict],
    avro_schema: dict,
    codec: str = "deflate",
    block_records: int = 4096,
) -> bytes:
    """Encode records into one OCF byte string (header + blocks)."""
    schema_json = json.dumps(avro_schema)
    sync = hashlib.md5(schema_json.encode() + b"spark-graft").digest()
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    write_long(out, len(meta))
    for k, v in meta.items():
        write_bytes(out, k.encode())
        write_bytes(out, v)
    write_long(out, 0)
    out.write(sync)
    enc = _encoder(avro_schema)
    for i in range(0, max(len(records), 1), block_records):
        chunk = records[i : i + block_records]
        if not chunk:
            break
        body = io.BytesIO()
        for r in chunk:
            enc(body, r)
        payload = body.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw DEFLATE
        elif codec != "null":
            raise ValueError(f"avro_ocf: unsupported codec {codec!r}")
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_ocf(blob: bytes) -> tuple[dict, list[dict]]:
    """Decode one OCF byte string -> (writer schema, records)."""
    buf = io.BytesIO(blob)
    if buf.read(4) != MAGIC:
        raise ValueError("avro_ocf: bad magic (not an Avro container file)")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:  # block-size form
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    dec = _decoder(schema)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"avro_ocf: unsupported codec {codec!r}")
        body = io.BytesIO(payload)
        for _ in range(count):
            records.append(dec(body))
        if buf.read(16) != sync:
            raise ValueError("avro_ocf: sync marker mismatch (corrupt block)")
    return schema, records


# ---------------------------------------------------------------------------
# Spark-level distributed write / read
# ---------------------------------------------------------------------------


def _pdf_to_records(pdf: pd.DataFrame, struct) -> list[dict]:
    """Pandas batch -> plain-Python records matching the Avro schema
    (NaN/NaT -> None, timestamps -> µs longs, numpy scalars -> Python)."""
    from pyspark.sql import types as T

    cols: dict[str, list] = {}
    for f in struct.fields:
        s = pdf[f.name]
        if isinstance(f.dataType, T.TimestampType):
            vals = [
                None if pd.isna(v) else int(pd.Timestamp(v).value // 1000)
                for v in s
            ]
        elif isinstance(f.dataType, T.DateType):
            epoch = pd.Timestamp("1970-01-01")
            vals = [
                None
                if pd.isna(v)
                else int((pd.Timestamp(v) - epoch).days)
                for v in s
            ]
        elif isinstance(f.dataType, T.ArrayType):
            vals = [None if v is None else list(v) for v in s]
        else:
            vals = [None if pd.isna(v) else v for v in s.tolist()]
        cols[f.name] = vals
    names = list(cols)
    return [dict(zip(names, row)) for row in zip(*cols.values())]


def _records_to_pdf(records: list[dict], struct) -> pd.DataFrame:
    from pyspark.sql import types as T

    out: dict[str, Any] = {}
    for f in struct.fields:
        vals = [r[f.name] for r in records]
        if isinstance(f.dataType, T.TimestampType):
            out[f.name] = pd.Series(
                [None if v is None else pd.Timestamp(v * 1000) for v in vals],
                dtype="datetime64[us]",
            )
        elif isinstance(f.dataType, T.DateType):
            epoch = pd.Timestamp("1970-01-01")
            out[f.name] = pd.Series(
                [
                    None
                    if v is None
                    else (epoch + pd.Timedelta(days=v)).date()
                    for v in vals
                ],
                dtype="object",
            )
        else:
            out[f.name] = pd.Series(vals, dtype="object")
    return pd.DataFrame(out, columns=[f.name for f in struct.fields])


def write_avro(df, path: str, codec: str = "deflate") -> int:
    """Distributed Avro write: one OCF file per Spark partition, encoded
    executor-side; returns the file count. The driver sees only the
    manifest. ``_SUCCESS`` commits the directory (same contract as the
    parquet writers). ``path`` must be a filesystem visible to every
    executor (local mode, NFS, or a FUSE-mounted object store) -- a
    pure-HDFS deployment would route these byte writes through the
    Hadoop FileSystem API instead of ``open()``."""
    struct = df.schema
    avro_schema = spark_to_avro_schema(struct)
    os.makedirs(path, exist_ok=True)

    def encode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        records: list[dict] = []
        for pdf in batches:
            records.extend(_pdf_to_records(pdf, struct))
        if records:
            fname = os.path.join(path, f"part-{pid:05d}.avro")
            with open(fname, "wb") as fh:
                fh.write(write_ocf(records, avro_schema, codec=codec))
            yield pd.DataFrame({"file": [fname], "rows": [len(records)]})

    manifest = df.mapInPandas(encode_partition, "file string, rows long").collect()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
    return len(manifest)


def read_avro(spark, path: str, schema):
    """Distributed Avro read: ``binaryFile`` lists ``*.avro`` into tasks,
    each file decodes where it lands (Arrow-batched back to the JVM), and
    the result carries the DECLARED schema so downstream plans stay in
    codegen."""
    from ..session import configure

    configure(spark)
    struct = schema
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def decode_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                _, records = read_ocf(bytes(blob))
                if records:
                    yield _records_to_pdf(records, struct)

    return files.mapInPandas(decode_files, struct)
