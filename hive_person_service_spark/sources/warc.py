"""WARC (Web ARChive, ISO 28500) reader + writer — the Common-Crawl
ingestion path of an LLM training-data pipeline.

Surface:
  * ``build_record`` / ``parse_stream``: record-level codec for the public
    WARC/1.1 framing (version line, CRLF header block, Content-Length
    payload, CRLF CRLF terminator).
  * ``write_warc_files``: distribute a DataFrame into ``n_files``
    ``.warc.gz`` files written executor-side, ONE GZIP MEMBER PER RECORD —
    the convention real crawl archives use so a CDX offset index can
    random-access single records without decompressing the file.
  * ``WarcDataSource`` (``spark.read.format("warc")``): file-per-partition
    batch reads. File-level parallelism is exactly how Common Crawl is
    consumed at scale (each .warc.gz ≈ 1 GiB, not splittable mid-file, so
    the planning unit IS the file; 100 TB = ~100k files = ~100k tasks).
    Headers surface as a map column; payloads stay ``binary`` until a
    downstream projection decodes them, so untouched payload bytes never
    cross Arrow more than once.

Determinism: record ids are UUIDv5-style digests of the doc id, dates are
a fixed epoch, gzip members zero their mtime — identical inputs produce
byte-identical archives, which keeps the declared round-trip query
oracle-checkable.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os

from pyspark.sql import DataFrame
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_VERSION = b"WARC/1.1"
_CRLF = b"\r\n"

#: deterministic WARC-Date for generated archives (fixtures must be
#: byte-stable across builds; a crawl's real date comes from the crawler)
FIXED_DATE = "2026-01-01T00:00:00Z"


def record_id_for(doc_id: int | str) -> str:
    """Deterministic urn:uuid record id (UUIDv5-shaped md5 digest)."""
    h = hashlib.md5(f"warc-record:{doc_id}".encode()).hexdigest()
    return (
        f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def build_record(
    warc_type: str,
    payload: bytes,
    headers: dict[str, str],
) -> bytes:
    """Serialize one WARC/1.1 record. ``headers`` must NOT contain
    Content-Length or WARC-Type (derived here); header order is sorted for
    byte-stability."""
    for k in headers:
        if k.lower() in ("content-length", "warc-type"):
            raise ValueError(f"derived header {k!r} must not be supplied")
    buf = bytearray()
    buf += _VERSION + _CRLF
    buf += f"WARC-Type: {warc_type}".encode() + _CRLF
    for k in sorted(headers):
        v = headers[k]
        if "\r" in v or "\n" in v:
            raise ValueError(f"header {k!r} value contains CR/LF")
        buf += f"{k}: {v}".encode() + _CRLF
    buf += f"Content-Length: {len(payload)}".encode() + _CRLF
    buf += _CRLF
    buf += payload
    buf += _CRLF + _CRLF
    return bytes(buf)


def gzip_member(record: bytes) -> bytes:
    """One gzip member per record (mtime pinned to 0 for determinism)."""
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
        gz.write(record)
    return out.getvalue()


def parse_stream(data: bytes):
    """Yield ``(headers, payload)`` per record from a decompressed WARC
    stream; ``headers`` includes the derived WARC-Type and Content-Length.
    Precise errors on framing violations (truncation, bad version line,
    missing Content-Length, missing record terminator)."""
    pos = 0
    n = len(data)
    while pos < n:
        end_ver = data.find(_CRLF, pos)
        if end_ver < 0:
            raise ValueError(f"truncated WARC: no version line at {pos}")
        version = data[pos:end_ver]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"bad WARC version line at {pos}: {version[:20]!r}"
            )
        pos = end_ver + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("truncated WARC: unterminated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line: payload follows
            if b":" not in line:
                raise ValueError(f"malformed WARC header line: {line[:40]!r}")
            k, v = line.split(b":", 1)
            headers[k.decode("utf-8").strip()] = v.decode("utf-8").strip()
        if "Content-Length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["Content-Length"])
        if pos + length > n:
            raise ValueError("truncated WARC: payload shorter than declared")
        payload = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("WARC record missing CRLF CRLF terminator")
        pos += 4
        yield headers, payload


def read_warc_file(path: str):
    """Yield ``(headers, payload)`` from a .warc or .warc.gz file (the gzip
    module transparently concatenates per-record members)."""
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            data = f.read()
    else:
        with open(path, "rb") as f:
            data = f.read()
    yield from parse_stream(data)


def surt_key(url: str) -> str:
    """Simplified SURT (Sort-friendly URI Reordering Transform) key, the
    CDX sort order: scheme stripped, host labels reversed and
    comma-joined, path appended — 'https://a.example.org/p' ->
    'org,example,a)/p'. (Full SURT also canonicalizes queries/sessions;
    out of scope for archive-local indexing.)"""
    u = url.split("://", 1)[-1]
    host, _, path = u.partition("/")
    return ",".join(reversed(host.lower().split("."))) + ")/" + path


def write_warc_files(
    df: DataFrame, out_dir: str, n_files: int, cdx: bool = False
) -> None:
    """Write ``df`` (doc_id, text, lang, source) as ``n_files`` WET-style
    conversion archives, executor-side: range-partition on doc_id, each
    task streams its partition into one .warc.gz. At 100 TB this is the
    same plan — one exchange, then embarrassingly parallel file writes.

    With ``cdx=True`` each archive also gets a ``.cdxj`` sidecar — one
    line per record, ``<surt-key> <timestamp> <json>``, where the JSON
    carries url/filename/offset/length (+ doc_id): the Common-Crawl-style
    capture index that lets a fetch seek straight to one gzip member
    without scanning the archive (see read_warc_records_by_index)."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    cols = df.columns

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.warc.gz"
        path = os.path.join(out_dir, fname)
        tmp = path + ".tmp"
        index: list[str] = []
        offset = 0
        with open(tmp, "wb") as f:
            for row in rows:
                d = dict(zip(cols, row))
                payload = (d["text"] or "").encode("utf-8")
                url = f"https://example.org/{d['source']}/{d['doc_id']}"
                rec = build_record(
                    "conversion",
                    payload,
                    {
                        "WARC-Record-ID": record_id_for(d["doc_id"]),
                        "WARC-Date": FIXED_DATE,
                        "WARC-Target-URI": url,
                        "Content-Type": "text/plain; charset=utf-8",
                        "WARC-X-Doc-Id": str(d["doc_id"]),
                        "WARC-X-Lang": str(d["lang"]),
                        "WARC-X-Source": str(d["source"]),
                    },
                )
                member = gzip_member(rec)
                f.write(member)
                if cdx:
                    meta = {
                        "url": url,
                        "filename": fname,
                        "offset": offset,
                        "length": len(member),
                        "doc_id": int(d["doc_id"]),
                    }
                    ts = FIXED_DATE.replace("-", "").replace(":", "")
                    ts = ts.replace("T", "").replace("Z", "")
                    index.append(
                        f"{surt_key(url)} {ts} "
                        f"{json.dumps(meta, sort_keys=True)}"
                    )
                offset += len(member)
        os.replace(tmp, path)
        if cdx:
            cdx_path = os.path.join(out_dir, fname + ".cdxj")
            with open(cdx_path + ".tmp", "w", encoding="utf-8") as f:
                for line in sorted(index):
                    f.write(line + "\n")
            os.replace(cdx_path + ".tmp", cdx_path)

    (
        df.repartitionByRange(n_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .foreachPartition(write_partition)
    )


def load_cdx(spark, warc_dir: str) -> DataFrame:
    """Load every .cdxj sidecar under ``warc_dir`` as a relation
    (urlkey, ts, url, filename, offset, length, doc_id) — planning input
    for index-driven fetches; at CC scale this is the petabyte corpus's
    few-TB index, a normal distributed scan."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    meta_schema = StructType(
        [
            StructField("url", StringType()),
            StructField("filename", StringType()),
            StructField("offset", LongType()),
            StructField("length", LongType()),
            StructField("doc_id", LongType()),
        ]
    )
    lines = spark.read.text(os.path.join(warc_dir, "*.cdxj"))
    parsed = lines.select(
        F.split("value", " ", 3).alias("p")
    ).select(
        F.col("p")[0].alias("urlkey"),
        F.col("p")[1].alias("ts"),
        F.from_json(F.col("p")[2], meta_schema).alias("m"),
    )
    return parsed.select(
        "urlkey", "ts", "m.url", "m.filename", "m.offset", "m.length",
        "m.doc_id"
    )


def read_warc_records_by_index(
    spark, warc_dir: str, wanted: DataFrame
) -> DataFrame:
    """Random-access fetch: join the CDX index against ``wanted``
    (a DataFrame with a ``doc_id`` column), then each task seeks straight
    to its records' gzip members — bytes read are proportional to the
    HITS, never the archive (the property the tests pin). ``wanted`` is
    broadcast (a fetch list is small by construction); matched entries
    are grouped per archive so each file opens once per task."""
    import pandas as pd
    from collections.abc import Iterator

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    idx = load_cdx(spark, warc_dir)
    hits = idx.join(
        F.broadcast(wanted.select("doc_id").distinct()), "doc_id"
    ).select("doc_id", "url", "filename", "offset", "length")

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("url", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, grp in pdf.groupby("filename"):
                with open(os.path.join(warc_dir, fname), "rb") as f:
                    for _, r in grp.sort_values("offset").iterrows():
                        f.seek(int(r["offset"]))
                        member = f.read(int(r["length"]))
                        [(_h, payload)] = list(
                            parse_stream(gzip.decompress(member))
                        )
                        rows.append(
                            (int(r["doc_id"]), r["url"], payload)
                        )
            yield pd.DataFrame(rows, columns=["doc_id", "url", "payload"])

    return hits.repartition("filename").mapInPandas(fetch, out_schema)


class _WarcFilePart(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option 'path'")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                glob.glob(os.path.join(self.path, "*.warc"))
                + glob.glob(os.path.join(self.path, "*.warc.gz"))
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"no .warc/.warc.gz files under {self.path}")
        return [_WarcFilePart(p) for p in files]

    def read(self, partition: _WarcFilePart):
        for headers, payload in read_warc_file(partition.path):
            yield (
                headers.get("WARC-Record-ID", ""),
                headers.get("WARC-Type", ""),
                headers.get("WARC-Date", ""),
                headers.get("WARC-Target-URI", ""),
                headers.get("Content-Type", ""),
                int(headers["Content-Length"]),
                {
                    k: v
                    for k, v in headers.items()
                    if k
                    not in (
                        "WARC-Record-ID",
                        "WARC-Type",
                        "WARC-Date",
                        "WARC-Target-URI",
                        "Content-Type",
                        "Content-Length",
                    )
                },
                payload,
            )


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return (
            "record_id string, warc_type string, warc_date string, "
            "target_uri string, content_type string, content_length long, "
            "headers map<string,string>, payload binary"
        )

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration of the ``warc`` batch format."""
    spark.dataSource.register(WarcDataSource)
