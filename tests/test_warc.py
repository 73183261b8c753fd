"""WARC codec + DataSource pins (sources/warc.py): ISO 28500 framing
golden bytes, precise malformed-input errors, gzip member-per-record
layout, deterministic archives, and the parquet->WARC->Spark round trip.
"""

from __future__ import annotations

import glob
import gzip
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.sources import load_table
from hive_person_service_spark.sources.warc import (
    build_record,
    gzip_member,
    parse_stream,
    read_warc_file,
    record_id_for,
    register_warc_source,
    write_warc_files,
)


def test_record_framing_golden_bytes():
    rec = build_record(
        "conversion",
        b"hello",
        {"WARC-Record-ID": "<urn:uuid:x>", "Content-Type": "text/plain"},
    )
    assert rec == (
        b"WARC/1.1\r\n"
        b"WARC-Type: conversion\r\n"
        b"Content-Type: text/plain\r\n"
        b"WARC-Record-ID: <urn:uuid:x>\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"hello"
        b"\r\n\r\n"
    )
    [(headers, payload)] = list(parse_stream(rec))
    assert payload == b"hello"
    assert headers["WARC-Type"] == "conversion"
    assert headers["Content-Length"] == "5"


def test_content_length_counts_bytes_not_chars():
    text = "héllo 世界"  # multi-byte utf-8
    rec = build_record("conversion", text.encode("utf-8"), {})
    [(headers, payload)] = list(parse_stream(rec))
    assert int(headers["Content-Length"]) == len(text.encode("utf-8"))
    assert payload.decode("utf-8") == text


def test_derived_headers_rejected_and_crlf_gated():
    with pytest.raises(ValueError, match="derived header"):
        build_record("conversion", b"", {"Content-Length": "0"})
    with pytest.raises(ValueError, match="CR/LF"):
        build_record("conversion", b"", {"X": "a\r\nb"})


def test_malformed_streams_raise_precise_errors():
    good = build_record("conversion", b"abc", {})
    with pytest.raises(ValueError, match="bad WARC version"):
        list(parse_stream(b"HTTP/1.1 200\r\n\r\n"))
    with pytest.raises(ValueError, match="payload shorter"):
        list(parse_stream(good[:-6]))
    with pytest.raises(ValueError, match="terminator"):
        list(parse_stream(good[:-2]))
    no_len = (
        b"WARC/1.1\r\nWARC-Type: conversion\r\n\r\nabc\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_stream(no_len))


def test_gzip_member_per_record_concatenation(tmp_path):
    r1 = build_record("conversion", b"one", {"WARC-X-Doc-Id": "1"})
    r2 = build_record("conversion", b"two", {"WARC-X-Doc-Id": "2"})
    p = tmp_path / "two.warc.gz"
    p.write_bytes(gzip_member(r1) + gzip_member(r2))
    got = list(read_warc_file(str(p)))
    assert [pl for _h, pl in got] == [b"one", b"two"]
    # and each member decompresses standalone (CDX random-access property)
    assert gzip.decompress(gzip_member(r2)) == r2


def test_record_id_deterministic():
    assert record_id_for(7) == record_id_for(7)
    assert record_id_for(7) != record_id_for(8)
    assert record_id_for(7).startswith("<urn:uuid:")


def test_write_is_deterministic_and_multifile(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_warc_files(docs, d1, n_files=4)
    write_warc_files(docs, d2, n_files=4)
    f1 = sorted(glob.glob(os.path.join(d1, "*.warc.gz")))
    f2 = sorted(glob.glob(os.path.join(d2, "*.warc.gz")))
    assert len(f1) == 4 and len(f2) == 4
    for a, b in zip(f1, f2):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), (a, b)


def test_datasource_roundtrip_matches_parquet(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "arch")
    write_warc_files(
        docs.select("doc_id", "text", "lang", "source"), out, n_files=4
    )
    register_warc_source(spark)
    recs = spark.read.format("warc").option("path", out).load()
    assert recs.rdd.getNumPartitions() == 4  # file-per-partition planning
    got = {
        r.doc_id: (r.text, r.lang)
        for r in recs.select(
            F.element_at("headers", "WARC-X-Doc-Id").cast("bigint").alias("doc_id"),
            F.col("payload").cast("string").alias("text"),
            F.element_at("headers", "WARC-X-Lang").alias("lang"),
        ).collect()
    }
    want = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    assert got == want  # byte-exact text survival, every document


def test_cdx_sidecar_offsets_are_exact(spark, tmp_path):
    """Every CDXJ line's (offset, length) must slice exactly one gzip
    member whose record round-trips standalone — the property that makes
    index-driven random access sound."""
    import json

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "arch")
    write_warc_files(docs, out, n_files=3, cdx=True)
    sidecars = sorted(glob.glob(os.path.join(out, "*.cdxj")))
    assert len(sidecars) == 3
    n = 0
    for sc in sidecars:
        with open(sc, encoding="utf-8") as f:
            lines = [ln.rstrip("\n") for ln in f]
        assert lines == sorted(lines)  # CDX sort order
        for ln in lines:
            key, _ts, meta_json = ln.split(" ", 2)
            meta = json.loads(meta_json)
            assert key.startswith("org,example)/")
            with open(os.path.join(out, meta["filename"]), "rb") as f:
                f.seek(meta["offset"])
                member = f.read(meta["length"])
            [(headers, payload)] = list(
                parse_stream(gzip.decompress(member))
            )
            assert headers["WARC-X-Doc-Id"] == str(meta["doc_id"])
            n += 1
    assert n == docs.count()


def test_index_fetch_matches_direct_read_and_is_selective(spark, tmp_path):
    from hive_person_service_spark.sources.warc import (
        load_cdx,
        read_warc_records_by_index,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "arch")
    write_warc_files(
        docs.select("doc_id", "text", "lang", "source"), out, n_files=3,
        cdx=True,
    )
    wanted = docs.where(F.col("doc_id") % 7 == 0).select("doc_id")
    got = {
        r.doc_id: bytes(r.payload).decode("utf-8")
        for r in read_warc_records_by_index(spark, out, wanted).collect()
    }
    want = {
        r.doc_id: r.text
        for r in docs.where(F.col("doc_id") % 7 == 0).collect()
    }
    assert got == want
    # selectivity: the fetch touches only the hit members' bytes
    idx = load_cdx(spark, out)
    hit_bytes = (
        idx.join(wanted, "doc_id").agg(F.sum("length").alias("b")).first().b
    )
    total_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(out, "*.warc.gz"))
    )
    assert hit_bytes < total_bytes / 3  # 1-in-7 sample reads a fraction


def test_content_length_column_is_payload_bytes(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "arch")
    write_warc_files(
        docs.select("doc_id", "text", "lang", "source"), out, n_files=2
    )
    register_warc_source(spark)
    recs = spark.read.format("warc").option("path", out).load()
    bad = recs.where(
        F.col("content_length") != F.octet_length("payload")
    ).count()
    assert bad == 0
