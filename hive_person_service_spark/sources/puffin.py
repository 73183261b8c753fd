"""Puffin file format + Iceberg v3 ``deletion-vector-v1`` blobs,
implemented from the PUBLIC specs (https://iceberg.apache.org/puffin-spec/
and the Iceberg table spec's v3 "Position Delete Vectors" section) with
the same in-repo-codec discipline as the Avro OCF / JPEG / Delta-DV
implementations.

Puffin layout (all per the format spec)::

    Magic | Blob_1 .. Blob_n | Magic | FooterPayload |
    FooterPayloadSize (int32 LE) | Flags (4 bytes) | Magic

``Magic`` is the 4 bytes ``PFA1``; ``FooterPayload`` is UTF-8 JSON
(``{"blobs": [BlobMetadata...], "properties": {...}}``); flag bit 0 of
byte 0 marks an lz4-compressed footer payload (this writer always emits
uncompressed; the reader gates compressed footers precisely -- no lz4
codec ships in this container).

``deletion-vector-v1`` blob data (the v3 table spec)::

    combined-length (int32 BE) | magic 0xD1D33DD3 | vector | crc (int32 BE)

* combined-length covers the DV magic + vector bytes;
* the vector is a 64-bit roaring bitmap in the "portable" serialization
  -- BYTE-COMPATIBLE with Delta Lake's RoaringBitmapArray (the v3 spec
  chose Delta's layout precisely so one file serves both formats), so
  the bitmap codec is shared with sources/delta_dv.py;
* crc is the CRC-32 of magic + vector (big-endian, full 32 bits).

Blob metadata carries the spec-required ``referenced-data-file`` and
``cardinality`` properties; the manifest entry's ``content_offset`` /
``content_size_in_bytes`` point at the whole framed blob (offset of the
combined-length word, length through the CRC), exactly what the v3
manifest fields 144/145 record.

Scale note: a DV is KBs per data file (cardinality counts rows DELETED),
so Puffin decode is driver-side like the rest of snapshot planning; the
deleted positions are applied DISTRIBUTED via a broadcast anti-join on
``_metadata.row_index`` -- data never funnels through the driver.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np

from .delta_dv import deserialize_bitmap, serialize_bitmap

_PUFFIN_MAGIC = b"PFA1"
_DV_MAGIC = b"\xd1\xd3\x3d\xd3"


def frame_dv_blob(positions) -> bytes:
    """Sorted-able iterable of non-negative int row indexes -> framed
    ``deletion-vector-v1`` blob bytes (length | magic | vector | crc)."""
    vector = serialize_bitmap(positions)
    body = _DV_MAGIC + vector
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def unframe_dv_blob(blob: bytes) -> np.ndarray:
    """Framed ``deletion-vector-v1`` blob bytes -> sorted int64 deleted
    row indexes (verifies the length word, DV magic and CRC-32)."""
    if len(blob) < 12:
        raise ValueError(f"deletion-vector blob too short ({len(blob)} bytes)")
    (combined,) = struct.unpack_from(">i", blob, 0)
    if combined != len(blob) - 8:
        raise ValueError(
            f"deletion-vector length mismatch: framed {combined}, "
            f"blob holds {len(blob) - 8}"
        )
    body = blob[4 : 4 + combined]
    if body[:4] != _DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4]!r} (expected {_DV_MAGIC!r})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + combined)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector checksum mismatch (corrupt blob)")
    return deserialize_bitmap(body[4:])


def write_puffin(path: str, blobs: list[dict]) -> list[dict]:
    """Write a Puffin file. ``blobs`` entries are
    ``{"type": str, "data": bytes, "properties": {...}, ...}``; any other
    BlobMetadata keys (snapshot-id, sequence-number, fields) pass
    through. Returns the BlobMetadata list (with offset/length filled),
    which for DV blobs is exactly what manifest entries need."""
    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(_PUFFIN_MAGIC)
        for b in blobs:
            data = b["data"]
            meta = {k: v for k, v in b.items() if k != "data"}
            meta.setdefault("fields", [])
            meta.setdefault("snapshot-id", -1)
            meta.setdefault("sequence-number", -1)
            meta["offset"] = fh.tell()
            meta["length"] = len(data)
            fh.write(data)
            metas.append(meta)
        payload = json.dumps(
            {"blobs": metas, "properties": {"created-by": "hive-person-service-spark"}}
        ).encode()
        fh.write(_PUFFIN_MAGIC)
        fh.write(payload)
        fh.write(struct.pack("<i", len(payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        fh.write(_PUFFIN_MAGIC)
    return metas


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's FileMetadata JSON (validates all three magic
    sites; gates compressed footer payloads precisely)."""
    with open(path, "rb") as fh:
        head = fh.read(4)
        if head != _PUFFIN_MAGIC:
            raise ValueError(f"not a Puffin file (leading magic {head!r}): {path}")
        fh.seek(-12, 2)
        size_raw = fh.read(4)
        flags = fh.read(4)
        if fh.read(4) != _PUFFIN_MAGIC:
            raise ValueError(f"bad Puffin trailing magic: {path}")
        (size,) = struct.unpack("<i", size_raw)
        if flags[0] & 0x01:
            raise ValueError(
                "Puffin footer payload is lz4-compressed (unsupported: no "
                f"lz4 codec in-container): {path}"
            )
        fh.seek(-(12 + size + 4), 2)
        if fh.read(4) != _PUFFIN_MAGIC:
            raise ValueError(f"bad Puffin footer-start magic: {path}")
        return json.loads(fh.read(size).decode())


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    """Random-access one blob's bytes (the manifest's content_offset /
    content_size_in_bytes view -- no footer read needed)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        return fh.read(length)


def read_dv_from_puffin(path: str, offset: int, length: int) -> np.ndarray:
    """Manifest-pointer random access: framed DV blob at (offset, length)
    -> sorted int64 deleted row indexes."""
    return unframe_dv_blob(read_puffin_blob(path, offset, length))
