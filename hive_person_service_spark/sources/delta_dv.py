"""Delta Lake deletion-vector codec, implemented from the PUBLIC protocol
spec (https://github.com/delta-io/delta/blob/master/PROTOCOL.md,
"Deletion Vectors" + "Deletion Vector Format") with no external bitmap
library -- the same in-repo-codec discipline as the Avro OCF and JPEG
implementations.

Three layers, each exactly as the spec describes:

  * **Z85** (ZeroMQ RFC 32 base85): encodes the 16-byte DV file UUID in
    ``add.deletionVector.pathOrInlineDv`` (storageType ``u``) and whole
    inline DVs (storageType ``i``).
  * **RoaringBitmapArray, "portable" format**: magic number 1681511377
    (int32 LE), int64 LE bitmap count, then per 32-bit bitmap: int32 LE
    key (the high 32 bits of the row indexes it holds) + a standard
    RoaringFormatSpec 32-bit roaring bitmap. The writer emits array /
    bitmap containers (cookie 12346); the reader additionally understands
    run containers (cookie 12347) so DVs written by real engines decode.
  * **DV file layout**: 1-byte format version (1), then per DV at its
    descriptor ``offset``: int32 BIG-endian data size, the bitmap bytes,
    int32 big-endian CRC-32 of the bitmap bytes (verified on read).

Scale note: a DV is KBs per data file (cardinality counts rows DELETED,
not rows kept), so decode is driver-side like the rest of the log replay;
the deleted positions are then applied DISTRIBUTED via an anti-join on
``_metadata.row_index`` -- the data path never funnels through the
driver.
"""

from __future__ import annotations

import io
import os
import struct
import uuid as _uuid
import zlib

import numpy as np

# Bumped whenever the on-disk DV framing changes (fixture caches key on
# it so a framing fix orphans old layouts instead of corrupting them).
# "crc32full": full 32-bit CRC after the 31-bit-mask interop fix.
DV_CODEC_TAG = "crc32full"

# ---------------------------------------------------------------------------
# Z85 (ZeroMQ RFC 32)
# ---------------------------------------------------------------------------

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 payload must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text must be a multiple of 5 chars, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        out.extend(n.to_bytes(4, "big"))
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit RoaringBitmap (RoaringFormatSpec) -- serialize / deserialize
# ---------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Serialize sorted uint32 values as a standard roaring bitmap using
    array/bitmap containers only (cookie 12346 -- always valid; run
    packing is an optional optimization)."""
    values = np.asarray(values, dtype=np.uint32)
    keys = (values >> 16).astype(np.uint16)
    lows = (values & 0xFFFF).astype(np.uint16)
    uniq_keys, starts = np.unique(keys, return_index=True)
    bounds = list(starts) + [len(values)]
    containers: list[tuple[int, int, bytes]] = []  # (key, card, payload)
    for i, k in enumerate(uniq_keys):
        vals = lows[bounds[i] : bounds[i + 1]]
        card = len(vals)
        if card <= _ARRAY_MAX:
            payload = vals.astype("<u2").tobytes()
        else:
            bits = np.zeros(1024, dtype="<u8")
            idx = vals.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
            payload = bits.tobytes()
        containers.append((int(k), card, payload))
    buf = io.BytesIO()
    buf.write(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(containers)))
    for k, card, _ in containers:
        buf.write(struct.pack("<HH", k, card - 1))
    # offset header (mandatory for the no-run cookie)
    pos = buf.tell() + 4 * len(containers)
    for _, _, payload in containers:
        buf.write(struct.pack("<I", pos))
        pos += len(payload)
    for _, _, payload in containers:
        buf.write(payload)
    return buf.getvalue()


def _deserialize_roaring32(data: bytes, base: int = 0) -> tuple[np.ndarray, int]:
    """Standard roaring bitmap bytes (starting at ``base``) -> (sorted
    uint32 values, end offset). Handles array, bitmap AND run containers."""
    cookie = struct.unpack_from("<i", data, base)[0]
    off = base + 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        size = (cookie >> 16) + 1
        n_flag_bytes = (size + 7) // 8
        run_flags = data[off : off + n_flag_bytes]
        off += n_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        size = struct.unpack_from("<i", data, off)[0]
        off += 4
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    keys = np.empty(size, dtype=np.uint32)
    cards = np.empty(size, dtype=np.int64)
    for i in range(size):
        k, cm1 = struct.unpack_from("<HH", data, off + 4 * i)
        keys[i], cards[i] = k, cm1 + 1
    off += 4 * size
    if has_offsets:
        off += 4 * size  # trust sequential layout; offsets are redundant
    out: list[np.ndarray] = []
    for i in range(size):
        is_run = bool(run_flags and (run_flags[i // 8] >> (i % 8)) & 1)
        if is_run:
            n_runs = struct.unpack_from("<H", data, off)[0]
            off += 2
            runs = np.frombuffer(data, dtype="<u2", count=2 * n_runs, offset=off)
            off += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(int(runs[2 * j]), int(runs[2 * j]) + int(runs[2 * j + 1]) + 1)
                    for j in range(n_runs)
                ]
            ).astype(np.uint32) if n_runs else np.empty(0, dtype=np.uint32)
        elif cards[i] <= _ARRAY_MAX:
            vals = np.frombuffer(
                data, dtype="<u2", count=int(cards[i]), offset=off
            ).astype(np.uint32)
            off += 2 * int(cards[i])
        else:
            bits = np.frombuffer(data, dtype="<u8", count=1024, offset=off)
            off += 8192
            vals = np.flatnonzero(
                np.unpackbits(bits.view(np.uint8), bitorder="little")
            ).astype(np.uint32)
        out.append((np.uint32(keys[i]) << np.uint32(16)) | vals)
    values = np.concatenate(out) if out else np.empty(0, dtype=np.uint32)
    return values, off


# ---------------------------------------------------------------------------
# RoaringBitmapArray "portable" 64-bit format
# ---------------------------------------------------------------------------

_PORTABLE_MAGIC = 1681511377


def serialize_bitmap(positions) -> bytes:
    """Sorted-able iterable of non-negative int row indexes -> portable
    RoaringBitmapArray bytes (magic, int64 count, per 32-bit bitmap:
    int32 key + standard roaring)."""
    pos = np.unique(np.asarray(list(positions), dtype=np.uint64))
    highs = (pos >> np.uint64(32)).astype(np.uint32)
    lows = (pos & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    buf = io.BytesIO()
    uniq = np.unique(highs)
    buf.write(struct.pack("<i", _PORTABLE_MAGIC))
    buf.write(struct.pack("<q", len(uniq)))
    for h in uniq:
        buf.write(struct.pack("<i", int(h)))
        buf.write(_serialize_roaring32(lows[highs == h]))
    return buf.getvalue()


def deserialize_bitmap(data: bytes) -> np.ndarray:
    """Portable RoaringBitmapArray bytes -> sorted int64 row indexes."""
    magic = struct.unpack_from("<i", data, 0)[0]
    if magic != _PORTABLE_MAGIC:
        raise ValueError(
            f"deletion vector: bad RoaringBitmapArray magic {magic} "
            f"(expected {_PORTABLE_MAGIC})"
        )
    n = struct.unpack_from("<q", data, 4)[0]
    off = 12
    out: list[np.ndarray] = []
    for _ in range(n):
        key = struct.unpack_from("<i", data, off)[0]
        off += 4
        vals, off = _deserialize_roaring32(data, off)
        out.append((np.int64(key) << np.int64(32)) | vals.astype(np.int64))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


# ---------------------------------------------------------------------------
# DV file layout + descriptors
# ---------------------------------------------------------------------------


def write_dv_file(table: str, bitmaps: list[bytes]) -> tuple[str, list[dict]]:
    """Write one DV file holding ``bitmaps`` (one per data file); returns
    (uuid-relative descriptor path base, per-bitmap descriptor fields).
    File layout per the spec: version byte 1, then per DV:
    int32 BE size | data | int32 BE crc32(data)."""
    uid = _uuid.uuid4()
    fname = f"deletion_vector_{uid}.bin"
    full = os.path.join(table, fname)
    descs: list[dict] = []
    with open(full, "wb") as fh:
        fh.write(b"\x01")
        for data in bitmaps:
            offset = fh.tell()
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            # FULL 32-bit CRC: real engines write the unmasked value (as a
            # signed int, but the BYTES equal the unsigned big-endian
            # form) -- masking to 31 bits would reject ~half of all real
            # DV files and make ours look corrupt to them
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            descs.append(
                {
                    "storageType": "u",
                    "pathOrInlineDv": z85_encode(uid.bytes),
                    "offset": offset,
                    "sizeInBytes": len(data),
                }
            )
    return fname, descs


def read_dv(table: str, desc: dict) -> np.ndarray:
    """Resolve a deletionVector descriptor -> sorted int64 deleted row
    indexes. Supports storageType u (uuid-derived relative path),
    p (absolute path) and i (inline)."""
    st = desc.get("storageType")
    if st == "i":
        raw = z85_decode(desc["pathOrInlineDv"])
        # z85 pads to 4-byte groups; sizeInBytes recovers the true length
        size = desc.get("sizeInBytes")
        return deserialize_bitmap(raw if size is None else raw[:size])
    if st == "u":
        raw = desc["pathOrInlineDv"]
        # optional random path prefix before the 20-char z85 uuid
        prefix, enc = raw[:-20], raw[-20:]
        uid = _uuid.UUID(bytes=z85_decode(enc))
        path = os.path.join(table, prefix, f"deletion_vector_{uid}.bin")
    elif st == "p":
        path = desc["pathOrInlineDv"]
    else:
        raise ValueError(f"deletion vector storageType {st!r} unsupported")
    with open(path, "rb") as fh:
        fh.seek(desc["offset"])
        (size,) = struct.unpack(">i", fh.read(4))
        if size != desc["sizeInBytes"]:
            raise ValueError(
                f"deletion vector size mismatch at offset {desc['offset']}: "
                f"file says {size}, descriptor says {desc['sizeInBytes']}"
            )
        data = fh.read(size)
        (crc,) = struct.unpack(">I", fh.read(4))
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector checksum mismatch (corrupt DV)")
    return deserialize_bitmap(data)
