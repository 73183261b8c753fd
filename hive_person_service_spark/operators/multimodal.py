"""Multimodal-column operators (SURVEY.md §2.J): image/audio/video carried
as opaque BinaryType blobs with typed metadata, processed via Arrow-batched
mapInPandas.

Decode status: EVERY container decodes for real with no external library
-- PGM/PPM, uncompressed BMP, non-interlaced 8-bit PNG (stdlib zlib
inflate + numpy scanline unfilter, all five filter types), and baseline
grayscale JPEG (operators/jpeg.py: T.81 Huffman entropy decode + IDCT in
numpy; encoder included, round-trip error pytest-pinned). The former
codec gate is CLOSED; only JPEG variants outside baseline grayscale
(progressive, subsampled color) raise ValueError with a precise message.
``resize_images`` runs a true decode -> nearest-neighbor resize over all
containers. ``decode_image_features`` keeps a deterministic fake
featurizer so the embedding-shaped plumbing stays testable without a
vision model.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema for a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("media_type", StringType()),  # image/png, audio/wav, ...
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("blob_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture: utf-8
    bytes as the blob (stand-in for real media payloads)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.lit("text/plain").alias("media_type"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
    )


def _fake_decode(blob: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: digest bytes -> unit
    vector. Replace with PIL/torchvision/libav in deployment."""
    h = hashlib.sha256(blob).digest()
    v = np.frombuffer(h[: dim * 4], dtype=np.uint32).astype(np.float64)
    v = v / np.linalg.norm(v)
    return v


def decode_image_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs. The mapInPandas
    iterator shape streams batches -- constant memory per task regardless of
    partition size, the right contract for 100 MB+ media blobs (pair with
    small files.maxPartitionBytes for blob tables)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "blob_len": blobs.str.len().astype("int64"),
                    "feature": [list(_fake_decode(b, dim)) for b in blobs],
                }
            )

    return assets.mapInPandas(extract, FEATURE_SCHEMA)


# --- Real image codecs: PGM (netpbm P5), BMP (gray8), PNG (stdlib zlib --
# + numpy unfilter -- see make_png/_decode_png further down), and baseline
# grayscale JPEG (operators/jpeg.py). These are REAL container formats any
# image tool can open -- the decode step is not a stub for any of them.


def make_pgm(px: np.ndarray) -> bytes:
    """Encode a gray8 array as binary PGM (P5): ASCII header then
    row-major bytes."""
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def make_bmp_gray8(px: np.ndarray) -> bytes:
    """Encode a gray8 array as an 8-bit palettized BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + 256-entry identity gray palette + BOTTOM-UP rows,
    each padded to a 4-byte boundary (the format's two classic traps)."""
    import struct

    h, w = px.shape
    row_bytes = (w + 3) & ~3
    palette = b"".join(bytes([g, g, g, 0]) for g in range(256))
    pixel_offset = 14 + 40 + len(palette)
    data_size = row_bytes * h
    header = b"BM" + struct.pack(
        "<IHHI", pixel_offset + data_size, 0, 0, pixel_offset
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, data_size, 2835, 2835, 256, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w] = px.astype(np.uint8)[::-1]  # bottom-up
    return header + info + palette + rows.tobytes()


def _decode_pnm(raw: bytes) -> np.ndarray:
    """Decode binary PGM (P5) / PPM (P6). Header = magic, whitespace- and
    comment-separated width, height, maxval; then raw samples. P6 RGB is
    reduced to gray8 with the integer luma (299r + 587g + 114b) // 1000."""
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(raw) and raw[i : i + 1].isspace():
            i += 1
        if raw[i : i + 1] == b"#":
            while i < len(raw) and raw[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(raw) and not raw[j : j + 1].isspace():
            j += 1
        fields.append(int(raw[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    if raw[:2] == b"P5":
        return np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=i).reshape(h, w)
    rgb = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )
    r, g, b = (rgb[..., k].astype(np.int64) for k in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def _decode_bmp(raw: bytes) -> np.ndarray:
    """Decode uncompressed 8-bit (palettized, assumed gray) and 24-bit BGR
    BMPs: pixel offset from the file header, bottom-up padded rows; 24-bit
    reduces to gray8 with the same integer luma as _decode_pnm."""
    import struct

    pixel_offset = struct.unpack_from("<I", raw, 10)[0]
    (
        _hdr_size,
        w,
        h,
        _planes,
        bits,
        compression,
    ) = struct.unpack_from("<IiiHHI", raw, 14)
    if compression != 0:
        raise ValueError(f"compressed BMP (biCompression={compression})")
    flip = h > 0
    h = abs(h)
    if bits == 8:
        row_bytes = (w + 3) & ~3
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes * h, offset=pixel_offset
        ).reshape(h, row_bytes)[:, :w]
        return rows[::-1] if flip else rows
    if bits == 24:
        row_bytes = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes * h, offset=pixel_offset
        ).reshape(h, row_bytes)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        if flip:
            bgr = bgr[::-1]
        b, g, r = (bgr[..., k].astype(np.int64) for k in range(3))
        return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    raise ValueError(f"unsupported BMP bit depth {bits}")


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def make_png(px: np.ndarray, color_type: int = 0) -> bytes:
    """Encode a real, spec-complete PNG (stdlib zlib, correct CRCs):
    8-bit, non-interlaced. ``px`` is (h, w) for gray (color_type 0) or
    (h, w, 3) for RGB (color_type 2). Rows use filter 0; any PNG reader
    (including _decode_png) round-trips the pixels exactly."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    if color_type == 0:
        h, w = px.shape
        body = px.astype(np.uint8)
    elif color_type == 2:
        h, w, _ = px.shape
        body = px.astype(np.uint8).reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported encode color type {color_type}")
    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), body], axis=1
    )  # filter byte 0 per row
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(flt: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. flt: (h, 1+stride) raw rows (first
    byte per row = filter type). Returns (h, stride) reconstructed bytes.

    Filter 2 (Up) is whole-row vectorized; 1 (Sub) is an exact per-channel
    cumulative sum mod 256 (recon[x] = filt[x] + recon[x-bpp]); 3/4
    (Average/Paeth) are inherently sequential in x and fall back to a
    per-byte loop -- correctness over speed, and encoders we emit use
    filter 0 anyway."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = int(flt[y, 0])
        row = flt[y, 1:].astype(np.int64)
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: cumsum within each channel residue class
            rec = row.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(rec[c::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (row + prev) % 256
        elif ftype == 3:  # Average
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _decode_png(raw: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG (gray / gray+alpha / RGB / RGBA)
    to gray8: chunk walk -> concatenated-IDAT zlib inflate -> scanline
    unfilter -> channel reduction (alpha dropped, RGB via the same integer
    luma as the other codecs). Interlaced, paletted, or 16-bit PNGs raise
    ValueError (not produced by any writer in this repo)."""
    import struct
    import zlib

    w, h = struct.unpack_from(">II", raw, 16)
    bit_depth, color_type, _comp, _filt, interlace = raw[24:29]
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]

    idat = bytearray()
    i = 8
    while i + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, i)
        tag = raw[i + 4 : i + 8]
        if tag == b"IDAT":
            idat += raw[i + 8 : i + 8 + length]
        if tag == b"IEND":
            break
        i += 12 + length
    stride = w * ch
    flt = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    flt = flt.reshape(h, 1 + stride)
    rec = _png_unfilter(flt, h, stride, bpp=ch)
    px = rec.reshape(h, w, ch)
    if color_type == 0:
        return px[..., 0]
    if color_type == 4:  # gray + alpha: drop alpha
        return px[..., 0]
    r, g, b = (px[..., k].astype(np.int64) for k in range(3))
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def decode_image(blob: bytes) -> np.ndarray:
    """Decode an image blob to a gray8 numpy array, dispatching on magic
    bytes. Every container decodes here with no external library: PGM/PPM,
    uncompressed BMP, non-interlaced 8-bit PNG (stdlib zlib + numpy
    unfilter), and baseline grayscale JPEG (operators/jpeg.py -- T.81
    Huffman + IDCT in numpy). JPEG variants outside baseline grayscale
    (progressive, chroma-subsampled color) raise ValueError with a precise
    message -- recognized, deliberately unimplemented."""
    raw = bytes(blob)
    if raw[:2] in (b"P5", b"P6"):
        return _decode_pnm(raw)
    if raw[:2] == b"BM":
        return _decode_bmp(raw)
    if raw[:8] == PNG_MAGIC:
        return _decode_png(raw)
    if raw[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg_gray

        return decode_jpeg_gray(raw)
    raise ValueError(f"unrecognized image magic {raw[:8]!r}")


def _nn_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor gray8 resize: output (r, c) samples source
    (floor(r*h/out_h), floor(c*w/out_w))."""
    h, w = arr.shape
    r_idx = (np.arange(out_h, dtype=np.int64) * h) // out_h
    c_idx = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[r_idx][:, c_idx]


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """REAL decode -> resize over encoded image blobs (PGM/PPM/BMP decode
    in-process; see decode_image for the PNG/JPEG codec gate). Streams
    Arrow batches via mapInPandas -- constant task memory however large
    the partition -- and emits raw gray8 rows (RAW_IMAGE_SCHEMA), the
    hand-off format the rest of the pixel pipeline consumes."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, blob in zip(pdf["asset_id"], pdf["blob"]):
                resized = _nn_resize(decode_image(blob), width, height)
                out.append((int(aid), resized.tobytes(), width, height))
            yield pd.DataFrame(
                out, columns=["asset_id", "blob", "width", "height"]
            )

    return assets.select("asset_id", "blob").mapInPandas(work, RAW_IMAGE_SCHEMA)


# Raw (decoded) image table: row-major gray8 pixels in a BinaryType blob.
RAW_IMAGE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def synth_raw_images(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic raw gray8 test images: dims from the id, pixel
    (x, y) = (3x + 7y + id) mod 256 -- arithmetic, so an oracle can
    re-derive any pixel (and thus any resize output) without the bytes."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid in pdf[id_col].astype("int64"):
                w = 16 + int(aid) % 8
                h = 16 + int(aid) % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((3 * x + 7 * y + int(aid)) % 256).astype(np.uint8)
                out.append((int(aid), px.tobytes(), w, h))
            yield pd.DataFrame(
                out, columns=["asset_id", "blob", "width", "height"]
            )

    return ids.select(F.col(id_col)).mapInPandas(synth, RAW_IMAGE_SCHEMA)


def synth_encoded_images(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic ENCODED test images -- same dims/pixel arithmetic as
    synth_raw_images ((3x + 7y + id) mod 256), but wrapped in a real
    container rotating by id mod 3: binary PGM, 8-bit BMP, or
    zlib-compressed PNG (make_png -- real IDAT + CRCs). All three codecs
    round-trip gray8 losslessly, so any oracle written against the raw
    pixel formula also checks each DECODE path end-to-end."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid in pdf[id_col].astype("int64"):
                w = 16 + int(aid) % 8
                h = 16 + int(aid) % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = ((3 * x + 7 * y + int(aid)) % 256).astype(np.uint8)
                form = int(aid) % 3
                if form == 0:
                    blob, mt = make_pgm(px), "image/x-portable-graymap"
                elif form == 1:
                    blob, mt = make_bmp_gray8(px), "image/bmp"
                else:
                    blob, mt = make_png(px), "image/png"
                out.append((int(aid), blob, mt))
            yield pd.DataFrame(out, columns=["asset_id", "blob", "media_type"])

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("blob", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return ids.select(F.col(id_col)).mapInPandas(synth, schema)


def resize_raw_images(
    assets: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """REAL nearest-neighbor resize over raw gray8 blobs (numpy index
    arithmetic per Arrow batch -- no codec needed): output pixel (r, c)
    samples source pixel (floor(r*h/out_h), floor(c*w/out_w)). Streaming
    mapInPandas iterator => constant memory per task however large the
    image partition is."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_out = np.arange(out_h, dtype=np.int64)
        cols_out = np.arange(out_w, dtype=np.int64)
        for pdf in batches:
            out = []
            for aid, blob, w, h in zip(
                pdf["asset_id"], pdf["blob"], pdf["width"], pdf["height"]
            ):
                arr = np.frombuffer(blob, dtype=np.uint8).reshape(int(h), int(w))
                r_idx = (rows_out * int(h)) // out_h
                c_idx = (cols_out * int(w)) // out_w
                resized = arr[r_idx][:, c_idx]
                out.append((int(aid), resized.tobytes(), out_w, out_h))
            yield pd.DataFrame(
                out, columns=["asset_id", "blob", "width", "height"]
            )

    return assets.mapInPandas(resize, RAW_IMAGE_SCHEMA)


# --- Real binary parsing: PNG header synthesis + dimension extraction. ----
# Unlike the stubbed feature decode above, this path needs no external
# library: a PNG's dimensions live at fixed offsets in the IHDR chunk
# (bytes 16..23, big-endian u32 pair), so parsing them is pure byte work --
# the realistic "cheap metadata pass over opaque media blobs" operator.

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

PNG_DIMS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def make_png_header(width: int, height: int) -> bytes:
    """Minimal valid PNG prefix: magic + IHDR chunk (length, type, w, h,
    bit depth 8, color type 2 (RGB), compression/filter/interlace 0).
    CRC omitted -- header parsers don't need it."""
    import struct

    ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
    return PNG_MAGIC + struct.pack(">I", 13) + b"IHDR" + ihdr


def synth_png_assets(docs: DataFrame) -> DataFrame:
    """Deterministic PNG-headered blobs from the documents fixture:
    width = 64 + doc_id % 960, height = 64 + (doc_id * 7) % 512. Arrow-
    batched synthesis (mapInPandas) -- the oracle re-derives the dims from
    doc_id, so round-tripping them through real bytes is an independent
    check of the binary plumbing."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "blob": [
                        make_png_header(int(64 + i % 960), int(64 + (i * 7) % 512))
                        for i in ids
                    ],
                    "media_type": "image/png",
                    "width": pd.Series([None] * len(ids), dtype="object"),
                    "height": pd.Series([None] * len(ids), dtype="object"),
                }
            )

    return docs.select("doc_id").mapInPandas(synth, ASSET_SCHEMA)


def png_dims(assets: DataFrame) -> DataFrame:
    """Parse width/height out of PNG blobs byte-wise (magic check + IHDR
    offsets 16..23). Looks only at the first 24 bytes of each blob --
    at scale, pair with a lazy/loaded-prefix blob source so tasks never
    materialize full media payloads for a metadata-only pass."""
    import struct

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h = [], []
            for b in pdf["blob"]:
                raw = bytes(b)
                if raw[:8] != PNG_MAGIC or raw[12:16] != b"IHDR":
                    out_w.append(-1)
                    out_h.append(-1)
                else:
                    w, h = struct.unpack(">II", raw[16:24])
                    out_w.append(w)
                    out_h.append(h)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "width": pd.Series(out_w, dtype="int64"),
                    "height": pd.Series(out_h, dtype="int64"),
                }
            )

    return assets.select("asset_id", "blob").mapInPandas(parse, PNG_DIMS_SCHEMA)


# --- Audio (WAV) -----------------------------------------------------------

WAV_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("bits", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def make_wav_header(sample_rate: int, n_samples: int, channels: int = 1,
                    bits: int = 16) -> bytes:
    """Minimal valid WAV (RIFF) header + empty data chunk declaration:
    RIFF/WAVE magic, fmt chunk (PCM, channels, rate, byte rate, block
    align, bits), data chunk size = n_samples * block_align. A parser needs
    only these 44 bytes -- real payloads would follow."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
    )


def synth_wav_assets(docs: DataFrame) -> DataFrame:
    """Deterministic WAV-headered blobs from the documents fixture:
    sample_rate = 8000 + (doc_id % 5) * 4000, n_samples = 1000 +
    (doc_id * 37) % 50000 -- the oracle re-derives both arithmetically, so
    parsing them back from bytes independently checks the binary path."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "blob": [
                        make_wav_header(
                            int(8000 + (i % 5) * 4000),
                            int(1000 + (i * 37) % 50000),
                        )
                        for i in ids
                    ],
                    "media_type": "audio/wav",
                    "width": pd.Series([None] * len(ids), dtype="object"),
                    "height": pd.Series([None] * len(ids), dtype="object"),
                }
            )

    return docs.select("doc_id").mapInPandas(synth, ASSET_SCHEMA)


def wav_meta(assets: DataFrame) -> DataFrame:
    """Parse sample rate / channels / bits / sample count / duration out of
    WAV blobs byte-wise (RIFF+fmt+data offsets). Reads only the 44-byte
    header per blob; duration_ms = n_samples * 1000 // sample_rate (exact
    integer arithmetic, engine-reproducible)."""
    import struct

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("sample_rate", "channels", "bits", "n_samples",
                     "duration_ms")}
            for b in pdf["blob"]:
                raw = bytes(b)
                if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                    for k in rows:
                        rows[k].append(-1)
                    continue
                _, channels, rate, _, block_align, bits = struct.unpack(
                    "<HHIIHH", raw[20:36]
                )
                data_size = struct.unpack("<I", raw[40:44])[0]
                n = data_size // block_align
                rows["sample_rate"].append(rate)
                rows["channels"].append(channels)
                rows["bits"].append(bits)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
            out = {"asset_id": pdf["asset_id"].astype("int64")}
            out.update({k: pd.Series(v, dtype="int64") for k, v in rows.items()})
            yield pd.DataFrame(out)

    return assets.select("asset_id", "blob").mapInPandas(parse, WAV_META_SCHEMA)
