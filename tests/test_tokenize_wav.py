"""Tests for the BPE tokenizer and WAV-header multimodal operators
(rows-only surfaces: pytest is their correctness gate)."""

from __future__ import annotations

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.multimodal import (
    make_wav_header,
    synth_wav_assets,
    wav_meta,
)
from hive_person_service_spark.operators.tokenize import (
    bpe_encode,
    bpe_encode_text,
    bpe_encode_word,
)
from hive_person_service_spark.sources import load_table


def test_bpe_merges_fire():
    # 'the' fully merges (t+h -> th, th+e -> the); 'scan' -> sc+an -> scan
    assert bpe_encode_word("the") == ["the"]
    assert bpe_encode_word("scan") == ["scan"]
    assert bpe_encode_word("value") == ["value"]
    # un-merged words fall back to characters (greedy, never fails)
    assert bpe_encode_word("xyz") == ["x", "y", "z"]
    # lowest-rank-first greediness: 'and' merges a+n (rank 2) before n+d,
    # then an+d (rank 19) -> single token
    assert bpe_encode_word("and") == ["and"]


def test_bpe_spark_matches_reference(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(100)
    got = {r.doc_id: r for r in bpe_encode(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        ids = bpe_encode_text(row.text)
        r = got[row.doc_id]
        assert r.n_bpe_tokens == len(ids)
        assert r.preview_ids == "-".join(str(i) for i in ids[:12])
        # BPE never produces more tokens than characters
        assert r.n_bpe_tokens <= r.n_chars


def test_wav_header_roundtrip_spark(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(64)
    meta = {r.asset_id: r for r in wav_meta(synth_wav_assets(docs)).collect()}
    assert len(meta) == 64
    for i, r in meta.items():
        rate = 8000 + (i % 5) * 4000
        n = 1000 + (i * 37) % 50000
        assert (r.sample_rate, r.channels, r.bits) == (rate, 1, 16)
        assert r.n_samples == n
        assert r.duration_ms == n * 1000 // rate


def test_wav_parser_rejects_garbage(spark):
    import pandas as pd

    from hive_person_service_spark.operators.multimodal import ASSET_SCHEMA

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "blob": [b"not a wav at all", make_wav_header(16000, 100)],
                "media_type": ["audio/wav"] * 2,
                "width": pd.Series([None, None], dtype="object"),
                "height": pd.Series([None, None], dtype="object"),
            }
        ),
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in wav_meta(bad).collect()}
    assert rows[1].sample_rate == -1  # flagged, not crashed
    assert rows[2].sample_rate == 16000 and rows[2].n_samples == 100


def test_image_codecs_round_trip():
    """PGM and BMP encoders/decoders are mutually consistent, including
    odd widths (BMP 4-byte row padding) and bottom-up row order."""
    import numpy as np

    from hive_person_service_spark.operators.multimodal import (
        decode_image,
        make_bmp_gray8,
        make_pgm,
    )

    rng = np.random.RandomState(3)
    for w, h in [(16, 16), (17, 5), (1, 1), (21, 3)]:
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        assert np.array_equal(decode_image(make_pgm(px)), px), (w, h)
        assert np.array_equal(decode_image(make_bmp_gray8(px)), px), (w, h)


def test_decode_image_ppm_and_bmp24_luma():
    """P6 PPM and 24-bit BMP reduce RGB with the integer luma formula."""
    import struct

    import numpy as np

    from hive_person_service_spark.operators.multimodal import decode_image

    rgb = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
                   dtype=np.uint8)
    h, w = 2, 2
    want = (
        299 * rgb[..., 0].astype(np.int64)
        + 587 * rgb[..., 1].astype(np.int64)
        + 114 * rgb[..., 2].astype(np.int64)
    ) // 1000
    ppm = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    assert np.array_equal(decode_image(ppm), want)

    # hand-rolled 24-bit BMP: BGR order, bottom-up, rows padded to 4 bytes
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    pixel_offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pixel_offset + row_bytes * h, 0, 0,
                                 pixel_offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h,
                       2835, 2835, 0, 0)
    assert np.array_equal(decode_image(header + info + rows.tobytes()), want)


def test_decode_image_codec_gate():
    """The codec gate is CLOSED (r4): all four containers decode for
    real. Malformed streams and recognized-but-unsupported JPEG variants
    raise ValueError with precise messages; junk raises ValueError."""
    import pytest

    from hive_person_service_spark.operators.multimodal import decode_image

    with pytest.raises(ValueError):  # JPEG magic, garbage body
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_image(b"GARBAGE!")


def test_jpeg_roundtrip_and_variant_errors():
    """Baseline grayscale JPEG codec (operators/jpeg.py): uniform image
    round-trips exactly (DC-only), smooth images stay within a tight
    error bound across sizes/qualities, the stream opens through
    decode_image's magic dispatch, and non-baseline variants raise
    precisely."""
    import numpy as np
    import pytest

    from hive_person_service_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )
    from hive_person_service_spark.operators.multimodal import decode_image

    flat = np.full((16, 24), 77, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_jpeg_gray(flat, 90)), flat)

    for h, w, q, bound in [(8, 8, 90, 4), (17, 23, 85, 6), (64, 48, 75, 9),
                           (33, 41, 95, 3)]:
        yy, xx = np.mgrid[0:h, 0:w]
        px = (128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).clip(
            0, 255
        ).astype(np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(px, q))
        assert dec.shape == (h, w)
        err = np.abs(dec.astype(int) - px.astype(int))
        assert err.max() <= bound, (h, w, q, err.max())

    good = encode_jpeg_gray(flat, 90)
    # every named frame type now routes (SOF9/10/11, DHP sequences); a
    # baseline scan mislabeled SOF11 dies precisely inside that decoder
    # (its SOS carries predictor selector 0, invalid for lossless)
    with pytest.raises(ValueError, match="predictor 0 out of range"):
        decode_jpeg_gray(good.replace(b"\xff\xc0", b"\xff\xcb", 1))
    with pytest.raises(ValueError, match="hierarchical"):
        decode_jpeg_gray(good.replace(b"\xff\xc0", b"\xff\xc5", 1))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01" + good[2:])
    # a baseline SCAN mislabeled as a progressive frame is rejected, not
    # misdecoded (progressive DC scans must have Se=0)
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg_gray(good.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_jpeg_progressive_identical_to_baseline():
    """Progressive (SOF2) decode: the multi-scan successive-approximation
    script carries exactly the baseline encoder's quantized coefficients,
    so decoded output must be BIT-IDENTICAL to decoding the baseline
    stream -- across block counts, non-multiple-of-8 edges, qualities,
    smooth images (long cross-block EOB runs) and noise (dense
    refinement traffic)."""
    import numpy as np

    from hive_person_service_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )
    from hive_person_service_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(42)
    for h, w, q in [(8, 8, 90), (16, 16, 90), (21, 37, 85), (64, 48, 75),
                    (33, 41, 95)]:
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        px = ((3 * x + 7 * y) % 256).astype(np.uint8)
        prog = encode_jpeg_progressive_gray(px, q)
        assert b"\xff\xc2" in prog  # really SOF2
        assert np.array_equal(
            decode_jpeg_gray(prog), decode_jpeg_gray(encode_jpeg_gray(px, q))
        ), (h, w, q)
    # long EOB runs: nearly-empty spectrum across many blocks
    px = np.full((64, 64), 128, dtype=np.uint8)
    px[10, 10] = 200
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_progressive_gray(px, 90)),
        decode_jpeg_gray(encode_jpeg_gray(px, 90)),
    )
    # noise: every refinement path busy
    px = rng.randint(0, 256, (48, 56)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_progressive_gray(px, 60)),
        decode_jpeg_gray(encode_jpeg_gray(px, 60)),
    )
    # magic dispatch routes progressive blobs too
    flat = np.full((16, 24), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_image(encode_jpeg_progressive_gray(flat, 90)), flat
    )


def test_jpeg_progressive_randomized_identity():
    """Randomized sweep: 20 random (shape, quality, content) combinations
    must all decode progressive == baseline bit-exactly -- cheap insurance
    over the refinement/EOB-run coder's state machine."""
    import numpy as np

    from hive_person_service_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    rng = np.random.RandomState(1234)
    for trial in range(20):
        h = int(rng.randint(8, 70))
        w = int(rng.randint(8, 70))
        q = int(rng.choice([35, 60, 80, 92]))
        kind = trial % 3
        if kind == 0:
            px = rng.randint(0, 256, (h, w)).astype(np.uint8)
        elif kind == 1:  # smooth gradient (long EOB runs)
            px = (
                (np.arange(h)[:, None] * 2 + np.arange(w)[None, :]) % 256
            ).astype(np.uint8)
        else:  # mostly flat with sparse spikes (ZRL + refinement mixes)
            px = np.full((h, w), 100, dtype=np.uint8)
            for _ in range(5):
                px[rng.randint(h), rng.randint(w)] = rng.randint(0, 256)
        a = decode_jpeg_gray(encode_jpeg_gray(px, q))
        b = decode_jpeg_gray(encode_jpeg_progressive_gray(px, q))
        assert np.array_equal(a, b), (trial, h, w, q, kind)


def test_jpeg_progressive_color_luma():
    """Progressive 4:2:0 color: interleaved DC scans + per-component AC
    band scans; luma reconstruction identical to the baseline color
    stream's at the same quality."""
    import numpy as np

    from hive_person_service_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_progressive_color,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (33, 46, 3)).astype(np.uint8)
    prog = encode_jpeg_progressive_color(rgb, 85)
    assert b"\xff\xc2" in prog
    a = decode_jpeg_gray(prog)
    b = decode_jpeg_gray(encode_jpeg_color(rgb, 85))
    assert a.shape == (33, 46)
    assert np.array_equal(a, b)
    # and the luma error vs the ideal BT.601 plane stays bounded
    r, g, bl = (rgb[..., k].astype(np.float64) for k in range(3))
    ideal = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * bl), 0, 255)
    assert np.abs(a.astype(int) - ideal.astype(int)).mean() < 12


def test_png_roundtrip_gray_and_rgb():
    """make_png -> _decode_png round-trips gray exactly; RGB reduces with
    the shared integer luma (same formula as PPM/BMP24)."""
    import numpy as np

    from hive_person_service_spark.operators.multimodal import (
        decode_image,
        make_png,
    )

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (5, 3), (17, 11), (64, 48)]:
        px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(decode_image(make_png(px)), px), (w, h)
    rgb = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    r, g, b = (rgb[..., k].astype(np.int64) for k in range(3))
    want = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    assert np.array_equal(decode_image(make_png(rgb, color_type=2)), want)


def test_png_all_filter_types_unfilter():
    """Hand-construct a PNG whose rows use filters 0..4 (our encoder only
    emits 0; external PNGs use all five) and check exact reconstruction
    against a reference per-byte unfilter."""
    import struct
    import zlib

    import numpy as np

    from hive_person_service_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_image,
    )

    rng = np.random.RandomState(11)
    h, w = 5, 16
    px = rng.randint(0, 256, size=(h, w), dtype=np.uint8)

    # forward-filter each row with its row-index filter type (bpp=1)
    lines = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        row = px[y].astype(np.int64)
        f = y % 5
        out = np.empty(w, dtype=np.int64)
        for x in range(w):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[x] = (row[x] - pred) % 256
        lines.append(f)
        lines += out.astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 0])
    blob = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_image(blob), px)


def test_resize_images_decodes_both_containers(spark):
    """resize_images over mixed PGM/BMP/PNG assets equals resize_raw_images
    over the raw pixels -- the decode step is lossless for gray8."""
    from hive_person_service_spark.operators.multimodal import (
        resize_images,
        resize_raw_images,
        synth_encoded_images,
        synth_raw_images,
    )

    ids = spark.range(0, 40).selectExpr("id AS asset_id")
    via_codec = {
        r.asset_id: bytes(r.blob)
        for r in resize_images(synth_encoded_images(ids), 8, 8).collect()
    }
    via_raw = {
        r.asset_id: bytes(r.blob)
        for r in resize_raw_images(synth_raw_images(ids), 8, 8).collect()
    }
    assert via_codec == via_raw
    assert len(via_codec) == 40


def test_jpeg_color_mcu_walk_extracts_luma():
    """A baseline 4:2:0 COLOR JPEG (interleaved MCUs, chroma tables)
    decodes through the same decode_jpeg_gray entry point: the MCU walk
    must keep the bitstream in sync across Y/Cb/Cr blocks and return the
    luma plane within a tight bound of the direct BT.601 luma."""
    import numpy as np

    from hive_person_service_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_color,
    )
    from hive_person_service_spark.operators.multimodal import decode_image

    for h, w in [(16, 16), (24, 40), (33, 41)]:
        yy, xx = np.mgrid[0:h, 0:w]
        rgb = np.stack(
            [
                (128 + 100 * np.sin(xx / 6.0)).clip(0, 255),
                (128 + 90 * np.cos(yy / 5.0)).clip(0, 255),
                (xx * 3 + yy * 2) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        blob = encode_jpeg_color(rgb, 90)
        dec = decode_image(blob)  # magic dispatch
        r, g, b = (rgb[..., k].astype(np.float64) for k in range(3))
        want = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        err = np.abs(dec.astype(np.float64) - want)
        assert dec.shape == (h, w)
        assert err.max() <= 4, (h, w, err.max())
