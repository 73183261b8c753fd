"""Pins for the arithmetic-coded JPEG path (operators/jpeg_arith.py).

No arithmetic-capable codec or T.81 test vector ships in this
container, so the pins are the strongest properties available offline:

* encode->decode is BIT-IDENTICAL to the Huffman baseline decoder's
  pixels (both entropy layers sit on the same quantized coefficients,
  so any coder/model asymmetry breaks the identity);
* the QM coder is near-entropy on skewed binary sources -- only a
  correctly-adapting Table D.3 walk delivers that (a transposed or
  corrupted state machine still round-trips but blows the size up;
  that exact failure mode was caught by this bound during development);
* arithmetic output is smaller than Huffman on realistic images (the
  known ~10-25 % advantage of the adaptive coder);
* Table D.3 structural invariants, FF->FF00 stuffing framing, restart
  resets, and the precise remaining gates.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from hive_person_service_spark.operators.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from hive_person_service_spark.operators.jpeg_arith import (
    _QM,
    _ArithDecoder,
    _ArithEncoder,
    decode_jpeg_arith_gray,
    encode_jpeg_arith_gray,
)


def _image(h, w, seed=42):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128 + 80 * np.sin(yy / 9) + 60 * np.cos(xx / 7)
        + rng.normal(0, 12, (h, w))
    ).clip(0, 255).astype(np.uint8)


def test_qm_table_invariants():
    assert len(_QM) == 114
    for i, (qe, nlps, nmps, sw) in enumerate(_QM):
        assert 1 <= qe <= 0x5B12
        assert 0 <= nlps <= 113 and 0 <= nmps <= 113
        if sw:
            assert qe > 0x5000  # switches only exist near p=0.5
    # the MPS chain from the start state reaches the max-skew terminal
    # (state 13, Qe=1, NMPS self-loop) -- broken transitions can't
    i = 0
    for _ in range(120):
        i = _QM[i][2]
    assert i == 13 and _QM[13][2] == 13 and _QM[13][0] == 1
    # fast-attack spine: the five initial switch states chain upward
    assert [s for s, row in enumerate(_QM[:113]) if row[3] == 1] == [
        0, 14, 36, 64, 80, 88, 95, 105, 110, 112
    ]
    # the fixed bin never adapts
    assert _QM[113][1] == 113 and _QM[113][2] == 113 and _QM[113][3] == 0


def test_qm_coder_roundtrip_and_efficiency():
    random.seed(3)
    for p in (0.5, 0.1, 0.02):
        syms = [1 if random.random() < p else 0 for _ in range(8000)]
        st = bytearray(1)
        enc = _ArithEncoder()
        for s in syms:
            enc.encode(st, 0, s)
        data = enc.finish()
        st2 = bytearray(1)
        dec = _ArithDecoder(data, 0)
        assert [dec.decode(st2, 0) for _ in range(8000)] == syms
        entropy_bytes = 8000 * -(
            p * math.log2(p) + (1 - p) * math.log2(1 - p)
        ) / 8
        assert len(data) < entropy_bytes * 1.25 + 16  # near-entropy


def test_qm_multi_bin_roundtrip():
    random.seed(11)
    for _ in range(40):
        nbins = random.randint(2, 8)
        bins = [random.randrange(nbins) for _ in range(1500)]
        ps = [random.random() for _ in range(nbins)]
        syms = [1 if random.random() < ps[b] else 0 for b in bins]
        st = bytearray(nbins)
        enc = _ArithEncoder()
        for b, s in zip(bins, syms):
            enc.encode(st, b, s)
        data = enc.finish()
        st2 = bytearray(nbins)
        dec = _ArithDecoder(data, 0)
        assert [dec.decode(st2, b) for b in bins] == syms


@pytest.mark.parametrize("hw", [(8, 8), (16, 24), (33, 41), (64, 64)])
@pytest.mark.parametrize("q", [30, 60, 90])
def test_arith_decode_identical_to_huffman(hw, q):
    px = _image(*hw)
    d_h = decode_jpeg_gray(encode_jpeg_gray(px, q))
    d_a = decode_jpeg_arith_gray(encode_jpeg_arith_gray(px, q))
    assert np.array_equal(d_h, d_a)


def test_arith_route_through_main_decoder():
    """decode_jpeg_gray recognizes SOF9 and routes to the QM decoder."""
    px = _image(40, 56)
    raw = encode_jpeg_arith_gray(px, 75)
    assert np.array_equal(
        decode_jpeg_gray(raw), decode_jpeg_arith_gray(raw)
    )


def test_arith_beats_huffman_on_real_images():
    tot_h = tot_a = 0
    for seed in (1, 2, 3):
        px = _image(96, 120, seed)
        for q in (50, 85):
            tot_h += len(encode_jpeg_gray(px, q))
            tot_a += len(encode_jpeg_arith_gray(px, q))
    assert tot_a < tot_h  # the adaptive-coder advantage


def test_ff_stuffing_framing():
    """Entropy segment never contains a bare 0xFF-nonzero pair."""
    px = _image(64, 64, 7)
    raw = encode_jpeg_arith_gray(px, 90)
    sos = raw.find(b"\xff\xda")
    scan = raw[sos + 2 + int.from_bytes(raw[sos + 2:sos + 4], "big"): -2]
    i = 0
    while i < len(scan) - 1:
        if scan[i] == 0xFF:
            assert scan[i + 1] == 0x00, f"bare FF {scan[i+1]:02x} at {i}"
            i += 2
        else:
            i += 1


def test_restart_interval_reset():
    px = _image(80, 80, 5)
    plain = encode_jpeg_arith_gray(px, 70)
    rst = encode_jpeg_arith_gray(px, 70, restart_interval=4)
    assert b"\xff\xd0" in rst or b"\xff\xd1" in rst
    a = decode_jpeg_arith_gray(plain)
    b = decode_jpeg_arith_gray(rst)
    assert np.array_equal(a, b)
    assert np.array_equal(a, decode_jpeg_gray(encode_jpeg_gray(px, 70)))


@pytest.mark.parametrize("hw", [(16, 16), (40, 56), (33, 17), (8, 8)])
@pytest.mark.parametrize("q", [50, 85, 95])
def test_progressive_arith_identical_to_sequential(hw, q):
    """SOF10 encode->decode reproduces EXACTLY the sequential SOF9
    stream's pixels at the same quality: identical quantized
    coefficients, different scan structure + entropy layer. Any model
    mismatch (EOBx rule, correction-bit context, fixed-state signs)
    desyncs the QM coder and corrupts every later block, so bit-equality
    here pins the whole Annex-G.2 model."""
    from hive_person_service_spark.operators.jpeg_arith import (
        decode_jpeg_arith_progressive_gray,
        encode_jpeg_arith_progressive_gray,
    )

    px = _image(*hw, seed=sum(hw) + q)
    seq = decode_jpeg_arith_gray(encode_jpeg_arith_gray(px, q))
    prog = decode_jpeg_arith_progressive_gray(
        encode_jpeg_arith_progressive_gray(px, q)
    )
    assert np.array_equal(seq, prog)


def test_progressive_arith_routes_through_main_decoder():
    from hive_person_service_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive_gray,
    )

    px = _image(24, 24, seed=3)
    raw = encode_jpeg_arith_progressive_gray(px, 85)
    assert b"\xff\xca" in raw  # SOF10 frame
    assert raw.count(b"\xff\xda") == 8  # DC first+refine, 2 bands x 3 levels
    seq = decode_jpeg_arith_gray(encode_jpeg_arith_gray(px, 85))
    assert np.array_equal(decode_jpeg_gray(raw), seq)


def test_progressive_arith_flat_and_extreme():
    from hive_person_service_spark.operators.jpeg_arith import (
        decode_jpeg_arith_progressive_gray,
        encode_jpeg_arith_progressive_gray,
    )

    for px in (
        np.zeros((16, 24), dtype=np.uint8),
        np.full((16, 24), 255, dtype=np.uint8),
        np.tile(np.array([0, 255] * 12, dtype=np.uint8), (16, 1)),
    ):
        seq = decode_jpeg_arith_gray(encode_jpeg_arith_gray(px, 75))
        prog = decode_jpeg_arith_progressive_gray(
            encode_jpeg_arith_progressive_gray(px, 75)
        )
        assert np.array_equal(seq, prog)


def test_lossless_arithmetic_now_routes():
    """SOF11 is implemented (round 6): decode_jpeg_gray dispatches it to
    the Annex-H.2 decoder. A bogus SOF11 header (an SOF9 stream with the
    marker flipped: DCT scan, predictor selector 0 in SOS) still dies
    with a PRECISE error from that decoder, not a crash."""
    px = _image(16, 16)
    from hive_person_service_spark.operators.jpeg_arith import (
        decode_jpeg_arith_lossless_gray,
        encode_jpeg_arith_lossless_gray,
    )

    raw = encode_jpeg_arith_lossless_gray(px)
    assert np.array_equal(decode_jpeg_gray(raw), px)
    assert np.array_equal(decode_jpeg_arith_lossless_gray(raw), px)
    bogus = bytearray(encode_jpeg_arith_gray(px, 80))
    i = bogus.find(b"\xff\xc9")
    bogus[i + 1] = 0xCB
    with pytest.raises(ValueError, match="predictor 0 out of range"):
        decode_jpeg_gray(bytes(bogus))


def test_flat_and_extreme_images():
    for px in (
        np.full((24, 24), 128, np.uint8),
        np.zeros((17, 9), np.uint8),
        np.full((9, 17), 255, np.uint8),
        (np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8),  # checker
    ):
        for q in (25, 95):
            d_h = decode_jpeg_gray(encode_jpeg_gray(px, q))
            d_a = decode_jpeg_arith_gray(encode_jpeg_arith_gray(px, q))
            assert np.array_equal(d_h, d_a)


# --- lossless (SOF3) pins: exact roundtrip is the strongest possible ---

from hive_person_service_spark.operators.jpeg import (  # noqa: E402
    encode_jpeg_lossless_gray,
)


def test_lossless_exact_roundtrip_all_predictors():
    rng = np.random.default_rng(3)
    for hw in [(1, 1), (5, 3), (16, 24), (48, 64)]:
        px = rng.integers(0, 256, hw, dtype=np.uint8)
        for pred in range(1, 8):
            raw = encode_jpeg_lossless_gray(px, predictor=pred)
            assert np.array_equal(decode_jpeg_gray(raw), px), (hw, pred)


def test_lossless_compresses_smooth_images():
    yy, xx = np.mgrid[0:64, 0:64]
    px = (128 + 60 * np.sin(yy / 9) + 50 * np.cos(xx / 7)).clip(
        0, 255
    ).astype(np.uint8)
    raw = encode_jpeg_lossless_gray(px, predictor=4)
    assert len(raw) < 64 * 64 * 0.6  # prediction removes most entropy
    assert np.array_equal(decode_jpeg_gray(raw), px)


def test_lossless_point_transform_and_restarts():
    px = _image(40, 56, 9)
    for pt in (1, 2):
        dec = decode_jpeg_gray(encode_jpeg_lossless_gray(px, 4, pt=pt))
        assert np.array_equal(dec, (px >> pt) << pt)
    raw = encode_jpeg_lossless_gray(px, predictor=7, restart_interval=64)
    assert b"\xff\xd0" in raw
    assert np.array_equal(decode_jpeg_gray(raw), px)


def test_lossless_gates():
    px = _image(16, 16)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless_gray(px, predictor=0)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless_gray(px, predictor=8)


def test_sof1_extended_sequential_decodes_as_baseline():
    """SOF1 only lifts baseline's table/precision limits; an 8-bit SOF1
    stream decodes identically on the baseline path. Hierarchical frames
    keep their precise gate (the same gate libjpeg keeps)."""
    from hive_person_service_spark.operators.jpeg import encode_jpeg_gray

    px = _image(24, 40, seed=5)
    raw = bytearray(encode_jpeg_gray(px, 85))
    ref = decode_jpeg_gray(bytes(raw))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC1  # SOF0 -> SOF1
    assert np.array_equal(decode_jpeg_gray(bytes(raw)), ref)
    raw[i + 1] = 0xC5  # differential (hierarchical) frame
    with pytest.raises(ValueError, match="hierarchical"):
        decode_jpeg_gray(bytes(raw))
