"""Pins for the LAST two T.81 coding processes: hierarchical (Annex J,
DHP/EXP + SOF7 differential refinements — operators/jpeg_hier.py) and
lossless arithmetic (SOF11, Annex H.2 — operators/jpeg_arith.py).

With these, every frame type the repo emits round-trips through
decode_jpeg_gray's dispatch: SOF0/1/2/3, hierarchical DHP sequences, and
the three arithmetic processes SOF9/10/11. The remaining gates
(differential DCT SOF5/6, differential arithmetic SOF13-15) stay precise
ValueErrors.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_person_service_spark.operators.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_lossless_gray,
)
from hive_person_service_spark.operators.jpeg_arith import (
    decode_jpeg_arith_lossless_gray,
    encode_jpeg_arith_lossless_gray,
)
from hive_person_service_spark.operators.jpeg_hier import (
    _up2,
    decode_jpeg_hier_gray,
    encode_jpeg_hier_gray,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    smooth = (
        np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 256
    ).astype(np.int64)
    noise = rng.integers(-12, 13, (h, w))
    return np.clip(smooth + noise, 0, 255).astype(np.uint8)


# -- hierarchical ------------------------------------------------------------


def test_up2_golden_vectors():
    # even out = input, odd out = (left + right + 1) >> 1, edge replicated
    assert _up2(np.array([[0, 10]]), 1, 4).tolist() == [[0, 5, 10, 10]]
    assert _up2(np.array([[0, 10]]), 1, 3).tolist() == [[0, 5, 10]]
    assert _up2(np.array([[7]]), 1, 2).tolist() == [[7, 7]]
    got = _up2(np.array([[1, 3], [5, 9]]), 4, 4)
    assert got.tolist() == [
        [1, 2, 3, 3],
        [3, 5, 6, 6],
        [5, 7, 9, 9],
        [5, 7, 9, 9],
    ]


@pytest.mark.parametrize("base", ["lossless", "dct"])
@pytest.mark.parametrize("hw", [(1, 1), (5, 7), (16, 16), (23, 31), (40, 64)])
def test_hierarchical_roundtrip_bit_exact(hw, base):
    """Both pyramid arrangements end bit-exact: fully-lossless (SOF3
    initial) trivially, and lossy-base (SOF0 initial) because the final
    SOF7 differential stage corrects the upsampled lossy reference to the
    original samples."""
    px = _img(*hw, seed=hw[0] * 100 + hw[1])
    raw = encode_jpeg_hier_gray(px, levels=2, base=base)
    assert np.array_equal(decode_jpeg_hier_gray(raw), px)
    # and through the frame dispatch of the main decoder
    assert np.array_equal(decode_jpeg_gray(raw), px)


def test_hierarchical_multi_level_exact():
    px = _img(37, 53, seed=9)
    for levels in (2, 3, 4):
        raw = encode_jpeg_hier_gray(px, levels=levels, base="lossless")
        assert np.array_equal(decode_jpeg_hier_gray(raw), px), levels


def test_hierarchical_stream_structure():
    px = _img(16, 16, seed=1)
    raw = encode_jpeg_hier_gray(px, levels=2, base="lossless")
    assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    assert b"\xff\xde" in raw  # DHP
    assert b"\xff\xdf" in raw  # EXP
    assert b"\xff\xc7" in raw  # SOF7 differential frame
    assert b"\xff\xc3" in raw  # SOF3 initial frame


def test_hierarchical_determinism():
    px = _img(24, 24, seed=5)
    a = encode_jpeg_hier_gray(px, levels=3, base="dct")
    b = encode_jpeg_hier_gray(px, levels=3, base="dct")
    assert a == b


def test_differential_gates_are_precise():
    px = _img(16, 16, seed=2)
    # SOF5-15 differential frames are SUPPORTED since round 6
    # (tests/test_jpeg_diff.py pins each kind); the remaining precise
    # gates are a differential frame with no hierarchical context and
    # multi-component differential frames
    naked = encode_jpeg_lossless_gray(px)
    naked = naked.replace(b"\xff\xc3", b"\xff\xc7", 1)
    with pytest.raises(ValueError, match="hierarchical"):
        decode_jpeg_gray(naked)
    from hive_person_service_spark.operators.jpeg_diff import (
        decode_diff_frame,
        encode_diff_frame,
    )

    frame = bytearray(
        encode_diff_frame(np.zeros((8, 8), dtype=np.int64), "dct")[0]
    )
    i = frame.find(b"\xff\xc5")
    frame[i + 9] = 3  # SOF component count -> 3
    with pytest.raises(ValueError, match="multi-component"):
        decode_diff_frame(bytes(frame))


def test_dhp_dimension_check():
    px = _img(16, 16, seed=3)
    raw = bytearray(encode_jpeg_hier_gray(px, levels=2, base="lossless"))
    i = raw.find(b"\xff\xde")
    raw[i + 5] = 0xFF  # corrupt DHP full-height
    with pytest.raises(ValueError, match="DHP declared"):
        decode_jpeg_hier_gray(bytes(raw))


# -- lossless arithmetic (SOF11) --------------------------------------------


@pytest.mark.parametrize("pred", list(range(1, 8)))
def test_sof11_roundtrip_every_predictor(pred):
    px = _img(21, 17, seed=pred)
    raw = encode_jpeg_arith_lossless_gray(px, predictor=pred)
    assert np.array_equal(decode_jpeg_arith_lossless_gray(raw), px)
    assert np.array_equal(decode_jpeg_gray(raw), px)  # dispatch


def test_sof11_point_transform():
    px = _img(16, 16, seed=11)
    raw = encode_jpeg_arith_lossless_gray(px, predictor=4, pt=2)
    back = decode_jpeg_arith_lossless_gray(raw)
    assert np.array_equal(back, (px >> 2) << 2)  # low bits discarded


def test_sof11_beats_huffman_lossless_on_smooth_images():
    px = _img(64, 64, seed=4)
    a = encode_jpeg_arith_lossless_gray(px)
    hf = encode_jpeg_lossless_gray(px)
    assert len(a) < len(hf)


@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_sof11_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w), dtype=np.uint8)
    raw = encode_jpeg_arith_lossless_gray(px, predictor=1 + seed % 7)
    assert np.array_equal(decode_jpeg_arith_lossless_gray(raw), px)


def test_sof11_structure_and_gates():
    px = _img(8, 8, seed=6)
    raw = encode_jpeg_arith_lossless_gray(px)
    assert b"\xff\xcb" in raw  # SOF11
    assert b"\xff\xcc" in raw  # DAC conditioning
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_arith_lossless_gray(px, predictor=0)
