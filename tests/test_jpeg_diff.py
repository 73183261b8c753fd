"""Behavioral pins for the differential JPEG frames
(operators/jpeg_diff.py -- SOF5/6/13/14/15) and their hierarchical
integration: per-kind round trips, encoder/decoder reference mirroring,
the final-lossless-correction exactness guarantee, frame slicing, and
the full base x diff_kind matrix."""

from __future__ import annotations

import numpy as np
import pytest

from hive_person_service_spark.operators.jpeg_diff import (
    decode_diff_frame,
    diff_frame_end,
    encode_diff_frame,
)
from hive_person_service_spark.operators.jpeg_hier import (
    decode_jpeg_hier_gray,
    encode_jpeg_hier_gray,
)

KINDS = ["lossless_arith", "dct", "dct_prog", "arith", "arith_prog"]


def _diff(h, w, seed, spread=40):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h, w)).astype(np.int64)
    target = np.clip(base + rng.randint(-spread, spread + 1, (h, w)), 0, 255)
    return target - base


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("dims", [(16, 24), (13, 9), (8, 8), (33, 17)])
def test_frame_roundtrip_matches_encoder_recon(kind, dims):
    """decode_diff_frame must reproduce EXACTLY what encode_diff_frame
    reported as the reconstruction (the property the hierarchical
    encoder relies on to mirror the decoder's reference)."""
    diff = _diff(*dims, seed=dims[0] * 100 + dims[1])
    frame, recon = encode_diff_frame(diff, kind, quality=90)
    assert diff_frame_end(frame, 0) == len(frame)
    got = decode_diff_frame(frame)
    assert np.array_equal(got, recon)
    if kind == "lossless_arith":
        assert np.array_equal(got, diff)
    else:
        assert np.abs(got - diff).mean() < 14  # lossy but close


def test_adjacent_frames_slice_cleanly():
    """Two back-to-back frames (each with its own leading DQT) must slice
    at the right boundary -- the second frame's tables are NOT absorbed
    into the first frame's slice."""
    d1 = _diff(16, 16, seed=1)
    d2 = _diff(16, 16, seed=2)
    f1, r1 = encode_diff_frame(d1, "dct_prog")
    f2, r2 = encode_diff_frame(d2, "arith_prog")
    blob = f1 + f2
    end1 = diff_frame_end(blob, 0)
    assert end1 == len(f1)
    assert np.array_equal(decode_diff_frame(blob[:end1]), r1)
    assert np.array_equal(decode_diff_frame(blob[end1:]), r2)


@pytest.mark.parametrize("base", ["lossless", "dct"])
@pytest.mark.parametrize(
    "dk", ["lossless", "lossless_arith", "dct", "dct_prog", "arith",
           "arith_prog"]
)
def test_hier_matrix_bit_exact(base, dk):
    """Every (initial frame, differential kind) combination decodes
    bit-exact: lossless kinds per stage, DCT kinds via the final
    lossless correction stage."""
    h, w = 33, 29
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    px = ((5 * x + 11 * y) % 256).astype(np.uint8)
    raw = encode_jpeg_hier_gray(px, levels=3, base=base, diff_kind=dk)
    assert np.array_equal(decode_jpeg_hier_gray(raw), px)


def test_dct_stage_is_really_lossy_and_correction_fixes_it():
    """The SOF5 mid-pyramid stage must be LOSSY (otherwise the final
    correction pin is vacuous): truncating the stream before the final
    SOF7 frame decodes to a close-but-not-equal image."""
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    raw = encode_jpeg_hier_gray(px, levels=2, base="lossless",
                                diff_kind="dct")
    # drop the last differential frame (the SOF7 correction): find the
    # final 0xFFC7 marker and cut there, re-terminating the stream
    cut = raw.rfind(b"\xff\xc7")
    assert cut > 0
    partial = raw[:cut] + b"\xff\xd9"
    approx = decode_jpeg_hier_gray(partial).astype(np.int64)
    assert not np.array_equal(approx, px)  # lossy stage observable
    assert np.abs(approx - px).mean() < 16  # but a real refinement
    assert np.array_equal(decode_jpeg_hier_gray(raw), px)  # corrected


def test_unknown_kind_gates():
    with pytest.raises(ValueError, match="unknown differential frame kind"):
        encode_diff_frame(np.zeros((8, 8), dtype=np.int64), "nope")
    with pytest.raises(ValueError, match="unknown differential frame kind"):
        encode_jpeg_hier_gray(
            np.zeros((16, 16), dtype=np.uint8), diff_kind="nope"
        )
