"""Hierarchical JPEG (T.81 Annex J) in pure numpy/stdlib — the LAST T.81
coding process behind a gate: a DHP-headed pyramid of frames where each
stage refines an upsampled reference.

Implements the public spec only (ITU-T T.81 / ISO 10918-1 Annex J):

  * DHP (0xFFDE, "define hierarchical progression"): SOF-syntax header
    carrying the FULL-resolution dimensions the pyramid converges to.
  * EXP (0xFFDF): expand the reference component by 2 horizontally and/or
    vertically before the next differential frame, with the J.1.1.3
    interpolation filter — even output sample = input sample, odd output
    sample = (left + right + 1) >> 1 with edge replication; output
    cropped to the next frame's dimensions (2d or 2d-1).
  * Non-differential INITIAL frame: lossless SOF3 (fully lossless
    pyramid) or baseline SOF0 (lossy base, the common "thumbnail first"
    arrangement) at the smallest pyramid level.
  * Differential LOSSLESS frames (SOF7): per-sample differences between
    the stage image and the upsampled reference, coded modulo 2^16 with
    the H.1 Huffman category alphabet (0..16, 16 = diff 32768) and NO
    predictor (differential frames set Ss=0 — the reference IS the
    prediction). A final SOF7 stage makes the whole stream bit-exact
    regardless of the initial frame's lossiness, which is the property
    the tests pin.

Downsampling (an encoder-side choice the spec deliberately leaves open,
J.1.1.2 note) is 2x decimation: level k+1 = level k's even rows/columns,
dims ceil(d/2) — deterministic, so identical inputs yield identical
archives.

Round 6 closes the last frame-type gates: differential DCT frames
(SOF5/SOF6 Huffman, SOF13/SOF14 arithmetic — lossy mid-pyramid
refinements, reference clamped to sample range, with a final lossless
correction stage keeping full-stream decode bit-exact) and differential
lossless arithmetic frames (SOF15) live in jpeg_diff.py and are selected
by ``encode_jpeg_hier_gray(diff_kind=...)``. Every T.81 frame family the
spec defines (SOF0-3, 5-7, 9-11, 13-15) now encodes AND decodes in-repo.

Like every codec here this runs as a per-blob function inside
Arrow-batched pandas UDFs on executors, never in a relational hot path.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    _LL_CODES,
    _BitReader,
    _BitWriter,
    _build_decode_map,
    _entropy_end,
    _extend,
    _magnitude,
    _read_huff,
    _seg,
    decode_jpeg_gray,
    encode_jpeg_gray,
    encode_jpeg_lossless_gray,
)

_DHP = 0xFFDE
_EXP = 0xFFDF
_SOF7 = 0xFFC7

# Huffman table bytes for the lossless/differential category alphabet,
# shared with the SOF3 encoder (jpeg.py builds _LL_CODES from these).
from .jpeg import _LL_BITS, _LL_VALS  # noqa: E402


def _down2(px: np.ndarray) -> np.ndarray:
    """Encoder-side 2x decimation (J.1.1.2 leaves the filter open)."""
    return px[::2, ::2]


def _up2(ref: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """J.1.1.3 expansion to (oh, ow), each axis doubled independently:
    out[2i] = in[i]; out[2i+1] = (in[i] + in[i+1] + 1) >> 1 (edge
    replicated), cropped to the target dimension (2d or 2d-1)."""
    h, w = ref.shape
    r = ref.astype(np.int64)
    if ow > w:
        nxt = np.concatenate([r[:, 1:], r[:, -1:]], axis=1)
        odd = (r + nxt + 1) >> 1
        wide = np.empty((h, 2 * w), dtype=np.int64)
        wide[:, 0::2] = r
        wide[:, 1::2] = odd
        r = wide[:, :ow]
    elif ow != w:
        raise ValueError(f"EXP width mismatch: {w} -> {ow}")
    if oh > h:
        nxt = np.concatenate([r[1:, :], r[-1:, :]], axis=0)
        odd = (r + nxt + 1) >> 1
        tall = np.empty((2 * r.shape[0], r.shape[1]), dtype=np.int64)
        tall[0::2, :] = r
        tall[1::2, :] = odd
        r = tall[:oh, :]
    elif oh != h:
        raise ValueError(f"EXP height mismatch: {h} -> {oh}")
    return r


def _diff_scan_bytes(diff: np.ndarray) -> bytes:
    """Huffman-code a (h, w) array of modulo-2^16 differences with the
    lossless category alphabet (no prediction: differential frame)."""
    wr = _BitWriter()
    for d in diff.reshape(-1):
        d = int(d) & 0xFFFF
        if d == 0x8000:
            c, ln = _LL_CODES[16]
            wr.put(c, ln)
            continue
        if d >= 0x8000:
            d -= 0x10000
        size, amp = _magnitude(d)
        c, ln = _LL_CODES[size]
        wr.put(c, ln)
        if size:
            wr.put(amp, size)
    wr.flush()
    return bytes(wr.out)


def _sof7_frame(diff: np.ndarray) -> bytes:
    """One differential lossless frame: SOF7 + DHT + SOS(Ss=0) + scan."""
    h, w = diff.shape
    sof = _seg(_SOF7, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xFFC4, b"\x00" + bytes(_LL_BITS) + bytes(_LL_VALS))
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0]))
    return sof + dht + sos + _diff_scan_bytes(diff)


def encode_jpeg_hier_gray(
    px: np.ndarray, levels: int = 2, base: str = "lossless",
    quality: int = 90, diff_kind: str = "lossless",
) -> bytes:
    """Encode an (h, w) uint8 array as a hierarchical (DHP) stream:
    ``levels-1`` decimations, an initial non-differential frame at the
    smallest level (``base='lossless'`` -> SOF3, ``base='dct'`` -> SOF0
    baseline at ``quality``), then one EXP + differential frame per level
    back up. ``diff_kind`` selects the differential coding process:

      * ``'lossless'`` — SOF7 (Huffman, exact per stage; the default)
      * ``'lossless_arith'`` — SOF15 (QM coder, exact per stage)
      * ``'dct'`` / ``'dct_prog'`` — SOF5 / SOF6 (Huffman DCT, lossy
        mid-pyramid refinements) with a FINAL SOF7 correction stage
      * ``'arith'`` / ``'arith_prog'`` — SOF13 / SOF14 (arithmetic DCT)
        with a final SOF15 correction stage

    Every configuration decodes bit-exact to the ORIGINAL samples: the
    lossless kinds are exact at each stage, and the DCT kinds end in a
    same-resolution lossless differential stage (the Annex J final-
    refinement arrangement)."""
    from .jpeg_diff import encode_diff_frame

    if levels < 2:
        raise ValueError("hierarchical stream needs >= 2 levels")
    if base not in ("lossless", "dct"):
        raise ValueError(f"unknown base frame kind {base!r}")
    if diff_kind not in (
        "lossless", "lossless_arith", "dct", "dct_prog", "arith",
        "arith_prog",
    ):
        raise ValueError(f"unknown differential frame kind {diff_kind!r}")
    h, w = px.shape
    pyramid = [px]
    for _ in range(levels - 1):
        pyramid.append(_down2(pyramid[-1]))
    small = pyramid[-1]

    if base == "lossless":
        initial = encode_jpeg_lossless_gray(small)
        ref = small.astype(np.int64)
    else:
        initial = encode_jpeg_gray(small, quality=quality)
        # the decoder's reference is the DECODED lossy frame; mirror it
        ref = decode_jpeg_gray(initial).astype(np.int64)
    # strip SOI/EOI (and the APP0 the standalone encoders emit stays —
    # legal anywhere between markers)
    initial_frame = initial[2:-2]

    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(_DHP, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += initial_frame
    for lvl in range(levels - 2, -1, -1):
        target = pyramid[lvl].astype(np.int64)
        th, tw = target.shape
        eh = 1 if tw > ref.shape[1] else 0
        ev = 1 if th > ref.shape[0] else 0
        if eh or ev:
            out += _seg(_EXP, bytes([(eh << 4) | ev]))
            ref = _up2(ref, th if ev else ref.shape[0],
                       tw if eh else ref.shape[1])
        if ref.shape != (th, tw):
            raise ValueError(
                f"pyramid dims drifted: ref {ref.shape} vs {(th, tw)}")
        if diff_kind == "lossless":
            diff = (target - ref) & 0xFFFF
            out += _sof7_frame(diff)
            ref = (ref + ((diff + 0x8000) & 0xFFFF) - 0x8000) & 0xFFFF
        elif diff_kind == "lossless_arith":
            frame, recon = encode_diff_frame(target - ref, "lossless_arith")
            out += frame
            ref = (ref + recon) & 0xFFFF
        else:
            # lossy DCT refinement: the decoder clamps the running
            # reference to sample range, so the encoder mirrors that
            frame, recon = encode_diff_frame(
                target - ref, diff_kind, quality=quality
            )
            out += frame
            ref = np.clip(ref + recon, 0, 255)
    if diff_kind in ("dct", "dct_prog"):
        out += _sof7_frame((px.astype(np.int64) - ref) & 0xFFFF)
    elif diff_kind in ("arith", "arith_prog"):
        frame, _recon = encode_diff_frame(
            px.astype(np.int64) - ref, "lossless_arith"
        )
        out += frame
    out += b"\xff\xd9"
    return bytes(out)


def _decode_diff_scan(
    data: bytes, start: int, h: int, w: int,
    table: dict[tuple[int, int], int],
) -> tuple[np.ndarray, int]:
    """Decode h*w modulo-2^16 differences; returns (diffs, end_pos)."""
    end = _entropy_end(data, start)
    rd = _BitReader(data[start:end])
    diff = np.zeros((h, w), dtype=np.int64)
    flat = diff.reshape(-1)
    for i in range(h * w):
        size = _read_huff(rd, table)
        if size == 16:
            flat[i] = 0x8000
        else:
            flat[i] = _extend(rd.bits(size), size)
    return diff, end


def decode_jpeg_hier_gray(raw: bytes) -> np.ndarray:
    """Decode a hierarchical (DHP) grayscale stream: initial SOF3/SOF0
    frame, then EXP expansions and SOF7 differential refinements folded
    into the reference modulo 2^16; returns the final full-resolution
    image. Precise gates for the differential-DCT (SOF5/6) and
    differential-arithmetic (SOF13-15) processes."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    full_h = full_w = -1
    ref: np.ndarray | None = None
    pending_exp: tuple[int, int] | None = None
    htables: dict[int, dict[tuple[int, int], int]] = {}
    frame_start = -1  # byte offset where the current frame's segments began
    frame_h = frame_w = 0
    in_sof7 = False
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = struct.unpack_from(">H", raw, pos)[0]
        if marker == 0xFFD9:
            break
        length = struct.unpack_from(">H", raw, pos + 2)[0]
        payload = raw[pos + 4 : pos + 2 + length]
        if marker == _DHP:
            _prec, full_h, full_w, ncomp = struct.unpack_from(
                ">BHHB", payload, 0
            )
            if ncomp != 1:
                raise ValueError(
                    "multi-component hierarchical JPEG unsupported "
                    "(single-component grayscale is supported)"
                )
        elif marker == _EXP:
            if ref is None:
                raise ValueError("EXP before any reference frame")
            pending_exp = (payload[0] >> 4, payload[0] & 0xF)
        elif marker in (0xFFC0, 0xFFC1, 0xFFC3):
            if full_h < 0:
                raise ValueError("hierarchical frame before DHP")
            # non-differential initial frame: decode by slicing it out as
            # a standalone stream and reusing the sequential/lossless
            # decoders (tables travel inside the slice)
            if ref is not None:
                raise ValueError(
                    "non-differential frame after the initial frame "
                    "(only SOF7 differential refinements are supported)"
                )
            if frame_start < 0:
                frame_start = pos
            # find this frame's SOS and the end of its entropy data
            j = pos
            while struct.unpack_from(">H", raw, j)[0] != 0xFFDA:
                j += 2 + struct.unpack_from(">H", raw, j + 2)[0]
            sos_len = struct.unpack_from(">H", raw, j + 2)[0]
            end = _entropy_end(raw, j + 2 + sos_len)
            standalone = b"\xff\xd8" + raw[frame_start:end] + b"\xff\xd9"
            ref = decode_jpeg_gray(standalone).astype(np.int64)
            frame_start = -1
            pos = end
            continue
        elif marker == _SOF7:
            _prec, frame_h, frame_w, ncomp = struct.unpack_from(
                ">BHHB", payload, 0
            )
            if ncomp != 1:
                raise ValueError(
                    "multi-component hierarchical JPEG unsupported "
                    "(single-component grayscale is supported)"
                )
            if ref is None:
                raise ValueError("differential frame before initial frame")
            in_sof7 = True
        elif marker in (0xFFC5, 0xFFC6, 0xFFCD, 0xFFCE, 0xFFCF):
            # differential DCT (SOF5/6 Huffman, SOF13/14 arithmetic) and
            # differential lossless arithmetic (SOF15): slice the self-
            # contained frame and fold its reconstructed diff in
            from .jpeg_diff import decode_diff_frame, diff_frame_end

            if ref is None:
                raise ValueError("differential frame before initial frame")
            start = frame_start if frame_start >= 0 else pos
            end = diff_frame_end(raw, start)
            diff = decode_diff_frame(raw[start:end])
            if pending_exp is not None:
                eh, ev = pending_exp
                ref = _up2(
                    ref,
                    diff.shape[0] if ev else ref.shape[0],
                    diff.shape[1] if eh else ref.shape[1],
                )
                pending_exp = None
            if ref.shape != diff.shape:
                raise ValueError(
                    f"differential frame dims {diff.shape} do not match "
                    f"reference {ref.shape} (missing EXP?)"
                )
            if marker == 0xFFCF:  # lossless: modulo-2^16 exact fold
                ref = (ref + diff) & 0xFFFF
            else:  # lossy DCT refinement: clamp to sample range
                ref = np.clip(ref + diff, 0, 255)
            frame_start = -1
            pos = end
            continue
        elif marker == 0xFFC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(payload[i + 17 : i + 17 + cnt])
                if tc == 0:
                    htables[th] = _build_decode_map(bits, vals)
                i += 17 + cnt
        elif marker == 0xFFDA:
            if not in_sof7:
                # SOS of a frame whose SOF we haven't seen: only legal
                # inside the sliced initial frame, handled above
                raise ValueError("SOS before any SOF in hierarchical stream")
            if payload[3] != 0:
                raise ValueError(
                    "differential frame must not use a predictor (Ss=0)"
                )
            if pending_exp is not None:
                eh, ev = pending_exp
                ref = _up2(
                    ref,
                    frame_h if ev else ref.shape[0],
                    frame_w if eh else ref.shape[1],
                )
                pending_exp = None
            if ref.shape != (frame_h, frame_w):
                raise ValueError(
                    f"differential frame dims {(frame_h, frame_w)} do not "
                    f"match reference {ref.shape} (missing EXP?)"
                )
            table = htables[payload[2] >> 4]
            diff, end = _decode_diff_scan(
                raw, pos + 2 + length, frame_h, frame_w, table
            )
            ref = (ref + ((diff + 0x8000) & 0xFFFF) - 0x8000) & 0xFFFF
            in_sof7 = False
            pos = end
            continue
        else:
            # APP0 etc.: if we're accumulating a frame slice (initial
            # frame, or a differential frame whose DQT/DAC precede its
            # SOF), remember where it began
            if frame_start < 0 and marker in (0xFFDB, 0xFFCC):
                frame_start = pos
        pos += 2 + length
    if ref is None:
        raise ValueError("hierarchical stream ended before any frame")
    if full_h >= 0 and ref.shape != (full_h, full_w):
        raise ValueError(
            f"hierarchical stream ended at {ref.shape}, DHP declared "
            f"{(full_h, full_w)}"
        )
    return np.clip(ref & 0xFFFF, 0, 255).astype(np.uint8)
