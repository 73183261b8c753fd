"""Differential JPEG frames (T.81 Annex J hierarchical stages beyond
lossless-Huffman SOF7): the last five frame types of the T.81 matrix.

  * SOF5  (0xFFC5) differential sequential DCT, Huffman
  * SOF6  (0xFFC6) differential progressive DCT, Huffman
  * SOF13 (0xFFCD) differential sequential DCT, arithmetic
  * SOF14 (0xFFCE) differential progressive DCT, arithmetic
  * SOF15 (0xFFCF) differential lossless, arithmetic

All from the public spec (ITU-T T.81 / ISO 10918-1). Differential frames
code the stage-minus-reference image directly: NO level shift, and NO
in-frame prediction (F.2: the upsampled reference IS the prediction, so
the DC "difference" coded per block is the quantized DC itself, and the
lossless sample "difference" is the hierarchical diff — both with their
usual conditioning/category machinery, which this module reuses verbatim
from the sequential/progressive/lossless coders in jpeg.py and
jpeg_arith.py; only the prediction source changes).

Encoder-side choices the spec leaves open, pinned here for determinism:
quantized differential DCT coefficients are clamped to the codeable
Huffman categories (DC ±2047, AC ±1023 — a quantization choice, always
spec-legal); the progressive scripts are DC(0,0) then AC bands (1,5),
(6,63) at Al=0. DCT differential stages are LOSSY (that is their point:
cheap mid-pyramid refinements); the hierarchical encoder appends a final
LOSSLESS differential stage after them, so full-stream decode stays
bit-exact — the property every hier test pins.

Each frame is self-contained (its DQT/DHT/DAC travel inside it), decoded
from a byte slice by ``decode_diff_frame`` and produced by
``encode_diff_frame``, which also returns the RECONSTRUCTED diff so the
hierarchical encoder can mirror the decoder's reference exactly.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    _AC_BITS,
    _AC_CODES,
    _AC_PROG_BITS,
    _AC_PROG_CODES,
    _AC_PROG_SYMS,
    _AC_VALS,
    _BitReader,
    _BitWriter,
    _DC_BITS,
    _DC_CODES,
    _DC_VALS,
    _EobState,
    _ProgAcEnc,
    _ZIGZAG,
    _build_decode_map,
    _dct2,
    _enc_ac_first,
    _entropy_end,
    _extend,
    _idct2,
    _magnitude,
    _prog_ac_first,
    _quant_table,
    _read_huff,
    _seg,
)
from .jpeg_arith import (
    _AC_SIGN_BIN,
    _AC_STAT_BINS,
    _ArithDecoder,
    _ArithEncoder,
    _DC_STAT_BINS,
    _LL_STAT_BINS,
    _LL_X_LARGE,
    _LL_X_SMALL,
    _decode_ac_block,
    _decode_dc_diff,
    _encode_ac_block,
    _encode_dc_diff,
    _decode_ll_diff,
    _encode_ll_diff,
    _ll_classify,
    _ll_wrap,
)
from .jpeg_arith import _dec_ac_first as _arith_dec_ac_first
from .jpeg_arith import _enc_ac_first as _arith_enc_ac_first

_SOF5, _SOF6 = 0xFFC5, 0xFFC6
_SOF13, _SOF14, _SOF15 = 0xFFCD, 0xFFCE, 0xFFCF

_DIFF_DCT_MARKERS = (_SOF5, _SOF6, _SOF13, _SOF14)
DIFF_MARKERS = (_SOF5, _SOF6, _SOF13, _SOF14, _SOF15)

_PROG_BANDS = ((1, 5), (6, 63))


# ---------------------------------------------------------------------------
# shared DCT-side helpers
# ---------------------------------------------------------------------------


def _diff_zz_blocks(diff: np.ndarray, qt: np.ndarray):
    """(h, w) signed diff -> (nblocks, 64) clamped quantized zigzag
    coefficients (no level shift; raster block order) + block grid."""
    h, w = diff.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        diff.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)),
        mode="edge",
    )
    zz = np.zeros((bh * bw, 64), dtype=np.int64)
    i = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = np.round(_dct2(block) / qt).astype(np.int64)
            z = coef.reshape(64)[_ZIGZAG]
            z[0] = np.clip(z[0], -2047, 2047)
            z[1:] = np.clip(z[1:], -1023, 1023)
            zz[i] = z
            i += 1
    return zz, bh, bw


def _recon_diff(zz: np.ndarray, qt: np.ndarray, bh: int, bw: int,
                h: int, w: int) -> np.ndarray:
    """Inverse of _diff_zz_blocks (the decoder's arithmetic, shared by
    the encoder to mirror the reference exactly)."""
    out = np.zeros((bh * 8, bw * 8), dtype=np.int64)
    i = 0
    inv = np.zeros(64, dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            inv[_ZIGZAG] = zz[i]
            coef = inv.reshape(8, 8) * qt
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.round(
                _idct2(coef.astype(np.float64))
            ).astype(np.int64)
            i += 1
    return out[:h, :w]


def _sof_seg(marker: int, h: int, w: int) -> bytes:
    return _seg(marker, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))


def _dqt_seg(qt: np.ndarray) -> bytes:
    return _seg(
        0xFFDB, b"\x00" + qt.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
    )


# ---------------------------------------------------------------------------
# Huffman differential frames (SOF5 sequential, SOF6 progressive)
# ---------------------------------------------------------------------------

_SEQ_DHT = _seg(
    0xFFC4,
    b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
    + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
)
_PROG_DHT = _seg(
    0xFFC4,
    b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
    + b"\x10" + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_SYMS),
)


def _enc_sof5_scan(zz: np.ndarray) -> bytes:
    wr = _BitWriter()
    for z in zz:
        size, amp = _magnitude(int(z[0]))  # PRED = 0: code the DC itself
        c, ln = _DC_CODES[size]
        wr.put(c, ln)
        if size:
            wr.put(amp, size)
        run = 0
        for k in range(1, 64):
            v = int(z[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _AC_CODES[0xF0]
                wr.put(c, ln)
                run -= 16
            size, amp = _magnitude(v)
            c, ln = _AC_CODES[(run << 4) | size]
            wr.put(c, ln)
            wr.put(amp, size)
            run = 0
        if run:
            c, ln = _AC_CODES[0x00]
            wr.put(c, ln)
    wr.flush()
    return bytes(wr.out)


def _enc_sof6_scans(zz: np.ndarray) -> bytes:
    out = bytearray()
    # DC scan (Ss=Se=0, Al=0): magnitude category of the DC value itself
    wr = _BitWriter()
    for z in zz:
        size, amp = _magnitude(int(z[0]))
        c, ln = _DC_CODES[size]
        wr.put(c, ln)
        if size:
            wr.put(amp, size)
    wr.flush()
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes(wr.out)
    # AC band scans at Al=0 (EOB-run coding)
    for ss, se in _PROG_BANDS:
        wr2 = _BitWriter()
        st = _ProgAcEnc(wr2, _AC_PROG_CODES)
        for z in zz:
            _enc_ac_first(st, z, ss, se, 0)
        st.flush_eobrun()
        wr2.flush()
        out += _seg(0xFFDA, bytes([1, 1, 0x10, ss, se, 0])) + bytes(wr2.out)
    return bytes(out)


# ---------------------------------------------------------------------------
# arithmetic differential frames (SOF13 sequential, SOF14 progressive)
# ---------------------------------------------------------------------------

_LO, _UP, _KX = 0, 1, 5
_DAC_SEQ = _seg(0xFFCC, bytes([0x00, (_UP << 4) | _LO, 0x10, _KX]))
_DAC_LL = _seg(0xFFCC, bytes([0x00, (_UP << 4) | _LO]))


def _enc_sof13_scan(zz: np.ndarray) -> bytes:
    enc = _ArithEncoder()
    dc_st = bytearray(_DC_STAT_BINS)
    ac_st = bytearray(_AC_STAT_BINS)
    ac_st[_AC_SIGN_BIN] = 113  # fixed sign bin (as the sequential coder)
    ctx = 0
    for z in zz:
        ctx = _encode_dc_diff(enc, dc_st, ctx, int(z[0]), _LO, _UP)
        _encode_ac_block(enc, ac_st, z, _KX)
    return enc.finish()


def _enc_sof14_scans(zz: np.ndarray) -> bytes:
    out = bytearray()
    enc = _ArithEncoder()
    dc_st = bytearray(_DC_STAT_BINS)
    ctx = 0
    for z in zz:
        ctx = _encode_dc_diff(enc, dc_st, ctx, int(z[0]), _LO, _UP)
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0])) + enc.finish()
    for ss, se in _PROG_BANDS:
        enc = _ArithEncoder()
        st = bytearray(_AC_STAT_BINS)
        st[_AC_SIGN_BIN] = 113
        for z in zz:
            _arith_enc_ac_first(enc, st, z, ss, se, 0, _KX)
        out += _seg(0xFFDA, bytes([1, 1, 0x10, ss, se, 0])) + enc.finish()
    return bytes(out)


# ---------------------------------------------------------------------------
# SOF15: differential lossless, arithmetic
# ---------------------------------------------------------------------------


def _enc_sof15_scan(diff: np.ndarray) -> bytes:
    """Code the modulo-2^16 hierarchical diffs with the H.2 lossless QM
    conditioning, Da/Db taken from the neighboring DIFFS (prediction is
    the reference image, so the coded values ARE the diffs)."""
    h, w = diff.shape
    st = bytearray(_LL_STAT_BINS)
    enc = _ArithEncoder()
    wrapped = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            d = _ll_wrap(int(diff[y, x]))
            da = int(wrapped[y, x - 1]) if x > 0 else 0
            db = int(wrapped[y - 1, x]) if y > 0 else 0
            cb = _ll_classify(db, _LO, _UP)
            ctx = 4 * (_ll_classify(da, _LO, _UP) + 5 * cb)
            xbase = _LL_X_LARGE if cb >= 3 else _LL_X_SMALL
            _encode_ll_diff(enc, st, ctx, xbase, d)
            wrapped[y, x] = d
    return enc.finish()


# ---------------------------------------------------------------------------
# frame assembly / decode
# ---------------------------------------------------------------------------


def encode_diff_frame(
    diff: np.ndarray, kind: str, quality: int = 90
) -> tuple[bytes, np.ndarray]:
    """Encode one differential frame; returns (frame bytes, the diff the
    DECODER will reconstruct — exact for lossless kinds, quantized for
    DCT kinds — so the caller can mirror the decoder's reference)."""
    h, w = diff.shape
    if kind in ("lossless_arith",):
        return (
            _sof_seg(_SOF15, h, w) + _DAC_LL
            + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0]))
            + _enc_sof15_scan(diff),
            np.vectorize(_ll_wrap)(diff.astype(np.int64) & 0xFFFF),
        )
    qt = _quant_table(quality)
    zz, bh, bw = _diff_zz_blocks(diff, qt)
    recon = _recon_diff(zz, qt, bh, bw, h, w)
    if kind == "dct":
        frame = (
            _dqt_seg(qt) + _sof_seg(_SOF5, h, w) + _SEQ_DHT
            + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + _enc_sof5_scan(zz)
        )
    elif kind == "dct_prog":
        frame = (
            _dqt_seg(qt) + _sof_seg(_SOF6, h, w) + _PROG_DHT
            + _enc_sof6_scans(zz)
        )
    elif kind == "arith":
        frame = (
            _dqt_seg(qt) + _sof_seg(_SOF13, h, w) + _DAC_SEQ
            + _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + _enc_sof13_scan(zz)
        )
    elif kind == "arith_prog":
        frame = (
            _dqt_seg(qt) + _sof_seg(_SOF14, h, w) + _DAC_SEQ
            + _enc_sof14_scans(zz)
        )
    else:
        raise ValueError(f"unknown differential frame kind {kind!r}")
    return frame, recon


def diff_frame_end(raw: bytes, pos: int) -> int:
    """End offset of the differential frame whose first segment starts at
    ``pos``: walks this frame's table/SOF/SOS segments and entropy data.
    Once the first scan has completed, only further SOS segments continue
    the frame (the layouts this module emits put all tables before the
    first scan), so a FOLLOWING frame's leading DQT/DAC is never absorbed."""
    scanned = False
    seen_sof = False
    while pos + 4 <= len(raw):
        marker = struct.unpack_from(">H", raw, pos)[0]
        if marker == 0xFFDA:
            length = struct.unpack_from(">H", raw, pos + 2)[0]
            pos = _entropy_end(raw, pos + 2 + length)
            scanned = True
            continue
        if scanned:
            break
        if marker in (0xFFDB, 0xFFC4, 0xFFCC, 0xFFDD) or (
            not seen_sof and marker in DIFF_MARKERS
        ):
            pos += 2 + struct.unpack_from(">H", raw, pos + 2)[0]
            if marker in DIFF_MARKERS:
                seen_sof = True
            continue
        break
    return pos


def decode_diff_frame(raw: bytes) -> np.ndarray:
    """Decode one self-contained differential frame slice -> int64 signed
    diff array (exact for SOF15, quantized reconstruction for the DCT
    kinds)."""
    pos = 0
    qt = None
    dc_map = ac_map = None
    sof = 0
    h = w = 0
    zz = None
    nb = 0
    bh = bw = 0
    diff15 = None
    while pos + 4 <= len(raw):
        marker = struct.unpack_from(">H", raw, pos)[0]
        length = struct.unpack_from(">H", raw, pos + 2)[0]
        payload = raw[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            tbl = np.zeros(64, dtype=np.int64)
            tbl[_ZIGZAG] = np.frombuffer(payload[1:65], dtype=np.uint8)
            qt = tbl.reshape(8, 8)
        elif marker in DIFF_MARKERS:
            sof = marker
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if ncomp != 1:
                raise ValueError(
                    "multi-component differential frames unsupported "
                    "(single-component grayscale is supported)"
                )
            bh, bw = (h + 7) // 8, (w + 7) // 8
            nb = bh * bw
            zz = np.zeros((nb, 64), dtype=np.int64)
        elif marker == 0xFFC4:
            i = 0
            while i < len(payload):
                tc = payload[i] >> 4
                bits = list(payload[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(payload[i + 17 : i + 17 + cnt])
                m = _build_decode_map(bits, vals)
                if tc == 0:
                    dc_map = m
                else:
                    ac_map = m
                i += 17 + cnt
        elif marker == 0xFFDA:
            scan_at = pos + 2 + length
            end = _entropy_end(raw, scan_at)
            ss, se = payload[3], payload[4]
            if sof == _SOF5:
                rd = _BitReader(raw[scan_at:end])
                for i in range(nb):
                    size = _read_huff(rd, dc_map)
                    zz[i, 0] = _extend(rd.bits(size), size)
                    k = 1
                    while k < 64:
                        sym = _read_huff(rd, ac_map)
                        if sym == 0x00:
                            break
                        if sym == 0xF0:
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise ValueError("AC index out of range")
                        zz[i, k] = _extend(rd.bits(sym & 0xF), sym & 0xF)
                        k += 1
            elif sof == _SOF6:
                rd = _BitReader(raw[scan_at:end])
                if ss == 0:
                    for i in range(nb):
                        size = _read_huff(rd, dc_map)
                        zz[i, 0] = _extend(rd.bits(size), size)
                else:
                    st = _EobState()
                    for i in range(nb):
                        _prog_ac_first(rd, ac_map, zz[i], ss, se, 0, st)
            elif sof == _SOF13:
                dec = _ArithDecoder(raw, scan_at)
                dc_st = bytearray(_DC_STAT_BINS)
                ac_st = bytearray(_AC_STAT_BINS)
                ac_st[_AC_SIGN_BIN] = 113
                ctx = 0
                for i in range(nb):
                    v, ctx = _decode_dc_diff(dec, dc_st, ctx, _LO, _UP)
                    zz[i, 0] = v
                    _decode_ac_block(dec, ac_st, zz[i], _KX)
            elif sof == _SOF14:
                dec = _ArithDecoder(raw, scan_at)
                if ss == 0:
                    dc_st = bytearray(_DC_STAT_BINS)
                    ctx = 0
                    for i in range(nb):
                        v, ctx = _decode_dc_diff(dec, dc_st, ctx, _LO, _UP)
                        zz[i, 0] = v
                else:
                    ac_st = bytearray(_AC_STAT_BINS)
                    ac_st[_AC_SIGN_BIN] = 113
                    for i in range(nb):
                        _arith_dec_ac_first(dec, ac_st, zz[i], ss, se, 0, _KX)
            elif sof == _SOF15:
                dec = _ArithDecoder(raw, scan_at)
                st = bytearray(_LL_STAT_BINS)
                diff15 = np.zeros((h, w), dtype=np.int64)
                for y in range(h):
                    for x in range(w):
                        da = int(diff15[y, x - 1]) if x > 0 else 0
                        db = int(diff15[y - 1, x]) if y > 0 else 0
                        cb = _ll_classify(db, _LO, _UP)
                        ctx = 4 * (_ll_classify(da, _LO, _UP) + 5 * cb)
                        xbase = _LL_X_LARGE if cb >= 3 else _LL_X_SMALL
                        diff15[y, x] = _ll_wrap(
                            _decode_ll_diff(dec, st, ctx, xbase)
                        )
            else:
                raise ValueError("SOS before SOF in differential frame")
            pos = end
            continue
        pos += 2 + length
    if sof == _SOF15:
        if diff15 is None:
            raise ValueError("SOF15 frame without scan data")
        return diff15
    if zz is None or qt is None:
        raise ValueError("truncated differential frame")
    return _recon_diff(zz, qt, bh, bw, h, w)
