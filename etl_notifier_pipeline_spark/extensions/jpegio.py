"""Minimal stdlib+numpy baseline JPEG codec (grayscale + color at
4:4:4 / 4:2:0 / 4:2:2) — the lossy twin of ``pngio``.

Why it exists: the container has no Pillow, but the engine's
multimodal layer (SURVEY §2.10 X4) must exercise LOSSY-format routing
with genuine bytes, not renamed text files. This module encodes and
decodes real ITU T.81 baseline JPEGs:

- ``encode_gray``: level shift -> 8x8 DCT-II -> Annex-K-style
  luminance quantization -> zigzag -> DC-difference + AC run-length
  Huffman coding -> JFIF byte stream (SOI/APP0/DQT/SOF0/DHT/SOS/EOI,
  0xFF byte stuffing).
- ``decode_gray``: parses DQT/SOF0/DHT/SOS from the stream (tables
  are read from the FILE, per the standard — any self-consistent
  table set is a valid JPEG), Huffman-decodes, dequantizes, inverse
  DCT, clamps.

The committed ``tests/fixtures/media/*.jpg`` fixtures are produced by
this encoder and decode in any JPEG reader (PIL, libjpeg, browsers):
baseline JPEG's validity depends only on the declared tables being
internally consistent, which the encode->decode roundtrip test pins
(pixel error bounded by the quantization table, exactly the lossy
contract). Scope gates are explicit: arithmetic coding, extended/lossless
frames, sampling factors above 2, and 3-component streams that
aren't YCbCr (Adobe APP14 transform=0 / exotic component ids) raise
``NotImplementedError`` with the gate message the multimodal layer
surfaces (PIL handles those when installed). Progressive (SOF2)
decodes AND encodes natively (T.81 G.2: spectral selection,
successive approximation, EOB runs, refinement correction bits), as
do restart intervals (DRI/RSTn): DC predictors reset and the stream
re-aligns at each marker, out-of-sequence markers are bad data
(``ValueError``).

Reference parity note: the reference repo has no media path at all —
this extends the engine's training-data-pipeline surface (brief §X4).
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables ---------------------------------------------------------------

# Annex-K-style luminance quantization at a mid quality point.
QUANT = np.array(
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

# Annex-K chrominance quantization (same mid quality point) — used by
# the 4:4:4 color path for Cb/Cr.
QUANT_C = np.array(
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

# standard luminance DC table (bits per code length 1..16, then symbols)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# standard chrominance DC table (T.81 Table K.4)
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))

# standard luminance AC table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# standard chrominance AC table (T.81 Table K.6)
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _huffman_codes(DC_BITS, DC_VALS)
_AC_CODES = _huffman_codes(AC_BITS, AC_VALS)
_DC_CODES_C = _huffman_codes(DC_BITS_C, DC_VALS_C)
_AC_CODES_C = _huffman_codes(AC_BITS_C, AC_VALS_C)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Pad to the byte boundary (1-bits, stuffed if the pad byte
        lands on 0xFF) and emit an RSTn marker — markers themselves
        are never byte-stuffed."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.buf += bytes((0xFF, 0xD0 + (m & 7)))


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    prev_dc: int,
) -> int:
    """DCT+quantize+entropy-code one level-shifted 8x8 block; returns
    the new DC predictor."""
    coef = _DCT @ block @ _DCT.T
    q = np.round(coef / quant).astype(np.int64)
    zz = q.flatten()[ZIGZAG]
    # DC
    diff = int(zz[0]) - prev_dc
    prev_dc = int(zz[0])
    size = _category(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(_amplitude(diff, size), size)
    # AC
    run = 0
    for v in zz[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(_amplitude(v, size), size)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return prev_dc


def _pad_to_blocks(img: np.ndarray) -> np.ndarray:
    """Pad to 8x8 multiples by edge replication (standard practice)."""
    height, width = img.shape
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    return np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_gray(
    pixels: list[int],
    width: int,
    height: int,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """8-bit grayscale pixels (row-major, len == width*height) ->
    baseline JFIF bytes. ``restart_interval`` > 0 emits a DRI segment
    and an RSTn marker (byte-aligned, DC predictor reset) every that
    many MCUs — the error-resilience framing real encoders use.
    ``progressive=True`` emits an SOF2 stream instead: a
    successive-approximation scan script (DC first at Al=1 -> AC first
    at Al=1 -> DC refine -> AC refine) over the standard tables; the
    quantized coefficients are identical to the baseline path, so the
    decode is pixel-identical to the baseline encode."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if progressive and restart_interval:
        raise ValueError(
            "progressive + restart_interval not supported together"
        )
    img = np.asarray(pixels, dtype=np.float64).reshape(height, width)
    padded = _pad_to_blocks(img)
    ph, pw = padded.shape
    if progressive:
        zz = _quantized_blocks(padded, QUANT)
        headers = [
            _seg(0xFFDB, bytes([0]) + bytes(QUANT.flatten()[ZIGZAG].tolist())),
            _seg(
                0xFFC2,
                struct.pack(">BHHB", 8, height, width, 1)
                + bytes([1, 0x11, 0]),
            ),
            _seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)),
            _seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)),
        ]
        return _progressive_stream(headers, (
            (bytes([1, 1, 0x00, 0, 0, 0x01]),
             lambda w: _enc_dc_first(w, [zz], [_DC_CODES], 1)),
            (bytes([1, 1, 0x00, 1, 63, 0x01]),
             lambda w: _enc_ac_first(w, zz, _AC_CODES, 1, 63, 1)),
            (bytes([1, 1, 0x00, 0, 0, 0x10]),
             lambda w: _enc_dc_refine(w, [zz], 0)),
            (bytes([1, 1, 0x00, 1, 63, 0x10]),
             lambda w: _enc_ac_refine(w, zz, _AC_CODES, 1, 63, 0)),
        ))

    w = _BitWriter()
    prev_dc = 0
    mcu_i = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                w.restart((mcu_i // restart_interval - 1) % 8)
                prev_dc = 0
            prev_dc = _encode_block(
                w, padded[by : by + 8, bx : bx + 8] - 128.0,
                QUANT, _DC_CODES, _AC_CODES, prev_dc,
            )
            mcu_i += 1
    data = w.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(QUANT.flatten()[ZIGZAG].tolist()))
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _quantized_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Padded plane in PIXEL range (0..255, NOT yet level-shifted —
    the -128 shift happens here) -> (bh, bw, 64) zigzag-order
    quantized DCT coefficients (the shared front half of every encode
    path; progressive scans re-walk these arrays per scan)."""
    ph, pw = plane.shape
    bh, bw = ph // 8, pw // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            q = np.round((_DCT @ blk @ _DCT.T) / quant).astype(np.int64)
            out[by, bx] = q.flatten()[ZIGZAG]
    return out


def _progressive_stream(headers: list[bytes], scans) -> bytes:
    """Assemble an SOF2 stream: SOI + JFIF APP0 + the caller's table/
    frame segments, then one (SOS payload, emit(writer)) entropy
    segment per scan — the shared back half of both progressive
    encoders, so a scan-script fix cannot diverge gray from color."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for seg in headers:
        out += seg
    for sos, emit in scans:
        out += _seg(0xFFDA, sos)
        w = _BitWriter()
        emit(w)
        out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _ac_point_transform(v: int, al: int) -> int:
    """AC successive-approximation point transform: magnitude shift
    toward zero (T.81 G.1.2.1) — NOT an arithmetic shift."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _enc_dc_first(
    w: "_BitWriter", arrs: list[np.ndarray], codes: list[dict], al: int
) -> None:
    """Interleaved (uniform-grid) progressive DC first scan: diffs of
    the point-transformed DC (arithmetic shift for DC per G.1.2.1)."""
    bh, bw, _ = arrs[0].shape
    prev = [0] * len(arrs)
    for by in range(bh):
        for bx in range(bw):
            for i, zz in enumerate(arrs):
                t = int(zz[by, bx, 0]) >> al
                diff = t - prev[i]
                prev[i] = t
                size = _category(diff)
                code, length = codes[i][size]
                w.write(code, length)
                if size:
                    w.write(_amplitude(diff, size), size)


def _enc_dc_refine(
    w: "_BitWriter", arrs: list[np.ndarray], al: int
) -> None:
    """DC refinement scan: one raw magnitude bit per block (no
    Huffman), two's-complement arithmetic shift extracts the bit."""
    bh, bw, _ = arrs[0].shape
    for by in range(bh):
        for bx in range(bw):
            for zz in arrs:
                w.write((int(zz[by, bx, 0]) >> al) & 1, 1)


def _enc_ac_first(
    w: "_BitWriter", arr: np.ndarray, codes: dict, ss: int, se: int, al: int
) -> None:
    """AC first scan for one component over band Ss..Se at point
    transform Al. EOB runs are deliberately capped at one block
    (EOB0), so the standard Annex-K tables — which carry no EOBn
    symbols for n>0 — stay sufficient; the decoder still handles
    general EOBn from foreign streams."""
    bh, bw, _ = arr.shape
    for by in range(bh):
        for bx in range(bw):
            zz = arr[by, bx]
            vals = [
                _ac_point_transform(int(zz[k]), al)
                for k in range(ss, se + 1)
            ]
            nz = [i for i, v in enumerate(vals) if v]
            prev = -1
            for i in nz:
                v = vals[i]
                run = i - prev - 1
                while run > 15:
                    code, length = codes[0xF0]
                    w.write(code, length)
                    run -= 16
                size = _category(v)
                code, length = codes[(run << 4) | size]
                w.write(code, length)
                w.write(_amplitude(v, size), size)
                prev = i
            if not nz or nz[-1] < se - ss:
                code, length = codes[0x00]  # EOB0
                w.write(code, length)


def _enc_ac_refine(
    w: "_BitWriter", arr: np.ndarray, codes: dict, ss: int, se: int, al: int
) -> None:
    """AC refinement scan (T.81 G.1.2.3 encoder, the jcphuff
    structure): newly-significant coefficients (|point transform|
    == 1) emit (run<<4)|1 + sign; already-significant ones buffer one
    correction bit, flushed after each symbol; trailing state folds
    into EOB0."""
    bh, bw, _ = arr.shape
    for by in range(bh):
        for bx in range(bw):
            zz = arr[by, bx]
            a = [
                abs(_ac_point_transform(int(zz[k]), al))
                for k in range(ss, se + 1)
            ]
            signs = [1 if zz[k] > 0 else 0 for k in range(ss, se + 1)]
            eob_i = max((i for i, v in enumerate(a) if v == 1), default=-1)
            run = 0
            br: list[int] = []
            for i, v in enumerate(a):
                if v == 0:
                    run += 1
                    continue
                while run > 15 and i <= eob_i:
                    code, length = codes[0xF0]
                    w.write(code, length)
                    run -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if v > 1:
                    br.append(v & 1)
                    continue
                code, length = codes[(run << 4) | 1]
                w.write(code, length)
                w.write(signs[i], 1)
                for b in br:
                    w.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                code, length = codes[0x00]  # EOB0
                w.write(code, length)
                for b in br:
                    w.write(b, 1)


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range YCbCr (ITU-R BT.601 coefficients)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def encode_rgb(
    pixels: list[int],
    width: int,
    height: int,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """8-bit interleaved RGB pixels (row-major, len == 3*width*height)
    -> baseline color JFIF bytes (3 components, Annex-K luma/chroma
    quant + standard luminance/chrominance Huffman tables). Decodes in
    any JPEG reader.

    ``subsampling="444"`` (default): no chroma subsampling —
    interleaved MCUs of one 8x8 block per component.
    ``subsampling="420"``: 2x2 chroma subsampling, the dominant form
    of real-world JPEG — 16x16 MCUs of four Y blocks (raster order)
    plus one 2x2-box-averaged Cb and Cr block each (SOF0 sampling
    Y=2x2, Cb=Cr=1x1).
    ``subsampling="422"``: horizontal-only subsampling — 16x8 MCUs of
    two Y blocks plus one 1x2-averaged Cb and Cr block each (SOF0
    sampling Y=2x1, Cb=Cr=1x1)."""
    if len(pixels) != 3 * width * height:
        raise ValueError("pixel count != 3*width*height")
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if progressive and (subsampling != "444" or restart_interval):
        raise ValueError(
            "progressive encode supports 4:4:4 only, without restarts"
        )
    rgb = np.asarray(pixels, dtype=np.float64).reshape(height, width, 3)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    if progressive:
        zzs = [
            _quantized_blocks(_pad_to_blocks(p), q)
            for p, q in ((y, QUANT), (cb, QUANT_C), (cr, QUANT_C))
        ]
        acs = [_AC_CODES, _AC_CODES_C, _AC_CODES_C]
        headers = [
            _seg(0xFFDB, bytes([0]) + bytes(QUANT.flatten()[ZIGZAG].tolist())),
            _seg(
                0xFFDB, bytes([1]) + bytes(QUANT_C.flatten()[ZIGZAG].tolist())
            ),
            _seg(
                0xFFC2,
                struct.pack(">BHHB", 8, height, width, 3)
                + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
            ),
            _seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)),
            _seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)),
            _seg(0xFFC4, bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C)),
            _seg(0xFFC4, bytes([0x11]) + bytes(AC_BITS_C) + bytes(AC_VALS_C)),
        ]
        scans: list[tuple[bytes, object]] = [
            # interleaved DC first (Al=1), then per-component AC
            # first scans, then the refinement passes (Ah=1 -> Al=0)
            (bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x01]),
             lambda w: _enc_dc_first(
                 w, zzs, [_DC_CODES, _DC_CODES_C, _DC_CODES_C], 1)),
        ]
        for cid, zz, ac in zip((1, 2, 3), zzs, acs):
            tbl = 0x00 if cid == 1 else 0x11
            scans.append(
                (bytes([1, cid, tbl, 1, 63, 0x01]),
                 lambda w, zz=zz, ac=ac: _enc_ac_first(w, zz, ac, 1, 63, 1))
            )
        scans.append(
            (bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x10]),
             lambda w: _enc_dc_refine(w, zzs, 0))
        )
        for cid, zz, ac in zip((1, 2, 3), zzs, acs):
            tbl = 0x00 if cid == 1 else 0x11
            scans.append(
                (bytes([1, cid, tbl, 1, 63, 0x10]),
                 lambda w, zz=zz, ac=ac: _enc_ac_refine(w, zz, ac, 1, 63, 0))
            )
        return _progressive_stream(headers, scans)
    tables = [
        (QUANT, _DC_CODES, _AC_CODES),        # Y
        (QUANT_C, _DC_CODES_C, _AC_CODES_C),  # Cb
        (QUANT_C, _DC_CODES_C, _AC_CODES_C),  # Cr
    ]
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    mcu_i = 0

    def _maybe_restart() -> None:
        nonlocal mcu_i
        if restart_interval and mcu_i and mcu_i % restart_interval == 0:
            w.restart((mcu_i // restart_interval - 1) % 8)
            prev_dc[:] = [0, 0, 0]

    if subsampling == "444":
        planes = [_pad_to_blocks(p) for p in (y, cb, cr)]
        ph, pw = planes[0].shape
        y_hv = 0x11
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                _maybe_restart()
                for ci, (plane, (q, dc, ac)) in enumerate(
                    zip(planes, tables)
                ):
                    prev_dc[ci] = _encode_block(
                        w, plane[by : by + 8, bx : bx + 8] - 128.0,
                        q, dc, ac, prev_dc[ci],
                    )
                mcu_i += 1
    else:  # 420 / 422
        # pad Y to the MCU footprint, box-average the chroma by the
        # sampling ratio — the padded chroma planes land exactly on
        # 8-multiples, one block per MCU
        sy = 2 if subsampling == "420" else 1  # vertical chroma ratio
        ph = (height + 8 * sy - 1) // (8 * sy) * (8 * sy)
        pw = (width + 15) // 16 * 16
        yp = np.pad(y, ((0, ph - height), (0, pw - width)), mode="edge")
        chroma = []
        for p in (cb, cr):
            p = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
            chroma.append(
                p.reshape(ph // sy, sy, pw // 2, 2).mean(axis=(1, 3))
            )
        y_hv = 0x22 if subsampling == "420" else 0x21
        for my in range(0, ph, 8 * sy):
            for mx in range(0, pw, 16):
                _maybe_restart()
                q, dc, ac = tables[0]
                for by in range(0, 8 * sy, 8):
                    for bx in (0, 8):
                        prev_dc[0] = _encode_block(
                            w,
                            yp[
                                my + by : my + by + 8,
                                mx + bx : mx + bx + 8,
                            ] - 128.0,
                            q, dc, ac, prev_dc[0],
                        )
                for ci, plane in enumerate(chroma, start=1):
                    q, dc, ac = tables[ci]
                    prev_dc[ci] = _encode_block(
                        w,
                        plane[
                            my // sy : my // sy + 8, mx // 2 : mx // 2 + 8
                        ] - 128.0,
                        q, dc, ac, prev_dc[ci],
                    )
                mcu_i += 1
    data = w.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(QUANT.flatten()[ZIGZAG].tolist()))
    out += _seg(0xFFDB, bytes([1]) + bytes(QUANT_C.flatten()[ZIGZAG].tolist()))
    # SOF0: Y->qt0 at y_hv sampling, Cb/Cr->qt1 at 1x1
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, y_hv, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += _seg(0xFFC4, bytes([0x01]) + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += _seg(0xFFC4, bytes([0x11]) + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOS: Y uses dc0/ac0, Cb/Cr dc1/ac1
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += data
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decode ---------------------------------------------------------------


def is_jpeg(blob: bytes) -> bool:
    return bool(blob) and blob[:3] == b"\xff\xd8\xff"


def _segments(blob: bytes):
    """Yield (marker, payload, offset_after) for each segment until SOS."""
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = (blob[i] << 8) | blob[i + 1]
        if marker == 0xFFD9:
            return
        ln = (blob[i + 2] << 8) | blob[i + 3]
        payload = blob[i + 4 : i + 2 + ln]
        yield marker, payload, i + 2 + ln
        if marker == 0xFFDA:
            return
        i = i + 2 + ln


def _segments_full(blob: bytes):
    """Yield (marker, payload, entropy) for the WHOLE stream — unlike
    ``_segments`` it continues past SOS, attaching each scan's entropy
    bytes (stuffed 0xFF00 and RSTn markers included; the scan decoder
    consumes those) so multi-scan streams (progressive) can walk every
    scan with the table state current at its SOS."""
    i = 2
    n = len(blob)
    while i + 2 <= n:
        if blob[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = (blob[i] << 8) | blob[i + 1]
        if marker == 0xFFD9:
            return
        if 0xFFD0 <= marker <= 0xFFD7:
            # Keep bad-data classification consistent with the baseline
            # walker: a restart marker is only legal inside a scan's
            # entropy bytes (consumed there), never at header position.
            raise ValueError("RSTn marker outside entropy stream")
        if marker == 0xFF01:
            i += 2  # TEM: bare marker, no length field
            continue
        ln = (blob[i + 2] << 8) | blob[i + 3]
        payload = blob[i + 4 : i + 2 + ln]
        j = i + 2 + ln
        entropy = None
        if marker == 0xFFDA:
            e0 = j
            while j + 1 < n:
                if (
                    blob[j] == 0xFF
                    and blob[j + 1] != 0x00
                    and not (0xD0 <= blob[j + 1] <= 0xD7)
                ):
                    break
                j += 1
            entropy = blob[e0:j]
        yield marker, payload, entropy
        i = j


def _parse_dqt(payload: bytes, quant: dict) -> None:
    j = 0
    while j < len(payload):
        pq, tq = payload[j] >> 4, payload[j] & 0xF
        if pq != 0:
            raise NotImplementedError(
                "16-bit quantization tables not supported by the "
                "stdlib JPEG codec"
            )
        tbl = np.zeros(64, dtype=np.int32)
        tbl[ZIGZAG] = np.frombuffer(payload[j + 1 : j + 65], dtype=np.uint8)
        quant[tq] = tbl.reshape(8, 8)
        j += 65


def _parse_dht(payload: bytes, huff: dict) -> None:
    j = 0
    while j < len(payload):
        tc, th = payload[j] >> 4, payload[j] & 0xF
        bits = list(payload[j + 1 : j + 17])
        nv = sum(bits)
        vals = list(payload[j + 17 : j + 17 + nv])
        huff[(tc, th)] = _decode_table(bits, vals)
        j += 17 + nv


def _parse_sof(payload: bytes) -> tuple[int, int, list[dict]]:
    """Shared SOF0/SOF2 frame-header parse with the codec's capability
    gates (8-bit precision, 1 or 3 components, sampling factors in
    {1, 2}). Returns (width, height, comps) where each comp is
    {"cid", "tq", "h", "v"} in SOF order."""
    prec, height, width, ncomp = struct.unpack(">BHHB", payload[:6])
    if prec != 8:
        raise NotImplementedError("only 8-bit precision supported")
    if ncomp not in (1, 3):
        raise NotImplementedError(
            f"{ncomp}-component JPEG not supported by the stdlib "
            "codec (grayscale and 3-component color only)"
        )
    comps: list[dict] = []
    for ci in range(ncomp):
        cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
        # single-component scans are non-interleaved by spec: the MCU
        # is one block, sampling factors don't apply
        h, v = (hv >> 4, hv & 0xF) if ncomp > 1 else (1, 1)
        if h not in (1, 2) or v not in (1, 2):
            raise NotImplementedError(
                f"sampling factor {h}x{v} not supported by the "
                "stdlib codec (factors 1 and 2 only: 4:4:4, "
                "4:2:0, 4:2:2) — needs Pillow"
            )
        comps.append({"cid": cid, "tq": tq, "h": h, "v": v})
    return width, height, comps


def _gate_non_ycbcr(comps: list[dict], adobe_transform: int | None) -> None:
    """Both decoders apply the JFIF/BT.601 YCbCr->RGB transform to
    every 3-component stream. That is only correct when the components
    ARE YCbCr: Adobe APP14 transform=0 declares raw RGB components,
    and non-JFIF streams with exotic component ids (JFIF mandates
    1/2/3) signal the same. Both decode without error but with garbled
    colors — gate them so the multimodal codec="auto" path falls back
    instead of emitting wrong features (r9 advice #5)."""
    if len(comps) != 3:
        return
    cids = [c["cid"] for c in comps]
    if adobe_transform == 0 or (
        adobe_transform is None and cids != [1, 2, 3]
    ):
        raise NotImplementedError(
            "3-component JPEG without a YCbCr color space "
            f"(Adobe transform={adobe_transform}, component "
            f"ids={cids}) not supported by the stdlib codec — "
            "needs Pillow"
        )


def dimensions(blob: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from any SOFn marker — metadata
    extraction without a full decode (the catalog path)."""
    for marker, payload, _ in _segments(blob):
        if 0xFFC0 <= marker <= 0xFFCF and marker not in (0xFFC4, 0xFFC8, 0xFFCC):
            h, w = struct.unpack(">HH", payload[1:5])
            return w, h, payload[5]
    raise ValueError("no SOF marker found")


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.data):
                raise EOFError("entropy stream exhausted")
            b = self.data[self.i]
            self.i += 1
            if b == 0xFF:
                # stuffed zero or marker; EOI handled by caller length
                if self.i < len(self.data) and self.data[self.i] == 0x00:
                    self.i += 1
                else:
                    raise EOFError("marker in entropy stream")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart_marker(self) -> int:
        """Discard pad bits to the byte boundary, consume an RSTn
        marker, return n (0-7). The pad byte (if any) was already
        consumed by the preceding MCU's last real bits — stuffing
        included — so the marker starts at ``self.i``."""
        self.n = 0
        if self.i + 1 >= len(self.data) or self.data[self.i] != 0xFF:
            raise EOFError("expected restart marker")
        m = self.data[self.i + 1]
        if not 0xD0 <= m <= 0xD7:
            raise EOFError(f"expected RSTn marker, found {m:#04x}")
        self.i += 2
        return m & 7


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol. A DHT whose 16 length counts don't
    match its value list is bad DATA (truncated/corrupted segment),
    not a crash."""
    if len(bits) < 16 or sum(bits) != len(vals):
        raise ValueError(
            "malformed DHT segment: length counts do not match values"
        )
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _dc_size_symbol(r: "_BitReader", dc_tbl: dict) -> int:
    """DC category symbol with the T.81 bound enforced: a corrupted
    DHT can map codes to arbitrary value bytes, and an unbounded
    'size' would read a multi-hundred-bit amplitude (unbounded int ->
    OverflowError in the int64 coefficient store). >15 is bad data."""
    size = _read_symbol(r, dc_tbl)
    if size > 15:
        raise EOFError(f"invalid DC size category {size}")
    return size


def _decode_baseline(blob: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Shared baseline decoder: parse tables + SOF0 + SOS, entropy-
    decode interleaved MCUs, return (width, height, [component
    planes] in SOF order, upsampled to full resolution). Handles 1
    component (grayscale) and 3 components at any sampling with
    factors in {1, 2} — 4:4:4, 4:2:0 (the dominant real-world form:
    16x16 MCUs of four Y blocks + one Cb + one Cr), and 4:2:2;
    subsampled chroma is upsampled by pixel replication (the standard
    fast path). Restart intervals (DRI) are honored: at each RSTn the
    reader byte-aligns, verifies the marker sequence, and resets the
    DC predictors. Sampling factors above 2 / progressive /
    arithmetic gate to ``NotImplementedError``; malformed bytes
    (including out-of-sequence restart markers) raise
    ``ValueError``."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG stream")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    width = height = 0
    comps: list[dict] = []  # SOF order: {"cid": int, "tq": int}
    scan: dict[int, tuple[int, int]] = {}  # cid -> (dc_id, ac_id)
    sos_at = None
    adobe_transform: int | None = None
    for marker, payload, end in _segments(blob):
        if marker == 0xFFEE and payload[:5] == b"Adobe":
            # APP14: byte 11 is the color transform (0 = components
            # are RGB/CMYK as-is, 1 = YCbCr, 2 = YCCK). Decoding a
            # transform=0 stream as YCbCr would produce silently
            # garbled pixels, so record it and gate below
            # (r9 advice #5).
            adobe_transform = payload[11] if len(payload) > 11 else None
        elif marker == 0xFFDB:
            _parse_dqt(payload, quant)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "only baseline (SOF0) JPEG is supported by the stdlib "
                "codec — progressive/extended streams need Pillow"
            )
        elif marker == 0xFFC0:
            width, height, comps = _parse_sof(payload)
        elif marker == 0xFFC4:
            _parse_dht(payload, huff)
        elif marker == 0xFFDD:
            # DRI: every `restart_interval` MCUs the entropy stream is
            # byte-aligned and segmented by an RSTn marker, with DC
            # predictors reset — consumed in the MCU loop below.
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif 0xFFD0 <= marker <= 0xFFD7:
            # RSTn are bare markers legal only INSIDE the entropy
            # stream; seeing one in the header walk is bad data.
            raise ValueError("RSTn marker outside entropy stream")
        elif marker == 0xFFDA:
            ns = payload[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG not "
                    "supported by the stdlib codec"
                )
            for si in range(ns):
                cs, tbl = payload[1 + 2 * si : 3 + 2 * si]
                scan[cs] = (tbl >> 4, tbl & 0xF)
            sos_at = end
    if sos_at is None or not width or not comps:
        raise ValueError("truncated JPEG: no SOS/SOF")
    _gate_non_ycbcr(comps, adobe_transform)
    try:
        ctabs = [
            (huff[(0, scan[c["cid"]][0])], huff[(1, scan[c["cid"]][1])],
             quant[c["tq"]])
            for c in comps
        ]
    except KeyError as e:
        raise ValueError(
            f"JPEG references undeclared Huffman/quant table {e}"
        ) from e
    r = _BitReader(blob[sos_at:])
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    # MCU footprint is (8*hmax x 8*vmax) image pixels; each component
    # contributes h*v blocks per MCU in raster order (T.81 A.2.3)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])) for c in comps
    ]
    prev_dc = [0] * len(comps)

    def _one_block(dc_tbl, ac_tbl, q, ci: int) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        size = _dc_size_symbol(r, dc_tbl)
        diff = _extend(r.bits(size), size) if size else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = _read_symbol(r, ac_tbl)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            zz[k] = _extend(r.bits(size), size)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[ZIGZAG] = zz
        return _DCT.T @ (coef.reshape(8, 8) * q) @ _DCT + 128.0

    try:
        mcu_i = 0
        rst_expect = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and (
                    mcu_i % restart_interval == 0
                ):
                    got = r.restart_marker()
                    if got != rst_expect:
                        raise EOFError(
                            f"restart marker out of sequence: expected "
                            f"RST{rst_expect}, found RST{got}"
                        )
                    rst_expect = (rst_expect + 1) & 7
                    prev_dc[:] = [0] * len(comps)
                for ci, (c, (dc_tbl, ac_tbl, q)) in enumerate(
                    zip(comps, ctabs)
                ):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                                _one_block(dc_tbl, ac_tbl, q, ci)
                            )
                mcu_i += 1
    except (EOFError, KeyError, IndexError, OverflowError) as e:
        # A malformed/truncated entropy stream is bad DATA, not a
        # missing capability — surface it as ValueError so callers
        # (and multimodal's per-row error column) classify it as a
        # decode failure rather than crashing the UDF (r7 advice #3).
        raise ValueError(f"malformed JPEG entropy stream: {e}") from e
    out: list[np.ndarray] = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            # replicate subsampled chroma back to full resolution
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:height, :width])
    return width, height, out


def _decode_progressive(blob: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Progressive (SOF2, Huffman) decoder per ITU T.81 Annex G.2:
    every scan accumulates into per-component coefficient arrays —
    spectral selection (band Ss..Se per scan), successive
    approximation (first scan at point transform Al, refinement scans
    appending one bit of precision), EOB runs across blocks in AC
    scans, correction bits in AC refinement scans, restart markers
    resetting DC predictors and the EOB run — then one vectorized
    dequantize + IDCT reconstructs the planes. Returns the same
    (width, height, planes) contract as ``_decode_baseline``."""
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    width = height = 0
    comps: list[dict] = []
    adobe_transform: int | None = None
    coefs: list[np.ndarray] = []
    mcux = mcuy = hmax = vmax = 0
    qt_of: list[int] = []
    saw_scan = False

    for marker, payload, entropy in _segments_full(blob):
        if marker == 0xFFEE and payload[:5] == b"Adobe":
            adobe_transform = payload[11] if len(payload) > 11 else None
        elif marker == 0xFFDB:
            _parse_dqt(payload, quant)
        elif marker == 0xFFC4:
            _parse_dht(payload, huff)
        elif marker == 0xFFDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xFFC2:
            width, height, comps = _parse_sof(payload)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            # coefficient arrays on the MCU-padded grid (interleaved
            # DC scans cover padding blocks; AC scans fill the
            # component's own ceil grid inside it)
            coefs = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
            qt_of = [c["tq"] for c in comps]
        elif marker in (0xFFC0, 0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise NotImplementedError(
                "mixed/non-SOF2 frame in progressive decode path"
            )
        elif marker == 0xFFDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            saw_scan = True
            _progressive_scan(
                payload, entropy or b"", comps, coefs, huff,
                mcux, mcuy, hmax, vmax, width, height, restart_interval,
            )
    if not saw_scan or not width:
        raise ValueError("truncated JPEG: no SOS/SOF")
    _gate_non_ycbcr(comps, adobe_transform)
    out: list[np.ndarray] = []
    for c, zz, tq in zip(comps, coefs, qt_of):
        if tq not in quant:
            raise ValueError(
                f"JPEG references undeclared quant table {tq}"
            )
        by, bx, _ = zz.shape
        nat = np.zeros_like(zz, dtype=np.float64)
        nat[..., ZIGZAG] = zz
        blocks = nat.reshape(by, bx, 8, 8) * quant[tq][None, None]
        # batched IDCT: DCT.T @ B @ DCT per block
        recon = np.einsum("ij,abjk,kl->abil", _DCT.T, blocks, _DCT) + 128.0
        plane = recon.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:height, :width])
    return width, height, out


def _progressive_scan(
    payload: bytes,
    entropy: bytes,
    comps: list[dict],
    coefs: list[np.ndarray],
    huff: dict,
    mcux: int,
    mcuy: int,
    hmax: int,
    vmax: int,
    width: int,
    height: int,
    restart_interval: int,
) -> None:
    """Decode ONE progressive scan into the coefficient arrays."""
    ns = payload[0]
    scan: list[tuple[int, int, int]] = []  # (comp index, dc id, ac id)
    cid_to_ix = {c["cid"]: i for i, c in enumerate(comps)}
    for si in range(ns):
        cs, tbl = payload[1 + 2 * si : 3 + 2 * si]
        if cs not in cid_to_ix:
            raise ValueError(f"scan references unknown component {cs}")
        scan.append((cid_to_ix[cs], tbl >> 4, tbl & 0xF))
    ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    if ss == 0 and se != 0:
        raise ValueError("progressive DC scan with Se != 0")
    if ss > 0 and ns != 1:
        raise ValueError("progressive AC scan must be single-component")

    r = _BitReader(entropy)
    eobrun = [0]
    prev_dc = [0] * ns
    rst_expect = 0
    unit_i = 0

    def _tbl(tc: int, th: int) -> dict:
        try:
            return huff[(tc, th)]
        except KeyError as e:
            raise ValueError(
                f"JPEG references undeclared Huffman table {e}"
            ) from e

    def _restart_if_due() -> None:
        nonlocal rst_expect
        if restart_interval and unit_i and unit_i % restart_interval == 0:
            got = r.restart_marker()
            if got != rst_expect:
                raise EOFError(
                    f"restart marker out of sequence: expected "
                    f"RST{rst_expect}, found RST{got}"
                )
            rst_expect = (rst_expect + 1) & 7
            prev_dc[:] = [0] * ns
            eobrun[0] = 0

    try:
        if ss == 0:
            # DC scan: interleaved when ns > 1, the component's own
            # grid when ns == 1 (non-interleaved by spec)
            if ns > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        _restart_if_due()
                        for i, (ci, dc_id, _) in enumerate(scan):
                            c = comps[ci]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    _dc_block(
                                        r, coefs[ci],
                                        my * c["v"] + by, mx * c["h"] + bx,
                                        _tbl(0, dc_id) if ah == 0 else None,
                                        prev_dc, i, ah, al,
                                    )
                        unit_i += 1
            else:
                ci, dc_id, _ = scan[0]
                bh, bw = _comp_blocks(
                    comps[ci], width, height, hmax, vmax
                )
                for byy in range(bh):
                    for bxx in range(bw):
                        _restart_if_due()
                        _dc_block(
                            r, coefs[ci], byy, bxx,
                            _tbl(0, dc_id) if ah == 0 else None,
                            prev_dc, 0, ah, al,
                        )
                        unit_i += 1
        else:
            ci, _, ac_id = scan[0]
            ac_tbl = _tbl(1, ac_id)
            bh, bw = _comp_blocks(comps[ci], width, height, hmax, vmax)
            for byy in range(bh):
                for bxx in range(bw):
                    _restart_if_due()
                    zz = coefs[ci][byy, bxx]
                    if ah == 0:
                        _ac_first(r, zz, ss, se, al, ac_tbl, eobrun)
                    else:
                        _ac_refine(r, zz, ss, se, al, ac_tbl, eobrun)
                    unit_i += 1
    except (EOFError, KeyError, IndexError, OverflowError) as e:
        raise ValueError(f"malformed JPEG entropy stream: {e}") from e


def _comp_blocks(
    c: dict, width: int, height: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """Non-interleaved block grid: ceil over the component's OWN
    sampled dimensions (T.81 A.2.2), not the MCU-padded grid."""
    cw = (width * c["h"] + hmax - 1) // hmax
    ch = (height * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _dc_block(
    r: "_BitReader",
    coef: np.ndarray,
    by: int,
    bx: int,
    dc_tbl: dict | None,
    prev_dc: list,
    i: int,
    ah: int,
    al: int,
) -> None:
    if ah == 0:
        size = _dc_size_symbol(r, dc_tbl)
        diff = _extend(r.bits(size), size) if size else 0
        prev_dc[i] += diff
        coef[by, bx, 0] = prev_dc[i] << al
    elif r.bit():
        # refinement: append one magnitude bit (two's complement |=
        # is exact for negatives too)
        coef[by, bx, 0] |= 1 << al


def _ac_first(
    r: "_BitReader",
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_tbl: dict,
    eobrun: list,
) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        sym = _read_symbol(r, ac_tbl)
        rr, s = sym >> 4, sym & 0xF
        if s:
            k += rr
            if k > se:
                raise EOFError("AC coefficient index past Se")
            zz[k] = _extend(r.bits(s), s) << al
            k += 1
        elif rr == 15:
            k += 16  # ZRL
        else:
            eobrun[0] = (1 << rr) - 1
            if rr:
                eobrun[0] += r.bits(rr)
            return


def _ac_refine(
    r: "_BitReader",
    zz: np.ndarray,
    ss: int,
    se: int,
    al: int,
    ac_tbl: dict,
    eobrun: list,
) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    significant coefficients arrive as +/-1<<Al; every NONZERO-history
    coefficient passed on the way carries one correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss

    def _correct(k: int) -> None:
        if r.bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else m1

    if eobrun[0] == 0:
        while k <= se:
            sym = _read_symbol(r, ac_tbl)
            rr, s = sym >> 4, sym & 0xF
            val = 0
            if s:
                if s != 1:
                    raise EOFError("AC refinement magnitude must be 1")
                val = p1 if r.bit() else m1
            elif rr != 15:
                eobrun[0] = 1 << rr
                if rr:
                    eobrun[0] += r.bits(rr)
                break
            # advance over rr zero-history positions, correcting
            # nonzero-history coefficients along the way
            while k <= se:
                if zz[k] != 0:
                    _correct(k)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if zz[k] != 0:
                _correct(k)
            k += 1
        eobrun[0] -= 1


def _decode_any(blob: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Route on the frame type: SOF0 -> baseline, SOF2 (Huffman
    progressive) -> progressive; every other SOFn keeps its explicit
    capability gate. This is also the malformed-bytes boundary for
    HEADER-level damage: any struct/index/EOF error raised while
    parsing arbitrary bytes is bad DATA (ValueError), never a crash
    escaping into the multimodal UDF — the entropy decoders convert
    their own failures inner-loop with more specific messages."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG stream")
    try:
        for marker, _payload, _ in _segments(blob):
            if marker == 0xFFC0:
                return _decode_baseline(blob)
            if marker == 0xFFC2:
                return _decode_progressive(blob)
            if marker in (0xFFC1, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                          0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
                raise NotImplementedError(
                    "only baseline (SOF0) and Huffman progressive (SOF2) "
                    "JPEG are supported by the stdlib codec — "
                    "extended/arithmetic/lossless streams need Pillow"
                )
    except (struct.error, IndexError, KeyError, EOFError,
            OverflowError) as e:
        raise ValueError(f"malformed JPEG headers: {e}") from e
    raise ValueError("truncated JPEG: no SOS/SOF")


def decode_gray(blob: bytes) -> tuple[int, int, list[int]]:
    """Baseline grayscale JPEG -> (width, height, row-major pixels).

    Raises ``NotImplementedError`` for arithmetic/extended streams —
    and for COLOR streams, which this strict-grayscale entry point
    rejects by contract (``decode_image`` handles them) — and
    ``ValueError`` for malformed bytes. Baseline (SOF0) and Huffman
    progressive (SOF2) both decode."""
    width, height, planes = _decode_any(blob)
    if len(planes) != 1:
        raise NotImplementedError(
            "decode_gray is single-component by contract — use "
            "decode_image for color JPEG"
        )
    out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return width, height, out.flatten().tolist()


def decode_image(blob: bytes) -> tuple[int, int, int, list[int]]:
    """Baseline (SOF0) or Huffman-progressive (SOF2) JPEG (grayscale
    or color at any 1/2-factor sampling) -> (width, height,
    n_components, row-major pixels — interleaved RGB for color).
    YCbCr -> RGB uses the JFIF/BT.601 inverse, matching every
    standard JPEG reader."""
    width, height, planes = _decode_any(blob)
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.flatten().tolist()
    rgb = _ycbcr_to_rgb(*planes)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.flatten().tolist()
