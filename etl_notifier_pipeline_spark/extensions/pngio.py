"""Minimal pure-stdlib PNG codec (8-bit gray / RGB, non-interlaced).

Why this exists: the engine's multimodal operators must exercise a
REAL image decode end-to-end — genuine bytes, genuine format parsing —
but the sandbox has no Pillow. PNG is losslessly decodable with
nothing beyond ``zlib`` + ``struct``, so this module supplies the
fallback decode branch (and the encoder that generated the committed
``tests/fixtures/media`` PNGs). PNG being lossless means the PIL
branch and this branch reconstruct IDENTICAL pixels, so feature
extraction (explicit block-mean pooling over the decoded pixels)
produces bit-equal vectors on either branch — asserted by a
PIL-gated parity test wherever Pillow is installed.

Scope (all the fixture needs, strict errors otherwise): bit depth 8,
color type 0 (grayscale) or 2 (RGB), no interlacing, no palette or
alpha. The decoder implements all five scanline filters (None / Sub /
Up / Average / Paeth) since any compliant encoder may emit them.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, mode: str = "L") -> bytes:
    """Serialize raw 8-bit pixels (row-major, ``L`` = 1 byte/px,
    ``RGB`` = 3 bytes/px) into a genuine PNG byte string."""
    channels = {"L": 1, "RGB": 3}[mode]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"expected {width * height * channels} bytes, got {len(pixels)}"
        )
    color_type = 0 if mode == "L" else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def is_png(blob: bytes) -> bool:
    return bool(blob) and blob[:8] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> tuple[int, int, str, bytes]:
    """Parse a PNG into (width, height, mode, raw row-major pixels).

    Raises ValueError on anything outside the supported subset — a
    corrupt or exotic file must fail loudly, never yield garbage
    features."""
    if not is_png(blob):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    mode = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (0, 2) or interlace or comp or filt:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            mode = "L" if color == 0 else "RGB"
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or mode is None:
        raise ValueError("missing IHDR")
    channels = 1 if mode == "L" else 3
    stride = width * channels
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # corrupted/truncated IDAT is bad DATA, not a crash — the
        # multimodal codec="auto" path classifies ValueError as
        # "undecodable here" and falls back
        raise ValueError(f"malformed PNG IDAT stream: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, mode, bytes(out)


def gray_pixels(blob: bytes) -> tuple[int, int, list[int]]:
    """Decode to grayscale. RGB uses Pillow's exact fixed-point ITU-R
    601 luma — ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` — so
    this branch and a PIL ``convert("L")`` branch feed bit-identical
    values to the pooling step (asserted by the PIL-gated parity
    test)."""
    width, height, mode, raw = decode_png(blob)
    if mode == "L":
        return width, height, list(raw)
    px = [
        (raw[i] * 19595 + raw[i + 1] * 38470 + raw[i + 2] * 7471 + 0x8000) >> 16
        for i in range(0, len(raw), 3)
    ]
    return width, height, px
