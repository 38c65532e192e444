"""Spec-derived JPEG conformance pins that do NOT route through the
repo's encoder.

The PIL-parity test is the usual cross-decoder check, but Pillow is
absent in this sandbox, so a mirrored encode/decode bug could pass the
symmetric round-trip tests (r10 advice). These fixtures close that
hole in-sandbox: the byte streams below are assembled by hand straight
from ITU T.81 (marker layout from B.2, Huffman coding from F.1.2 /
Annex G.2), sharing no code with ``jpegio``'s encoder, and the
expected pixels are LITERALS computed analytically — a DC-only 8x8
block reconstructs to the flat value ``DC_dequant / 8 + 128`` (the
2-D IDCT of a lone c00 term), so no IDCT code is needed to know the
answer. A decoder bug mirrored into the encoder cannot satisfy these.

Fixture geometry (both streams): 16x8 grayscale, two 8x8 blocks,
quant table all-ones, raw DC coefficients 80 (left block) and 96
(right block) -> flat pixels 128 + 80/8 = 138 and 128 + 96/8 = 140.
"""

from __future__ import annotations

import struct

import pytest

from etl_notifier_pipeline_spark.extensions import jpegio

EXPECTED_PIXELS = ([138] * 8 + [140] * 8) * 8  # row-major 16x8


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dqt_all_ones() -> bytes:
    return _seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))


def _dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    assert len(bits) == 16 and sum(bits) == len(vals)
    return _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def _pack_bits(bits: str) -> bytes:
    """MSB-first bit string -> bytes, 1-padded per T.81 F.1.2.3 (the
    values below never form 0xFF, so no byte stuffing arises)."""
    bits = bits + "1" * (-len(bits) % 8)
    out = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert b"\xff" not in out, "fixture must not need byte stuffing"
    return out


def progressive_fixture() -> bytes:
    """SOF2, three scans: DC-first at Al=1, DC refinement (Ah=1,
    Al=0), then the AC band 1..63 as a single EOBRUN=2 (symbol 0x10 +
    one 0 extension bit) covering both all-zero-AC blocks."""
    # DC table 0: two length-2 codes, '00'->cat 4, '01'->cat 6.
    # AC table 0: '00'->0x10 (EOB1), '01'->0x00 (EOB0, unused).
    out = b"\xff\xd8"
    out += _dqt_all_ones()
    out += _seg(0xFFC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, [0, 2] + [0] * 14, [4, 6])
    # scan 1: DC first, Al=1. Shifted DCs 40, 48 -> diffs 40 (cat 6,
    # '01'+'101000') then 8 (cat 4, '00'+'1000').
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += _pack_bits("01" + "101000" + "00" + "1000")
    # scan 2: DC refinement, Ah=1 Al=0 — one raw LSB per block (80 and
    # 96 are both even -> bits 0,0).
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    out += _pack_bits("00")
    # scan 3: AC 1..63 first pass. EOBn r=1 ('00') + ext bit 0 ->
    # EOBRUN = (1<<1) + 0 = 2, ending both blocks in one symbol.
    out += _dht(1, 0, [0, 2] + [0] * 14, [0x10, 0x00])
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += _pack_bits("00" + "0")
    out += b"\xff\xd9"
    return out


def restart_fixture() -> bytes:
    """SOF0 baseline with DRI=1: RST0 between the two blocks, so the
    second block's DC prediction resets (diff = raw 96, not 16)."""
    # DC table 0: single length-1 code '0' -> cat 7.
    # AC table 0: single length-1 code '0' -> 0x00 (EOB).
    out = b"\xff\xd8"
    out += _dqt_all_ones()
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, [1] + [0] * 15, [7])
    out += _dht(1, 0, [1] + [0] * 15, [0x00])
    out += _seg(0xFFDD, struct.pack(">H", 1))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # block 1: DC 80 = cat 7 ('0'+'1010000'), then EOB ('0')
    out += _pack_bits("0" + "1010000" + "0")
    out += b"\xff\xd0"  # RST0 — resets the DC predictor
    # block 2: diff 96 post-reset = cat 7 ('0'+'1100000'), then EOB
    out += _pack_bits("0" + "1100000" + "0")
    out += b"\xff\xd9"
    return out


def test_progressive_spec_stream_decodes_to_pinned_pixels():
    blob = progressive_fixture()
    assert jpegio.is_jpeg(blob)
    w, h, px = jpegio.decode_gray(blob)
    assert (w, h) == (16, 8)
    assert px == EXPECTED_PIXELS


def test_restart_spec_stream_decodes_to_pinned_pixels():
    blob = restart_fixture()
    w, h, px = jpegio.decode_gray(blob)
    assert (w, h) == (16, 8)
    assert px == EXPECTED_PIXELS


def test_restart_prediction_reset_matters():
    """Decoding must RESET the DC predictor at RST0: if it carried the
    prediction across the marker, block 2 would land on 80+96=176 ->
    pixel 150, not 140. Pin the distinguishing pixel directly."""
    _, _, px = jpegio.decode_gray(restart_fixture())
    assert px[8] == 140 and px[8] != 150


def test_progressive_header_position_rstn_rejected():
    """A restart marker at header position (outside any entropy
    segment) is malformed in BOTH walkers — r10 advice pinned the
    progressive walker to the baseline's classification."""
    blob = progressive_fixture()
    # splice a bare RST1 right before the first SOS
    sos = blob.index(b"\xff\xda")
    bad = blob[:sos] + b"\xff\xd1" + blob[sos:]
    with pytest.raises(ValueError, match="RSTn"):
        jpegio.decode_gray(bad)
