"""Stdlib RIFF/WAVE audio codec (SURVEY §2.10 X4 — the audio analog
of ``pngio``/``jpegio``).

The multimodal mandate treats audio as opaque ``binary`` columns whose
decode step is stubbed when the codec library is absent. Like images
(stdlib PNG + baseline JPEG), uncompressed PCM WAV needs no external
library at all: the container is a RIFF chunk walk and the samples are
fixed-width little-endian integers (or IEEE float32) — all parseable
with ``struct``. This module decodes WAV *for real* in-sandbox so the
audio modality joins PNG/JPEG on the genuinely-decoded side of
``codec="auto"``; compressed formats (MP3/AAC/μ-law/ADPCM…) stay
clearly gated behind ``NotImplementedError`` so the auto path falls
back to the deterministic fake instead of emitting garbage.

Format support (WAVE_FORMAT_PCM=1, WAVE_FORMAT_IEEE_FLOAT=3, plus
WAVE_FORMAT_EXTENSIBLE=0xFFFE wrapping either):

- PCM 8-bit (unsigned), 16/24/32-bit (signed little-endian)
- IEEE float32 / float64
- any channel count (decode mixes to mono by plain mean — the same
  convention as the image path's fixed luma transform: one canonical
  scalar signal per asset, so features are layout-independent)
- arbitrary extra chunks (LIST/fact/cue…) are skipped by the chunk
  walk; a stdlib-``wave``-module parity test pins the header fields

Scale notes: decode runs inside Arrow-batched ``mapInPandas`` (see
``extensions.multimodal``) — one Python call per BATCH of blobs, never
per row; nothing here touches the driver. Reference parity: the
reference pipeline has no media path at all (its 1,001 LoC are
DB/queue glue) — this implements the multimodal mandate from the task
brief, not a reference file.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- container


def is_wav(blob: bytes) -> bool:
    """True when the bytes carry the RIFF/WAVE magic."""
    return (
        blob is not None
        and len(blob) >= 12
        and blob[0:4] == b"RIFF"
        and blob[8:12] == b"WAVE"
    )


def _chunks(blob: bytes):
    """Walk RIFF sub-chunks: yields (fourcc, payload_offset, size).
    Chunks are word-aligned — odd sizes carry a pad byte."""
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


class WavInfo:
    """Parsed header facts (no sample decode)."""

    __slots__ = (
        "format_tag",
        "channels",
        "sample_rate",
        "bits_per_sample",
        "data_offset",
        "data_size",
    )

    def __init__(self, format_tag, channels, sample_rate, bits_per_sample,
                 data_offset, data_size):
        self.format_tag = format_tag
        self.channels = channels
        self.sample_rate = sample_rate
        self.bits_per_sample = bits_per_sample
        self.data_offset = data_offset
        self.data_size = data_size

    @property
    def n_frames(self) -> int:
        bpf = self.channels * (self.bits_per_sample // 8)
        return self.data_size // bpf if bpf else 0

    @property
    def duration_ms(self) -> int:
        if not self.sample_rate:
            return 0
        return self.n_frames * 1000 // self.sample_rate


def wav_info(blob: bytes) -> WavInfo:
    """Parse the fmt/data chunks. Raises ``ValueError`` on malformed
    containers, ``NotImplementedError`` on compressed format tags —
    the same gate taxonomy as ``jpegio`` (malformed vs capability)."""
    if not is_wav(blob):
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    for fourcc, off, size in _chunks(blob):
        if fourcc == b"fmt " and fmt is None:
            if size < 16 or off + 16 > len(blob):
                raise ValueError("truncated fmt chunk")
            tag, ch, rate, _byterate, _align, bits = struct.unpack_from(
                "<HHIIHH", blob, off
            )
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag is the
                # first 2 bytes of the 16-byte SubFormat GUID
                if size < 40 or off + 26 > len(blob):
                    raise ValueError("truncated extensible fmt chunk")
                (tag,) = struct.unpack_from("<H", blob, off + 24)
            fmt = (tag, ch, rate, bits)
        elif fourcc == b"data" and data is None:
            data = (off, min(size, len(blob) - off))
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, bits = fmt
    if tag not in (1, 3):
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed/companded) requires an "
            "audio codec library; stdlib path decodes PCM and IEEE float"
        )
    if tag == 1 and bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"PCM bit depth {bits} unsupported")
    if tag == 3 and bits not in (32, 64):
        raise NotImplementedError(f"IEEE float bit depth {bits} unsupported")
    if ch == 0 or rate == 0:
        raise ValueError("zero channels or sample rate")
    if rate > 10_000_000:
        # u32 header field, but no real codec emits >10 MHz — an
        # adversarial value here would otherwise overflow the int32
        # column audio_meta declares, failing the whole Arrow batch
        # instead of NULLing one row
        raise ValueError(f"implausible sample rate {rate}")
    return WavInfo(tag, ch, rate, bits, data[0], data[1])


# ------------------------------------------------------------------ samples


def mono_samples(blob: bytes) -> tuple[int, list[float]]:
    """Decode to a mono float signal in [-1, 1]: (sample_rate,
    samples). Multi-channel input mixes by per-frame mean. Pure-python
    ``struct`` decode — callers batch via Arrow, so the per-blob cost
    is bounded by fixture-sized assets; a 100 TB corpus decodes inside
    executors, one batch at a time."""
    info = wav_info(blob)
    raw = blob[info.data_offset : info.data_offset + info.data_size]
    ch = info.channels
    if info.format_tag == 3:
        fmt_char = "f" if info.bits_per_sample == 32 else "d"
        width = info.bits_per_sample // 8
        n = len(raw) // width
        vals = struct.unpack(f"<{n}{fmt_char}", raw[: n * width])
        flat = [float(v) for v in vals]
    elif info.bits_per_sample == 8:
        flat = [(b - 128) / 128.0 for b in raw]
    elif info.bits_per_sample == 16:
        n = len(raw) // 2
        vals = struct.unpack(f"<{n}h", raw[: n * 2])
        flat = [v / 32768.0 for v in vals]
    elif info.bits_per_sample == 24:
        n = len(raw) // 3
        flat = []
        for i in range(n):
            b0, b1, b2 = raw[3 * i], raw[3 * i + 1], raw[3 * i + 2]
            v = b0 | (b1 << 8) | (b2 << 16)
            if v >= 1 << 23:
                v -= 1 << 24
            flat.append(v / 8388608.0)
    else:  # 32-bit PCM
        n = len(raw) // 4
        vals = struct.unpack(f"<{n}i", raw[: n * 4])
        flat = [v / 2147483648.0 for v in vals]
    if ch == 1:
        return info.sample_rate, flat
    frames = len(flat) // ch
    mono = [
        sum(flat[f * ch : (f + 1) * ch]) / ch for f in range(frames)
    ]
    return info.sample_rate, mono


# ------------------------------------------------------------------ encoder


def encode_wav(
    samples: list[float], sample_rate: int, *, channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Minimal PCM WAV writer (16-bit LE; interleaved input for
    multi-channel) — exists so round-trip tests and deterministic
    fixtures need no external tooling. Clamps to [-1, 1]."""
    if bits != 16:
        raise NotImplementedError("encoder writes 16-bit PCM only")
    ints = []
    for s in samples:
        s = -1.0 if s < -1.0 else (1.0 if s > 1.0 else s)
        v = int(round(s * 32767.0))
        ints.append(v)
    data = struct.pack(f"<{len(ints)}h", *ints)
    byterate = sample_rate * channels * 2
    align = channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byterate, align, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


# ----------------------------------------------------------------- features


def segment_rms_features(
    samples: list[float], n_segments: int = 16
) -> list[float]:
    """The audio analog of the image path's 4x4 block-mean pooling:
    split the mono signal into ``n_segments`` equal spans (integer
    floor boundaries — deterministic, resampling-free) and emit each
    span's RMS energy. Values land in [0, 1]; an exact byte-duplicate
    asset reproduces the vector bit-for-bit (the xm near-dup queries'
    cos==1.0 invariant)."""
    n = len(samples)
    if n < n_segments:
        raise ValueError(
            f"signal too short to pool: {n} samples < {n_segments} segments"
        )
    feats = []
    for i in range(n_segments):
        lo = i * n // n_segments
        hi = (i + 1) * n // n_segments
        acc = 0.0
        for j in range(lo, hi):
            acc += samples[j] * samples[j]
        feats.append((acc / (hi - lo)) ** 0.5)
    return feats
