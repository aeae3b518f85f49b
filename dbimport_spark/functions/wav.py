"""From-scratch WAV (RIFF/PCM + G.711) codec — the audio sibling of the
PNG codec.

Implements the canonical WAVE file layout from the public RIFF/WAVE
specification (Microsoft/IBM multimedia programming interface spec;
summarized at http://soundfile.sapp.org/doc/WaveFormat/): ``RIFF`` size
``WAVE`` header, a ``fmt `` chunk, and a ``data`` chunk. Chunk walking
skips unknown chunks (LIST/INFO etc.) per spec, so files written by
other tools decode too.

Three format tags decode for real:
  * 1 (PCM, 16-bit) — little-endian int16 frames.
  * 7 (μ-law) and 6 (A-law) — ITU-T G.711 companded 8-bit audio, the
    classic COMPRESSED telephony formats. Expansion to int16 is a pure
    256-entry table lookup built from the published segment formulas
    (exponent/mantissa piecewise-linear approximation of the log curve),
    applied with numpy fancy indexing — fully vectorized, no per-sample
    Python. The compressors (linear → code) are implemented too, also
    vectorized (segment index via bit-length LUT).

Container note: no audio libraries ship in this environment, so — like
sources/avro.py and functions/png.py — the format is implemented
stdlib-only (struct + bytes). The stdlib ``wave`` module cross-validates
the writer in tests; the reader here is used on executors (operates on
in-memory bytes, no filesystem round-trip, numpy-vectorized sample
decode)."""

from __future__ import annotations

import struct

import numpy as np


def _build_g711_tables():
    """Decode LUTs (code byte → int16) from the G.711 segment formulas.

    μ-law: the transmitted byte is bit-inverted; u = ~c has sign(1) /
    exponent(3) / mantissa(4) fields and decodes to
    ±(((mant·8 + 132) << exp) − 132)  (max 32124).
    A-law: the byte is XOR-masked with 0x55; segment 0 decodes to
    mant·16 + 8, higher segments to (mant·16 + 264) << (seg − 1), with
    the sign bit SET meaning positive (max 32256)."""
    codes = np.arange(256, dtype=np.int32)

    u = 255 - codes  # ~c & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    mu = np.where(u & 0x80, 0x84 - mag, mag - 0x84).astype(np.int16)

    a = codes ^ 0x55
    seg = (a >> 4) & 7
    mant = a & 0x0F
    t = np.where(seg == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(seg - 1, 0))
    alaw = np.where(a & 0x80, t, -t).astype(np.int16)
    return mu, alaw


_G711_MU_DECODE, _G711_A_DECODE = _build_g711_tables()

#: bit-length of each byte value 0..255 — the vectorized "find the
#: segment" primitive both compressors share.
_BIT_LEN = np.array([max(1, int(v).bit_length()) for v in range(256)], dtype=np.int32)


def g711_decode(codes, law: str = "mu") -> np.ndarray:
    """companded byte array → int16 samples (pure LUT fancy-index)."""
    table = _G711_MU_DECODE if law == "mu" else _G711_A_DECODE
    arr = np.frombuffer(codes, dtype=np.uint8) if isinstance(codes, (bytes, bytearray)) else np.asarray(codes, dtype=np.uint8)
    return table[arr]


#: Segment upper bounds for the compressors (16-bit magnitude domain):
#: μ-law segments end at (0x1F..0xFFF << 3) + bias headroom; A-law at
#: the published 0x1F..0xFFF knees scaled ×8 (its codes carry a 13-bit
#: magnitude in a 16-bit word).
_SEG_MU_END = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32)
_SEG_A_END = np.array([0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32)


def g711_encode(samples, law: str = "mu") -> bytes:
    """int16 samples → companded byte per sample (vectorized compressor).

    Round-trip property (asserted in tests): encode(decode(c)) == c for
    every code — each code decodes to its segment's reconstruction level,
    which re-compresses to the same code."""
    x = np.asarray(samples, dtype=np.int32)
    if law == "mu":
        sign = np.where(x < 0, 0x80, 0)
        mag = np.minimum(np.abs(x), 32635) + 0x84
        exp = np.searchsorted(_SEG_MU_END, mag, side="left").astype(np.int32)
        mant = (mag >> (exp + 3)) & 0x0F
        return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()
    if law == "a":
        # sign bit SET means positive on the wire (before the 0x55 mask)
        sign = np.where(x >= 0, 0x80, 0)
        mag = np.minimum(np.where(x >= 0, x, -x), 32767)
        seg = np.searchsorted(_SEG_A_END, mag, side="left").astype(np.int32)
        mant = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0x0F)
        return (((sign | (seg << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8).tobytes()
    raise ValueError(f"unknown companding law {law!r}")


def encode_wav(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """int16 samples (interleaved if multi-channel) → WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ",
        16,
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def encode_wav_g711(codes: bytes, law: str = "mu", sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Companded G.711 code bytes → WAV bytes (format tag 7=μ-law,
    6=A-law, 8 bits/sample). Non-PCM fmt chunks carry a cbSize field per
    the WAVE spec, so the fmt chunk is 18 bytes here."""
    tag = {"mu": 7, "a": 6}.get(law)
    if tag is None:
        raise ValueError(f"unknown companding law {law!r}")
    block_align = channels
    fmt = struct.pack(
        "<4sIHHIIHHH",
        b"fmt ",
        18,
        tag,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        8,
        0,  # cbSize
    )
    data = struct.pack("<4sI", b"data", len(codes)) + codes
    if len(codes) & 1:
        data += b"\x00"  # word alignment; data size field stays exact
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(blob: bytes):
    """WAV bytes → (sample_rate, channels, int16 numpy array of frames).

    Walks RIFF chunks (word-aligned per spec), requires a ``fmt `` chunk
    before ``data``, and rejects unsupported encodings or truncated
    payloads loudly rather than guessing. PCM16 passes through; G.711
    μ-law/A-law (tags 7/6, 8-bit) expand to int16 via the vectorized
    LUTs — compressed audio decoded for real."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = tag = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        pos += 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", blob, pos
            )
            if not ((tag == 1 and bits == 16) or (tag in (6, 7) and bits == 8)):
                raise ValueError(f"unsupported WAV encoding (tag={tag}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if pos + size > len(blob):
                raise ValueError("truncated data chunk")
            if tag == 1:
                pcm = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=pos)
            else:
                pcm = g711_decode(
                    blob[pos : pos + size], "mu" if tag == 7 else "a"
                )
            return rate, channels, pcm
        pos += size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")
