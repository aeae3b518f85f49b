"""From-scratch WAV (RIFF/PCM) codec — the audio sibling of the PNG codec.

Implements the canonical WAVE file layout from the public RIFF/WAVE
specification (Microsoft/IBM multimedia programming interface spec;
summarized at http://soundfile.sapp.org/doc/WaveFormat/): ``RIFF`` size
``WAVE`` header, a ``fmt `` chunk (PCM format tag 1, 16-bit), and a
``data`` chunk of little-endian int16 frames. Chunk walking skips unknown
chunks (LIST/INFO etc.) per spec, so files written by other tools decode
too.

Container note: no audio libraries ship in this environment, so — like
sources/avro.py and functions/png.py — the format is implemented
stdlib-only (struct + bytes). The stdlib ``wave`` module cross-validates
the writer in tests; the reader here is used on executors (operates on
in-memory bytes, no filesystem round-trip, numpy-vectorized sample
decode)."""

from __future__ import annotations

import struct

import numpy as np


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


def decode_wav(blob: bytes):
    """WAV bytes → (sample_rate, channels, int16 numpy array of frames).

    Walks RIFF chunks (word-aligned per spec), requires a PCM16 ``fmt ``
    chunk before ``data``, and rejects non-PCM or truncated payloads
    loudly rather than guessing."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        pos += 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", blob, pos
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding (tag={tag}, bits={bits})")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if pos + size > len(blob):
                raise ValueError("truncated data chunk")
            pcm = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=pos)
            return rate, channels, pcm
        pos += size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")
