"""AIFF codec (Audio Interchange File Format) — the big-endian IFF
cousin of WAV that Mac-sourced corpora carry, from the public AIFF-C
specification (Apple, 1989). Layout: ``FORM`` size ``AIFF`` container
with a ``COMM`` chunk (channels, frame count, bits, and the sample rate
as an 80-bit IEEE 754 extended float — decoded from its sign/exponent/
mantissa fields, no float80 support needed) and an ``SSND`` chunk
(offset + block-size prelude, then big-endian PCM frames). 16-bit
mono/stereo; unknown chunks are skipped per the IFF rules; chunks are
word-aligned like RIFF.
"""

from __future__ import annotations

import struct

import numpy as np


class AiffError(ValueError):
    pass


def _pack_extended(rate: int) -> bytes:
    """int sample rate → 80-bit IEEE 754 extended (sign/15-bit biased
    exponent, 64-bit mantissa with explicit integer bit)."""
    if rate <= 0:
        raise AiffError("sample rate must be positive")
    exp = rate.bit_length() - 1
    mant = rate << (63 - exp)  # normalize: top bit of the 64-bit mantissa set
    return struct.pack(">HQ", 16383 + exp, mant)


def _unpack_extended(b: bytes) -> int:
    expo, mant = struct.unpack(">HQ", b)
    if expo & 0x8000:
        raise AiffError("negative sample rate")
    if expo == 0 and mant == 0:
        raise AiffError("zero sample rate")
    exp = expo - 16383
    # value = mant / 2^63 * 2^exp; integer rates land exactly
    shift = 63 - exp
    if shift < 0:
        raise AiffError("sample rate out of range")
    if mant & ((1 << shift) - 1):
        raise AiffError("non-integer sample rate not supported")
    return mant >> shift


def encode_aiff(samples, sample_rate: int = 8000) -> bytes:
    """int16 samples (1-D mono or (n, 2) stereo) → AIFF bytes."""
    x = np.asarray(samples, dtype=np.int16)
    stereo = x.ndim == 2
    if stereo and x.shape[1] != 2:
        raise AiffError("only mono or stereo is supported")
    if x.size == 0:
        raise AiffError("cannot encode an empty sample stream")
    channels = 2 if stereo else 1
    n_frames = x.shape[0]
    pcm = x.astype(">i2").tobytes()  # interleaved big-endian
    comm = struct.pack(">hIh", channels, n_frames, 16) + _pack_extended(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + pcm
    body = b"AIFF"
    for cid, payload in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"  # IFF word alignment
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(blob: bytes):
    """AIFF bytes → (sample_rate, int16 samples; (n, 2) when stereo)."""
    if len(blob) < 12 or blob[:4] != b"FORM" or blob[8:12] != b"AIFF":
        raise AiffError("not an AIFF file")
    pos = 12
    channels = n_frames = bits = rate = None
    pcm = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from(">I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise AiffError(f"truncated {cid!r} chunk")
        if cid == b"COMM":
            if size < 18:
                raise AiffError("COMM chunk too short")
            channels, n_frames, bits = struct.unpack_from(">hIh", body, 0)
            rate = _unpack_extended(body[8:18])
            if channels not in (1, 2) or bits != 16:
                raise AiffError(
                    f"unsupported AIFF ({channels} channels, {bits}-bit)"
                )
        elif cid == b"SSND":
            if channels is None:
                raise AiffError("SSND before COMM")
            off, _blk = struct.unpack_from(">II", body, 0)
            data = body[8 + off :]
            need = n_frames * channels * 2
            if len(data) < need:
                raise AiffError("truncated SSND sample data")
            pcm = np.frombuffer(data, dtype=">i2", count=n_frames * channels)
            x = pcm.astype(np.int16)
            if channels == 2:
                x = x.reshape(-1, 2)
            return rate, x
        pos += 8 + size + (size & 1)
    raise AiffError("missing SSND chunk")
