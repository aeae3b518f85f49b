"""From-scratch WAV (RIFF/PCM + G.711) codec — the audio sibling of the
PNG codec.

Implements the canonical WAVE file layout from the public RIFF/WAVE
specification (Microsoft/IBM multimedia programming interface spec;
summarized at http://soundfile.sapp.org/doc/WaveFormat/): ``RIFF`` size
``WAVE`` header, a ``fmt `` chunk, and a ``data`` chunk. Chunk walking
skips unknown chunks (LIST/INFO etc.) per spec, so files written by
other tools decode too.

Four format tags decode for real:
  * 1 (PCM, 16-bit) — little-endian int16 frames.
  * 7 (μ-law) and 6 (A-law) — ITU-T G.711 companded 8-bit audio, the
    classic COMPRESSED telephony formats. Expansion to int16 is a pure
    256-entry table lookup built from the published segment formulas
    (exponent/mantissa piecewise-linear approximation of the log curve),
    applied with numpy fancy indexing — fully vectorized, no per-sample
    Python. The compressors (linear → code) are implemented too, also
    vectorized (segment index via bit-length LUT).
  * 0x11 (IMA/DVI ADPCM) — 4-bit adaptive differential PCM from the
    public IMA ADPCM recommendation (step-size + index-adjust tables and
    the shift-add difference expansion as published; also Microsoft's
    WAVE_FORMAT_IMA_ADPCM block layout: per-block 4-byte state header,
    low-nibble-first payload, ``fact`` chunk carrying the true sample
    count). The predictor recurrence is sequential WITHIN a block but
    blocks are independent (each header restates predictor + step
    index), so the decoder vectorizes ACROSS blocks: a Python loop over
    the ≤ samples-per-block positions doing numpy ops over all blocks at
    once — the same "vectorize across rows" pattern as the GIF/PNG hot
    paths.

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


# ------------------------------------------------------------- IMA ADPCM

#: The 89-entry step-size table and 8-entry index-adjust table from the
#: IMA ADPCM recommendation (identical in every public description of the
#: algorithm: IMA Digital Audio TWG, Microsoft's WAVE_FORMAT_IMA_ADPCM
#: registration, multimedia.cx's DVI/IMA page).
ADPCM_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

_ADPCM_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _adpcm_expand_step(pred, idx, nib):
    """One decode step, vectorized over a batch of independent blocks:
    (predictor, step index, 4-bit code) → (new predictor, new index).
    The shift-add form is the bit-exact published expansion
    diff = step>>3 (+ step if bit2) (+ step>>1 if bit1) (+ step>>2 if
    bit0), negated when bit3 is set; predictor saturates to int16 and the
    index walks the step table clamped to [0, 88]."""
    step = ADPCM_STEPS[idx]
    delta = nib & 7
    diff = (
        (step >> 3)
        + np.where(delta & 4, step, 0)
        + np.where(delta & 2, step >> 1, 0)
        + np.where(delta & 1, step >> 2, 0)
    )
    pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
    idx = np.clip(idx + _ADPCM_INDEX_ADJ[delta], 0, 88)
    return pred, idx


def adpcm_decode(data: bytes, block_align: int, n_samples: int | None = None) -> np.ndarray:
    """Mono IMA ADPCM block stream → int16 samples.

    Each ``block_align``-byte block is a 4-byte header (int16 initial
    predictor = the block's FIRST output sample, uint8 step index, one
    reserved byte) followed by low-nibble-first 4-bit codes, giving
    ``(block_align - 4) * 2 + 1`` samples per full block. Blocks decode
    independently (the header restates the full codec state), so the
    sequential predictor recurrence runs as a Python loop over sample
    POSITIONS with numpy ops across ALL blocks at once. ``n_samples``
    (from the WAV ``fact`` chunk) trims padding in the final block."""
    if block_align < 8:
        raise ValueError(f"block_align {block_align} too small for IMA ADPCM")
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size % block_align:
        raise ValueError(
            f"ADPCM data length {buf.size} is not a multiple of block_align {block_align}"
        )
    blocks = buf.reshape(-1, block_align).astype(np.int32)
    n_blocks = blocks.shape[0]
    pred = blocks[:, 0] | (blocks[:, 1] << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16 header field
    idx = blocks[:, 2]
    if (idx > 88).any():
        raise ValueError("ADPCM block header step index out of range")
    payload = blocks[:, 4:]
    per_block = payload.shape[1] * 2 + 1
    nib = np.empty((n_blocks, payload.shape[1] * 2), dtype=np.int32)
    nib[:, 0::2] = payload & 0x0F
    nib[:, 1::2] = payload >> 4
    out = np.empty((n_blocks, per_block), dtype=np.int16)
    out[:, 0] = pred
    for j in range(nib.shape[1]):
        pred, idx = _adpcm_expand_step(pred, idx, nib[:, j])
        out[:, j + 1] = pred
    flat = out.reshape(-1)
    if n_samples is not None:
        if n_samples > flat.size:
            raise ValueError("fact chunk claims more samples than blocks hold")
        flat = flat[:n_samples]
    return flat


def adpcm_encode(samples, block_align: int = 256) -> tuple[bytes, int]:
    """int16 samples → (mono IMA ADPCM block stream, sample count).

    Every block restarts from its own header state (predictor = the
    block's first sample; step index seeded from the previous block's
    exit state so the adaptation warms up once, which is the common
    encoder choice — any header index is a VALID bitstream since the
    decoder trusts the header). Within a block the quantizer runs the
    decoder's own recurrence on its chosen codes (closed-loop), so
    encode→decode error is bounded by the current step size. The
    final partial block is zero-padded; the true count rides in the
    WAV ``fact`` chunk."""
    x = np.asarray(samples, dtype=np.int32)
    if x.size == 0:
        raise ValueError("cannot encode an empty sample stream")
    per_block = (block_align - 4) * 2 + 1
    n_blocks = -(-x.size // per_block)
    padded = np.zeros(n_blocks * per_block, dtype=np.int32)
    padded[: x.size] = x
    blocks = padded.reshape(n_blocks, per_block)
    out = bytearray()
    idx = 0  # carried across blocks; each header snapshots it
    for b in range(n_blocks):
        row = blocks[b]
        pred = int(row[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for j in range(1, per_block):
            step = int(ADPCM_STEPS[idx])
            diff = int(row[j]) - pred
            code = 8 if diff < 0 else 0
            diff = abs(diff)
            acc = step >> 3
            if diff >= step:
                code |= 4
                diff -= step
                acc += step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
                acc += step >> 1
            if diff >= step >> 2:
                code |= 1
                acc += step >> 2
            pred = int(np.clip(pred + (-acc if code & 8 else acc), -32768, 32767))
            idx = int(np.clip(idx + int(_ADPCM_INDEX_ADJ[code & 7]), 0, 88))
            nibs.append(code)
        packed = np.asarray(nibs, dtype=np.uint8).reshape(-1, 2)
        out += ((packed[:, 1] << 4) | packed[:, 0]).astype(np.uint8).tobytes()
    return bytes(out), x.size


def encode_wav_adpcm(
    data: bytes, n_samples: int, block_align: int, sample_rate: int = 8000
) -> bytes:
    """Mono IMA ADPCM block stream → WAV bytes (format tag 0x11).

    Per Microsoft's WAVE_FORMAT_IMA_ADPCM registration the fmt chunk
    carries cbSize=2 with wSamplesPerBlock, and compressed formats carry
    a ``fact`` chunk with the true sample count (used by the decoder to
    trim final-block padding)."""
    per_block = (block_align - 4) * 2 + 1
    fmt = struct.pack(
        "<4sIHHIIHHHH",
        b"fmt ",
        20,
        0x11,
        1,  # mono
        sample_rate,
        (sample_rate * block_align + per_block - 1) // per_block,  # avg bytes/sec
        block_align,
        4,  # bits per (encoded) sample
        2,  # cbSize
        per_block,
    )
    fact = struct.pack("<4sII", b"fact", 4, n_samples)
    chunk = struct.pack("<4sI", b"data", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    body = b"WAVE" + fmt + fact + chunk
    return struct.pack("<4sI", b"RIFF", len(body)) + body


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
    block_align = fact_samples = None
    while pos + 8 <= len(blob):
        cid, size = struct.unpack_from("<4sI", blob, pos)
        pos += 8
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", blob, pos
            )
            if not (
                (tag == 1 and bits == 16)
                or (tag in (6, 7) and bits == 8)
                or (tag == 0x11 and bits == 4)
            ):
                raise ValueError(f"unsupported WAV encoding (tag={tag}, bits={bits})")
            if tag == 0x11 and channels != 1:
                # stereo IMA interleaves 4-byte sub-blocks per channel;
                # not produced by this library — reject loudly.
                raise ValueError("only mono IMA ADPCM is supported")
        elif cid == b"fact":
            (fact_samples,) = struct.unpack_from("<I", blob, pos)
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            if pos + size > len(blob):
                raise ValueError("truncated data chunk")
            if tag == 1:
                pcm = np.frombuffer(blob, dtype="<i2", count=size // 2, offset=pos)
            elif tag == 0x11:
                pcm = adpcm_decode(
                    blob[pos : pos + size], block_align, fact_samples
                )
            else:
                pcm = g711_decode(
                    blob[pos : pos + size], "mu" if tag == 7 else "a"
                )
            return rate, channels, pcm
        pos += size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk found")
