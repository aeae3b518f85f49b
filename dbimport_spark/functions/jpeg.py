"""From-scratch baseline JPEG codec (stdlib + numpy) — closes the last
stubbed image format in the multimodal family.

Implemented from the public ITU-T T.81 (1992) specification ("Digital
compression and coding of continuous-tone still images") and the JFIF 1.02
interchange format note:

* encoder: baseline sequential DCT (SOF0) and PROGRESSIVE (SOF2, 6-stage
  scan script: DC first + spectral-selection AC bands + successive-
  approximation refinements per Annex G), 8-bit, grayscale or YCbCr with
  4:4:4 or 4:2:0 chroma subsampling, Annex K.1/K.2 quantization tables
  scaled by the common IJG quality formula, Annex K.3 Huffman tables;
* decoder: general baseline interleaved scan — SOF0 frames with arbitrary
  sampling factors (h, v ≤ 2 covers 4:4:4 / 4:2:2 / 4:2:0), multiple DQT /
  DHT segments, restart intervals (DRI/RSTn), 0xFF00 byte unstuffing —
  plus full progressive decode (SOF2): DC first/refinement, AC spectral
  bands with EOB runs, AC successive-approximation correction-bit passes,
  arbitrary scan scripts, coefficient state accumulated across scans.
  Progressive and baseline encodings of one image decode to IDENTICAL
  pixels (same quantized coefficients) — the suite's differential gate.

Vectorization: all DCT/IDCT, quantization, zigzag, level-shift, and color
transforms operate on (n_blocks, 8, 8) numpy stacks — one einsum per
plane, never per-pixel Python. The only per-symbol Python is the entropy
(Huffman) layer, which is inherently serial per bit position; the decoder
amortizes it with a (length, code) → symbol table and batch magnitude
decoding.

Reference parity note: the reference imports blobs opaquely and never
decodes (`/root/reference/src/main/java/de/soderer/dbimport/
DbImportWorker.java` blob import path); decode kernels are part of this
repo's training-data-pipeline surface, not a reference port.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# --------------------------------------------------------------- constants

# zigzag order: index i of the 1-D coefficient vector → (row, col)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# ITU-T T.81 Annex K.1 / K.2 example quantization tables (natural order)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: F = C @ x @ C.T, x = C.T @ F @ C
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits, vals):
    """(bits[1..16], huffval) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """(bits, huffval) → {(length, code): symbol} for the decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1 → coarsest, 50 → Annex K, 100 → all-ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


# ----------------------------------------------------------------- encoder


def _blocks_of_plane(plane: np.ndarray) -> np.ndarray:
    """(H, W) plane with H, W multiples of 8 → (n, 8, 8) block stack in
    raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_plane_coeffs(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift, DCT, quantize, zigzag a full plane at once →
    (n_blocks, 64) int coefficient rows."""
    blocks = _blocks_of_plane(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
    q = np.round(coeffs / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZIGZAG]


def _huff_encode_block(out: bytearray, acc: int, nbits: int, zz, pred: int, dc_codes, ac_codes):
    """Entropy-encode one zigzag block; bit state is threaded through plain
    ints and whole bytes flush once per block (with 0xFF00 stuffing) — the
    per-symbol method-call writer this replaces was the encode bottleneck.
    Returns (acc, nbits, dc)."""
    dc = int(zz[0])
    v = dc - pred
    if v == 0:
        size = 0
    else:
        size = abs(v).bit_length()
        bits = v if v > 0 else v + (1 << size) - 1
    code, ln = dc_codes[size]
    acc = (acc << ln) | code
    nbits += ln
    if size:
        acc = (acc << size) | bits
        nbits += size
    nz = np.nonzero(zz[1:])[0]
    if nz.size:
        positions = (nz + 1).tolist()
        values = zz[nz + 1].tolist()
        prev_pos = 0
        for pos, v in zip(positions, values):
            run = pos - prev_pos - 1
            prev_pos = pos
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                acc = (acc << ln) | code
                nbits += ln
                run -= 16
            size = abs(v).bit_length()
            bits = v if v > 0 else v + (1 << size) - 1
            code, ln = ac_codes[(run << 4) | size]
            acc = (acc << (ln + size)) | (code << size) | bits
            nbits += ln + size
        if positions[-1] < 63:
            code, ln = ac_codes[0x00]  # EOB
            acc = (acc << ln) | code
            nbits += ln
    else:
        code, ln = ac_codes[0x00]
        acc = (acc << ln) | code
        nbits += ln
    while nbits >= 8:
        nbits -= 8
        byte = (acc >> nbits) & 0xFF
        out.append(byte)
        if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
            out.append(0x00)
    acc &= (1 << nbits) - 1
    return acc, nbits, dc


def _flush_bits(out: bytearray, acc: int, nbits: int):
    """Pad the residual bits to a byte boundary with 1-bits (T.81 F.1.2.3)
    and append; returns the reset (acc, nbits)."""
    if nbits:
        pad = 8 - nbits
        byte = ((acc << pad) | ((1 << pad) - 1)) & 0xFF
        out.append(byte)
        if byte == 0xFF:
            out.append(0x00)
    return 0, 0


class _ProgWriter:
    """Entropy bit writer for progressive scans (0xFF00 stuffing, 1-bit
    padding flush) — the refinement passes interleave Huffman codes, sign
    bits, and buffered correction bits, so a stateful writer beats the
    baseline path's inlined accumulator here."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def code(self, table, sym: int) -> None:
        c, ln = table[sym]
        self.bits(c, ln)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.bits((1 << pad) - 1, pad)


def _prog_ac_first(pw, zz, ss, se, al, ac_codes):
    """AC first pass for one block (T.81 G.1.2.2): band-limited baseline
    coding of the point-transformed magnitudes, per-block EOB (EOB runs
    are a size optimization the decoder supports; the encoder keeps runs
    local so correction state never crosses blocks)."""
    run = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            run += 1
            continue
        while run > 15:
            pw.code(ac_codes, 0xF0)
            run -= 16
        size = a.bit_length()
        sval = a if v > 0 else -a
        bits = sval if sval > 0 else sval + (1 << size) - 1
        pw.code(ac_codes, (run << 4) | size)
        pw.bits(bits, size)
        run = 0
    if run > 0:
        pw.code(ac_codes, 0x00)


def _prog_ac_refine(pw, zz, ss, se, al, ac_codes):
    """AC refinement for one block (G.1.2.3): newly-significant
    coefficients (|v|>>Al == 1) are coded as run/1 + sign; coefficients
    significant in earlier scans contribute one buffered correction bit
    (bit Al of |v|). Bit ORDER must mirror the decoder's walk exactly:
    after a ZRL the decoder consumes correction bits only for history
    coefficients up to the 16th zero of that window (it then resumes at
    the next symbol), so the buffered bits are kept as an ordered queue
    interleaved with zero markers and flushed per window — flushing the
    whole buffer after the first ZRL desyncs any block with a history
    coefficient between the 16th zero and the next significant one."""
    run = 0
    events: list[int | None] = []  # None = zero position, int = correction bit
    for k in range(ss, se + 1):
        v = int(zz[k])
        a = abs(v) >> al
        if a == 0:
            run += 1
            events.append(None)
            continue
        if a == 1:
            while run > 15:
                pw.code(ac_codes, 0xF0)
                zcount = 0
                while events:
                    ev = events.pop(0)
                    if ev is None:
                        zcount += 1
                        if zcount == 16:
                            break
                    else:
                        pw.bits(ev, 1)
                run -= 16
            pw.code(ac_codes, (run << 4) | 1)
            pw.bits(1 if v > 0 else 0, 1)
            for ev in events:
                if ev is not None:
                    pw.bits(ev, 1)
            events = []
            run = 0
        else:
            events.append(a & 1)
    if events:
        pw.code(ac_codes, 0x00)  # EOB, run length 1
        for ev in events:
            if ev is not None:
                pw.bits(ev, 1)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Row-major 8-bit pixels (gray or RGB) → JFIF bytes.
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    that many MCUs/blocks (error-resilience feature real encoders emit).
    ``progressive`` emits an SOF2 stream with a 6-stage scan script
    (DC first at Al=1, two spectral AC bands at Al=2, two AC refinement
    passes, DC refinement) — the same QUANTIZED coefficients as the
    baseline stream, so baseline and progressive encodings of one image
    decode to IDENTICAL pixels (the differential test the suite runs)."""
    if channels not in (1, 3):
        raise JpegError(f"unsupported channel count {channels}")
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    if len(pixels) != width * height * channels:
        raise JpegError("pixel buffer size mismatch")
    px = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width, channels)

    qy = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)

    if channels == 1:
        planes = [px[:, :, 0].astype(np.float64)]
        qtabs = [qy]
        samp = [(1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # chroma: 2×2 box mean on an edge-padded even grid
            def down(p):
                p = _pad_edge(p, 2)
                return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qtabs = [qy, qc, qc]
    planes = [np.clip(np.round(p), 0, 255) for p in planes]

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcu_w = 8 * hmax
    mcu_h = 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    # pad each plane to a whole number of MCUs at ITS resolution
    coeffs = []
    blocks_per_row = []
    for (h, v), plane, qt in zip(samp, planes, qtabs):
        plane = _pad_edge(plane, 1)  # no-op, keeps types tidy
        target_h = mcus_y * 8 * v
        target_w = mcus_x * 8 * h
        ph, pw = plane.shape
        plane = np.pad(
            plane, ((0, target_h - ph), (0, target_w - pw)), mode="edge"
        )
        coeffs.append(_encode_plane_coeffs(plane, qt))
        blocks_per_row.append(target_w // 8)

    dc_codes_y = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_codes_y = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_codes_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_codes_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    ncomp = len(planes)
    dc_tabs = [dc_codes_y if ci == 0 else dc_codes_c for ci in range(ncomp)]
    ac_tabs = [ac_codes_y if ci == 0 else ac_codes_c for ci in range(ncomp)]

    if progressive:
        scans = _progressive_scans(
            coeffs, samp, blocks_per_row, mcus_x, mcus_y, width, height,
            hmax, vmax, dc_tabs, ac_tabs, restart_interval,
        )
        ebuf = None
    else:
        ebuf = bytearray()
        acc = 0
        nbits = 0
        preds = [0] * len(planes)
        mcu_count = 0
        rst_n = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    # byte-align, emit RSTn, reset DC predictors (T.81 E.2.4)
                    acc, nbits = _flush_bits(ebuf, acc, nbits)
                    ebuf += bytes((0xFF, 0xD0 + rst_n))
                    rst_n = (rst_n + 1) % 8
                    preds = [0] * len(planes)
                for ci, (h, v) in enumerate(samp):
                    dc_codes = dc_tabs[ci]
                    ac_codes = ac_tabs[ci]
                    for by in range(v):
                        for bx in range(h):
                            row = my * v + by
                            col = mx * h + bx
                            zz = coeffs[ci][row * blocks_per_row[ci] + col]
                            acc, nbits, preds[ci] = _huff_encode_block(
                                ebuf, acc, nbits, zz, preds[ci], dc_codes, ac_codes
                            )
                mcu_count += 1
        acc, nbits = _flush_bits(ebuf, acc, nbits)

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 / JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    # DQT (table 0 luma, table 1 chroma when color)
    for tid, qt in enumerate([qy] + ([qc] if channels == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt[z]) for z in _ZIGZAG)
    # SOF0 baseline / SOF2 progressive
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, height, width, len(planes)
    )
    for ci, (h, v) in enumerate(samp):
        out += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    # DHT segments
    for tc_th, bits, vals in [
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ] + (
        [
            (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
        if channels == 3
        else []
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals)) + bytes([tc_th])
        out += bytes(bits) + bytes(vals)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        for sos, entropy in scans:
            out += sos + entropy
    else:
        # SOS
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
        for ci in range(len(planes)):
            out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        out += b"\x00\x3f\x00"
        out += ebuf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _progressive_scans(
    coeffs, samp, blocks_per_row, mcus_x, mcus_y, width, height,
    hmax, vmax, dc_tabs, ac_tabs, restart_interval,
):
    """Build the 6-stage progressive scan sequence as (SOS bytes, entropy
    bytes) pairs. Script: DC first (Al=1, interleaved) → per-component
    spectral AC bands 1-5 and 6-63 at Al=2 → AC refinements Al=1 and
    Al=0 → DC refinement — every Annex-G decode path (first, refinement,
    ZRL-with-corrections, EOB) gets exercised by real streams."""
    ncomp = len(samp)

    def sos_header(comp_specs, ss, se, ah, al):
        b = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_specs), len(comp_specs))
        for cid, tt in comp_specs:
            b += bytes([cid, tt])
        return b + bytes([ss, se, (ah << 4) | al])

    def emit_dc(ah, al):
        pw = _ProgWriter()
        preds = [0] * ncomp
        rst = 0
        cnt = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    pw.flush()
                    pw.out += bytes((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                    preds = [0] * ncomp
                for ci, (h, v) in enumerate(samp):
                    for by in range(v):
                        for bx in range(h):
                            row = my * v + by
                            col = mx * h + bx
                            c0 = int(coeffs[ci][row * blocks_per_row[ci] + col][0])
                            if ah == 0:
                                val = c0 >> al  # DC: arithmetic point transform
                                diff = val - preds[ci]
                                preds[ci] = val
                                if diff == 0:
                                    pw.code(dc_tabs[ci], 0)
                                else:
                                    size = abs(diff).bit_length()
                                    bits = diff if diff > 0 else diff + (1 << size) - 1
                                    pw.code(dc_tabs[ci], size)
                                    pw.bits(bits, size)
                            else:
                                pw.bits((c0 >> al) & 1, 1)
                cnt += 1
        pw.flush()
        return pw.out

    def emit_ac(ci, ss, se, ah, al):
        pw = _ProgWriter()
        h, v = samp[ci]
        cw = -(-width * h // hmax)
        chh = -(-height * v // vmax)
        bw, bh = -(-cw // 8), -(-chh // 8)
        bpr = blocks_per_row[ci]
        rst = 0
        cnt = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and cnt and cnt % restart_interval == 0:
                    pw.flush()
                    pw.out += bytes((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                zz = coeffs[ci][by * bpr + bx]
                if ah == 0:
                    _prog_ac_first(pw, zz, ss, se, al, ac_tabs[ci])
                else:
                    _prog_ac_refine(pw, zz, ss, se, al, ac_tabs[ci])
                cnt += 1
        pw.flush()
        return pw.out

    dc_specs = [(ci + 1, (0x00 if ci == 0 else 0x01) << 4) for ci in range(ncomp)]
    scans = [(sos_header(dc_specs, 0, 0, 0, 1), emit_dc(0, 1))]
    for ss, se, ah, al in ((1, 5, 0, 2), (6, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)):
        for ci in range(ncomp):
            spec = [(ci + 1, 0x00 if ci == 0 else 0x01)]
            scans.append((sos_header(spec, ss, se, ah, al), emit_ac(ci, ss, se, ah, al)))
    scans.append((sos_header(dc_specs, 0, 0, 1, 0), emit_dc(1, 0)))
    return scans


# ----------------------------------------------------------------- decoder


def _clean_entropy(data: bytes, pos: int):
    """Strip 0xFF00 byte stuffing from the entropy segment in ONE pass and
    record restart-marker boundaries as offsets into the cleaned stream.
    Returns (clean bytes, restart offsets, end) where ``end`` is the
    absolute offset of the terminating marker (the 0xFF of EOI / the next
    header marker), letting multi-scan (progressive) streams resume the
    marker loop after the scan. The per-byte exception-driven reader this
    replaces was the decode bottleneck on long scans."""
    out = bytearray()
    restarts = []
    i = pos
    n = len(data)
    end = n
    while i < n:
        j = data.find(b"\xff", i)
        if j == -1:
            out += data[i:]
            break
        out += data[i:j]
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            out.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            restarts.append(len(out))
            i = j + 2
        else:
            end = j  # EOI or next marker: end of entropy data
            break
    return bytes(out), restarts, end


_LUT_CACHE: dict = {}


def _huff_lut(table: dict) -> list:
    """(length, code)→symbol table → a flat 2^16 lookup: peek 16 bits,
    one list index gives (symbol << 5 | code_length); 0 marks invalid.
    Cached globally — real streams almost always carry the Annex K.3
    standard tables, so the build cost is paid once per process."""
    key = tuple(sorted(table.items()))
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = [0] * 65536
        for (length, code), sym in table.items():
            base = code << (16 - length)
            span = 1 << (16 - length)
            lut[base : base + span] = [(sym << 5) | length] * span
        _LUT_CACHE[key] = lut
    return lut


def decode_jpeg(data: bytes):
    """JPEG bytes → (width, height, channels, pixel bytes row-major).

    Grayscale output for 1-component frames, RGB for 3-component (JFIF
    YCbCr). Baseline sequential (SOF0/1) and progressive (SOF2, spectral
    selection + successive approximation per T.81 Annex G) both decode
    for real; a progressive stream accumulates coefficient state across
    its scans and renders at EOI."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    frame = None
    progressive = False
    prog_state = None  # per-component coefficient lists + EOB run
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegError("truncated segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                qtables[tq] = tab
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                if p + 17 > len(body):
                    raise JpegError("truncated DHT segment")
                tc_th = body[p]
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise JpegError("DHT declares more codes than it carries")
                htables[tc_th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
            progressive = marker == 0xC2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise JpegError("truncated SOS header")
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise JpegError(f"scan references unknown component {cs}")
                entry = {"comp": comp, "ci": frame["comps"].index(comp)}
                # validate exactly what the scan will use: DC-first scans
                # need the DC table, AC scans (first AND refinement) the
                # AC table, DC refinement neither (raw bits only)
                need_dc = (not progressive) or (ss == 0 and ah == 0)
                need_ac = (not progressive) or ss > 0
                if need_dc:
                    if tt >> 4 not in htables:
                        raise JpegError("scan references undefined Huffman table")
                    entry["dc"] = htables[tt >> 4]
                if need_ac:
                    if (0x10 | (tt & 0x0F)) not in htables:
                        raise JpegError("scan references undefined Huffman table")
                    entry["ac"] = htables[0x10 | (tt & 0x0F)]
                scan.append(entry)
            pos = pos + 2 + seglen
            if not progressive:
                return _decode_scan(data, pos, frame, scan, qtables, restart_interval)
            if prog_state is None:
                prog_state = _new_prog_state(frame)
            pos = _decode_scan_progressive(
                data, pos, frame, scan, prog_state, ss, se, ah, al,
                restart_interval,
            )
            continue
        pos += 2 + seglen
    if progressive and prog_state is not None:
        return _finish_progressive(frame, prog_state, qtables)
    raise JpegError("no scan found")


def _decode_scan(data, pos, frame, scan, qtables, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["comp"]["h"] for c in scan)
    vmax = max(c["comp"]["v"] for c in scan)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # coefficient stacks per scan component, filled by sparse scatter
    n_blocks_of = []
    coo_idx: list[list[int]] = []
    coo_val: list[list[int]] = []
    for s in scan:
        ch, cv = s["comp"]["h"], s["comp"]["v"]
        n_blocks_of.append(mcus_x * ch * mcus_y * cv)
        coo_idx.append([])
        coo_val.append([])

    clean, restarts, _end = _clean_entropy(data, pos)
    clean += b"\x00\x00\x00\x00"  # pad so the final peeks never IndexError
    limit = len(clean)
    # flattened per-MCU plan: (ci, dc_lut, ac_lut, block_index) per block
    plan = []
    for ci, s in enumerate(scan):
        ch, cv = s["comp"]["h"], s["comp"]["v"]
        plan.append((ci, _huff_lut(s["dc"]), _huff_lut(s["ac"]), ch, cv, mcus_x * ch))

    acc = 0
    nbits = 0
    p = 0
    next_restart = iter(restarts)
    preds = [0] * len(scan)
    mcu_count = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    # byte-align and resume at the recorded RST boundary
                    try:
                        p = next(next_restart)
                    except StopIteration:
                        raise JpegError(
                            "DRI declared but RST marker missing"
                        ) from None
                    acc = 0
                    nbits = 0
                    preds = [0] * len(scan)
                for ci, dc_lut, ac_lut, ch, cv, bpr in plan:
                    idx_list = coo_idx[ci]
                    val_list = coo_val[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            bbase = ((my * cv + by) * bpr + (mx * ch + bx)) * 64
                            # ---- DC
                            while nbits < 16:
                                acc = (acc << 8) | clean[p]
                                p += 1
                                nbits += 8
                            packed = dc_lut[(acc >> (nbits - 16)) & 0xFFFF]
                            if packed == 0:
                                raise JpegError("invalid Huffman code")
                            size = packed >> 5
                            nbits -= packed & 31
                            if size:
                                while nbits < size:
                                    acc = (acc << 8) | clean[p]
                                    p += 1
                                    nbits += 8
                                nbits -= size
                                v = (acc >> nbits) & ((1 << size) - 1)
                                diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                            else:
                                diff = 0
                            preds[ci] += diff
                            idx_list.append(bbase)
                            val_list.append(preds[ci])
                            acc &= (1 << nbits) - 1
                            # ---- AC
                            k = 1
                            while k < 64:
                                while nbits < 16:
                                    acc = (acc << 8) | clean[p]
                                    p += 1
                                    nbits += 8
                                packed = ac_lut[(acc >> (nbits - 16)) & 0xFFFF]
                                if packed == 0:
                                    raise JpegError("invalid Huffman code")
                                rs = packed >> 5
                                nbits -= packed & 31
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0x0F
                                if k > 63:
                                    raise JpegError("AC index out of range")
                                while nbits < size:
                                    acc = (acc << 8) | clean[p]
                                    p += 1
                                    nbits += 8
                                nbits -= size
                                v = (acc >> nbits) & ((1 << size) - 1)
                                idx_list.append(bbase + k)
                                val_list.append(
                                    v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                                )
                                k += 1
                            acc &= (1 << nbits) - 1
                mcu_count += 1
    except IndexError:
        raise JpegError("truncated entropy stream") from None
    if p > limit:
        raise JpegError("truncated entropy stream")

    stacks = []
    for nb, idxs, vals in zip(n_blocks_of, coo_idx, coo_val):
        flat = np.zeros(nb * 64, dtype=np.int64)
        if idxs:
            flat[np.asarray(idxs, dtype=np.int64)] = np.asarray(vals, dtype=np.int64)
        stacks.append(flat.reshape(-1, 64))

    return _render_planes(
        [s["comp"] for s in scan], stacks, qtables, mcus_x, mcus_y, hmax, vmax, w, h
    )


def _render_planes(comps, stacks, qtables, mcus_x, mcus_y, hmax, vmax, w, h):
    """Shared back half of decoding (baseline and progressive): zigzag
    coefficient stacks → dequantize + IDCT (one einsum per component) →
    upsample → crop → grayscale or JFIF YCbCr→RGB pixels."""
    planes = []
    for comp, zz in zip(comps, stacks):
        if comp["tq"] not in qtables:
            raise JpegError("frame references undefined quantization table")
        q = qtables[comp["tq"]]
        # zz rows are zigzag-ordered → multiply by the zigzag view of the
        # (natural-order) table, THEN permute back to natural order
        coeffs = (zz * q[_ZIGZAG])[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        blocks = np.einsum("xu,nuv,yv->nxy", _C.T, coeffs, _C.T)
        px = np.clip(np.round(blocks) + 128.0, 0, 255).astype(np.uint8)
        ch, cv = comp["h"], comp["v"]
        bpr = mcus_x * ch
        rows = mcus_y * cv
        plane = (
            px.reshape(rows, bpr, 8, 8).transpose(0, 2, 1, 3).reshape(rows * 8, bpr * 8)
        )
        # upsample to full resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return w, h, 1, planes[0].tobytes()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r_ = np.clip(np.round(y + 1.402 * cr), 0, 255)
    g_ = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b_ = np.clip(np.round(y + 1.772 * cb), 0, 255)
    rgb = np.stack([r_, g_, b_], axis=-1).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


# ------------------------------------------------------------- progressive

def _new_prog_state(frame):
    """Per-component zigzag coefficient storage (flat Python lists — the
    progressive passes update scattered entries) on the interleaved MCU
    grid, shared by every scan of the stream."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    coefs = []
    bpr = []
    for c in frame["comps"]:
        bpr.append(mcus_x * c["h"])
        coefs.append([0] * (mcus_x * c["h"] * mcus_y * c["v"] * 64))
    return {
        "hmax": hmax, "vmax": vmax, "mcus_x": mcus_x, "mcus_y": mcus_y,
        "coefs": coefs, "bpr": bpr,
    }


def _comp_block_dims(frame, comp, st):
    """Non-interleaved scan traversal dims: the component's own block grid
    (T.81 A.2.2), ≤ the MCU-padded storage grid."""
    cw = -(-frame["w"] * comp["h"] // st["hmax"])
    chh = -(-frame["h"] * comp["v"] // st["vmax"])
    return -(-cw // 8), -(-chh // 8)


def _decode_scan_progressive(
    data, pos, frame, scan, st, ss, se, ah, al, restart_interval
):
    """One progressive scan (T.81 Annex G.2): updates ``st['coefs']`` in
    place, returns the stream position after the scan's entropy data.

    DC scans (Ss=Se=0) are MCU-interleaved when they carry several
    components; AC scans are single-component over the component's own
    block grid. Ah=0 scans establish coefficients at precision Al; Ah>0
    scans refine one bit (Al = Ah−1 by spec, trusted as given)."""
    if ss == 0 and se != 0:
        raise JpegError("progressive scan mixes DC and AC coefficients")
    if ss > 0 and len(scan) != 1:
        raise JpegError("progressive AC scan must be single-component")
    if se > 63 or ss > se:
        raise JpegError("bad spectral selection bounds")

    clean, restarts, end = _clean_entropy(data, pos)
    clean += b"\x00\x00\x00\x00"
    reader = {"acc": 0, "nbits": 0, "p": 0}

    def receive(n):
        acc, nbits, p = reader["acc"], reader["nbits"], reader["p"]
        while nbits < n:
            acc = (acc << 8) | clean[p]
            p += 1
            nbits += 8
        nbits -= n
        reader["acc"] = acc & ((1 << nbits) - 1)
        reader["nbits"] = nbits
        reader["p"] = p
        return (acc >> nbits) & ((1 << n) - 1)

    def huff(lut):
        acc, nbits, p = reader["acc"], reader["nbits"], reader["p"]
        while nbits < 16:
            acc = (acc << 8) | clean[p]
            p += 1
            nbits += 8
        packed = lut[(acc >> (nbits - 16)) & 0xFFFF]
        if packed == 0:
            raise JpegError("invalid Huffman code")
        nbits -= packed & 31
        reader["acc"] = acc & ((1 << nbits) - 1)
        reader["nbits"] = nbits
        reader["p"] = p
        return packed >> 5

    next_restart = iter(restarts)
    eobrun = 0
    preds = [0] * len(scan)

    def maybe_restart(unit_count):
        nonlocal eobrun, preds
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            try:
                reader["p"] = next(next_restart)
            except StopIteration:
                raise JpegError("DRI declared but RST marker missing") from None
            reader["acc"] = 0
            reader["nbits"] = 0
            eobrun = 0
            preds = [0] * len(scan)

    try:
        if ss == 0 and ah == 0:
            # ---- DC first pass (interleaved like a baseline scan)
            for unit, blocks in enumerate(_scan_blocks(frame, scan, st)):
                maybe_restart(unit)
                for si, bbase in blocks:
                    size = huff(_huff_lut(scan[si]["dc"]))
                    if size:
                        v = receive(size)
                        diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
                    else:
                        diff = 0
                    preds[si] += diff
                    st["coefs"][scan[si]["ci"]][bbase] = preds[si] << al
        elif ss == 0:
            # ---- DC refinement: one raw bit per block
            for unit, blocks in enumerate(_scan_blocks(frame, scan, st)):
                maybe_restart(unit)
                for si, bbase in blocks:
                    if receive(1):
                        st["coefs"][scan[si]["ci"]][bbase] |= 1 << al
        else:
            s0 = scan[0]
            coef = st["coefs"][s0["ci"]]
            ac_lut = _huff_lut(s0["ac"])
            bw, bh = _comp_block_dims(frame, s0["comp"], st)
            bpr = st["bpr"][s0["ci"]]
            p1 = 1 << al
            unit = 0
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart(unit)
                    unit += 1
                    bbase = (by * bpr + bx) * 64
                    if ah == 0:
                        # ---- AC first pass with EOB runs
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = huff(ac_lut)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += receive(r)
                                break
                            k += r
                            if k > se:
                                raise JpegError("AC index out of band")
                            v = receive(s)
                            v = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            coef[bbase + k] = v << al
                            k += 1
                    else:
                        # ---- AC refinement (G.2's correction-bit pass)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = huff(ac_lut)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r < 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += receive(r)
                                        break
                                    newval = 0  # ZRL: skip 16 zero-history
                                elif s == 1:
                                    newval = p1 if receive(1) else -p1
                                else:
                                    raise JpegError(
                                        "refinement magnitude must be 1"
                                    )
                                while k <= se:
                                    idx = bbase + k
                                    c = coef[idx]
                                    if c != 0:
                                        if receive(1) and not (c & p1):
                                            coef[idx] = c + (p1 if c > 0 else -p1)
                                    else:
                                        r -= 1
                                        if r < 0:
                                            break
                                    k += 1
                                if s and k <= se:
                                    coef[bbase + k] = newval
                                k += 1
                        if eobrun > 0:
                            while k <= se:
                                idx = bbase + k
                                c = coef[idx]
                                if c != 0:
                                    if receive(1) and not (c & p1):
                                        coef[idx] = c + (p1 if c > 0 else -p1)
                                k += 1
                            eobrun -= 1
    except IndexError:
        raise JpegError("truncated entropy stream") from None
    # the 16-bit Huffman prefetch may pull ≤2 bytes past the final real
    # byte of a valid stream; anything beyond that consumed pad bytes
    if reader["p"] > len(clean) - 4 + 2:
        raise JpegError("truncated entropy stream")
    return end


def _scan_blocks(frame, scan, st):
    """Yield per-unit lists of (scan index, coefficient base offset) for a
    DC scan: MCU-interleaved when several components, the component's own
    block grid when single (T.81 A.2)."""
    if len(scan) > 1:
        for my in range(st["mcus_y"]):
            for mx in range(st["mcus_x"]):
                unit = []
                for si, s in enumerate(scan):
                    ch, cv = s["comp"]["h"], s["comp"]["v"]
                    bpr = st["bpr"][s["ci"]]
                    for by in range(cv):
                        for bx in range(ch):
                            unit.append(
                                (si, ((my * cv + by) * bpr + (mx * ch + bx)) * 64)
                            )
                yield unit
    else:
        bw, bh = _comp_block_dims(frame, scan[0]["comp"], st)
        bpr = st["bpr"][scan[0]["ci"]]
        for by in range(bh):
            for bx in range(bw):
                yield [(0, (by * bpr + bx) * 64)]


def _finish_progressive(frame, st, qtables):
    stacks = [
        np.asarray(c, dtype=np.int64).reshape(-1, 64) for c in st["coefs"]
    ]
    return _render_planes(
        frame["comps"], stacks, qtables,
        st["mcus_x"], st["mcus_y"], st["hmax"], st["vmax"],
        frame["w"], frame["h"],
    )
