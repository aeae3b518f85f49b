"""Argon2 (RFC 9106) in numpy — enough KDF to decrypt KDBX4 databases.

Implements Argon2d and Argon2id (the two KeePass uses; KDBX4 defaults to
Argon2d) with the BlaMka compression function G vectorized over the 8
independent permutation applications per pass (uint64 numpy arithmetic
wraps mod 2^64 exactly like the spec's machine words). Blake2b comes from
hashlib; the variable-length H' wrapper follows RFC 9106 §3.3.

Validated against the RFC 9106 §5 test vectors
(tests/test_sources.py::test_argon2_rfc9106_vectors). Memory-filling is a
sequential per-block loop (the algorithm is inherently sequential within
a segment), so this is suitable for the small/medium cost parameters of
test fixtures and typical vaults, not for bulk password cracking — which
is the point of Argon2 anyway.

Reference behavior: KdbxDataProvider.java:176-273 delegates KDBX4 KDF to
the KeePass reference implementation; format fields per the public KDBX4
specification.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

ARGON2D, ARGON2I, ARGON2ID = 0, 1, 2

_M32 = np.uint64(0xFFFFFFFF)
_TWO = np.uint64(2)


def _rotr(x: np.ndarray, n: int) -> np.ndarray:
    n = np.uint64(n)
    return (x >> n) | (x << (np.uint64(64) - n))


def _gb(a, b, c, d):
    a = a + b + _TWO * (a & _M32) * (b & _M32)
    d = _rotr(d ^ a, 32)
    c = c + d + _TWO * (c & _M32) * (d & _M32)
    b = _rotr(b ^ c, 24)
    a = a + b + _TWO * (a & _M32) * (b & _M32)
    d = _rotr(d ^ a, 16)
    c = c + d + _TWO * (c & _M32) * (d & _M32)
    b = _rotr(b ^ c, 63)
    return a, b, c, d


_DIAG_B = [5, 6, 7, 4]
_DIAG_C = [10, 11, 8, 9]
_DIAG_D = [15, 12, 13, 14]


def _p(v: np.ndarray) -> np.ndarray:
    """BlaMka permutation applied to each row of v (shape (n, 16))."""
    a, b, c, d = _gb(v[:, 0:4], v[:, 4:8], v[:, 8:12], v[:, 12:16])
    v = np.concatenate([a, b, c, d], axis=1)
    a, b, c, d = _gb(v[:, 0:4], v[:, _DIAG_B], v[:, _DIAG_C], v[:, _DIAG_D])
    out = v.copy()
    out[:, 0:4] = a
    out[:, _DIAG_B] = b
    out[:, _DIAG_C] = c
    out[:, _DIAG_D] = d
    return out


def _g(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Compression G over two 1 KiB blocks (128 uint64 words each)."""
    r = x ^ y
    # registers: 8x8 grid of 2-word (16-byte) cells; row pass then column pass
    q = _p(r.reshape(8, 16)).reshape(8, 8, 2)
    q = _p(q.transpose(1, 0, 2).reshape(8, 16)).reshape(8, 8, 2).transpose(1, 0, 2)
    return q.reshape(128) ^ r


def _h_prime(data: bytes, tag_len: int) -> bytes:
    """Variable-length hash H' (RFC 9106 §3.3)."""
    pre = struct.pack("<I", tag_len)
    if tag_len <= 64:
        return hashlib.blake2b(pre + data, digest_size=tag_len).digest()
    r = -(-tag_len // 32) - 2
    out = bytearray()
    v = hashlib.blake2b(pre + data, digest_size=64).digest()
    out += v[:32]
    for _ in range(r - 1):
        v = hashlib.blake2b(v, digest_size=64).digest()
        out += v[:32]
    out += hashlib.blake2b(v, digest_size=tag_len - 32 * r).digest()
    return bytes(out)


def argon2(
    password: bytes,
    salt: bytes,
    time_cost: int,
    memory_kib: int,
    parallelism: int,
    tag_len: int = 32,
    type_: int = ARGON2D,
    secret: bytes = b"",
    ad: bytes = b"",
    version: int = 0x13,
) -> bytes:
    if type_ not in (ARGON2D, ARGON2ID):
        raise NotImplementedError("only Argon2d and Argon2id are implemented")
    p = parallelism
    h = hashlib.blake2b(digest_size=64)
    for v_ in (p, tag_len, memory_kib, time_cost, version, type_):
        h.update(struct.pack("<I", v_))
    for part in (password, salt, secret, ad):
        h.update(struct.pack("<I", len(part)))
        h.update(part)
    h0 = h.digest()

    m_prime = (memory_kib // (4 * p)) * 4 * p
    q = m_prime // p  # lane length in blocks
    seg = q // 4
    B = np.zeros((p, q, 128), dtype=np.uint64)
    for lane in range(p):
        for j in (0, 1):
            blk = _h_prime(h0 + struct.pack("<II", j, lane), 1024)
            B[lane, j] = np.frombuffer(blk, dtype="<u8")

    def addresses_blocks(r, lane, sl):
        """Argon2i address-block generator for data-independent segments."""
        ctr = 0
        while True:
            ctr += 1
            zeros = np.zeros(128, dtype=np.uint64)
            inp = np.zeros(128, dtype=np.uint64)
            for k, v_ in enumerate((r, lane, sl, m_prime, time_cost, type_, ctr)):
                inp[k] = v_
            addr = _g(zeros, _g(zeros, inp))
            for w in addr:
                yield int(w)

    for r in range(time_cost):
        for sl in range(4):
            for lane in range(p):
                data_independent = type_ == ARGON2ID and r == 0 and sl < 2
                if data_independent:
                    addr_gen = addresses_blocks(r, lane, sl)
                first = 2 if (r == 0 and sl == 0) else 0
                if data_independent:
                    # consume addresses for the skipped first blocks so the
                    # counter stays aligned with the block index
                    for _ in range(first):
                        next(addr_gen)
                for idx in range(first, seg):
                    j = sl * seg + idx
                    prev = (j - 1) % q
                    pw = B[lane, prev]
                    if data_independent:
                        word = next(addr_gen)
                        J1, J2 = word & 0xFFFFFFFF, word >> 32
                    else:
                        J1 = int(pw[0] & _M32)
                        J2 = int(pw[0] >> np.uint64(32))
                    ref_lane = lane if (r == 0 and sl == 0) else J2 % p
                    same = ref_lane == lane
                    if r == 0:
                        w_count = (
                            sl * seg + idx - 1
                            if same
                            else sl * seg - (1 if idx == 0 else 0)
                        )
                    else:
                        w_count = (
                            q - seg + idx - 1
                            if same
                            else q - seg - (1 if idx == 0 else 0)
                        )
                    x = (J1 * J1) >> 32
                    y = (w_count * x) >> 32
                    zz = w_count - 1 - y
                    ref_idx = (
                        zz if r == 0 else (((sl + 1) % 4) * seg + zz) % q
                    )
                    new = _g(pw, B[ref_lane, ref_idx])
                    if version >= 0x13 and r > 0:
                        B[lane, j] ^= new
                    else:
                        B[lane, j] = new

    final = B[0, q - 1].copy()
    for lane in range(1, p):
        final ^= B[lane, q - 1]
    return _h_prime(final.tobytes(), tag_len)
