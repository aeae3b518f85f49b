"""Pure-stdlib AES (FIPS-197) + CTR / CBC / ECB modes.

Backs the WinZip-AES zip envelope (sources/zipaes.py) and KDBX decryption
(sources/kdbx.py) without a crypto dependency — same stance as the
from-scratch BIFF8/OLE2 reader. Tables are GENERATED from GF(2^8)
arithmetic at import (no transcribed constants); correctness is pinned to
the FIPS-197 appendix test vectors in tests/test_sources.py.

T-table implementation: ~10 µs/block in CPython — fine for the
driver-side, fixture-sized archives this backs (the reference also
decrypts archives single-threaded on one node: DataProvider.java:166-197).
Not a general-purpose crypto library: no constant-time guarantees; do not
reuse outside this import path.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac

# --------------------------------------------------------- GF(2^8) tables

_exp = [0] * 512
_log = [0] * 256


def _init_gf():
    x = 1
    for i in range(255):
        _exp[i] = x
        _log[x] = i
        # multiply by generator 3: x*3 = x ^ xtime(x)
        x ^= ((x << 1) ^ (0x1B if x & 0x80 else 0)) & 0xFF
    for i in range(255, 512):
        _exp[i] = _exp[i - 255]


_init_gf()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _exp[_log[a] + _log[b]]


def _rotl8(a: int, n: int) -> int:
    return ((a << n) | (a >> (8 - n))) & 0xFF


SBOX = [0] * 256
INV_SBOX = [0] * 256
for _a in range(256):
    _inv = 0 if _a == 0 else _exp[255 - _log[_a]]
    _s = _inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2) ^ _rotl8(_inv, 3) ^ _rotl8(_inv, 4) ^ 0x63
    SBOX[_a] = _s
    INV_SBOX[_s] = _a

# encryption T-tables: T0[x] = [2s, s, s, 3s] packed big-endian-ish
_T0 = [0] * 256
_T1 = [0] * 256
_T2 = [0] * 256
_T3 = [0] * 256
_D0 = [0] * 256
_D1 = [0] * 256
_D2 = [0] * 256
_D3 = [0] * 256
for _a in range(256):
    _s = SBOX[_a]
    _w = (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    _T0[_a] = _w
    _T1[_a] = ((_w >> 8) | (_w << 24)) & 0xFFFFFFFF
    _T2[_a] = ((_w >> 16) | (_w << 16)) & 0xFFFFFFFF
    _T3[_a] = ((_w >> 24) | (_w << 8)) & 0xFFFFFFFF
    _si = INV_SBOX[_a]
    _w = (
        (_gmul(_si, 14) << 24)
        | (_gmul(_si, 9) << 16)
        | (_gmul(_si, 13) << 8)
        | _gmul(_si, 11)
    )
    _D0[_a] = _w
    _D1[_a] = ((_w >> 8) | (_w << 24)) & 0xFFFFFFFF
    _D2[_a] = ((_w >> 16) | (_w << 16)) & 0xFFFFFFFF
    _D3[_a] = ((_w >> 24) | (_w << 8)) & 0xFFFFFFFF

_RCON = [0x01]
while len(_RCON) < 14:
    _r = _RCON[-1] << 1
    _RCON.append((_r ^ 0x11B) if _r & 0x100 else _r)


class AES:
    """AES-128/192/256 block cipher (encrypt + decrypt one 16-byte block)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError("AES key must be 16/24/32 bytes")
        nk = len(key) // 4
        self.rounds = nk + 6
        w = [int.from_bytes(key[4 * i : 4 * i + 4], "big") for i in range(nk)]
        for i in range(nk, 4 * (self.rounds + 1)):
            t = w[i - 1]
            if i % nk == 0:
                t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
                t = (
                    (SBOX[(t >> 24) & 0xFF] << 24)
                    | (SBOX[(t >> 16) & 0xFF] << 16)
                    | (SBOX[(t >> 8) & 0xFF] << 8)
                    | SBOX[t & 0xFF]
                )
                t ^= _RCON[i // nk - 1] << 24
            elif nk > 6 and i % nk == 4:
                t = (
                    (SBOX[(t >> 24) & 0xFF] << 24)
                    | (SBOX[(t >> 16) & 0xFF] << 16)
                    | (SBOX[(t >> 8) & 0xFF] << 8)
                    | SBOX[t & 0xFF]
                )
            w.append(w[i - nk] ^ t)
        self._rk = w
        # decryption round keys: InvMixColumns applied to middle round keys
        dk = list(w)
        for i in range(4, 4 * self.rounds):
            t = dk[i]
            dk[i] = (
                _D0[SBOX[(t >> 24) & 0xFF]]
                ^ _D1[SBOX[(t >> 16) & 0xFF]]
                ^ _D2[SBOX[(t >> 8) & 0xFF]]
                ^ _D3[SBOX[t & 0xFF]]
            )
        self._dk = dk

    def encrypt_block(self, block: bytes) -> bytes:
        rk = self._rk
        s0 = int.from_bytes(block[0:4], "big") ^ rk[0]
        s1 = int.from_bytes(block[4:8], "big") ^ rk[1]
        s2 = int.from_bytes(block[8:12], "big") ^ rk[2]
        s3 = int.from_bytes(block[12:16], "big") ^ rk[3]
        k = 4
        for _ in range(self.rounds - 1):
            t0 = _T0[(s0 >> 24) & 0xFF] ^ _T1[(s1 >> 16) & 0xFF] ^ _T2[(s2 >> 8) & 0xFF] ^ _T3[s3 & 0xFF] ^ rk[k]
            t1 = _T0[(s1 >> 24) & 0xFF] ^ _T1[(s2 >> 16) & 0xFF] ^ _T2[(s3 >> 8) & 0xFF] ^ _T3[s0 & 0xFF] ^ rk[k + 1]
            t2 = _T0[(s2 >> 24) & 0xFF] ^ _T1[(s3 >> 16) & 0xFF] ^ _T2[(s0 >> 8) & 0xFF] ^ _T3[s1 & 0xFF] ^ rk[k + 2]
            t3 = _T0[(s3 >> 24) & 0xFF] ^ _T1[(s0 >> 16) & 0xFF] ^ _T2[(s1 >> 8) & 0xFF] ^ _T3[s2 & 0xFF] ^ rk[k + 3]
            s0, s1, s2, s3 = t0, t1, t2, t3
            k += 4
        out = bytearray(16)
        for i, (a, b, c, d) in enumerate(
            ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
        ):
            w = (
                (SBOX[(a >> 24) & 0xFF] << 24)
                | (SBOX[(b >> 16) & 0xFF] << 16)
                | (SBOX[(c >> 8) & 0xFF] << 8)
                | SBOX[d & 0xFF]
            ) ^ rk[k + i]
            out[4 * i : 4 * i + 4] = w.to_bytes(4, "big")
        return bytes(out)

    def decrypt_block(self, block: bytes) -> bytes:
        dk = self._dk
        nr = self.rounds
        s0 = int.from_bytes(block[0:4], "big") ^ dk[4 * nr]
        s1 = int.from_bytes(block[4:8], "big") ^ dk[4 * nr + 1]
        s2 = int.from_bytes(block[8:12], "big") ^ dk[4 * nr + 2]
        s3 = int.from_bytes(block[12:16], "big") ^ dk[4 * nr + 3]
        k = 4 * (nr - 1)
        for _ in range(nr - 1):
            t0 = _D0[(s0 >> 24) & 0xFF] ^ _D1[(s3 >> 16) & 0xFF] ^ _D2[(s2 >> 8) & 0xFF] ^ _D3[s1 & 0xFF] ^ dk[k]
            t1 = _D0[(s1 >> 24) & 0xFF] ^ _D1[(s0 >> 16) & 0xFF] ^ _D2[(s3 >> 8) & 0xFF] ^ _D3[s2 & 0xFF] ^ dk[k + 1]
            t2 = _D0[(s2 >> 24) & 0xFF] ^ _D1[(s1 >> 16) & 0xFF] ^ _D2[(s0 >> 8) & 0xFF] ^ _D3[s3 & 0xFF] ^ dk[k + 2]
            t3 = _D0[(s3 >> 24) & 0xFF] ^ _D1[(s2 >> 16) & 0xFF] ^ _D2[(s1 >> 8) & 0xFF] ^ _D3[s0 & 0xFF] ^ dk[k + 3]
            s0, s1, s2, s3 = t0, t1, t2, t3
            k -= 4
        out = bytearray(16)
        for i, (a, b, c, d) in enumerate(
            ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
        ):
            w = (
                (INV_SBOX[(a >> 24) & 0xFF] << 24)
                | (INV_SBOX[(b >> 16) & 0xFF] << 16)
                | (INV_SBOX[(c >> 8) & 0xFF] << 8)
                | INV_SBOX[d & 0xFF]
            ) ^ dk[i]
            out[4 * i : 4 * i + 4] = w.to_bytes(4, "big")
        return bytes(out)


# ------------------------------------------------------------------ modes


def ctr_crypt(key: bytes, data: bytes, counter: int = 1, little_endian: bool = True) -> bytes:
    """AES-CTR keystream XOR (encrypt == decrypt). WinZip AES uses a
    16-byte little-endian counter starting at 1 with no nonce."""
    aes = AES(key)
    out = bytearray(len(data))
    for off in range(0, len(data), 16):
        ks = aes.encrypt_block(
            counter.to_bytes(16, "little" if little_endian else "big")
        )
        chunk = data[off : off + 16]
        out[off : off + len(chunk)] = bytes(a ^ b for a, b in zip(chunk, ks))
        counter += 1
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    aes = AES(key)
    out = bytearray(len(data))
    prev = iv
    for off in range(0, len(data), 16):
        block = data[off : off + 16]
        dec = aes.decrypt_block(block)
        out[off : off + 16] = bytes(a ^ b for a, b in zip(dec, prev))
        prev = block
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    aes = AES(key)
    out = bytearray(len(data))
    prev = iv
    for off in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[off : off + 16], prev))
        prev = aes.encrypt_block(block)
        out[off : off + 16] = prev
    return bytes(out)


def ecb_encrypt(key: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("ECB data not block-aligned")
    aes = AES(key)
    return b"".join(aes.encrypt_block(data[o : o + 16]) for o in range(0, len(data), 16))


def pkcs7_unpad(data: bytes) -> bytes:
    if not data or len(data) % 16:
        raise ValueError("bad PKCS7 payload")
    n = data[-1]
    if not 1 <= n <= 16 or data[-n:] != bytes([n]) * n:
        raise ValueError("bad PKCS7 padding")
    return data[:-n]


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


# --------------------------------------------------- WinZip AES key setup


def winzip_derive(password: bytes, salt: bytes, strength: int):
    """(aes_key, hmac_key, verifier) per the WinZip AE spec: PBKDF2-HMAC-SHA1,
    1000 iterations, dkLen = 2*keyLen + 2."""
    key_len = {1: 16, 2: 24, 3: 32}[strength]
    dk = hashlib.pbkdf2_hmac("sha1", password, salt, 1000, dklen=2 * key_len + 2)
    return dk[:key_len], dk[key_len : 2 * key_len], dk[2 * key_len :]


def hmac_sha1_trunc(key: bytes, data: bytes, n: int = 10) -> bytes:
    return _hmac.new(key, data, hashlib.sha1).digest()[:n]
