"""WinZip-AES (AE-1/AE-2) zip entry decryption + a minimal writer, stdlib.

Reference accepts AES-256 and ZipCrypto passworded zips
(DataProvider.java:166-197). The stdlib zipfile handles ZipCrypto;
method-99 (AES) entries are handled here: central-directory metadata comes
from zipfile, the raw encrypted stream is read at the local-header offset,
and the WinZip AE layout is applied —

    salt (8/12/16 by strength) | 2-byte password verifier |
    AES-CTR payload (LE counter from 1) | 10-byte HMAC-SHA1 auth code

Keys: PBKDF2-HMAC-SHA1(password, salt, 1000) → enc key + hmac key +
verifier (sources/aes.py). The auth code is checked over the ENCRYPTED
payload before decrypting; AE-2 carries crc=0 so integrity rests on the
HMAC alone.
"""

from __future__ import annotations

import hmac
import struct
import zipfile
import zlib

from dbimport_spark.sources.aes import (
    ctr_crypt,
    hmac_sha1_trunc,
    winzip_derive,
)

AES_EXTRA_ID = 0x9901
WZ_AES_METHOD = 99
_SALT_LEN = {1: 8, 2: 12, 3: 16}


class ZipAesError(ValueError):
    pass


def _parse_aes_extra(extra: bytes):
    """(vendor_version, strength, actual_method) from the 0x9901 field."""
    off = 0
    while off + 4 <= len(extra):
        ext_id, size = struct.unpack_from("<HH", extra, off)
        if ext_id == AES_EXTRA_ID and size >= 7:
            ver, vendor, strength, method = struct.unpack_from(
                "<H2sBH", extra, off + 4
            )
            if vendor != b"AE":
                raise ZipAesError(f"unexpected AES vendor id {vendor!r}")
            return ver, strength, method
        off += 4 + size
    raise ZipAesError("no WinZip AES extra field on method-99 entry")


def read_aes_entry(path: str, info: zipfile.ZipInfo, password: str) -> bytes:
    """Decrypt + decompress one method-99 entry, verifying password and
    auth code."""
    with open(path, "rb") as f:
        f.seek(info.header_offset)
        hdr = f.read(30)
        if hdr[:4] != b"PK\x03\x04":
            raise ZipAesError("bad local file header")
        name_len, extra_len = struct.unpack_from("<HH", hdr, 26)
        f.seek(info.header_offset + 30 + name_len)
        local_extra = f.read(extra_len)
        raw = f.read(info.compress_size)
    try:
        _, strength, actual_method = _parse_aes_extra(local_extra)
    except ZipAesError:
        _, strength, actual_method = _parse_aes_extra(info.extra)
    salt_len = _SALT_LEN.get(strength)
    if salt_len is None:
        raise ZipAesError(f"bad AES strength {strength}")
    if len(raw) < salt_len + 2 + 10:
        raise ZipAesError("entry too short for AES layout")
    salt = raw[:salt_len]
    check = raw[salt_len : salt_len + 2]
    payload = raw[salt_len + 2 : -10]
    auth = raw[-10:]
    enc_key, mac_key, verifier = winzip_derive(
        password.encode("utf-8"), salt, strength
    )
    if check != verifier:
        raise ZipAesError("wrong password for AES zip entry")
    if not hmac.compare_digest(hmac_sha1_trunc(mac_key, payload), auth):
        raise ZipAesError("AES zip auth code mismatch (corrupted archive)")
    data = ctr_crypt(enc_key, payload)
    if actual_method == zipfile.ZIP_DEFLATED:
        data = zlib.decompress(data, -15)
    elif actual_method != zipfile.ZIP_STORED:
        raise ZipAesError(f"unsupported inner compression method {actual_method}")
    return data


def write_aes_zip(
    path: str,
    name: str,
    data: bytes,
    password: str,
    strength: int = 3,
    deflate: bool = True,
    salt: bytes | None = None,
) -> None:
    """Minimal single-entry AE-2 writer (tests + fixture tooling; AE-2 ⇒
    crc field is zero). ``salt`` is injectable for deterministic tests."""
    import os

    salt_len = _SALT_LEN[strength]
    if salt is None:
        salt = os.urandom(salt_len)
    if len(salt) != salt_len:
        raise ZipAesError(f"salt must be {salt_len} bytes for strength {strength}")
    inner_method = zipfile.ZIP_DEFLATED if deflate else zipfile.ZIP_STORED
    if deflate:
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload_plain = c.compress(data) + c.flush()
    else:
        payload_plain = data
    enc_key, mac_key, verifier = winzip_derive(
        password.encode("utf-8"), salt, strength
    )
    payload = ctr_crypt(enc_key, payload_plain)
    auth = hmac_sha1_trunc(mac_key, payload)
    stream = salt + verifier + payload + auth
    extra = struct.pack("<HHH2sBH", AES_EXTRA_ID, 7, 2, b"AE", strength, inner_method)
    nameb = name.encode("utf-8")
    with open(path, "wb") as f:
        local = struct.pack(
            "<4sHHHHHIIIHH",
            b"PK\x03\x04",
            51,  # version needed: 5.1 for AES
            1,   # gp flag: encrypted
            WZ_AES_METHOD,
            0, 0,  # dos time/date
            0,  # crc (AE-2)
            len(stream),
            len(data),
            len(nameb),
            len(extra),
        )
        f.write(local + nameb + extra)
        f.write(stream)
        cd_off = f.tell()
        central = struct.pack(
            "<4sHHHHHHIIIHHHHHII",
            b"PK\x01\x02",
            51, 51, 1,
            WZ_AES_METHOD,
            0, 0,
            0,
            len(stream),
            len(data),
            len(nameb),
            len(extra),
            0, 0, 0, 0,
            0,  # local header offset
        )
        f.write(central + nameb + extra)
        cd_size = f.tell() - cd_off
        f.write(
            struct.pack(
                "<4sHHHHIIH", b"PK\x05\x06", 0, 0, 1, 1, cd_size, cd_off, 0
            )
        )
