"""KDBX (KeePass) source: decrypt with password, one row per entry.

Reference: dataprovider/KdbxDataProvider.java:176-273 (entries via its own
KdbxReader; password credentials). Implemented here from the PUBLIC KDBX
3.1 format description with the stdlib + the from-scratch AES
(sources/aes.py) — no pykeepass dependency:

    header TLVs → composite key = SHA256(SHA256(password))
    → AES-KDF (`rounds`× AES-ECB over the transform seed) → SHA256
    → master = SHA256(master_seed ‖ transformed)
    → AES-256-CBC payload, PKCS7 → stream-start-bytes check
    → SHA256-verified hashed block stream → optional gzip → XML
    → entries (protected values: Salsa20 inner stream, document order)

KDBX4 is ALSO supported (see the "KDBX4" section below): Argon2d/id KDF
(sources/argon2.py, numpy, RFC 9106 test-vector-validated), u32 header
TLVs + VariantDictionary KDF params, header SHA256 + HMAC-SHA256, HMAC
block stream, AES-CBC or ChaCha20 payload, ChaCha20/Salsa20 inner stream
for protected values. When pykeepass IS installed, tests cross-check a
self-written database against it
(tests/test_sources.py::test_kdbx_pykeepass_crosscheck).
"""

from __future__ import annotations

import base64
import gzip as _gzip
import hashlib
import io
import struct
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from dbimport_spark.sources.aes import AES, cbc_decrypt, cbc_encrypt, pkcs7_pad, pkcs7_unpad

ENTRY_FIELDS = ["title", "username", "password", "url", "notes", "path"]

_SIG = b"\x03\xd9\xa2\x9a\x67\xfb\x4b\xb5"
_AES_UUID = bytes.fromhex("31c1f2e6bf714350be5805216afc5aff")
# header TLV ids (KDBX3)
_H_END, _H_CIPHER, _H_COMPRESSION, _H_MASTER_SEED = 0, 2, 3, 4
_H_TRANSFORM_SEED, _H_TRANSFORM_ROUNDS, _H_IV = 5, 6, 7
_H_PROTECTED_STREAM_KEY, _H_STREAM_START, _H_INNER_STREAM_ID = 8, 9, 10


class KdbxError(ValueError):
    pass


# ------------------------------------------------------------- salsa20

_SALSA_NONCE = bytes.fromhex("e830094b97205d2a")  # fixed KDBX inner nonce


def _salsa20_block(key: bytes, nonce: bytes, counter: int) -> bytes:
    def rotl(x, n):
        return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF

    c = b"expand 32-byte k"
    st = [
        int.from_bytes(c[0:4], "little"),
        *[int.from_bytes(key[i : i + 4], "little") for i in range(0, 16, 4)],
        int.from_bytes(c[4:8], "little"),
        int.from_bytes(nonce[0:4], "little"),
        int.from_bytes(nonce[4:8], "little"),
        counter & 0xFFFFFFFF,
        (counter >> 32) & 0xFFFFFFFF,
        int.from_bytes(c[8:12], "little"),
        *[int.from_bytes(key[i : i + 4], "little") for i in range(16, 32, 4)],
        int.from_bytes(c[12:16], "little"),
    ]
    x = list(st)
    qr = (
        (0, 4, 8, 12), (5, 9, 13, 1), (10, 14, 2, 6), (15, 3, 7, 11),
        (0, 1, 2, 3), (5, 6, 7, 4), (10, 11, 8, 9), (15, 12, 13, 14),
    )
    for _ in range(10):  # 20 rounds = 10 double rounds
        for a, b, cc, d in qr:
            x[b] ^= rotl((x[a] + x[d]) & 0xFFFFFFFF, 7)
            x[cc] ^= rotl((x[b] + x[a]) & 0xFFFFFFFF, 9)
            x[d] ^= rotl((x[cc] + x[b]) & 0xFFFFFFFF, 13)
            x[a] ^= rotl((x[d] + x[cc]) & 0xFFFFFFFF, 18)
    return b"".join(
        ((x[i] + st[i]) & 0xFFFFFFFF).to_bytes(4, "little") for i in range(16)
    )


class _Salsa20Stream:
    """KDBX inner random stream: Salsa20 with key SHA256(protected_stream_key)
    and the fixed nonce, consumed across protected values in document order."""

    def __init__(self, protected_stream_key: bytes):
        self._key = hashlib.sha256(protected_stream_key).digest()
        self._counter = 0
        self._buf = b""

    def crypt(self, data: bytes) -> bytes:
        while len(self._buf) < len(data):
            self._buf += _salsa20_block(self._key, _SALSA_NONCE, self._counter)
            self._counter += 1
        ks, self._buf = self._buf[: len(data)], self._buf[len(data) :]
        return bytes(a ^ b for a, b in zip(data, ks))


# --------------------------------------------------------------- key KDF


def _master_key(password: str, master_seed: bytes, transform_seed: bytes, rounds: int) -> bytes:
    composite = hashlib.sha256(
        hashlib.sha256(password.encode("utf-8")).digest()
    ).digest()
    aes = AES(transform_seed)
    key = composite
    for _ in range(rounds):
        key = aes.encrypt_block(key[:16]) + aes.encrypt_block(key[16:])
    transformed = hashlib.sha256(key).digest()
    return hashlib.sha256(master_seed + transformed).digest()


# ---------------------------------------------------------------- reader


def _read_headers(f) -> tuple[int, dict[int, bytes], bytes]:
    """Returns (major_version, headers, raw_header_bytes). TLV length is
    u16 in KDBX3, u32 in KDBX4; raw bytes are kept for the v4 SHA/HMAC."""
    start = f.tell()
    sig = f.read(8)
    if sig != _SIG:
        raise KdbxError("not a KDBX file (bad signature)")
    minor, major = struct.unpack("<HH", f.read(4))
    if major not in (3, 4):
        raise KdbxError(f"unsupported KDBX version {major}.{minor}")
    def need(n: int) -> bytes:
        b = f.read(n)
        if len(b) != n:
            raise KdbxError("truncated KDBX header (corrupt file)")
        return b

    headers: dict[int, bytes] = {}
    while True:
        hid = need(1)[0]
        if major == 3:
            (size,) = struct.unpack("<H", need(2))
        else:
            (size,) = struct.unpack("<I", need(4))
        data = need(size)
        if hid == _H_END:
            end = f.tell()
            f.seek(start)
            raw = f.read(end - start)
            return major, headers, raw
        headers[hid] = data


def _deblock(data: bytes) -> bytes:
    """SHA256-verified hashed block stream → concatenated payload."""
    out = []
    off = 0
    while True:
        _bid, digest, length = (
            struct.unpack_from("<I", data, off)[0],
            data[off + 4 : off + 36],
            struct.unpack_from("<I", data, off + 36)[0],
        )
        off += 40
        if length == 0:
            return b"".join(out)
        block = data[off : off + length]
        off += length
        if hashlib.sha256(block).digest() != digest:
            raise KdbxError("hashed block stream digest mismatch (corrupt file)")
        out.append(block)


def read_kdbx_xml(path: str, password: str):
    with open(path, "rb") as f:
        major, headers, raw_header = _read_headers(f)
        encrypted = f.read()
    if major == 4:
        return _read_kdbx4_xml(headers, raw_header, encrypted, password)
    if headers.get(_H_CIPHER, _AES_UUID) != _AES_UUID:
        raise KdbxError("only the AES-256 cipher is supported")
    rounds = struct.unpack("<Q", headers[_H_TRANSFORM_ROUNDS])[0]
    key = _master_key(
        password, headers[_H_MASTER_SEED], headers[_H_TRANSFORM_SEED], rounds
    )
    try:
        plain = pkcs7_unpad(cbc_decrypt(key, headers[_H_IV], encrypted))
    except ValueError as e:  # garbage padding: almost always a bad key
        raise KdbxError("wrong password (undecryptable payload)") from e
    start = headers[_H_STREAM_START]
    if plain[: len(start)] != start:
        raise KdbxError("wrong password (stream start bytes mismatch)")
    payload = _deblock(plain[len(start) :])
    if struct.unpack("<I", headers.get(_H_COMPRESSION, b"\0\0\0\0"))[0] == 1:
        payload = _gzip.decompress(payload)
    inner_id = struct.unpack("<I", headers.get(_H_INNER_STREAM_ID, b"\0\0\0\0"))[0]
    stream = None
    if inner_id == 2:
        stream = _Salsa20Stream(headers[_H_PROTECTED_STREAM_KEY])
    elif inner_id != 0:
        raise KdbxError(f"unsupported inner random stream id {inner_id}")
    return ET.fromstring(payload), stream


def read_kdbx_entries(path: str, password: str) -> list[dict[str, str | None]]:
    """All entries, group-path annotated, protected values decrypted."""
    root, stream = read_kdbx_xml(path, password)
    # protected values decrypt against the stream position in DOCUMENT
    # order — walk the whole tree first
    if stream is not None:
        for val in root.iter("Value"):
            if (val.get("Protected") or "").lower() == "true":
                raw = base64.b64decode(val.text or "")
                val.text = stream.crypt(raw).decode("utf-8")
                val.set("Protected", "False")
    entries: list[dict[str, str | None]] = []

    def walk(group, path_parts):
        name_el = group.find("Name")
        name = name_el.text if name_el is not None else None
        parts = path_parts + ([name] if name else [])
        for entry in group.findall("Entry"):
            kv = {}
            for s in entry.findall("String"):
                k = s.findtext("Key")
                if k is not None:
                    kv[k] = s.findtext("Value")
            entries.append(
                {
                    "title": kv.get("Title"),
                    "username": kv.get("UserName"),
                    "password": kv.get("Password"),
                    "url": kv.get("URL"),
                    "notes": kv.get("Notes"),
                    "path": "/".join(parts),
                }
            )
        for sub in group.findall("Group"):
            walk(sub, parts)

    kp_root = root.find("Root")
    if kp_root is None:
        raise KdbxError("no Root element in KDBX XML")
    for group in kp_root.findall("Group"):
        walk(group, [])
    return entries


def read_kdbx(spark: SparkSession, path: str, password: str) -> DataFrame:
    from dbimport_spark.sources.excel import rows_to_df

    rows = [[e[f] for f in ENTRY_FIELDS] for e in read_kdbx_entries(path, password)]
    return rows_to_df(spark, ENTRY_FIELDS, rows)


# ---------------------------------------------------------------- writer


def write_kdbx3_minimal(
    path: str,
    entries: list[dict[str, str]],
    password: str,
    rounds: int = 6000,
    compress: bool = True,
    protect_passwords: bool = True,
    seed: bytes = b"\x42" * 32,
) -> None:
    """Minimal KDBX 3.1 writer (fixtures + tests; deterministic when
    ``seed`` is fixed). Entries: dicts with title/username/password/url/
    notes and optional 'group' ('a/b' nests groups under Root)."""
    master_seed = hashlib.sha256(seed + b"master").digest()
    transform_seed = hashlib.sha256(seed + b"transform").digest()
    iv = hashlib.sha256(seed + b"iv").digest()[:16]
    protected_key = hashlib.sha256(seed + b"inner").digest()
    stream_start = hashlib.sha256(seed + b"start").digest()

    stream = _Salsa20Stream(protected_key) if protect_passwords else None
    payload = _build_xml(entries, stream)
    if compress:
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(payload)
        payload = buf.getvalue()
    block = (
        struct.pack("<I", 0)
        + hashlib.sha256(payload).digest()
        + struct.pack("<I", len(payload))
        + payload
        + struct.pack("<I", 1)
        + b"\x00" * 32
        + struct.pack("<I", 0)
    )
    key = _master_key(password, master_seed, transform_seed, rounds)
    encrypted = cbc_encrypt(key, iv, pkcs7_pad(stream_start + block))

    headers = [
        (_H_CIPHER, _AES_UUID),
        (_H_COMPRESSION, struct.pack("<I", 1 if compress else 0)),
        (_H_MASTER_SEED, master_seed),
        (_H_TRANSFORM_SEED, transform_seed),
        (_H_TRANSFORM_ROUNDS, struct.pack("<Q", rounds)),
        (_H_IV, iv),
        (_H_PROTECTED_STREAM_KEY, protected_key),
        (_H_STREAM_START, stream_start),
        (_H_INNER_STREAM_ID, struct.pack("<I", 2 if protect_passwords else 0)),
        (_H_END, b"\r\n\r\n"),
    ]
    with open(path, "wb") as f:
        f.write(_SIG)
        f.write(struct.pack("<HH", 1, 3))  # version 3.1
        for hid, data in headers:
            f.write(struct.pack("<BH", hid, len(data)) + data)
        f.write(encrypted)


def _build_xml(entries: list[dict[str, str]], stream) -> bytes:
    """KeePassFile XML from entry dicts; passwords protected with the
    given inner stream (Salsa20 for v3, ChaCha20 for v4) when present."""
    root_group = ET.Element("Group")
    ET.SubElement(root_group, "Name").text = "Root"
    group_cache: dict[str, ET.Element] = {"": root_group}

    def group_for(gpath: str) -> ET.Element:
        if gpath in group_cache:
            return group_cache[gpath]
        parent, _, leaf = gpath.rpartition("/")
        g = ET.SubElement(group_for(parent), "Group")
        ET.SubElement(g, "Name").text = leaf
        group_cache[gpath] = g
        return g

    field_keys = (
        ("Title", "title"), ("UserName", "username"), ("Password", "password"),
        ("URL", "url"), ("Notes", "notes"),
    )
    for e in entries:
        g = group_for(e.get("group", ""))
        el = ET.SubElement(g, "Entry")
        for xml_key, field in field_keys:
            s = ET.SubElement(el, "String")
            ET.SubElement(s, "Key").text = xml_key
            v = ET.SubElement(s, "Value")
            text = e.get(field, "")
            if field == "password" and stream is not None:
                v.set("Protected", "True")
                v.text = base64.b64encode(
                    stream.crypt(text.encode("utf-8"))
                ).decode("ascii")
            else:
                v.text = text

    kpf = ET.Element("KeePassFile")
    ET.SubElement(kpf, "Meta")
    root_el = ET.SubElement(kpf, "Root")
    root_el.append(root_group)
    return ET.tostring(kpf, encoding="utf-8", xml_declaration=True)


# ================================================================= KDBX4
#
# KDBX4 framing (public format spec; reference delegates to the KeePass
# implementation, KdbxDataProvider.java:176-273): u32 header TLVs, KDF
# described by a VariantDictionary (Argon2d/id — sources/argon2.py),
# header SHA256 + HMAC-SHA256, HMAC-keyed block stream around the
# ciphertext, inner header carrying the random-stream id/key, ChaCha20
# protected values.

_H_KDF_PARAMS = 11
_ARGON2D_UUID = bytes.fromhex("ef636ddf8c29444b91f7a9a403e30a0c")
_ARGON2ID_UUID = bytes.fromhex("9e298b1956db4773b23dfc3ec6f0a1e6")
_AES_KDF_UUID = bytes.fromhex("c9d9f39a628a4460bf740d08c18a4fea")
_CHACHA20_UUID = bytes.fromhex("d6038a2b8b6f4cb5a524339a31dbb59a")
_INNER_END, _INNER_STREAM_ID, _INNER_STREAM_KEY, _INNER_BINARY = 0, 1, 2, 3


def _chacha20_block(key: bytes, nonce: bytes, counter: int) -> bytes:
    def rotl(x, n):
        return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF

    st = [
        0x61707865, 0x3320646E, 0x79622D32, 0x6B206574,
        *[int.from_bytes(key[i : i + 4], "little") for i in range(0, 32, 4)],
        counter & 0xFFFFFFFF,
        *[int.from_bytes(nonce[i : i + 4], "little") for i in range(0, 12, 4)],
    ]
    x = list(st)
    qr = (
        (0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15),
        (0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14),
    )
    for _ in range(10):
        for a, b, c, d in qr:
            x[a] = (x[a] + x[b]) & 0xFFFFFFFF; x[d] = rotl(x[d] ^ x[a], 16)
            x[c] = (x[c] + x[d]) & 0xFFFFFFFF; x[b] = rotl(x[b] ^ x[c], 12)
            x[a] = (x[a] + x[b]) & 0xFFFFFFFF; x[d] = rotl(x[d] ^ x[a], 8)
            x[c] = (x[c] + x[d]) & 0xFFFFFFFF; x[b] = rotl(x[b] ^ x[c], 7)
    return b"".join(
        ((x[i] + st[i]) & 0xFFFFFFFF).to_bytes(4, "little") for i in range(16)
    )


class _ChaCha20Stream:
    """RFC 8439 ChaCha20 keystream; for the KDBX4 inner random stream the
    key material is SHA512(stream_key): key = [:32], nonce = [32:44]."""

    def __init__(self, key: bytes, nonce: bytes, counter: int = 0):
        self._key, self._nonce, self._counter = key, nonce, counter
        self._buf = b""

    @classmethod
    def inner(cls, stream_key: bytes) -> "_ChaCha20Stream":
        h = hashlib.sha512(stream_key).digest()
        return cls(h[:32], h[32:44])

    def crypt(self, data: bytes) -> bytes:
        while len(self._buf) < len(data):
            self._buf += _chacha20_block(self._key, self._nonce, self._counter)
            self._counter += 1
        ks, self._buf = self._buf[: len(data)], self._buf[len(data) :]
        return bytes(a ^ b for a, b in zip(data, ks))


# ------------------------------------------------- VariantDictionary

_VD_U32, _VD_U64, _VD_BOOL, _VD_I32, _VD_I64 = 0x04, 0x05, 0x08, 0x0C, 0x0D
_VD_STR, _VD_BYTES = 0x18, 0x42


def _vd_parse(data: bytes) -> dict[str, object]:
    (ver,) = struct.unpack_from("<H", data, 0)
    if ver & 0xFF00 != 0x0100:
        raise KdbxError(f"unsupported VariantDictionary version {ver:#x}")
    out: dict[str, object] = {}
    off = 2
    while True:
        t = data[off]
        off += 1
        if t == 0:
            return out
        (klen,) = struct.unpack_from("<I", data, off)
        off += 4
        key = data[off : off + klen].decode("utf-8")
        off += klen
        (vlen,) = struct.unpack_from("<I", data, off)
        off += 4
        raw = data[off : off + vlen]
        off += vlen
        if t == _VD_U32:
            out[key] = struct.unpack("<I", raw)[0]
        elif t == _VD_U64:
            out[key] = struct.unpack("<Q", raw)[0]
        elif t == _VD_BOOL:
            out[key] = raw != b"\x00"
        elif t == _VD_I32:
            out[key] = struct.unpack("<i", raw)[0]
        elif t == _VD_I64:
            out[key] = struct.unpack("<q", raw)[0]
        elif t == _VD_STR:
            out[key] = raw.decode("utf-8")
        elif t == _VD_BYTES:
            out[key] = raw
        else:
            raise KdbxError(f"unknown VariantDictionary type {t:#x}")


def _vd_serialize(items: list[tuple[int, str, object]]) -> bytes:
    out = [struct.pack("<H", 0x0100)]
    for t, key, val in items:
        if t == _VD_U32:
            raw = struct.pack("<I", val)
        elif t == _VD_U64:
            raw = struct.pack("<Q", val)
        elif t == _VD_BYTES:
            raw = val
        else:
            raise KdbxError(f"unsupported VariantDictionary write type {t:#x}")
        kb = key.encode("utf-8")
        out.append(
            bytes([t]) + struct.pack("<I", len(kb)) + kb
            + struct.pack("<I", len(raw)) + raw
        )
    out.append(b"\x00")
    return b"".join(out)


# ------------------------------------------------------ KDBX4 keys/blocks


def _kdbx4_keys(password: str, headers: dict[int, bytes]) -> tuple[bytes, bytes]:
    """(cipher_key, hmac_base) from password + v4 headers."""
    from dbimport_spark.sources.argon2 import ARGON2D, ARGON2ID, argon2

    composite = hashlib.sha256(
        hashlib.sha256(password.encode("utf-8")).digest()
    ).digest()
    kdf = _vd_parse(headers[_H_KDF_PARAMS])
    uuid = kdf.get("$UUID")
    if uuid == _ARGON2D_UUID or uuid == _ARGON2ID_UUID:
        transformed = argon2(
            composite,
            kdf["S"],
            time_cost=int(kdf["I"]),
            memory_kib=int(kdf["M"]) // 1024,
            parallelism=int(kdf["P"]),
            tag_len=32,
            type_=ARGON2D if uuid == _ARGON2D_UUID else ARGON2ID,
            version=int(kdf.get("V", 0x13)),
        )
    elif uuid == _AES_KDF_UUID:
        aes = AES(kdf["S"])
        key = composite
        for _ in range(int(kdf["R"])):
            key = aes.encrypt_block(key[:16]) + aes.encrypt_block(key[16:])
        transformed = hashlib.sha256(key).digest()
    else:
        raise KdbxError(f"unsupported KDF UUID {uuid.hex() if isinstance(uuid, bytes) else uuid}")
    master_seed = headers[_H_MASTER_SEED]
    cipher_key = hashlib.sha256(master_seed + transformed).digest()
    hmac_base = hashlib.sha512(master_seed + transformed + b"\x01").digest()
    return cipher_key, hmac_base


def _hmac_block_key(hmac_base: bytes, index: int) -> bytes:
    return hashlib.sha512(struct.pack("<Q", index) + hmac_base).digest()


def _hmac_deblock(data: bytes, hmac_base: bytes) -> bytes:
    import hmac as _hmac

    out = []
    off, i = 0, 0
    while True:
        mac = data[off : off + 32]
        (length,) = struct.unpack_from("<I", data, off + 32)
        off += 36
        block = data[off : off + length]
        off += length
        msg = struct.pack("<Q", i) + struct.pack("<I", length) + block
        want = _hmac.new(_hmac_block_key(hmac_base, i), msg, hashlib.sha256).digest()
        if not _hmac.compare_digest(mac, want):
            raise KdbxError("HMAC block stream mismatch (wrong password or corrupt)")
        if length == 0:
            return b"".join(out)
        out.append(block)
        i += 1


def _hmac_enblock(data: bytes, hmac_base: bytes, block_size: int = 1 << 20) -> bytes:
    import hmac as _hmac

    out = []
    i = 0
    for off in range(0, len(data) + 1, block_size):
        block = data[off : off + block_size]
        msg = struct.pack("<Q", i) + struct.pack("<I", len(block)) + block
        mac = _hmac.new(_hmac_block_key(hmac_base, i), msg, hashlib.sha256).digest()
        out.append(mac + struct.pack("<I", len(block)) + block)
        i += 1
        if not block:
            break
    else:
        # data length was an exact multiple: still need the terminator
        msg = struct.pack("<Q", i) + struct.pack("<I", 0)
        mac = _hmac.new(_hmac_block_key(hmac_base, i), msg, hashlib.sha256).digest()
        out.append(mac + struct.pack("<I", 0))
    return b"".join(out)


def _read_kdbx4_xml(headers, raw_header, body, password):
    import hmac as _hmac

    if hashlib.sha256(raw_header).digest() != body[:32]:
        raise KdbxError("header SHA256 mismatch (corrupt file)")
    cipher_key, hmac_base = _kdbx4_keys(password, headers)
    header_mac_key = _hmac_block_key(hmac_base, 0xFFFFFFFFFFFFFFFF)
    want = _hmac.new(header_mac_key, raw_header, hashlib.sha256).digest()
    if not _hmac.compare_digest(want, body[32:64]):
        raise KdbxError("wrong password (header HMAC mismatch)")
    encrypted = _hmac_deblock(body[64:], hmac_base)
    cipher = headers.get(_H_CIPHER, _AES_UUID)
    iv = headers[_H_IV]
    if cipher == _AES_UUID:
        try:
            payload = pkcs7_unpad(cbc_decrypt(cipher_key, iv, encrypted))
        except ValueError as e:
            raise KdbxError("undecryptable payload (corrupt file)") from e
    elif cipher == _CHACHA20_UUID:
        payload = _ChaCha20Stream(cipher_key, iv, 0).crypt(encrypted)
    else:
        raise KdbxError(f"unsupported cipher {cipher.hex()}")
    if struct.unpack("<I", headers.get(_H_COMPRESSION, b"\0\0\0\0"))[0] == 1:
        payload = _gzip.decompress(payload)
    # inner header
    off = 0
    stream_id, stream_key = 0, b""
    while True:
        t = payload[off]
        (length,) = struct.unpack_from("<I", payload, off + 1)
        data = payload[off + 5 : off + 5 + length]
        off += 5 + length
        if t == _INNER_END:
            break
        if t == _INNER_STREAM_ID:
            stream_id = struct.unpack("<I", data)[0]
        elif t == _INNER_STREAM_KEY:
            stream_key = data
        elif t != _INNER_BINARY:
            raise KdbxError(f"unknown inner header type {t}")
    if stream_id == 3:
        stream = _ChaCha20Stream.inner(stream_key)
    elif stream_id == 2:
        stream = _Salsa20Stream(stream_key)
    elif stream_id == 0:
        stream = None
    else:
        raise KdbxError(f"unsupported inner random stream id {stream_id}")
    return ET.fromstring(payload[off:]), stream


def write_kdbx4_minimal(
    path: str,
    entries: list[dict[str, str]],
    password: str,
    memory_kib: int = 64,
    iterations: int = 2,
    parallelism: int = 2,
    compress: bool = True,
    protect_passwords: bool = True,
    seed: bytes = b"\x42" * 32,
) -> None:
    """Minimal KDBX 4.0 writer (fixtures + tests; deterministic for a
    fixed ``seed``): Argon2d KDF, AES-256-CBC payload, gzip, ChaCha20
    inner stream for protected values, HMAC block stream framing."""
    from dbimport_spark.sources.argon2 import ARGON2D, argon2

    master_seed = hashlib.sha256(seed + b"master4").digest()
    kdf_salt = hashlib.sha256(seed + b"argon2salt").digest()
    iv = hashlib.sha256(seed + b"iv4").digest()[:16]
    inner_key = hashlib.sha512(seed + b"inner4").digest()  # 64 bytes

    stream = _ChaCha20Stream.inner(inner_key) if protect_passwords else None
    xml = _build_xml(entries, stream)
    inner_header = (
        bytes([_INNER_STREAM_ID]) + struct.pack("<I", 4)
        + struct.pack("<I", 3 if protect_passwords else 0)
        + bytes([_INNER_STREAM_KEY]) + struct.pack("<I", len(inner_key)) + inner_key
        + bytes([_INNER_END]) + struct.pack("<I", 0)
    )
    payload = inner_header + xml
    if compress:
        buf = io.BytesIO()
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(payload)
        payload = buf.getvalue()

    kdf_params = _vd_serialize(
        [
            (_VD_BYTES, "$UUID", _ARGON2D_UUID),
            (_VD_BYTES, "S", kdf_salt),
            (_VD_U32, "P", parallelism),
            (_VD_U64, "M", memory_kib * 1024),
            (_VD_U64, "I", iterations),
            (_VD_U32, "V", 0x13),
        ]
    )
    headers = [
        (_H_CIPHER, _AES_UUID),
        (_H_COMPRESSION, struct.pack("<I", 1 if compress else 0)),
        (_H_MASTER_SEED, master_seed),
        (_H_IV, iv),
        (_H_KDF_PARAMS, kdf_params),
        (_H_END, b"\r\n\r\n"),
    ]
    raw = io.BytesIO()
    raw.write(_SIG)
    raw.write(struct.pack("<HH", 0, 4))  # version 4.0
    for hid, data in headers:
        raw.write(struct.pack("<BI", hid, len(data)) + data)
    raw_header = raw.getvalue()

    composite = hashlib.sha256(
        hashlib.sha256(password.encode("utf-8")).digest()
    ).digest()
    transformed = argon2(
        composite, kdf_salt, time_cost=iterations, memory_kib=memory_kib,
        parallelism=parallelism, tag_len=32, type_=ARGON2D,
    )
    cipher_key = hashlib.sha256(master_seed + transformed).digest()
    hmac_base = hashlib.sha512(master_seed + transformed + b"\x01").digest()

    import hmac as _hmac

    encrypted = cbc_encrypt(cipher_key, iv, pkcs7_pad(payload))
    with open(path, "wb") as f:
        f.write(raw_header)
        f.write(hashlib.sha256(raw_header).digest())
        f.write(
            _hmac.new(
                _hmac_block_key(hmac_base, 0xFFFFFFFFFFFFFFFF),
                raw_header,
                hashlib.sha256,
            ).digest()
        )
        f.write(_hmac_enblock(encrypted, hmac_base))
