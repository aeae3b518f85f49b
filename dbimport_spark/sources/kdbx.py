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

KDBX4 (Argon2 KDF, HMAC block format) is NOT supported — Argon2 has no
stdlib implementation; a KDBX4 signature raises with a clear message.
When pykeepass IS installed, tests cross-check a self-written database
against it (tests/test_sources.py::test_kdbx_pykeepass_crosscheck).
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


def _read_headers(f) -> dict[int, bytes]:
    sig = f.read(8)
    if sig != _SIG:
        raise KdbxError("not a KDBX file (bad signature)")
    minor, major = struct.unpack("<HH", f.read(4))
    if major >= 4:
        raise KdbxError(
            f"KDBX{major} uses Argon2/HMAC framing — only KDBX3 is supported "
            "(no stdlib Argon2)"
        )
    if major != 3:
        raise KdbxError(f"unsupported KDBX version {major}.{minor}")
    headers: dict[int, bytes] = {}
    while True:
        hid = f.read(1)[0]
        (size,) = struct.unpack("<H", f.read(2))
        data = f.read(size)
        if hid == _H_END:
            return headers
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


def read_kdbx_xml(path: str, password: str) -> tuple[ET.Element, _Salsa20Stream | None]:
    with open(path, "rb") as f:
        headers = _read_headers(f)
        encrypted = f.read()
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
    stream = _Salsa20Stream(protected_key) if protect_passwords else None
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
    payload = ET.tostring(kpf, encoding="utf-8", xml_declaration=True)
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
