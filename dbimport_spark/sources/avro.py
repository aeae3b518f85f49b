"""From-scratch Avro object-container codec (stdlib only).

The container has no Avro jar in this environment (Spark ships avro as an
external module), so — like the XLS/BIFF8, KDBX, and WinZip-AES sources —
the format is implemented directly from the public specification
(https://avro.apache.org/docs/1.11.1/specification/): magic ``Obj\\x01``,
a bytes-map of file metadata (``avro.schema`` JSON, ``avro.codec``), a
16-byte sync marker, then blocks of ``(long count, long size, payload,
sync)``. Scalars use zigzag-varint longs, length-prefixed UTF-8 strings,
little-endian IEEE floats/doubles; nullable fields are ``["null", T]``
unions (branch index then value). Supported codecs: ``null`` and
``deflate`` (raw DEFLATE, no zlib header — spec §"Required Codecs").

Type surface: long, double, string, bytes, boolean, and their nullable
unions — the scalar lattice the import pipeline's schema inference emits
(dbimport_spark/schema/infer.py). Reference parity: the reference imports
whatever container lands in the drop dir (DbImportWorker file-type
dispatch); Avro is the row-oriented lake interchange sibling of its
CSV/JSON surface.

Scale design: one container FILE is the unit of parallelism (exactly like
the reference's one-file-one-import and like parquet part files). The
writer runs as one task per partition via mapInPandas, each emitting an
independent container file; the reader lists ``*.avro`` through Spark's
binaryFile source and decodes each file in the task that holds its bytes.
Finer-than-file splitting (seeking to sync markers) is possible per spec
but pointless below ~128 MB part files, which the writer never exceeds
here."""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic marker: reproducible fixtures


# ---------------------------------------------------------------- encoding

def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        u |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_value(v, typ: str, nullable: bool) -> bytes:
    if nullable:
        if v is None:
            return _zigzag_encode(0)
        head = _zigzag_encode(1)
    else:
        head = b""
        if v is None:
            raise ValueError(f"null in non-nullable {typ} field")
    if typ in ("long", "int"):
        return head + _zigzag_encode(int(v))
    if typ == "double":
        return head + struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return head + _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return head + _zigzag_encode(len(raw)) + raw
    if typ == "boolean":
        return head + (b"\x01" if v else b"\x00")
    raise ValueError(f"unsupported avro type {typ}")


def _dec_value(buf: io.BytesIO, typ: str, nullable: bool):
    if nullable:
        if _zigzag_decode(buf) == 0:
            return None
    if typ in ("long", "int"):
        return _zigzag_decode(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return buf.read(_zigzag_decode(buf)).decode("utf-8")
    if typ == "bytes":
        return buf.read(_zigzag_decode(buf))
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    raise ValueError(f"unsupported avro type {typ}")


def _schema_json(fields: list[tuple[str, str, bool]]) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": "Row",
            "fields": [
                {"name": n, "type": ["null", t] if nl else t}
                for (n, t, nl) in fields
            ],
        }
    )


def parse_schema(schema_json: str) -> list[tuple[str, str, bool]]:
    """Flatten a record schema to (name, type, nullable) triples."""
    sch = json.loads(schema_json)
    if sch.get("type") != "record":
        raise ValueError("only record schemas supported")
    out = []
    for f in sch["fields"]:
        t = f["type"]
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(branches) != 1 or len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union {t}")
            out.append((f["name"], branches[0], True))
        else:
            out.append((f["name"], t, False))
    return out


# -------------------------------------------------------------- container

def write_container(
    rows, fields: list[tuple[str, str, bool]], codec: str = "deflate",
    rows_per_block: int = 1000,
) -> bytes:
    """Serialize rows (sequences ordered like ``fields``) into one Avro
    object-container file, returned as bytes."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec}")
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": _schema_json(fields).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag_encode(len(meta))
    for k, v in sorted(meta.items()):
        kk = k.encode()
        out += _zigzag_encode(len(kk)) + kk + _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    out += SYNC

    rows = list(rows)
    for start in range(0, len(rows), rows_per_block):
        chunk = rows[start : start + rows_per_block]
        payload = bytearray()
        for r in chunk:
            for (name, typ, nl), v in zip(fields, r):
                payload += _enc_value(v, typ, nl)
        data = bytes(payload)
        if codec == "deflate":
            data = zlib.compress(data, 6)[2:-4]  # strip zlib header+adler
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(data))
        out += data
        out += SYNC
    return bytes(out)


def read_container(blob: bytes):
    """Decode one container file → (fields, rows); rows are tuples in
    field order."""
    buf = io.BytesIO(blob)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count prefixes a block byte size
            n = -n
            _zigzag_decode(buf)
        for _ in range(n):
            k = buf.read(_zigzag_decode(buf)).decode()
            v = buf.read(_zigzag_decode(buf))
            meta[k] = v
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec}")
    fields = parse_schema(meta["avro.schema"].decode())
    sync = buf.read(16)
    rows = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n_rows = _zigzag_decode(buf)
        n_bytes = _zigzag_decode(buf)
        data = buf.read(n_bytes)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        bbuf = io.BytesIO(data)
        for _ in range(n_rows):
            rows.append(
                tuple(_dec_value(bbuf, t, nl) for (_, t, nl) in fields)
            )
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
    return fields, rows


# ------------------------------------------------------------ spark glue

_SPARK_TO_AVRO = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "boolean": "boolean",
}


def write_avro_dir(df, path: str, codec: str = "deflate") -> None:
    """Distributed writer: each input partition emits one independent
    ``part-N.avro`` container file under ``path`` (the parquet part-file
    convention; local/shared filesystem, like every lake sink here)."""
    import shutil

    import pandas as pd

    if os.path.isdir(path):  # overwrite semantics, like every sink here
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_AVRO:
            raise ValueError(f"unsupported spark type {t} for avro")
        fields.append((f.name, _SPARK_TO_AVRO[t], f.nullable))
    names = [f[0] for f in fields]

    def _write(iterator):
        import uuid

        buf = []
        for pdf in iterator:
            buf.append(pdf)
        n = 0
        if buf:
            all_pdf = pd.concat(buf, ignore_index=True)
            rows = [
                tuple(None if pd.isna(v) else v for v in t)
                for t in all_pdf[names].itertuples(index=False, name=None)
            ]
            n = len(rows)
            if n:
                blob = write_container(rows, fields, codec=codec)
                fn = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
                with open(fn, "wb") as fh:
                    fh.write(blob)
        yield pd.DataFrame({"n_rows": [n]})

    df.mapInPandas(_write, "n_rows long").collect()


def read_avro_dir(spark, path: str, schema: str):
    """Distributed reader: Spark's binaryFile source lists and ships each
    container file to one task; the task decodes it with the stdlib codec.
    ``schema`` is the expected Spark DDL (names must match the embedded
    writer schema; decode order comes from the FILE's schema, so column
    order differences are tolerated)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))
    expected = [c.strip().split()[0] for c in schema.split(",")]

    def _read(iterator):
        for pdf in iterator:
            for blob in pdf["content"]:
                fields, rows = read_container(bytes(blob))
                cols = [f[0] for f in fields]
                yield pd.DataFrame(rows, columns=cols)[expected]

    return files.select("content").mapInPandas(_read, schema)
