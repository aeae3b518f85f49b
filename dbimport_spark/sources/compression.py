"""Compression envelope: transparent zip / tar.gz / tgz / gz (optionally
password-protected zip) around any format.

Reference: DataProvider.java:166-197 (single-zip-entry enforcement,
AES-256 and ZipCrypto passwords), uncompressed-size probing :270-292.

gzip/bzip2 are native to Spark's text-based readers (splittable: no — but
distributed across files). zip/tar need a pre-step: entries are extracted
to a temp dir and the extracted path is handed to the real reader. The
extraction is driver-side per archive — matching the reference, which
streams a single archive single-threaded; many archives can be extracted
in parallel by the caller.

ZipCrypto passwords: stdlib zipfile. WinZip-AES (AES-128/192/256) zips:
stdlib parse + from-scratch AES in sources/zipaes.py / sources/aes.py.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import os
import shutil
import tarfile
import tempfile
import zipfile

NATIVE_SUFFIXES = (".gz", ".bz2")  # Spark text readers decode transparently
ARCHIVE_SUFFIXES = (".zip", ".tar.gz", ".tgz", ".tar")
def _zst_open(path, mode="rb"):
    """File-like over a decompressed .zst: native codec when the frame
    declares its size, from-scratch RFC 8878 decoder (sources/zstd.py)
    otherwise."""
    import io

    from dbimport_spark.sources.zstd import zstd_decompress_auto

    with open(path, "rb") as fh:
        return io.BytesIO(zstd_decompress_auto(fh.read()))


_STREAM_CODECS = {".gz": gzip.open, ".bz2": bz2.open, ".xz": lzma.open,
                  ".lzma": lzma.open, ".zst": _zst_open}


def decompress_if_needed(
    path: str,
    password: str | None = None,
    target_dir: str | None = None,
    for_spark_text_reader: bool = True,
) -> str:
    """Return a path readable by the downstream reader.

    *.gz stays as-is when the downstream reader is a Spark text-based one
    (CSV/JSON — Spark decompresses transparently); otherwise it is
    gunzipped. zip/tar(.gz) are extracted (single entry enforced for zip,
    like DataProvider.java:166-197).
    """
    lower = path.lower()
    if lower.endswith((".tar.gz", ".tgz", ".tar")):
        out = target_dir or tempfile.mkdtemp(prefix="dbimport_untar_")
        with tarfile.open(path) as tf:
            members = [m for m in tf.getmembers() if m.isfile()]
            if not members:
                raise ValueError(f"empty tar archive: {path}")
            tf.extractall(out, members=members, filter="data")
            return os.path.join(out, members[0].name)
    if lower.endswith(".zip"):
        out = target_dir or tempfile.mkdtemp(prefix="dbimport_unzip_")
        with zipfile.ZipFile(path) as zf:
            names = [n for n in zf.namelist() if not n.endswith("/")]
            if len(names) != 1:
                raise ValueError(
                    f"zip archive must contain exactly one entry, found {len(names)}: {path}"
                )
            info = zf.getinfo(names[0])
            if info.compress_type == 99:  # WinZip AES (AE-1/AE-2)
                if password is None:
                    raise ValueError(f"AES-encrypted zip needs a password: {path}")
                from dbimport_spark.sources.zipaes import read_aes_entry

                data = read_aes_entry(path, info, password)
                dest = os.path.join(out, os.path.basename(names[0]))
                with open(dest, "wb") as fh:
                    fh.write(data)
                return dest
            if password is not None:
                zf.setpassword(password.encode("utf-8"))
                return zf.extract(names[0], out, pwd=password.encode("utf-8"))
            return zf.extract(names[0], out)
    for suf, opener in _STREAM_CODECS.items():
        if not lower.endswith(suf):
            continue
        if suf in NATIVE_SUFFIXES and for_spark_text_reader:
            return path  # Spark/Hadoop codecs decode these transparently
        # .xz/.lzma have no Hadoop codec in this Spark build: decompress
        # driver-side like the other single-file envelopes (the multi-file
        # wildcard path keeps ingestion distributed ACROSS files)
        out = target_dir or tempfile.mkdtemp(prefix="dbimport_decomp_")
        dest = os.path.join(out, os.path.basename(path)[: -len(suf)])
        with opener(path, "rb") as src, open(dest, "wb") as dst:
            shutil.copyfileobj(src, dst)
        return dest
    return path


def detect_format(path: str) -> str:
    """Extension-based format detection incl. double extensions
    (DbImportDefinition.java:581-654); default CSV."""
    name = os.path.basename(path).lower()
    for comp in (".zip", ".tar.gz", ".tgz", ".tar", ".gz", ".bz2", ".xz", ".lzma", ".zst"):
        if name.endswith(comp):
            name = name[: -len(comp)]
            break
    for fmt in ("csv", "json", "yaml", "yml", "xml", "xlsx", "xls", "ods", "vcf", "kdbx", "sql"):
        if name.endswith("." + fmt):
            return {"yml": "yaml", "xls": "excel", "xlsx": "excel"}.get(fmt, fmt)
    return "csv"
