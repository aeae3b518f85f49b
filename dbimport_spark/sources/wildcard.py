"""Multi-file wildcard import: `?`/`*` in the filename part only, files
sorted by name, one table per file derived from the filename.

Reference: DbImport.java:907-948 (wildcard expansion), :1316-1361
(table-from-filename: strip extensions, `(tablename)` override wins),
DbImportMultiWorker.java:39-196 (per-file sub-import, `-c` stops at first
error).
"""

from __future__ import annotations

import glob
import os
import re


def expand_wildcard(pattern: str) -> list[str]:
    """Sorted file list; wildcards allowed in the filename only
    (DbImport.java:907-923)."""
    dirname = os.path.dirname(pattern)
    if any(ch in dirname for ch in "*?"):
        raise ValueError("wildcards are only allowed in the filename, not the directory")
    return sorted(glob.glob(pattern))


_TABLE_OVERRIDE_RE = re.compile(r"\(([^)]+)\)")
_COMPRESSION_EXTS = (".zip", ".tar.gz", ".tgz", ".tar", ".gz")
_FORMAT_EXTS = (".csv", ".json", ".yaml", ".yml", ".xml", ".xlsx", ".xls",
                ".ods", ".vcf", ".kdbx", ".sql")


def table_name_for_file(path: str) -> str:
    """Derive the target table name from a file name: a `(tablename)`
    marker anywhere in the name wins; otherwise strip compression + format
    extensions (DbImport.java:1316-1361)."""
    name = os.path.basename(path)
    m = _TABLE_OVERRIDE_RE.search(name)
    if m:
        return m.group(1).strip().lower()
    lower = name.lower()
    for ext in _COMPRESSION_EXTS:
        if lower.endswith(ext):
            name = name[: -len(ext)]
            lower = name.lower()
            break
    for ext in _FORMAT_EXTS:
        if lower.endswith(ext):
            name = name[: -len(ext)]
            break
    return name.strip().lower()
