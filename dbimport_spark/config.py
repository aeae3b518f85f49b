"""Configuration surface mirroring the reference's DbImportDefinition.

Reference: /root/reference/src/main/java/de/soderer/dbimport/DbImportDefinition.java
(import/duplicate mode enums at DbImportDefinition.java:60-137, parameter
checks at :564-703). We keep only what affects data semantics; JDBC vendor
plumbing collapses into Spark writer options.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field


class ImportMode(enum.Enum):
    """Reference: DbImportDefinition.ImportMode (DbImportDefinition.java:60-75)."""

    CLEARINSERT = "CLEARINSERT"  # delete all target rows, then insert
    INSERT = "INSERT"            # insert only keys not present in target
    UPDATE = "UPDATE"            # update only keys present in target
    UPSERT = "UPSERT"            # update existing, then insert missing


class DuplicateMode(enum.Enum):
    """Reference: DbImportDefinition.DuplicateMode (DbImportDefinition.java:77-137).

    CKECK_SOURCE_* prefixes in the reference are split here into the two
    orthogonal decisions actually taken by DbImportWorker.java:426-581:
    what to do with duplicate keys in the source (drop first / join) and
    whether to dedup the target first (MAKE_UNIQUE) or update only the
    first target occurrence (UPDATE_FIRST) vs all (UPDATE_ALL).
    """

    NO_CHECK = "NO_CHECK"
    CKECK_SOURCE_ONLY_DROP = "CKECK_SOURCE_ONLY_DROP"
    CKECK_SOURCE_ONLY_JOIN = "CKECK_SOURCE_ONLY_JOIN"
    UPDATE_FIRST_DROP = "UPDATE_FIRST_DROP"
    UPDATE_FIRST_JOIN = "UPDATE_FIRST_JOIN"
    UPDATE_ALL_DROP = "UPDATE_ALL_DROP"
    UPDATE_ALL_JOIN = "UPDATE_ALL_JOIN"
    MAKE_UNIQUE_DROP = "MAKE_UNIQUE_DROP"
    MAKE_UNIQUE_JOIN = "MAKE_UNIQUE_JOIN"

    @property
    def source_dedup(self) -> str | None:
        """'drop' | 'join' | None — how source duplicates are collapsed."""
        if self is DuplicateMode.NO_CHECK:
            return None
        return "drop" if self.value.endswith("DROP") else "join"

    @property
    def make_unique_target(self) -> bool:
        return self.value.startswith("MAKE_UNIQUE")

    @property
    def source_only_check(self) -> bool:
        """True for NO_CHECK / CKECK_SOURCE_ONLY_*: the reference never
        touches existing target rows in these modes — UPDATE does nothing,
        UPSERT and keyed INSERT append all source rows without an existence
        check (DbImportWorker.java:495-543). Keeping this exact prevents
        pairing an un-collapsed source with a join-based update, which
        would multiply matching target rows."""
        return self in (
            DuplicateMode.NO_CHECK,
            DuplicateMode.CKECK_SOURCE_ONLY_DROP,
            DuplicateMode.CKECK_SOURCE_ONLY_JOIN,
        )

    @property
    def update_first_only(self) -> bool:
        return self.value.startswith("UPDATE_FIRST")


@dataclass
class ColumnMapping:
    """One `dbcolumn="datacolumn" formatinfo` mapping entry.

    Reference parse: DbImportMappingDialog.parseMappingString
    (DbImportMappingDialog.java:286-326). format_info is one of
    '.' ',' 'file' 'lc' 'uc' 'email' or a Java date pattern.
    """

    target: str
    source: str | None  # None → column stays empty/null (`column_blob=;`)
    format_info: str | None = None


_MAPPING_ENTRY_RE = re.compile(
    r"""\s*(?P<target>[\w%$#. -]+?)\s*=\s*(?:'(?P<src>[^']*)'|"(?P<srcq>[^"]*)")?\s*(?P<fmt>[^;\n]*?)\s*$"""
)


def parse_mapping_string(mapping: str) -> list[ColumnMapping]:
    """Parse the `a='x'; b='y' fmt; c=` mapping syntax.

    Reference: DbImportMappingDialog.java:286-326 — entries separated by
    ';' or newline, data column quoted with ' or ", optional trailing
    format info, duplicate db columns rejected.
    """
    entries: list[ColumnMapping] = []
    seen: set[str] = set()
    for raw in re.split(r"[;\n]", mapping):
        if not raw.strip():
            continue
        m = _MAPPING_ENTRY_RE.match(raw)
        if not m:
            raise ValueError(f"Invalid mapping entry: {raw!r}")
        target = m.group("target").strip().lower()
        source = m.group("src") if m.group("src") is not None else m.group("srcq")
        fmt = m.group("fmt").strip() or None
        if target in seen:
            raise ValueError(f"Duplicate db column in mapping: {target!r}")
        seen.add(target)
        entries.append(ColumnMapping(target=target, source=source, format_info=fmt))
    return entries


@dataclass
class KeyColumn:
    """Key column, optionally wrapped in a SQL function like lower(col).

    Reference: keyColumnsWithFunctions parsing at DbImportWorker.java:256-288;
    golden proof of `-k "lower(column_varchar)"` at
    DbImportTest_MariaDB.java:1044-1089.
    """

    column: str
    expression: str | None = None  # SQL expr referencing `column`, e.g. "lower(column_varchar)"

    @property
    def key_expr(self) -> str:
        return self.expression if self.expression else self.column


_KEY_FN_RE = re.compile(r"^\s*(\w+)\s*\(\s*([\w .]+)\s*\)\s*$")


def parse_key_column(spec: str) -> KeyColumn:
    m = _KEY_FN_RE.match(spec)
    if m:
        return KeyColumn(column=m.group(2).strip(), expression=spec.strip())
    return KeyColumn(column=spec.strip())


@dataclass
class ImportDefinition:
    """The semantic subset of the reference's DbImportDefinition."""

    import_mode: ImportMode = ImportMode.INSERT
    duplicate_mode: DuplicateMode = DuplicateMode.UPDATE_ALL_JOIN
    key_columns: list[KeyColumn] = field(default_factory=list)
    mappings: list[ColumnMapping] | None = None
    update_with_null_values: bool = True  # `-u` turns this OFF (DbImport.java:469-471)
    complete_commit: bool = False         # `-c`: any invalid row aborts the import
    trim_values: bool = False             # `-t`
    null_value_string: str = ""           # `-n`
    import_data_time_zone: str | None = None  # `-idtz`
    database_time_zone: str | None = None     # `-dbtz`
    date_format: str | None = None            # `-dateformat` (global)
    date_time_format: str | None = None       # `-datetimeformat`
    additional_insert_values: dict[str, str] = field(default_factory=dict)  # `-insvalues`
    additional_update_values: dict[str, str] = field(default_factory=dict)  # `-updvalues`

    def validate(self) -> None:
        """Reference: DbImportDefinition.checkParameters (:564-703)."""
        if self.import_mode in (ImportMode.UPDATE, ImportMode.UPSERT) and not self.key_columns:
            raise ValueError(f"Key columns are mandatory for import mode {self.import_mode.value}")
