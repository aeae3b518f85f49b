"""Automapping + mapping validation.

Reference: case-insensitive automap DbImportWorker.java:217-230 (and
:185-197); validation rules :199-246 — mapped db column must exist in the
target, mapped data property must exist in the source, key columns must be
mapped.
"""

from __future__ import annotations

from dbimport_spark.config import ColumnMapping, KeyColumn


def automap(db_columns: list[str], data_columns: list[str]) -> list[ColumnMapping]:
    """Case-insensitive name-equality automapping
    (DbImportWorker.java:217-230)."""
    by_lower = {c.lower(): c for c in data_columns}
    out = []
    for db_col in db_columns:
        src = by_lower.get(db_col.lower())
        if src is not None:
            out.append(ColumnMapping(target=db_col.lower(), source=src))
    return out


def check_mapping(
    mappings: list[ColumnMapping],
    db_columns: list[str],
    data_columns: list[str],
    key_columns: list[KeyColumn] | None = None,
) -> None:
    """Raise ValueError with reference-style messages on invalid mappings
    (DbImportWorker.java:199-246)."""
    db_lower = {c.lower() for c in db_columns}
    data_set = set(data_columns)
    mapped_targets = set()
    for m in mappings:
        if m.target.lower() not in db_lower:
            raise ValueError(f"Mapped db column '{m.target}' does not exist in table")
        if m.source is not None and m.source not in data_set:
            raise ValueError(f"Mapped data property '{m.source}' does not exist in data")
        mapped_targets.add(m.target.lower())
    for k in key_columns or []:
        if k.column.lower() not in mapped_targets:
            raise ValueError(f"Key column '{k.column}' is not included in mapping")
