"""KDBX (KeePass) source: decrypt with password, one row per entry.

Reference: dataprovider/KdbxDataProvider.java:176-273. pykeepass is not in
this container — parse is import-gated; the row→DataFrame plumbing is the
shared ``rows_to_df`` used by Excel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbimport_spark.sources.excel import rows_to_df

ENTRY_FIELDS = ["title", "username", "password", "url", "notes", "path"]


def read_kdbx(
    spark: SparkSession,
    path: str,
    password: str,
) -> DataFrame:
    try:
        from pykeepass import PyKeePass
    except ImportError as e:
        raise NotImplementedError(
            "kdbx parsing requires pykeepass (not installed in this container)"
        ) from e
    kp = PyKeePass(path, password=password)
    rows = [
        [e.title, e.username, e.password, e.url, e.notes, "/".join(e.path or [])]
        for e in kp.entries
    ]
    return rows_to_df(spark, ENTRY_FIELDS, rows)
