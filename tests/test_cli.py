"""CLI (python -m dbimport_spark) end-to-end: the reference's flagship
single-file import path (SURVEY §3.1) against a parquet warehouse —
create-from-inference, UPSERT with keys, invalid-row routing to a
format-faithful errors file, atomic table swap, JSON statistics."""

import json
import os

import pytest

from dbimport_spark.__main__ import build_parser, main


def _run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_create_then_upsert_with_errors(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    f1 = tmp_path / "t1.csv"
    f1.write_text("id;name;amount\n1;alice;10,5\n2;bob;20,25\n")
    f2 = tmp_path / "t2.csv"
    f2.write_text("id;name;amount\n2;bobby;30,75\n4;dora;oops\n5;eve;50,0\n")
    mapping = "id='id'; name='name'; amount='amount' ,"

    rc, st = _run(capsys, wh, "people", "-importfile", str(f1), "-m", mapping)
    assert rc == 0 and st["ok"] and st["created"]
    assert (st["found"], st["inserted"], st["invalid"]) == (2, 2, 0)

    rc, st = _run(
        capsys, wh, "people", "-importfile", str(f2),
        "-import", "UPSERT", "-k", "id", "-m", mapping,
    )
    assert rc == 0 and st["ok"] and not st["created"]
    assert (st["found"], st["inserted"], st["updated"], st["invalid"]) == (3, 1, 1, 1)
    # format-faithful errors file with reference naming (t2.csv.errors.csv)
    assert st["error_file"] == str(f2) + ".errors.csv"
    assert open(st["error_file"]).read() == "id;name;amount\n4;dora;oops\n"

    rows = sorted(
        (r.id, r.name, float(r.amount))
        for r in spark.read.parquet(os.path.join(wh, "people")).collect()
    )
    assert rows == [(1, "alice", 10.5), (2, "bobby", 30.75), (5, "eve", 50.0)]
    # the inference lattice typed the ','-format column numerically
    sch = {f.name: f.dataType.simpleString() for f in spark.read.parquet(os.path.join(wh, "people")).schema.fields}
    assert sch["amount"] == "double" and sch["id"] in ("int", "bigint")


def test_cli_complete_commit_aborts_and_preserves_table(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    f1 = tmp_path / "a.csv"
    f1.write_text("id;v\n1;10\n")
    f2 = tmp_path / "b.csv"
    f2.write_text("id;v\n2;bad\n3;30\n")
    rc, st = _run(capsys, wh, "t", "-importfile", str(f1))
    assert rc == 0 and st["inserted"] == 1

    rc, st = _run(
        capsys, wh, "t", "-importfile", str(f2), "-import", "UPSERT", "-k", "id", "-c",
    )
    assert rc == 2 and not st["ok"] and "rolled back" in st["error"]
    # -c rollback: table untouched
    assert [tuple(r) for r in spark.read.parquet(os.path.join(wh, "t")).collect()] == [(1, 10)]


def test_cli_inline_data_and_flag_grammar(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    rc, st = _run(
        capsys, wh, "inline_t", "-data", "k;v\n1;x\n2;y", "-sep", ";",
    )
    assert rc == 0 and st["inserted"] == 2
    p = build_parser()
    ns = p.parse_args([wh, "x", "-importfile", "f.csv", "-u", "-t", "-n", "NULL"])
    assert ns.no_null_update and ns.trim and ns.null_value == "NULL"
    # missing source is a clean runtime JSON error now that utility
    # modes (-connectiontest) legitimately run without one
    rc, st = _run(capsys, wh, "x")
    assert rc == 2 and not st["ok"] and "required" in st["error"]


def test_cli_wildcard_multifile_table_per_file(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    (tmp_path / "m_one.csv").write_text("id;v\n1;10\n")
    (tmp_path / "m_two.csv").write_text("id;v\n2;20\n")
    rc, st = _run(capsys, wh, "*", "-importfile", str(tmp_path / "m_*.csv"))
    assert rc == 0 and st["ok"] and st["files"] == 2
    assert [i["table"] for i in st["imports"]] == ["m_one", "m_two"]
    assert {r.id for r in spark.read.parquet(os.path.join(wh, "m_two")).collect()} == {2}


def test_cli_sql_script_over_warehouse_views(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    (tmp_path / "t.csv").write_text("id;v\n1;10\n")
    rc, _ = _run(capsys, wh, "base", "-importfile", str(tmp_path / "t.csv"))
    assert rc == 0
    script = tmp_path / "s.sql"
    script.write_text("SELECT count(*) FROM base; SELECT 1;")
    rc, st = _run(capsys, wh, "x", "-importfile", str(script))
    assert rc == 0 and st == {"ok": True, "executed": 2, "errors": []}
    bad = tmp_path / "bad.sql"
    bad.write_text("SELECT * FROM does_not_exist;")
    rc, st = _run(capsys, wh, "x", "-importfile", str(bad))
    assert rc == 2 and not st["ok"] and st["errors"]


def test_cli_utility_modes(spark, tmp_path, capsys):
    """§3.4: connectiontest and importblob (DbImport.java:1042-1126, :822-835)."""
    wh = str(tmp_path / "wh")
    os.makedirs(wh)
    rc, st = _run(capsys, wh, "x", "-connectiontest", "2")
    assert rc == 0 and st == {"ok": True, "iterations": [True, True]}

    spark.createDataFrame([(1, None), (2, None)], "id int, payload binary").write.parquet(
        os.path.join(wh, "blobs")
    )
    blob = tmp_path / "b.bin"
    blob.write_bytes(b"\x01\x02payload")
    rc, st = _run(
        capsys, wh, "blobs", "-importfile", str(blob), "-blobimport", "payload", "id = 2",
    )
    assert rc == 0 and st["ok"]
    rows = {r.id: r.payload for r in spark.read.parquet(os.path.join(wh, "blobs")).collect()}
    assert bytes(rows[2]) == b"\x01\x02payload" and rows[1] is None
    # type mismatch surfaces as a clean JSON error, not a traceback
    rc, st = _run(
        capsys, wh, "blobs", "-importfile", str(blob), "-blobimport", "id", "id = 2",
    )
    assert rc == 2 and not st["ok"] and "DATATYPE_MISMATCH" in st["error"]
