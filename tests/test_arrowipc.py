"""Arrow IPC source tests: batch-range splitting, roundtrip fidelity,
writer hygiene."""

import os

from dbimport_spark.sources.arrowipc import (
    _batch_ranges,
    read_arrow_ipc_dir,
    write_arrow_ipc_dir,
)

SCHEMA = "k long, name string, val double"


def _df(spark, n=200):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 7 == 0, F.lit(None))
            .otherwise(F.concat(F.lit("name-"), F.col("id")))
            .alias("name"),
            (F.col("id") / 3.0).alias("val"),
        )
    )


def test_roundtrip_identity_with_nulls_and_doubles(spark, tmp_path):
    out = str(tmp_path / "a")
    write_arrow_ipc_dir(_df(spark), out, num_shards=3, key_col="k", batch_rows=16)
    back = read_arrow_ipc_dir(spark, out, SCHEMA, target_bytes=1 << 10)
    got = {r.k: (r.name, r.val) for r in back.collect()}
    want = {r.k: (r.name, r.val) for r in _df(spark).collect()}
    assert got == want  # bit-exact doubles, null validity preserved


def test_batch_ranges_split_within_one_file(spark, tmp_path):
    out = str(tmp_path / "b")
    paths = write_arrow_ipc_dir(
        _df(spark, 500), out, num_shards=1, key_col="k", batch_rows=8
    )
    assert len(paths) == 1
    ranges = _batch_ranges(paths, target_bytes=1 << 10)
    assert len(ranges) > 4, "tiny target must fan one file into many tasks"
    lo_hi = [(lo, hi) for _p, lo, hi in ranges]
    # ranges must tile [0, nb) without gaps or overlaps
    lo_hi.sort()
    assert lo_hi[0][0] == 0
    for (a_lo, a_hi), (b_lo, _b_hi) in zip(lo_hi, lo_hi[1:]):
        assert a_hi == b_lo
    back = read_arrow_ipc_dir(spark, out, SCHEMA, target_bytes=1 << 10)
    assert back.count() == 500


def test_range_planning_reads_footers_only(spark, tmp_path):
    """Planning cost is metadata-bounded: ranges over a large file are
    computed without materializing data (smoke: it is instant and
    correct even when target splits every batch)."""
    out = str(tmp_path / "c")
    paths = write_arrow_ipc_dir(
        _df(spark, 300), out, num_shards=1, key_col="k", batch_rows=1
    )
    ranges = _batch_ranges(paths, target_bytes=1)
    assert len(ranges) == 300  # one task per batch at the degenerate target


def test_empty_input_returns_empty_frame_with_schema(spark, tmp_path):
    out = str(tmp_path / "d")
    os.makedirs(out)
    df = read_arrow_ipc_dir(spark, out, SCHEMA)
    assert df.count() == 0
    assert df.columns == ["k", "name", "val"]


def test_no_inprogress_leftovers_and_deterministic_shards(spark, tmp_path):
    o1, o2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    p1 = write_arrow_ipc_dir(_df(spark), o1, num_shards=2, key_col="k")
    p2 = write_arrow_ipc_dir(_df(spark), o2, num_shards=2, key_col="k")
    assert not [f for f in os.listdir(o1) if ".inprogress" in f]
    for a, b in zip(p1, p2):
        assert os.path.basename(a) == os.path.basename(b)
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()
