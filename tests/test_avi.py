"""AVI/MJPEG container tests: structural roundtrip, header-field parity,
spec conformance (word alignment, 'rec ' nesting, 00db ids), loud
failures on corruption, and the Spark frame-sampling surface."""

import struct

import pytest

from dbimport_spark.functions.avi import AviError, decode_avi, encode_avi
from dbimport_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _jpeg_frames(n, w=16, h=8, seed=3):
    import random

    rnd = random.Random(seed)
    srcs = [bytes(rnd.randrange(256) for _ in range(w * h)) for _ in range(n)]
    return srcs, [encode_jpeg(w, h, 1, px, quality=95) for px in srcs]


def test_roundtrip_geometry_fps_frames():
    srcs, frames = _jpeg_frames(5)
    blob = encode_avi(16, 8, frames, fps=24)
    w, h, fps, out = decode_avi(blob)
    assert (w, h, fps, len(out)) == (16, 8, 24, 5)
    # frame payloads come back byte-exact (the container is lossless;
    # only the JPEG inside is lossy)
    assert out == frames
    import numpy as np

    for f, src in zip(out, srcs):
        fw, fh, _ch, px = decode_jpeg(f)
        assert (fw, fh) == (16, 8)
        a = np.frombuffer(px, np.uint8).astype(int)
        b = np.frombuffer(src, np.uint8).astype(int)
        assert int(np.abs(a - b).max()) <= 16


def test_word_alignment_odd_frame_sizes():
    # JPEG blobs are arbitrary-length; odd sizes force pad bytes between
    # movi chunks, which a sloppy walker misparses as the next chunk id.
    frames = [b"\xff\xd8odd", b"\xff\xd8even", b"\xff\xd8x"]
    assert {len(f) % 2 for f in frames} == {0, 1}
    blob = encode_avi(4, 4, frames, fps=10)
    _w, _h, _fps, out = decode_avi(blob)
    assert out == frames


def test_rec_list_nesting_and_00db_ids():
    # Some muxers group frames in 'rec ' LISTs and name uncompressed
    # frames '00db' — both are spec-legal; build such a file by hand.
    frames = [b"AA", b"BB", b"CC"]
    base = encode_avi(4, 4, [b"x"], fps=10)
    # extract hdrl from the generated file, then hand-build movi
    # (declared_frames must match, so patch avih dwTotalFrames to 3)
    w, h, fps, _ = decode_avi(base)

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return struct.pack("<4sI", cid, len(payload)) + payload + pad

    def lst(t, payload):
        return chunk(b"LIST", t + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", 100000, 0, 0, 0, 3, 0, 1, 2, 4, 4, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, 10, 0, 3, 2, 0, 0, 0, 0, 4, 4,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 4, 4, 1, 24, b"MJPG", 48, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(
        b"movi",
        chunk(b"00dc", frames[0])
        + lst(b"rec ", chunk(b"00db", frames[1]) + chunk(b"00dc", frames[2])),
    )
    blob = chunk(b"RIFF", b"AVI " + hdrl + movi)
    dw, dh, dfps, out = decode_avi(blob)
    assert (dw, dh, dfps) == (4, 4, 10)
    assert out == frames


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:40], "truncated RIFF"),
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:8] + b"WAVE" + b[12:], "not 'AVI '"),
    ],
)
def test_corruption_is_loud(mutate, msg):
    _s, frames = _jpeg_frames(2)
    blob = encode_avi(16, 8, frames, fps=10)
    with pytest.raises(AviError, match=msg):
        decode_avi(mutate(blob))


def test_frame_count_mismatch_is_loud():
    _s, frames = _jpeg_frames(3)
    blob = bytearray(encode_avi(16, 8, frames, fps=10))
    # avih dwTotalFrames lives 16 bytes into the avih payload; find it
    # structurally rather than by magic offset
    at = bytes(blob).index(b"avih") + 8 + 16
    assert struct.unpack_from("<I", blob, at)[0] == 3
    struct.pack_into("<I", blob, at, 7)
    with pytest.raises(AviError, match="declares 7 frames"):
        decode_avi(bytes(blob))


def test_idx1_size_mismatch_is_loud():
    _s, frames = _jpeg_frames(2)
    blob = bytearray(encode_avi(16, 8, frames, fps=10))
    at = bytes(blob).index(b"idx1") + 8 + 12  # first entry's dwChunkLength
    struct.pack_into("<I", blob, at, 1)
    with pytest.raises(AviError, match="idx1 frame sizes disagree"):
        decode_avi(bytes(blob))


def test_unsupported_codec_is_loud():
    _s, frames = _jpeg_frames(1)
    blob = bytearray(encode_avi(16, 8, frames, fps=10))
    at = bytes(blob).index(b"strh") + 8 + 4  # fccHandler
    blob[at : at + 4] = b"H264"
    with pytest.raises(AviError, match="unsupported video codec"):
        decode_avi(bytes(blob))


def test_encode_validates_inputs():
    with pytest.raises(AviError, match="zero frames"):
        encode_avi(4, 4, [], fps=10)
    with pytest.raises(AviError, match="positive"):
        encode_avi(0, 4, [b"x"], fps=10)


def test_avi_fuzz_never_crashes_unloudly():
    """Random tail corruption must always surface as AviError (or decode
    to something), never an unhandled struct/index error."""
    import random

    rnd = random.Random(11)
    _s, frames = _jpeg_frames(3)
    blob = bytearray(encode_avi(16, 8, frames, fps=10))
    for _ in range(200):
        b = bytearray(blob)
        for _k in range(rnd.randrange(1, 4)):
            b[rnd.randrange(12, len(b))] ^= 1 << rnd.randrange(8)
        try:
            decode_avi(bytes(b))
        except AviError:
            pass  # loud and typed — the contract


def test_sample_video_frames_spark(spark):
    """End-to-end Spark surface: fixture builder → container parse →
    real JPEG decode, with the integer pick-set contract."""
    import pandas as pd

    from dbimport_spark.functions import multimodal

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                # 1 frame, 4 frames, 8 frames-worth (capped at 6)
                "text": ["a" * 128, "bcdefgh " * 64, "xyzw" * 256],
            }
        )
    )
    media = multimodal.documents_as_avi_media(
        docs, width=16, frame_h=8, max_frames=6, quality=95, fps=10
    )
    out = multimodal.sample_video_frames(media, n_frames=3).toPandas()
    got = {
        (int(r.media_id), int(r.frame_idx)): r for r in out.itertuples()
    }
    # doc 1: 1 frame -> pick {0}; doc 2: 4 frames -> {0, 1, 3};
    # doc 3: 6 frames -> {0, 2, 5}
    assert set(got) == {(1, 0), (2, 0), (2, 1), (2, 3), (3, 0), (3, 2), (3, 5)}
    for (mid, _idx), r in got.items():
        assert (r.width, r.height, r.fps) == (16, 8, 10)
        assert r.total_frames == {1: 1, 2: 4, 3: 6}[mid]
        assert r.px_sum > 0 and len(r.pixel_sha256) == 64


class TestDib:
    """Uncompressed BI_RGB payloads: stride padding, channel order,
    row flip, losslessness, codec cross-errors."""

    def test_lossless_roundtrip_with_stride_padding(self):
        import random

        rnd = random.Random(9)
        w, h = 15, 8  # stride 45 -> 48
        frames = [
            bytes(rnd.randrange(256) for _ in range(w * h * 3)) for _ in range(3)
        ]
        blob = encode_avi(w, h, frames, fps=12, codec="DIB")
        from dbimport_spark.functions.avi import decode_avi_dib

        assert decode_avi_dib(blob) == (15, 8, 12, frames)

    def test_dib_layout_on_disk_is_bottom_up_bgr(self):
        """Pin the wire layout: one 2x2 frame whose pixels are distinct
        primaries; the stored bytes must be bottom row first, BGR."""
        from dbimport_spark.functions.avi import _rgb_to_dib

        # top-down RGB: (R)(G) / (B)(W)
        rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
        raw = _rgb_to_dib(2, 2, rgb)
        stride = 8  # 2*3=6 -> padded 8
        assert len(raw) == stride * 2
        # bottom row (B, W) first, channels reversed to BGR
        assert raw[0:6] == bytes([255, 0, 0, 255, 255, 255])
        assert raw[6:8] == b"\x00\x00"  # padding
        assert raw[8:14] == bytes([0, 0, 255, 0, 255, 0])

    def test_wrong_decoder_is_loud_both_ways(self):
        from dbimport_spark.functions.avi import decode_avi_dib

        _s, jf = _jpeg_frames(2)
        mjpg = encode_avi(16, 8, jf, fps=10)
        with pytest.raises(AviError, match="not an uncompressed-DIB"):
            decode_avi_dib(mjpg)
        dib = encode_avi(2, 2, [bytes(12)], fps=10, codec="DIB")
        with pytest.raises(AviError, match="unsupported video codec"):
            decode_avi(dib)

    def test_bad_frame_sizes_loud(self):
        from dbimport_spark.functions.avi import decode_avi_dib

        with pytest.raises(AviError, match="needs"):
            encode_avi(2, 2, [bytes(11)], fps=10, codec="DIB")
        blob = bytearray(encode_avi(2, 2, [bytes(12)], fps=10, codec="DIB"))
        # shrink the movi frame chunk's declared size by 2 (keeps RIFF
        # consistent enough to reach the DIB size check)
        at = bytes(blob).index(b"00db") + 4
        import struct as _struct

        (sz,) = _struct.unpack_from("<I", blob, at)
        _struct.pack_into("<I", blob, at, sz - 4)
        try:
            decode_avi_dib(bytes(blob))
        except AviError:
            pass  # either the walk or the size check flags it — loud is loud


class TestAudioVideo:
    """Interleaved A+V: two-stream header, chunk routing, demux."""

    def test_av_roundtrip_both_tracks_exact(self):
        import random

        import numpy as np

        from dbimport_spark.functions.avi import decode_avi_av, encode_avi_av
        from dbimport_spark.functions.wav import g711_decode

        rnd = random.Random(21)
        vf = [bytes(rnd.randrange(256) for _ in range(15 * 8 * 3)) for _ in range(4)]
        codes = bytes(rnd.randrange(256) for _ in range(3203))  # non-multiple of spf
        blob = encode_avi_av(15, 8, vf, codes, fps=10, law="a", sample_rate=8000)
        w, h, fps, rgb, rate, pcm = decode_avi_av(blob)
        assert (w, h, fps, rate) == (15, 8, 10, 8000)
        assert rgb == vf
        assert (pcm == g711_decode(codes, "a")).all()
        assert pcm.dtype == np.int16

    def test_av_no_audio_stream_is_loud(self):
        import pytest as _pytest

        from dbimport_spark.functions.avi import decode_avi_av, encode_avi

        blob = encode_avi(2, 2, [bytes(12)], fps=10, codec="DIB")
        with _pytest.raises(AviError, match="no audio stream"):
            decode_avi_av(blob)

    def test_av_unknown_audio_tag_is_loud(self):
        import pytest as _pytest

        from dbimport_spark.functions.avi import decode_avi_av, encode_avi_av

        blob = bytearray(
            encode_avi_av(2, 2, [bytes(12)], b"\x00\x01", fps=10, law="mu")
        )
        # the auds strf is the SECOND strf; its wFormatTag leads the chunk
        at = bytes(blob).index(b"strf", bytes(blob).index(b"auds")) + 8
        struct.pack_into("<H", blob, at, 2)  # ADPCM: unsupported
        with _pytest.raises(AviError, match="unsupported audio format"):
            decode_avi_av(bytes(blob))

    def test_av_video_only_decoders_ignore_audio_chunks(self):
        from dbimport_spark.functions.avi import decode_avi_dib, encode_avi_av

        vf = [bytes(range(12))]
        blob = encode_avi_av(2, 2, vf, b"\x10\x20\x30", fps=10)
        # a pure-video decoder on an A+V file sees just the video track
        assert decode_avi_dib(blob)[3] == vf
