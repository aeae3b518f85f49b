"""Baseline JPEG codec tests (dbimport_spark/functions/jpeg.py): roundtrip
error bounds per mode, frame geometry on odd sizes, marker/stream
robustness. JPEG is lossy — assertions are error BOUNDS (derived from the
quantization tables), never byte equality."""

import numpy as np
import pytest
from struct import error as struct_error

from dbimport_spark.functions.jpeg import JpegError, decode_jpeg, encode_jpeg


def _err(a, b):
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    return int(d.max()), float(d.mean())


class TestJpegRoundtrip:
    def test_gray_smooth_gradient(self):
        w, h = 64, 48
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = np.clip(xx * 2 + yy, 0, 255).astype(np.uint8)
        dw, dh, dc, px = decode_jpeg(encode_jpeg(w, h, 1, img.tobytes(), quality=90))
        assert (dw, dh, dc) == (w, h, 1)
        mx, mean = _err(img, np.frombuffer(px, np.uint8).reshape(h, w))
        assert mx <= 12 and mean < 2.0

    def test_gray_random_noise_q95(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
        _, _, _, px = decode_jpeg(encode_jpeg(40, 40, 1, img.tobytes(), quality=95))
        mx, _ = _err(img, np.frombuffer(px, np.uint8).reshape(40, 40))
        assert mx <= 16  # measured 7; a zigzag/quant/Huffman bug gives ~100+

    def test_rgb_444_odd_dimensions(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (33, 29, 3), dtype=np.uint8)
        dw, dh, dc, px = decode_jpeg(encode_jpeg(29, 33, 3, img.tobytes(), quality=92))
        assert (dw, dh, dc) == (29, 33, 3)  # MCU padding cropped exactly
        mx, mean = _err(img, np.frombuffer(px, np.uint8).reshape(33, 29, 3))
        assert mean < 10.0  # chroma tables are coarse on noise; mean gates it

    def test_rgb_420_subsampling(self):
        yy, xx = np.mgrid[0:50, 0:70]
        img = np.stack(
            [
                np.clip(20 + xx * 2, 0, 255),
                np.clip(30 + yy * 3, 0, 255),
                np.clip(40 + xx + yy, 0, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        dw, dh, dc, px = decode_jpeg(
            encode_jpeg(70, 50, 3, img.tobytes(), quality=90, subsampling="420")
        )
        assert (dw, dh, dc) == (70, 50, 3)
        mx, mean = _err(img, np.frombuffer(px, np.uint8).reshape(50, 70, 3))
        assert mx <= 12 and mean < 2.0  # smooth image survives 2x2 chroma

    def test_quality_monotone_size(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8).tobytes()
        sizes = [len(encode_jpeg(32, 32, 1, img, quality=q)) for q in (30, 60, 95)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_tiny_and_exact_block_sizes(self):
        for w, h in [(8, 8), (16, 8), (7, 5), (1, 1)]:
            img = (np.arange(w * h) % 256).astype(np.uint8)
            dw, dh, dc, px = decode_jpeg(
                encode_jpeg(w, h, 1, img.tobytes(), quality=90)
            )
            assert (dw, dh, dc) == (w, h, 1)
            assert len(px) == w * h


class TestJpegRobustness:
    def test_not_a_jpeg(self):
        with pytest.raises(JpegError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_baseline_scan_in_sof2_frame_rejected(self):
        # flipping SOF0→SOF2 makes the full-band interleaved scan illegal
        # for a progressive frame (a progressive scan may not mix DC and
        # AC) — the decoder must say so, not desync
        blob = bytearray(encode_jpeg(8, 8, 1, bytes(64), quality=90))
        idx = blob.find(b"\xff\xc0")
        blob[idx + 1] = 0xC2  # flip SOF0 → SOF2
        with pytest.raises(JpegError, match="progressive"):
            decode_jpeg(bytes(blob))

    def test_truncated_stream_is_loud(self):
        blob = encode_jpeg(32, 32, 1, bytes(range(256)) * 4, quality=90)
        with pytest.raises(JpegError):
            decode_jpeg(blob[: len(blob) // 2])

    def test_byte_stuffing_roundtrip(self):
        # flat 255 image maximizes 0xFF-prone entropy bytes
        img = np.full((24, 24), 255, np.uint8)
        _, _, _, px = decode_jpeg(encode_jpeg(24, 24, 1, img.tobytes(), quality=50))
        mx, _ = _err(img, np.frombuffer(px, np.uint8).reshape(24, 24))
        assert mx <= 4


def test_restart_interval_roundtrip():
    """DRI + RSTn markers: encoder emits them every N MCUs with DC-pred
    reset; decoder byte-aligns and resumes at each boundary. A slip in
    either side shifts every block after the first boundary."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 64), dtype=np.uint8)  # 5x8 = 40 MCUs
    blob = encode_jpeg(64, 40, 1, img.tobytes(), quality=92, restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI present
    assert any(bytes((0xFF, 0xD0 + i)) in blob for i in range(8))
    dw, dh, dc, px = decode_jpeg(blob)
    assert (dw, dh, dc) == (64, 40, 1)
    d = np.abs(np.frombuffer(px, np.uint8).reshape(40, 64).astype(int) - img.astype(int))
    assert d.max() <= 16


def test_missing_rst_after_dri_is_loud():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    blob = bytearray(encode_jpeg(64, 40, 1, img.tobytes(), quality=92, restart_interval=3))
    # strip every RST marker from the entropy stream: the decoder must
    # fail loudly, not leak StopIteration
    for i in range(8):
        blob = bytearray(bytes(blob).replace(bytes((0xFF, 0xD0 + i)), b""))
    with pytest.raises(JpegError):
        decode_jpeg(bytes(blob))


class TestJpegFuzz:
    def test_random_bytes_never_crash_uncontrolled(self):
        """Decoding garbage must raise a controlled error (JpegError /
        ValueError family), never hang, IndexError, or succeed."""
        import random

        rnd = random.Random(1234)
        for trial in range(200):
            n = rnd.choice([0, 1, 3, 16, 200, 2000])
            blob = bytes(rnd.randrange(256) for _ in range(n))
            try:
                decode_jpeg(blob)
            except (JpegError, ValueError, struct_error):
                continue
            except Exception as e:  # pragma: no cover
                raise AssertionError(f"uncontrolled {type(e).__name__} on trial {trial}")

    def test_mutated_valid_stream_fails_controlled(self):
        """Bit-flips in a real stream: decode either still returns a frame
        of the declared geometry or raises a controlled error."""
        import random

        rnd = random.Random(99)
        img = (np.arange(64 * 24) % 256).astype(np.uint8).reshape(24, 64)
        blob = bytearray(encode_jpeg(64, 24, 1, img.tobytes(), quality=85))
        for trial in range(150):
            mut = bytearray(blob)
            for _ in range(rnd.randrange(1, 4)):
                mut[rnd.randrange(2, len(mut))] ^= 1 << rnd.randrange(8)
            try:
                w, h, c, px = decode_jpeg(bytes(mut))
            except (JpegError, ValueError, struct_error, KeyError):
                continue
            assert len(px) == w * h * c


class TestProgressive:
    """SOF2 progressive: spectral selection + successive approximation.
    The load-bearing gate is DIFFERENTIAL: baseline and progressive
    encodings carry the same quantized coefficients, so their decodes
    must be pixel-IDENTICAL — any scan-state, EOB-run, or correction-bit
    slip breaks equality somewhere."""

    @staticmethod
    def _gradient(w, h, ch, seed=0):
        rng = np.random.default_rng(seed)
        if ch == 1:
            return (np.add.outer(np.arange(h), np.arange(w)) * 3 % 256).astype(
                np.uint8
            ).tobytes()
        img = np.zeros((h, w, 3), np.uint8)
        img[..., 0] = np.add.outer(np.arange(h), np.arange(w)) % 256
        img[..., 1] = (np.arange(w) * 5 % 256)[None, :]
        img[..., 2] = rng.integers(0, 256, (h, w))
        return img.tobytes()

    @pytest.mark.parametrize(
        "w,h,ch,sub,q",
        [
            (16, 16, 1, "444", 90),
            (33, 17, 1, "444", 90),
            (64, 48, 3, "444", 85),
            (64, 48, 3, "420", 85),
            (37, 29, 3, "420", 95),
            (129, 65, 3, "420", 60),
        ],
    )
    def test_identical_to_baseline(self, w, h, ch, sub, q):
        px = self._gradient(w, h, ch)
        base = decode_jpeg(encode_jpeg(w, h, ch, px, quality=q, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg(w, h, ch, px, quality=q, subsampling=sub, progressive=True)
        )
        assert base == prog

    def test_identical_on_random_images(self):
        # noise maximizes coefficient density: every refinement path
        # (ZRL-with-corrections, EOB tails, sign bits) gets exercised
        rng = np.random.default_rng(7)
        for _ in range(10):
            w = int(rng.integers(8, 80))
            h = int(rng.integers(8, 80))
            ch = int(rng.choice([1, 3]))
            sub = str(rng.choice(["444", "420"])) if ch == 3 else "444"
            q = int(rng.integers(10, 100))
            px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8).tobytes()
            base = decode_jpeg(encode_jpeg(w, h, ch, px, quality=q, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg(w, h, ch, px, quality=q, subsampling=sub, progressive=True)
            )
            assert base == prog, (w, h, ch, sub, q)

    def test_progressive_with_restart_markers(self):
        rng = np.random.default_rng(4)
        px = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8).tobytes()
        want = decode_jpeg(encode_jpeg(64, 48, 3, px, quality=80))
        for ri in (1, 3):
            got = decode_jpeg(
                encode_jpeg(
                    64, 48, 3, px, quality=80, progressive=True, restart_interval=ri
                )
            )
            assert got == want, ri

    def test_truncated_progressive_is_loud(self):
        px = self._gradient(64, 48, 3)
        blob = encode_jpeg(64, 48, 3, px, quality=85, progressive=True)
        with pytest.raises(JpegError):
            decode_jpeg(blob[: len(blob) // 3])

    def test_progressive_fuzz_controlled(self):
        import random

        rnd = random.Random(5)
        px = self._gradient(32, 24, 1)
        blob = bytearray(encode_jpeg(32, 24, 1, px, quality=85, progressive=True))
        for trial in range(120):
            mut = bytearray(blob)
            for _ in range(rnd.randrange(1, 4)):
                mut[rnd.randrange(2, len(mut))] ^= 1 << rnd.randrange(8)
            try:
                w, h, c, out = decode_jpeg(bytes(mut))
            except (JpegError, ValueError, struct_error, KeyError):
                continue
            assert len(out) == w * h * c
