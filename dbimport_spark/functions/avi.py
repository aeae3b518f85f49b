"""From-scratch AVI (RIFF) container codec for MJPEG video — the video
sibling of the PNG/GIF/WAV/JPEG codecs.

Implements the public AVI RIFF layout (Microsoft "AVI RIFF File
Reference" / OpenDML AVI spec): a ``RIFF/AVI `` envelope holding a
``LIST hdrl`` (an ``avih`` MainAVIHeader plus one ``LIST strl`` with an
``strh`` stream header and an ``strf`` BITMAPINFOHEADER), a ``LIST movi``
of ``00dc`` compressed-frame chunks, and an ``idx1`` index. Frames are
Motion-JPEG: each ``00dc`` payload is a standalone baseline JPEG that
functions/jpeg.py decodes for real, so a decoded AVI yields true pixels —
no stub anywhere on the video path.

Reference parity note: hudeany/dbimport treats media as opaque blob
columns (no codecs); this module is beyond-reference scope from the
builder's brief (multimodal frame sampling). Like png.py/gif.py it is
stdlib+numpy only: struct packing, explicit chunk walking, loud
``AviError`` on malformed input (fuzz-tested like the JPEG decoder).

Scale contract: codecs run inside Arrow-batched ``mapInPandas`` kernels —
one task per partition, blobs never shuffle; callers size partitions by
bytes. Decode cost is dominated by the per-frame JPEG IDCT, which is
numpy-vectorized (see functions/jpeg.py).
"""

from __future__ import annotations

import struct

#: MainAVIHeader / stream-header flag: the file carries an idx1 index.
_AVIF_HASINDEX = 0x00000010
#: idx1 entry flag: the chunk is a key frame (every MJPEG frame is).
_AVIIF_KEYFRAME = 0x00000010


class AviError(ValueError):
    """Malformed or unsupported AVI payload (loud, never a guess)."""


def _chunk(cid: bytes, payload: bytes) -> bytes:
    """RIFF chunk: id + size + payload, padded to word alignment."""
    pad = b"\x00" if len(payload) & 1 else b""
    return struct.pack("<4sI", cid, len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _dib_stride(width: int) -> int:
    """BI_RGB rows are padded to 4-byte boundaries (24-bit: 3·w bytes)."""
    return (width * 3 + 3) & ~3


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB pixels → one BI_RGB frame payload: bottom-up row
    order, BGR channel order, 4-byte row stride — the DIB layout."""
    import numpy as np

    if len(rgb) != width * height * 3:
        raise AviError(
            f"DIB frame needs {width * height * 3} RGB bytes, got {len(rgb)}"
        )
    a = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
    stride = _dib_stride(width)
    out = np.zeros((height, stride), dtype=np.uint8)
    out[:, : width * 3] = a[::-1, :, ::-1].reshape(height, width * 3)
    return out.tobytes()


def _dib_to_rgb(width: int, height: int, frame: bytes) -> bytes:
    """Inverse of _rgb_to_dib, validating the stride-padded size."""
    import numpy as np

    stride = _dib_stride(width)
    if len(frame) != stride * height:
        raise AviError(
            f"DIB frame size {len(frame)} != stride {stride} × height {height}"
        )
    rows = np.frombuffer(frame, np.uint8).reshape(height, stride)
    a = rows[:, : width * 3].reshape(height, width, 3)
    return a[::-1, :, ::-1].tobytes()


def encode_avi(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 10,
    codec: str = "MJPG",
) -> bytes:
    """Video frames → AVI bytes.

    ``codec="MJPG"`` (default): each frame is a complete baseline-JPEG
    blob, stored as-is in '00dc' chunks. ``codec="DIB"``: each frame is
    top-down RGB pixels (w·h·3 bytes) stored UNCOMPRESSED as BI_RGB —
    bottom-up, BGR, 4-byte row stride — in '00db' chunks; lossless, the
    classic uncompressed-AVI layout. One 'vids' stream; every frame is a
    key frame. ``fps`` is stored as rate/scale = fps/1 in the stream
    header and as microseconds-per-frame in the main header, so a
    decoder can recover it from either (decode cross-checks both).
    """
    if codec not in ("MJPG", "DIB"):
        raise AviError(f"unsupported encode codec {codec!r}")
    if not frames:
        raise AviError("cannot encode an AVI with zero frames")
    if width <= 0 or height <= 0 or fps <= 0:
        raise AviError("width, height and fps must be positive")

    if codec == "DIB":
        frames = [_rgb_to_dib(width, height, f) for f in frames]
    max_frame = max(len(f) for f in frames)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<IIIIIIIIIIIIII",
            1_000_000 // fps,  # dwMicroSecPerFrame
            max_frame * fps,  # dwMaxBytesPerSec (upper bound)
            0,  # dwPaddingGranularity
            _AVIF_HASINDEX,  # dwFlags
            len(frames),  # dwTotalFrames
            0,  # dwInitialFrames
            1,  # dwStreams
            max_frame,  # dwSuggestedBufferSize
            width,
            height,
            0, 0, 0, 0,  # dwReserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids",
            b"MJPG" if codec == "MJPG" else b"DIB ",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate  (rate/scale = fps)
            0,  # dwStart
            len(frames),  # dwLength (in frames)
            max_frame,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable-size frames)
            0, 0, width, height,  # rcFrame
        ),
    )
    # strf for a video stream is a BITMAPINFOHEADER (40 bytes).
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            width,
            height,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG" if codec == "MJPG" else b"\x00\x00\x00\x00",  # biCompression (0 = BI_RGB)
            width * height * 3,  # biSizeImage (nominal)
            0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_parts: list[bytes] = []
    idx_entries: list[bytes] = []
    # idx1 offsets point at the chunk ID, measured from the start of the
    # 'movi' fourcc (the dominant historical convention; decode_avi also
    # accepts absolute-from-file offsets, both exist in the wild).
    off = 4
    ckid = b"00dc" if codec == "MJPG" else b"00db"
    for f in frames:
        ck = _chunk(ckid, f)
        movi_parts.append(ck)
        idx_entries.append(
            struct.pack("<4sIII", ckid, _AVIIF_KEYFRAME, off, len(f))
        )
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_parts))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk(blob: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, payload_size)
    for each chunk in blob[pos:end]; validates sizes loudly."""
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", blob, pos)
        body = pos + 8
        if body + size > end:
            raise AviError(
                f"chunk {cid!r} at {pos} overruns its parent "
                f"(size {size}, available {end - body})"
            )
        if cid in (b"LIST", b"RIFF"):
            if size < 4:
                raise AviError(f"{cid!r} chunk too short for a list type")
            yield cid, blob[body : body + 4], body + 4, size - 4
        else:
            yield cid, None, body, size
        pos = body + size + (size & 1)


def _parse_avi(blob: bytes):
    """Structural RIFF walk shared by the public decoders: returns
    (width, height, fps, handler, frames) with frames as raw payloads.

    Never trusts idx1 to locate frames, but when an index is present its
    per-frame sizes are cross-checked against the movi chunks (a
    mismatch is corruption). Accepts both '00dc' (compressed) and
    '00db' (uncompressed DIB) frame ids and nested 'rec ' groups, per
    spec.
    """
    if len(blob) < 12 or blob[:4] != b"RIFF":
        raise AviError("not a RIFF file")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if 8 + riff_size > len(blob):
        raise AviError("truncated RIFF envelope")
    if blob[8:12] != b"AVI ":
        raise AviError(f"RIFF form is {blob[8:12]!r}, not 'AVI '")

    width = height = None
    vid_handler = None
    audio_fmt = None
    fps_hdr = fps_strh = None
    declared_frames = None
    frames: list[bytes] = []
    audio_parts: list[bytes] = []
    idx_sizes: list[int] = []

    def scan_movi(start: int, size: int) -> None:
        for cid, ltype, body, csize in _walk(blob, start, start + size):
            if cid == b"LIST" and ltype == b"rec ":
                scan_movi(body, csize)
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(blob[body : body + csize])
            elif cid[2:4] == b"wb" and cid[:2].isdigit():
                audio_parts.append(blob[body : body + csize])

    for cid, ltype, body, size in _walk(blob, 12, 8 + riff_size):
        if cid == b"LIST" and ltype == b"hdrl":
            for c2, l2, b2, s2 in _walk(blob, body, body + size):
                if c2 == b"avih":
                    if s2 < 40:
                        raise AviError("avih header too short")
                    (us_per_frame, _, _, _, declared_frames, _, _, _,
                     width, height) = struct.unpack_from("<10I", blob, b2)
                    if us_per_frame:
                        fps_hdr = round(1_000_000 / us_per_frame)
                elif c2 == b"LIST" and l2 == b"strl":
                    stream_type = None
                    for c3, _l3, b3, s3 in _walk(blob, b2, b2 + s2):
                        if c3 == b"strh":
                            if s3 < 48:
                                raise AviError("strh header too short")
                            fcc_type, handler = struct.unpack_from("<4s4s", blob, b3)
                            stream_type = fcc_type
                            if fcc_type != b"vids":
                                continue  # auds strf parsed below
                            vid_handler = handler
                            scale, rate = struct.unpack_from("<II", blob, b3 + 20)
                            if scale:
                                fps_strh = rate // scale
                        elif c3 == b"strf" and stream_type == b"auds":
                            # WAVEFORMAT(EX): the audio stream's format
                            if s3 < 16:
                                raise AviError("auds strf too short")
                            tag, ch, rate, _avg, _align, bits = struct.unpack_from(
                                "<HHIIHH", blob, b3
                            )
                            audio_fmt = {
                                "tag": tag, "channels": ch,
                                "rate": rate, "bits": bits,
                            }
        elif cid == b"LIST" and ltype == b"movi":
            scan_movi(body, size)
        elif cid == b"idx1":
            for off in range(0, size - size % 16, 16):
                ckid, _flags, _ofs, csize = struct.unpack_from(
                    "<4sIII", blob, body + off
                )
                if ckid[2:4] in (b"dc", b"db"):  # video entries only
                    idx_sizes.append(csize)

    if width is None or height is None:
        raise AviError("no avih main header found")
    if not frames:
        raise AviError("no movi frame chunks found")
    if declared_frames is not None and declared_frames != len(frames):
        raise AviError(
            f"avih declares {declared_frames} frames, movi holds {len(frames)}"
        )
    if idx_sizes and idx_sizes != [len(f) for f in frames]:
        raise AviError("idx1 frame sizes disagree with movi chunks")
    fps = fps_strh if fps_strh is not None else fps_hdr
    if fps_strh is not None and fps_hdr is not None and fps_strh != fps_hdr:
        raise AviError(f"strh fps {fps_strh} != avih fps {fps_hdr}")
    return width, height, fps or 0, vid_handler, frames, audio_fmt, b"".join(audio_parts)


def decode_avi(blob: bytes):
    """AVI bytes → (width, height, fps, frames) for an MJPG stream;
    frames are the raw JPEG blobs. See _parse_avi for the walk rules."""
    width, height, fps, handler, frames, _afmt, _audio = _parse_avi(blob)
    if handler not in (b"MJPG", b"mjpg"):
        raise AviError(
            f"unsupported video codec {handler!r} (decode_avi handles "
            "MJPG; uncompressed BI_RGB decodes via decode_avi_dib)"
        )
    return width, height, fps, frames


def decode_avi_dib(blob: bytes):
    """AVI bytes → (width, height, fps, frames) for an UNCOMPRESSED
    BI_RGB ('DIB ') stream; each frame comes back as top-down RGB pixels
    (w·h·3 bytes) — stride padding stripped, rows re-flipped, BGR→RGB.
    Lossless end to end."""
    width, height, fps, handler, frames, _afmt, _audio = _parse_avi(blob)
    if handler not in (b"DIB ", b"\x00\x00\x00\x00", None):
        raise AviError(
            f"stream {handler!r} is not an uncompressed-DIB video"
        )
    return width, height, fps, [_dib_to_rgb(width, height, f) for f in frames]


def encode_avi_av(
    width: int,
    height: int,
    video_frames: list[bytes],
    audio_codes: bytes,
    fps: int = 10,
    law: str = "mu",
    sample_rate: int = 8000,
) -> bytes:
    """Interleaved audio+video AVI: one uncompressed BI_RGB 'vids' stream
    (top-down RGB input frames, stored as DIB) plus one G.711 'auds'
    stream (format tag 7 = μ-law / 6 = A-law, 8-bit codes), audio split
    into per-frame '01wb' chunks of sample_rate // fps samples (remainder
    rides with the last frame) — the classic interleaved-AVI layout, so a
    demuxer can stream both tracks in one pass."""
    if not video_frames:
        raise AviError("cannot encode an AVI with zero frames")
    if width <= 0 or height <= 0 or fps <= 0:
        raise AviError("width, height and fps must be positive")
    tag = {"mu": 7, "a": 6}.get(law)
    if tag is None:
        raise AviError(f"unknown companding law {law!r}")

    dib_frames = [_rgb_to_dib(width, height, f) for f in video_frames]
    max_frame = max(len(f) for f in dib_frames)
    n = len(video_frames)
    spf = max(1, sample_rate // fps)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<IIIIIIIIIIIIII",
            1_000_000 // fps, max_frame * fps, 0, _AVIF_HASINDEX,
            n, 0, 2, max_frame, width, height, 0, 0, 0, 0,
        ),
    )
    strh_v = _chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
            max_frame, 0xFFFFFFFF, 0, 0, 0, width, height,
        ),
    )
    strf_v = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40, width, height, 1, 24, b"\x00\x00\x00\x00",
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    strh_a = _chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, sample_rate,  # scale/rate: samples per second
            0, len(audio_codes),  # dwLength in samples (1 byte each)
            spf, 0xFFFFFFFF, 1,  # dwSampleSize = 1 byte
            0, 0, 0, 0,
        ),
    )
    strf_a = _chunk(
        b"strf",
        struct.pack(
            "<HHIIHHH", tag, 1, sample_rate, sample_rate, 1, 8, 0
        ),
    )
    hdrl = _list(
        b"hdrl",
        avih + _list(b"strl", strh_v + strf_v) + _list(b"strl", strh_a + strf_a),
    )

    movi_parts: list[bytes] = []
    idx_entries: list[bytes] = []
    off = 4
    for i, f in enumerate(dib_frames):
        for cid, payload in (
            (b"00db", f),
            (
                b"01wb",
                audio_codes[i * spf : (i + 1) * spf]
                if i < n - 1
                else audio_codes[i * spf :],
            ),
        ):
            ck = _chunk(cid, payload)
            movi_parts.append(ck)
            idx_entries.append(
                struct.pack("<4sIII", cid, _AVIIF_KEYFRAME, off, len(payload))
            )
            off += len(ck)
    movi = _list(b"movi", b"".join(movi_parts))
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi_av(blob: bytes):
    """Interleaved AVI → (width, height, fps, rgb_frames, sample_rate,
    pcm16 numpy samples): DIB video unpacked losslessly, the audio track
    reassembled across its '01wb' chunks and expanded through the G.711
    (or PCM16) decoder in functions/wav.py. The A+V demux primitive of a
    video-corpus pipeline."""
    from dbimport_spark.functions import wav as _wav

    width, height, fps, handler, frames, afmt, audio = _parse_avi(blob)
    if handler not in (b"DIB ", b"\x00\x00\x00\x00", None):
        raise AviError(f"video stream {handler!r} is not uncompressed DIB")
    if afmt is None:
        raise AviError("no audio stream found (use decode_avi_dib)")
    tag = afmt["tag"]
    if tag == 7:
        pcm = _wav.g711_decode(audio, "mu")
    elif tag == 6:
        pcm = _wav.g711_decode(audio, "a")
    elif tag == 1 and afmt["bits"] == 16:
        import numpy as np

        pcm = np.frombuffer(audio, dtype="<i2")
    else:
        raise AviError(f"unsupported audio format tag {tag}")
    rgb = [_dib_to_rgb(width, height, f) for f in frames]
    return width, height, fps, rgb, afmt["rate"], pcm
