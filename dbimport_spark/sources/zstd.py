"""From-scratch Zstandard frame DECODER (RFC 8878, public spec).

Open text corpora ship as .jsonl.zst and Python's stdlib has no zstd;
this implements the full decode stack from the spec — frame + block
framing, backward bitstreams, FSE (tANS) table construction and
decoding, canonical Huffman literals (1- and 4-stream, direct and
FSE-compressed weights), sequence execution with the three-slot repeat
-offset history — so the compression envelope can open .zst files with
no native library. Correctness is pinned by differential tests against
the REFERENCE implementation (pyarrow bundles libzstd) over randomized
corpora at multiple compression levels (tests/test_zstd.py).

Decoder only, by design: producing .zst is a library concern; ingesting
the wild web's archives is the engine's. Dictionaries are rejected
loudly (Dictionary_ID != 0); skippable frames and multi-frame streams
are handled; the content checksum (xxh64) is consumed, not verified.

Spec: https://www.rfc-editor.org/rfc/rfc8878 (also distributed as
zstd_compression_format.md). This file is an independent implementation
from that text, not a translation of libzstd.
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F


class ZstdError(ValueError):
    pass


# ------------------------------------------------------------ bitstreams


class _BackBits:
    """zstd's backward bitstream: the encoder writes LSB-first; the
    decoder finds the sentinel 1-bit in the LAST byte and reads bit
    groups walking backward. A sliding small-int window (refilled one
    byte at a time from the lower-index bytes) keeps every operation
    O(1) — holding the whole stream as one big int makes each read
    O(stream), which is quadratic over a 128 KB block."""

    __slots__ = ("data", "acc", "nbuf", "k", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdError("corrupt bitstream: missing sentinel bit")
        self.data = data
        last = data[-1]
        sb = last.bit_length() - 1  # bits below the sentinel
        self.acc = last & ((1 << sb) - 1)
        self.nbuf = sb
        self.k = len(data) - 1  # next refill byte is data[k-1]
        self.pos = sb + 8 * self.k  # total unread bits (API-compatible)

    def _refill(self, need: int) -> None:
        while self.nbuf < need and self.k > 0:
            self.k -= 1
            self.acc = (self.acc << 8) | self.data[self.k]
            self.nbuf += 8

    def read(self, n: int) -> int:
        """Read n bits; reading past the start zero-fills (the spec's
        final-state transitions rely on this) and leaves pos negative so
        callers can detect exhaustion."""
        if n == 0:
            return 0
        self._refill(n)
        self.pos -= n
        if self.nbuf >= n:
            self.nbuf -= n
            v = self.acc >> self.nbuf
            self.acc &= (1 << self.nbuf) - 1
            return v
        v = self.acc << (n - self.nbuf)  # exhausted: zero-fill low bits
        self.acc = 0
        self.nbuf = 0
        return v

    def peek(self, n: int) -> int:
        self._refill(n)
        if self.nbuf >= n:
            return self.acc >> (self.nbuf - n)
        return self.acc << (n - self.nbuf)

    def skip(self, n: int) -> None:
        self._refill(n)
        self.pos -= n
        if self.nbuf >= n:
            self.nbuf -= n
            self.acc &= (1 << self.nbuf) - 1
        else:
            self.acc = 0
            self.nbuf = 0


class _FwdBits:
    """Forward LSB-first bitstream (FSE table descriptions)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            out |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return out

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


# ------------------------------------------------------------------- FSE


def _fse_build(norm: list[int], accuracy_log: int):
    """Decoding table from normalized counts (prob -1 allowed).
    Returns parallel lists (symbol, nb_bits, baseline) indexed by state
    — the spec's spread-then-assign construction."""
    size = 1 << accuracy_log
    table_sym = [0] * size
    high = size - 1
    for sym, c in enumerate(norm):
        if c == -1:
            table_sym[high] = sym
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for sym, c in enumerate(norm):
        if c <= 0:
            continue
        for _ in range(c):
            table_sym[pos] = sym
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ZstdError("corrupt FSE table: spread did not close")
    next_cnt = [c if c > 0 else 1 for c in norm]
    # low-prob (-1) symbols decode with a full-accuracy read from state 0
    counts = list(next_cnt)
    nb = [0] * size
    base = [0] * size
    for state in range(size):
        sym = table_sym[state]
        x = counts[sym]
        counts[sym] += 1
        nbits = accuracy_log - (x.bit_length() - 1)
        nb[state] = nbits
        base[state] = (x << nbits) - size
    return table_sym, nb, base


def _fse_read_table(data: bytes, max_log: int):
    """Parse an FSE table description (truncated-binary coded counts with
    zero-run repeat flags, RFC 8878 §4.1.1); returns (norm, accuracy_log,
    bytes_consumed)."""
    bits = _FwdBits(data)
    accuracy_log = bits.read(4) + 5
    if accuracy_log > max_log:
        raise ZstdError(f"FSE accuracy {accuracy_log} > max {max_log}")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    norm: list[int] = []
    while remaining > 1:
        if len(norm) > 255:
            raise ZstdError("corrupt FSE table: too many symbols")
        while remaining < threshold:
            threshold >>= 1
        # value in [0, remaining]: truncated binary, short codes are the
        # low values whose (nb-1)-bit image is unambiguous
        nb = threshold.bit_length()  # threshold == 1 << (nb - 1)
        max_short = 2 * threshold - 1 - remaining
        v = bits.read(nb - 1)
        if v < max_short:
            value = v
        else:
            v |= bits.read(1) << (nb - 1)
            value = v if v < threshold else v - max_short
        count = value - 1  # 0 encodes "probability -1"
        if count == -1:
            norm.append(-1)
            remaining -= 1
        else:
            norm.append(count)
            remaining -= count
            if count == 0:
                # 2-bit repeat flags add further zero-count symbols
                while True:
                    rep = bits.read(2)
                    norm.extend([0] * rep)
                    if rep != 3:
                        break
    if remaining != 1:
        raise ZstdError("corrupt FSE table: counts overflow")
    return norm, accuracy_log, bits.bytes_consumed()


class _FseState:
    __slots__ = ("sym", "nb", "base", "log", "state")

    def __init__(self, table, bs: _BackBits):
        self.sym, self.nb, self.base = table
        self.log = (len(self.sym)).bit_length() - 1
        self.state = bs.read(self.log)

    def symbol(self) -> int:
        return self.sym[self.state]

    def update(self, bs: _BackBits) -> None:
        self.state = self.base[self.state] + bs.read(self.nb[self.state])


# --------------------------------------------------------------- Huffman


def _huff_from_weights(weights: list[int]):
    """Canonical Huffman decode table from explicit weights; the LAST
    symbol's weight is implied — it completes the total to the next
    power of two, which also fixes the table log."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("corrupt Huffman weights: empty")
    tbl_log = total.bit_length()  # 2^tbl_log is the next power of 2 > total
    if tbl_log > 11:
        raise ZstdError("Huffman table log > 11")
    rest = (1 << tbl_log) - total
    if rest & (rest - 1):
        raise ZstdError("corrupt Huffman weights: remainder not a power of 2")
    weights = weights + [rest.bit_length()]  # 2^(w-1) == rest
    max_bits = tbl_log
    # fill by increasing weight: longest codes first, symbol order within
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    pos = 0
    for w in range(1, max_bits + 1):
        nbits = max_bits + 1 - w
        span = 1 << (w - 1)
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            for _ in range(span):
                table[pos] = (sym, nbits)
                pos += 1
    if pos != len(table):
        raise ZstdError("corrupt Huffman weights: table not filled")
    return table, max_bits


def _huff_read_table(data: bytes):
    """Parse a Huffman tree description; returns (table, max_bits,
    bytes_consumed)."""
    h = data[0]
    if h >= 128:  # direct: 4-bit weights
        n = h - 127
        nbytes = (n + 1) // 2
        raw = data[1 : 1 + nbytes]
        weights = []
        for i in range(n):
            b = raw[i >> 1]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        tbl, mb = _huff_from_weights(weights)
        return tbl, mb, 1 + nbytes
    # FSE-compressed weights: h = compressed size
    comp = data[1 : 1 + h]
    norm, alog, used = _fse_read_table(comp, 6)
    table = _fse_build(norm, alog)
    bs = _BackBits(comp[used:])
    s1 = _FseState(table, bs)
    s2 = _FseState(table, bs)
    weights: list[int] = []
    while True:
        weights.append(s1.symbol())
        s1.update(bs)
        if bs.pos < 0:
            weights.append(s2.symbol())
            break
        weights.append(s2.symbol())
        s2.update(bs)
        if bs.pos < 0:
            weights.append(s1.symbol())
            break
        if len(weights) > 255:
            raise ZstdError("corrupt Huffman weights: >255 symbols")
    tbl, mb = _huff_from_weights(weights)
    return tbl, mb, 1 + h


def _huff_decode_stream(data: bytes, table, max_bits: int, n_out: int) -> bytes:
    bs = _BackBits(data)
    out = bytearray(n_out)
    peek, skip = bs.peek, bs.skip
    for i in range(n_out):
        sym, nbits = table[peek(max_bits)]
        skip(nbits)
        if bs.pos < 0:
            raise ZstdError("Huffman stream exhausted early")
        out[i] = sym
    return bytes(out)


# ------------------------------------------------------------- sequences

# RFC 8878 predefined distributions + code tables
_LL_DEFAULT = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2,
               2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
_ML_DEFAULT = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
_OF_DEFAULT = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
               1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                              256, 512, 1024, 2048, 4096, 8192, 16384,
                              32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
                       13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83,
                                 99, 131, 259, 515, 1027, 2051, 4099, 8195,
                                 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]


def _seq_table(mode: int, data: bytes, default, max_log, rle_max, prev):
    """Resolve one of the three sequence tables per its compression mode.
    Returns (table, bytes_consumed)."""
    if mode == 0:  # predefined
        alog = {36: 6, 53: 6, 29: 5}[len(default)]
        return _fse_build(default, alog), 0
    if mode == 1:  # RLE: single symbol, accuracy 0
        sym = data[0]
        if sym > rle_max:
            raise ZstdError("RLE symbol out of range")
        return _fse_build([0] * sym + [1], 0), 1
    if mode == 2:  # FSE-compressed
        norm, alog, used = _fse_read_table(data, max_log)
        return _fse_build(norm, alog), used
    if prev is None:  # repeat with no previous table
        raise ZstdError("repeat mode without a previous table")
    return prev, 0


# ------------------------------------------------------------ block/frame


class _BlockCtx:
    """Cross-block state inside one frame: repeat offsets, previous
    Huffman table, previous FSE tables."""

    def __init__(self):
        self.rep = [1, 4, 8]
        self.huff = None  # (table, max_bits)
        self.ll = self.of = self.ml = None


def _decode_literals(data: bytes, ctx: _BlockCtx):
    """Literals section -> (literals bytes, bytes consumed)."""
    b0 = data[0]
    btype = b0 & 3
    sfmt = (b0 >> 2) & 3
    if btype in (0, 1):  # raw / RLE
        if sfmt in (0, 2):
            rsize = b0 >> 3
            hdr = 1
        elif sfmt == 1:
            rsize = (b0 >> 4) | (data[1] << 4)
            hdr = 2
        else:
            rsize = (b0 >> 4) | (data[1] << 4) | (data[2] << 12)
            hdr = 3
        if btype == 0:
            return bytes(data[hdr : hdr + rsize]), hdr + rsize
        return bytes([data[hdr]]) * rsize, hdr + 1
    # compressed (2) / treeless (3)
    if sfmt == 0:
        rsize = (b0 >> 4) | ((data[1] & 0x3F) << 4)
        csize = (data[1] >> 6) | (data[2] << 2)
        hdr, streams = 3, 1
    elif sfmt == 1:
        rsize = (b0 >> 4) | ((data[1] & 0x3F) << 4)
        csize = (data[1] >> 6) | (data[2] << 2)
        hdr, streams = 3, 4
    elif sfmt == 2:
        rsize = (b0 >> 4) | (data[1] << 4) | ((data[2] & 3) << 12)
        csize = (data[2] >> 2) | (data[3] << 6)
        hdr, streams = 4, 4
    else:
        rsize = (b0 >> 4) | (data[1] << 4) | ((data[2] & 0x3F) << 12)
        csize = (data[2] >> 6) | (data[3] << 2) | (data[4] << 10)
        hdr, streams = 5, 4
    payload = data[hdr : hdr + csize]
    if btype == 2:
        table, max_bits, used = _huff_read_table(payload)
        ctx.huff = (table, max_bits)
        payload = payload[used:]
    elif ctx.huff is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    table, max_bits = ctx.huff
    if streams == 1:
        lit = _huff_decode_stream(payload, table, max_bits, rsize)
    else:
        s1 = int.from_bytes(payload[0:2], "little")
        s2 = int.from_bytes(payload[2:4], "little")
        s3 = int.from_bytes(payload[4:6], "little")
        body = payload[6:]
        sizes = [s1, s2, s3, len(body) - s1 - s2 - s3]
        if sizes[3] < 0:
            raise ZstdError("corrupt 4-stream jump table")
        per = (rsize + 3) // 4
        outs = []
        off = 0
        for i, sz in enumerate(sizes):
            want = per if i < 3 else rsize - 3 * per
            outs.append(
                _huff_decode_stream(body[off : off + sz], table, max_bits, want)
            )
            off += sz
        lit = b"".join(outs)
    if len(lit) != rsize:
        raise ZstdError("literals size mismatch")
    return lit, hdr + csize


def _decode_sequences(data: bytes, lit: bytes, ctx: _BlockCtx, out: bytearray):
    """Sequences section: execute (literal-copy, match-copy) pairs into
    ``out`` (which already holds the window)."""
    b0 = data[0]
    if b0 == 0:
        out += lit
        return
    if b0 < 128:
        nseq, p = b0, 1
    elif b0 < 255:
        nseq, p = ((b0 - 128) << 8) + data[1], 2
    else:
        nseq, p = data[1] + (data[2] << 8) + 0x7F00, 3
    modes = data[p]
    p += 1
    ll_mode, of_mode, ml_mode = (modes >> 6) & 3, (modes >> 4) & 3, (modes >> 2) & 3
    ctx.ll, used = _seq_table(ll_mode, data[p:], _LL_DEFAULT, 9, 35, ctx.ll)
    p += used
    ctx.of, used = _seq_table(of_mode, data[p:], _OF_DEFAULT, 8, 31, ctx.of)
    p += used
    ctx.ml, used = _seq_table(ml_mode, data[p:], _ML_DEFAULT, 9, 52, ctx.ml)
    p += used
    bs = _BackBits(data[p:])
    st_ll = _FseState(ctx.ll, bs)
    st_of = _FseState(ctx.of, bs)
    st_ml = _FseState(ctx.ml, bs)
    lit_pos = 0
    rep = ctx.rep
    for i in range(nseq):
        of_code = st_of.symbol()
        of_val = (1 << of_code) + bs.read(of_code)
        ml_code = st_ml.symbol()
        ml = _ML_BASE[ml_code] + bs.read(_ML_BITS[ml_code])
        ll_code = st_ll.symbol()
        ll = _LL_BASE[ll_code] + bs.read(_LL_BITS[ll_code])
        if of_val > 3:
            offset = of_val - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            # repeat offsets; literals_length == 0 shifts the meaning up
            idx = of_val - 1 if ll != 0 else of_val
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 2:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # ll == 0 and of_val == 3: "repeat offset 1 minus one"
                offset = rep[0] - 1
                if offset <= 0:
                    raise ZstdError("corrupt sequence: zero repeat offset")
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out += lit[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ZstdError("corrupt sequence: offset beyond window")
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            for j in range(ml):  # overlapping copy
                out.append(out[start + j])
        if i < nseq - 1:
            st_ll.update(bs)
            st_ml.update(bs)
            st_of.update(bs)
    out += lit[lit_pos:]


def _decode_frame(data: bytes, off: int, out: bytearray) -> int:
    """Decode one zstd frame starting at ``off``; returns the offset
    just past it."""
    fhd = data[off]
    off += 1
    fcs_code = fhd >> 6
    single = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    did_code = fhd & 3
    if fhd & 0x08:
        raise ZstdError("reserved frame-header bit set")
    if not single:
        off += 1  # window descriptor: we keep the whole output anyway
    did_len = (0, 1, 2, 4)[did_code]
    if did_len:
        did = int.from_bytes(data[off : off + did_len], "little")
        if did != 0:
            raise ZstdError(f"dictionary {did} required — dictionaries unsupported")
        off += did_len
    fcs_len = (1 if single else 0, 2, 4, 8)[fcs_code]
    fcs = None
    if fcs_len:
        fcs = int.from_bytes(data[off : off + fcs_len], "little")
        if fcs_len == 2:
            fcs += 256
        off += fcs_len
    ctx = _BlockCtx()
    frame_start = len(out)
    while True:
        if off + 3 > len(data):
            raise ZstdError("truncated input: missing block header")
        bh = int.from_bytes(data[off : off + 3], "little")
        off += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype != 1 and off + bsize > len(data):
            raise ZstdError("truncated input: block body short")
        if btype == 0:  # raw
            out += data[off : off + bsize]
            off += bsize
        elif btype == 1:  # RLE
            if off >= len(data):
                raise ZstdError("truncated input: missing RLE byte")
            out += bytes([data[off]]) * bsize
            off += 1
        elif btype == 2:  # compressed
            blk = data[off : off + bsize]
            off += bsize
            lit, used = _decode_literals(blk, ctx)
            _decode_sequences(blk[used:], lit, ctx, out)
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    if checksum:
        off += 4  # xxh64 low 32 bits: consumed, not verified (stdlib-free)
    if fcs is not None and len(out) - frame_start != fcs:
        raise ZstdError(
            f"frame content size mismatch: {len(out) - frame_start} != {fcs}"
        )
    return off


def frame_content_size(data: bytes) -> int | None:
    """Declared content size of the FIRST frame, or None when the header
    omits it (streaming frames)."""
    if len(data) < 5 or int.from_bytes(data[:4], "little") != ZSTD_MAGIC:
        return None
    fhd = data[4]
    off = 5
    fcs_code = fhd >> 6
    single = (fhd >> 5) & 1
    if not single:
        off += 1
    off += (0, 1, 2, 4)[fhd & 3]
    fcs_len = (1 if single else 0, 2, 4, 8)[fcs_code]
    if not fcs_len or off + fcs_len > len(data):
        return None
    fcs = int.from_bytes(data[off : off + fcs_len], "little")
    return fcs + 256 if fcs_len == 2 else fcs


def zstd_decompress_auto(data: bytes) -> bytes:
    """Decompress via the native reference codec when one is available
    AND the frame declares its size (libzstd's one-shot API needs the
    output bound); otherwise the from-scratch decoder handles it —
    including streaming frames with no declared size, which the native
    one-shot path cannot."""
    size = frame_content_size(data)
    if size is not None:
        try:
            import pyarrow as pa

            if pa.Codec.is_available("zstd"):
                out = bytes(pa.Codec("zstd").decompress(data, size))
                if len(out) == size:
                    return out
        except Exception:
            pass  # multi-frame stream, absent codec, … — take the slow path
    return zstd_decompress(data)


def zstd_decompress(data: bytes) -> bytes:
    """Decode a (possibly multi-frame) zstd stream. Corrupt or truncated
    input raises ZstdError — never wrong output, never a hang."""
    out = bytearray()
    off = 0
    n = len(data)
    while off < n:
        if off + 4 > n:
            raise ZstdError("truncated input: partial magic")
        magic = int.from_bytes(data[off : off + 4], "little")
        off += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size = int.from_bytes(data[off : off + 4], "little")
            off += 4 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad magic 0x{magic:08x} at offset {off - 4}")
        try:
            off = _decode_frame(data, off, out)
        except IndexError as e:  # any short read inside the block decoders
            raise ZstdError(f"truncated or corrupt frame: {e}") from e
    return bytes(out)
