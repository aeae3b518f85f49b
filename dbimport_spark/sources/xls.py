"""Legacy binary Excel (.xls): minimal stdlib OLE2 + BIFF8 parser.

Reference: dataprovider/ExcelDataProvider.java reads .xls via POI's HSSF;
this module parses the same container with the stdlib so the format works
without xlrd (which read_excel still prefers when installed).

Scope (deliberate): the cell types the reference emits —
NUMBER/RK/MULRK numerics, LABELSST/LABEL strings, BOOLERR booleans,
BLANK — plus SST with CONTINUE records (whole-string splits), sheet
selection by BOUNDSHEET name, mini-FAT streams (real small .xls files
store the Workbook stream in the ministream). Formula cached values and
date-style detection are out of scope (formulas → None; date-styled
numerics stay doubles — the coercion layer types them per target column).

A fixture-grade writer (`write_xls_minimal`) produces a valid
OLE2+BIFF8 file for round-trip tests.
"""

from __future__ import annotations

import struct

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


# ------------------------------------------------------------------ OLE2


def _ole2_read_stream(data: bytes, stream_names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name is in stream_names."""
    if data[:8] != OLE_MAGIC:
        raise ValueError("not an OLE2 compound file")
    sect_size = 1 << struct.unpack_from("<H", data, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * sect_size
        return data[off : off + sect_size]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    nxt = difat_start
    while nxt not in (ENDOFCHAIN, FREESECT):
        s = sector(nxt)
        entries = struct.unpack(f"<{sect_size // 4}I", s)
        difat += entries[:-1]
        nxt = entries[-1]
    fat_sectors = [x for x in difat[:n_fat] if x != FREESECT][:n_fat]
    fat: list[int] = []
    for fs in fat_sectors:
        fat += struct.unpack(f"<{sect_size // 4}I", sector(fs))

    def read_chain(start: int) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s not in (ENDOFCHAIN, FREESECT) and seen <= len(fat):
            out += sector(s)
            s = fat[s]
            seen += 1
        return bytes(out)

    dir_data = read_chain(dir_start)
    entries = []
    for off in range(0, len(dir_data) - 127, 128):
        name_len = struct.unpack_from("<H", dir_data, off + 64)[0]
        if name_len < 2:
            continue
        name = dir_data[off : off + name_len - 2].decode("utf-16-le", "replace")
        etype = dir_data[off + 66]
        start = struct.unpack_from("<I", dir_data, off + 116)[0]
        size = struct.unpack_from("<I", dir_data, off + 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    target = next((e for e in entries if e[0] in stream_names and e[1] == 2), None)
    if target is None:
        raise ValueError(f"stream not found: {stream_names}")
    _, _, start, size = target

    if size >= mini_cutoff:
        return read_chain(start)[:size]
    # ministream: 64-byte sectors inside the root entry's stream
    if root is None:
        raise ValueError("mini-stream without root entry")
    ministream = read_chain(root[2])[: root[3]]
    minifat: list[int] = []
    nxt = minifat_start
    count = 0
    while nxt not in (ENDOFCHAIN, FREESECT) and count < n_minifat + 1:
        minifat += struct.unpack(f"<{sect_size // 4}I", sector(nxt))
        nxt = fat[nxt]
        count += 1
    out = bytearray()
    s = start
    seen = 0
    while s not in (ENDOFCHAIN, FREESECT) and seen <= len(minifat):
        out += ministream[s * mini_size : (s + 1) * mini_size]
        s = minifat[s]
        seen += 1
    return bytes(out[:size])


# ------------------------------------------------------------------ BIFF8


def _decode_rk(rk: int) -> float:
    div100 = rk & 1
    as_int = rk & 2
    if as_int:
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFF))[0] >> 2)
    else:
        v = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if div100 else v


def _records(stream: bytes, pos: int = 0):
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield op, stream[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """Shared string table; CONTINUE splits supported at string
    boundaries (each continue chunk restarts parsing state)."""
    chunks = [payload] + continues
    strings: list[str] = []
    total = struct.unpack_from("<I", chunks[0], 4)[0]
    ci, pos = 0, 8
    while len(strings) < total and ci < len(chunks):
        buf = chunks[ci]
        if pos + 3 > len(buf):
            ci += 1
            pos = 0
            continue
        ln, grbit = struct.unpack_from("<HB", buf, pos)
        pos += 3
        rich = grbit & 0x08
        ext = grbit & 0x04
        n_rich = 0
        sz_ext = 0
        if rich:
            n_rich = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
        if ext:
            sz_ext = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        if grbit & 0x01:  # utf-16
            raw = buf[pos : pos + 2 * ln]
            pos += 2 * ln
            strings.append(raw.decode("utf-16-le", "replace"))
        else:  # compressed (latin-1 low bytes)
            raw = buf[pos : pos + ln]
            pos += ln
            strings.append(raw.decode("latin-1"))
        pos += 4 * n_rich + sz_ext
    return strings


def read_xls_rows(path: str, sheet_name: str | None = None) -> list[list]:
    """Parse a .xls file into a rectangular list-of-rows (None gaps)."""
    with open(path, "rb") as f:
        data = f.read()
    wb = _ole2_read_stream(data, ("Workbook", "Book"))

    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, bof offset)
    pending_sst: bytes | None = None
    sst_continues: list[bytes] = []
    for op, payload, _pos in _records(wb):
        if op == 0x00FC:  # SST
            pending_sst = payload
            sst_continues = []
        elif op == 0x003C and pending_sst is not None:  # CONTINUE
            sst_continues.append(payload)
        elif op == 0x0085:  # BOUNDSHEET
            bof = struct.unpack_from("<I", payload, 0)[0]
            ln = payload[6]
            grbit = payload[7]
            if grbit & 0x01:
                name = payload[8 : 8 + 2 * ln].decode("utf-16-le", "replace")
            else:
                name = payload[8 : 8 + ln].decode("latin-1")
            sheets.append((name, bof))
        elif op == 0x000A:  # EOF of workbook globals
            break
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, sst_continues)
    if not sheets:
        raise ValueError("xls has no sheets")
    if sheet_name is None:
        bof = sheets[0][1]
    else:
        match = next((b for n, b in sheets if n == sheet_name), None)
        if match is None:
            raise ValueError(f"sheet not found: {sheet_name!r}")
        bof = match

    cells: dict[tuple[int, int], object] = {}
    for op, payload, _pos in _records(wb, bof):
        if op == 0x000A:  # EOF of this sheet
            break
        if op == 0x0203:  # NUMBER
            r, c = struct.unpack_from("<HH", payload, 0)
            cells[(r, c)] = struct.unpack_from("<d", payload, 6)[0]
        elif op == 0x027E:  # RK
            r, c = struct.unpack_from("<HH", payload, 0)
            cells[(r, c)] = _decode_rk(struct.unpack_from("<I", payload, 6)[0])
        elif op == 0x00BD:  # MULRK
            r, c0 = struct.unpack_from("<HH", payload, 0)
            ncells = (len(payload) - 6) // 6
            for i in range(ncells):
                rk = struct.unpack_from("<I", payload, 4 + 6 * i + 2)[0]
                cells[(r, c0 + i)] = _decode_rk(rk)
        elif op == 0x00FD:  # LABELSST
            r, c = struct.unpack_from("<HH", payload, 0)
            idx = struct.unpack_from("<I", payload, 6)[0]
            cells[(r, c)] = sst[idx] if idx < len(sst) else None
        elif op == 0x0204:  # LABEL (inline biff8 string)
            r, c = struct.unpack_from("<HH", payload, 0)
            ln, grbit = struct.unpack_from("<HB", payload, 6)
            if grbit & 0x01:
                cells[(r, c)] = payload[9 : 9 + 2 * ln].decode("utf-16-le", "replace")
            else:
                cells[(r, c)] = payload[9 : 9 + ln].decode("latin-1")
        elif op == 0x0205:  # BOOLERR
            r, c = struct.unpack_from("<HH", payload, 0)
            val, is_err = payload[6], payload[7]
            cells[(r, c)] = None if is_err else bool(val)
        # BLANK (0x0201) / ROW (0x0208) / others: no value

    if not cells:
        return []
    max_r = max(r for r, _ in cells)
    max_c = max(c for _, c in cells)
    return [
        [cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)
    ]


# -------------------------------------------------------------- writer


def _biff_str(s: str) -> bytes:
    """BIFF8 unicode string, compressed when latin-1-safe."""
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(raw), 0) + raw
    except UnicodeEncodeError:
        raw = s.encode("utf-16-le")
        # cch is in 16-bit code units (surrogate pairs count as 2)
        return struct.pack("<HB", len(raw) // 2, 1) + raw


def write_xls_minimal(path: str, header: list[str], rows: list[list]) -> None:
    """Fixture-grade .xls writer: one sheet, NUMBER/LABELSST/BOOLERR
    cells, SST, wrapped in a minimal OLE2 container (FAT stream)."""

    def rec(op: int, payload: bytes) -> bytes:
        return struct.pack("<HH", op, len(payload)) + payload

    all_rows = [list(header)] + [list(r) for r in rows]
    strings: list[str] = []
    s_index: dict[str, int] = {}
    for r in all_rows:
        for v in r:
            if isinstance(v, str) and v not in s_index:
                s_index[v] = len(strings)
                strings.append(v)

    sheet = bytearray()
    sheet += rec(0x0809, struct.pack("<HHHHI", 0x0600, 0x0010, 0, 0, 0))  # BOF sheet
    for ri, r in enumerate(all_rows):
        for ci, v in enumerate(r):
            if v is None:
                continue
            if isinstance(v, bool):
                sheet += rec(0x0205, struct.pack("<HHHBB", ri, ci, 0, 1 if v else 0, 0))
            elif isinstance(v, (int, float)):
                sheet += rec(0x0203, struct.pack("<HHH", ri, ci, 0) + struct.pack("<d", float(v)))
            else:
                sheet += rec(0x00FD, struct.pack("<HHHI", ri, ci, 0, s_index[str(v)]))
    sheet += rec(0x000A, b"")

    sst_payload = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        sst_payload += _biff_str(s)

    globals_recs = bytearray()
    globals_recs += rec(0x0809, struct.pack("<HHHHI", 0x0600, 0x0005, 0, 0, 0))  # BOF globals
    # BOUNDSHEET carries the sheet-BOF stream offset: build the payload
    # with a placeholder first so the length math can't drift
    name_bytes = b"\x06\x00Sheet1"  # len=6, compressed
    bs_payload = struct.pack("<IBB", 0, 0, 0) + name_bytes
    bof_off = (
        len(globals_recs)
        + (4 + len(bs_payload))
        + (4 + len(sst_payload))
        + 4  # globals EOF record
    )
    bs_payload = struct.pack("<IBB", bof_off, 0, 0) + name_bytes
    globals_recs += rec(0x0085, bs_payload)
    globals_recs += rec(0x00FC, sst_payload)
    globals_recs += rec(0x000A, b"")

    wb = bytes(globals_recs) + bytes(sheet)
    # pad past the ministream cutoff so the stream lives in the plain FAT
    if len(wb) < 4096:
        wb += b"\x00" * (4096 - len(wb))

    sect = 512
    n_stream = (len(wb) + sect - 1) // sect
    wb += b"\x00" * (n_stream * sect - len(wb))
    # layout: sector 0 = FAT, 1 = directory, 2.. = stream
    n_total = 2 + n_stream
    fat = [FREESECT] * (sect // 4)
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN
    for i in range(n_stream):
        fat[2 + i] = 3 + i if i + 1 < n_stream else ENDOFCHAIN
    assert n_total <= len(fat)

    def dir_entry(name: str, etype: int, start: int, size: int, child: int = FREESECT) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = raw.ljust(64, b"\x00")
        e += struct.pack("<H", len(raw))
        e += struct.pack("<BB", etype, 1)
        e += struct.pack("<III", FREESECT, FREESECT, child)
        e += b"\x00" * 16  # clsid
        e += b"\x00" * 4   # state
        e += b"\x00" * 16  # times
        e += struct.pack("<II", start, size)
        e += b"\x00" * 4
        return e

    directory = (
        dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)
        + dir_entry("Workbook", 2, 2, len(wb))
        + b"\x00" * 128 * 2
    )

    header_b = bytearray(512)
    header_b[0:8] = OLE_MAGIC
    struct.pack_into("<H", header_b, 24, 0x003E)   # minor version
    struct.pack_into("<H", header_b, 26, 0x0003)   # major version
    struct.pack_into("<H", header_b, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header_b, 30, 9)        # 512-byte sectors
    struct.pack_into("<H", header_b, 32, 6)        # 64-byte mini sectors
    struct.pack_into("<I", header_b, 44, 1)        # 1 FAT sector
    struct.pack_into("<I", header_b, 48, 1)        # directory start
    struct.pack_into("<I", header_b, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header_b, 60, ENDOFCHAIN)  # no miniFAT
    struct.pack_into("<I", header_b, 64, 0)
    struct.pack_into("<I", header_b, 68, ENDOFCHAIN)  # no extra DIFAT
    struct.pack_into("<I", header_b, 72, 0)
    difat = [0] + [FREESECT] * 108
    struct.pack_into("<109I", header_b, 76, *difat)

    with open(path, "wb") as f:
        f.write(bytes(header_b))
        f.write(struct.pack(f"<{len(fat)}I", *fat))
        f.write(directory.ljust(sect, b"\x00"))
        f.write(wb)
