#!/usr/bin/env python3
"""Synthesize a minimal but GENUINE uncompressed sas7bdat fixture.

No SAS writer exists in this environment, so the bytes are laid out
directly from the public format spec (the community-reverse-engineered
layout implemented by pandas/io/sas, parso, and readstat). The output
is only committed after `pd.read_sas` — a completely independent
parser — round-trips it to the exact expected values, which is what
makes the Scala reader's test against this fixture evidence of
real-format compatibility rather than self-consistency.

Layout choices (all from the public spec):
  - 64-bit (byte 32 = 0x33), little-endian (byte 37 = 0x01), align1=0
    (byte 35 = 0x00 keeps the header scalar offsets at 196/200/204)
  - header 8192 bytes, page size 8192
  - page 0: meta page (type 0x0000) carrying row_size, column_size,
    subheader_counts, column_text, column_name, column_attributes,
    column_list, and one format_and_label per column
  - pages 1..n: pure data pages (type 0x0100), rows packed from
    offset 40 (bit_offset 32 + subheader_pointers_offset 8)
  - columns: id double, val double, name char(8); row length 24
  - 100 rows split 60/40 across two data pages (exercises the page
    loop); values are closed-form so the DuckDB oracle needs no table

Usage: tools/make_sas_fixture.py [out.sas7bdat]
"""
import struct
import sys

U64 = True
INT = 8
PAGE = 8192
HEADER = 8192
BIT_OFFSET = 32          # page_bit_offset_x64
SH_PTR_LEN = 24          # subheader_pointer_length_x64
ROWS = 100
ROWS_P1 = 60
ROW_LEN = 24
COLS = [("id", "d"), ("val", "d"), ("name", "s")]


def u16(x):
    return struct.pack("<H", x)


def u32(x):
    return struct.pack("<I", x)


def u64(x):
    return struct.pack("<Q", x)


def f64(x):
    return struct.pack("<d", x)


def header() -> bytes:
    magic = (b"\x00\x00\x00\x00\x00\x00\x00\x00"
             b"\x00\x00\x00\x00\xc2\xea\x81\x60"
             b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
             b"\x09\xc7\x31\x8c\x18\x1f\x10\x11")
    h = bytearray(HEADER)
    h[0:32] = magic
    h[32] = 0x33           # u64
    h[35] = 0x00           # align1 = 0
    h[37] = 0x01           # little-endian
    h[39] = ord("1")       # unix
    h[70] = 20             # encoding: utf-8
    h[84:92] = b"SAS FILE"
    h[92:156] = b"GRAFT_SAS_FIXTURE".ljust(64)
    h[156:164] = b"DATA    "
    # created/modified: 2026-01-01 as seconds since 1960-01-01
    secs = float((2026 - 1960) * 365.25 * 86400)
    h[164:172] = f64(secs)
    h[172:180] = f64(secs)
    h[196:200] = u32(HEADER)
    h[200:204] = u32(PAGE)
    h[204:208] = u32(3)    # page count: 1 meta + 2 data
    h[216:224] = b"9.0401M2"
    h[224:240] = b"Linux".ljust(16)
    return bytes(h)


def subheader_rowsize() -> bytes:
    b = bytearray(808)
    b[0:8] = b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00"
    b[5 * INT:5 * INT + 8] = u64(ROW_LEN)
    b[6 * INT:6 * INT + 8] = u64(ROWS)
    b[9 * INT:9 * INT + 8] = u64(len(COLS))   # col_count_p1
    b[10 * INT:10 * INT + 8] = u64(0)          # col_count_p2
    b[15 * INT:15 * INT + 8] = u64(0)          # rows on mix page
    b[682:684] = u16(0)                        # lcs
    b[706:708] = u16(0)                        # lcp
    return bytes(b)


def subheader_colsize() -> bytes:
    return (b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00" + u64(len(COLS))).ljust(24, b"\x00")


def subheader_counts() -> bytes:
    return b"\x00\xfc\xff\xff\xff\xff\xff\xff".ljust(64, b"\x00")


def text_blob():
    """The column-name text pool: [size u16][pad 6][names...]; name
    offsets are relative to the blob start (pandas slices the blob
    INCLUDING its size prefix). No trailing padding after the last
    name — the reader rstrips b'\\x00 ' from the whole blob."""
    names = b""
    offsets = []
    base = 8
    for n, _ in COLS:
        offsets.append(base + len(names))
        names += n.encode()
    blob = u16(8 + len(names)) + b"\x00" * 6 + names
    return blob, offsets


def subheader_text(blob: bytes) -> bytes:
    return (b"\xfd\xff\xff\xff\xff\xff\xff\xff" + blob).ljust(
        8 + ((len(blob) + 7) // 8) * 8, b"\x00")


def subheader_colname(offsets) -> bytes:
    # pointer i lives at start + 16 + 8*i: [text_idx u16][offset u16]
    # [length u16][pad u16]; declared length must satisfy
    # (length - 2*INT - 12) // 8 == ncols
    b = bytearray(2 * INT + 12 + 8 * len(COLS))
    b[0:8] = b"\xff\xff\xff\xff\xff\xff\xff\xff"
    for i, ((n, _), off) in enumerate(zip(COLS, offsets)):
        p = 16 + 8 * i
        b[p:p + 2] = u16(0)            # text subheader index
        b[p + 2:p + 4] = u16(off)      # offset into the blob
        b[p + 4:p + 6] = u16(len(n))
    return bytes(b)


def subheader_colattrs() -> bytes:
    # vector i at start + 16 + 16*i: [data_offset u64][data_len u32]
    # [pad u16][type u8][pad u8]; type 1=double 2=char
    b = bytearray(2 * INT + 12 + (INT + 8) * len(COLS))
    b[0:8] = b"\xfc\xff\xff\xff\xff\xff\xff\xff"
    data_off = 0
    for i, (_, t) in enumerate(COLS):
        p = 16 + 16 * i
        width = 8
        b[p:p + 8] = u64(data_off)
        b[p + 8:p + 12] = u32(width)
        b[p + 14] = 1 if t == "d" else 2
        data_off += width
    assert data_off == ROW_LEN
    return bytes(b)


def subheader_collist() -> bytes:
    return b"\xfe\xff\xff\xff\xff\xff\xff\xff".ljust(64, b"\x00")


def subheader_format() -> bytes:
    # all-zero format/label fields -> empty format string -> no
    # date/datetime conversion on the pandas side
    return b"\xfe\xfb\xff\xff\xff\xff\xff\xff".ljust(64, b"\x00")


def meta_page(subheaders) -> bytes:
    page = bytearray(PAGE)
    page[BIT_OFFSET:BIT_OFFSET + 2] = u16(0x0000)             # meta
    page[BIT_OFFSET + 2:BIT_OFFSET + 4] = u16(len(subheaders))
    page[BIT_OFFSET + 4:BIT_OFFSET + 6] = u16(len(subheaders))
    ptr = BIT_OFFSET + 8
    # subheader bodies pack from the page END, like real files
    tail = PAGE
    for sh in subheaders:
        tail -= len(sh)
        page[tail:tail + len(sh)] = sh
        page[ptr:ptr + 8] = u64(tail)
        page[ptr + 8:ptr + 16] = u64(len(sh))
        page[ptr + 16] = 0   # compression: uncompressed
        page[ptr + 17] = 0   # type
        ptr += SH_PTR_LEN
        assert ptr <= tail, "meta page overflow"
    return bytes(page)


def row_bytes(i: int) -> bytes:
    return f64(float(i)) + f64(i * 0.25) + f"row_{i:03d}".encode().ljust(8)


def data_page(rows) -> bytes:
    page = bytearray(PAGE)
    page[BIT_OFFSET:BIT_OFFSET + 2] = u16(0x0100)   # data
    page[BIT_OFFSET + 2:BIT_OFFSET + 4] = u16(len(rows))
    page[BIT_OFFSET + 4:BIT_OFFSET + 6] = u16(0)
    pos = BIT_OFFSET + 8
    for r in rows:
        page[pos:pos + ROW_LEN] = r
        pos += ROW_LEN
    return bytes(page)


# ---------------------------------------------------------------------------
# Format-matrix variants: 32-bit little-endian and 64-bit big-endian
#
# The main fixture is 64-bit LE (the common modern export); these
# cover the other two quadrants of the public layout the reader
# claims — 32-bit files (4-byte subheader scalars, bit_offset 16,
# 12-byte pointers, lcs/lcp at 354/378) and big-endian byte order
# (header flag byte 37 = 0x00, every scalar and double byte-swapped).
# Same closed-form contents as the main fixture; pd.read_sas
# validates both.
# ---------------------------------------------------------------------------


def make_variant(out: str, u64: bool, little: bool) -> None:
    INT_ = 8 if u64 else 4
    BIT = 32 if u64 else 16
    PTR = 24 if u64 else 12
    e = "<" if little else ">"

    def p16(x):
        return struct.pack(e + "H", x)

    def p32(x):
        return struct.pack(e + "I", x)

    def pint(x):
        return struct.pack(e + ("Q" if u64 else "I"), x)

    def pf64(x):
        return struct.pack(e + "d", x)

    def sig(four: bytes) -> bytes:
        # 4-byte signatures widen to 8 on u64 files; the widened forms
        # must be ones the public signature table lists: LE appends
        # zeros, BE prepends 0x00s for the symmetric f7/f6 signatures
        # and 0xFFs for the reversed fd/ff/fc/fe family
        if not u64:
            return four if little else bytes(reversed(four))
        if little:
            return four + b"\x00" * 4
        if four[0] in (0xF7, 0xF6):
            return b"\x00" * 4 + four
        return b"\xff" * 4 + bytes(reversed(four))

    def hdr() -> bytes:
        magic = (b"\x00\x00\x00\x00\x00\x00\x00\x00"
                 b"\x00\x00\x00\x00\xc2\xea\x81\x60"
                 b"\xb3\x14\x11\xcf\xbd\x92\x08\x00"
                 b"\x09\xc7\x31\x8c\x18\x1f\x10\x11")
        h = bytearray(HEADER)
        h[0:32] = magic
        h[32] = 0x33 if u64 else 0x22
        h[35] = 0x00                      # align1 = 0
        h[37] = 0x01 if little else 0x00  # endianness
        h[39] = ord("1")
        h[70] = 20
        h[84:92] = b"SAS FILE"
        h[92:156] = b"GRAFT_SAS_VARIANT".ljust(64)
        h[156:164] = b"DATA    "
        secs = float((2026 - 1960) * 365.25 * 86400)
        h[164:172] = pf64(secs)
        h[172:180] = pf64(secs)
        h[196:200] = p32(HEADER)
        h[200:204] = p32(PAGE)
        h[204:208] = p32(3)
        h[216:224] = b"9.0401M2"
        h[224:240] = b"Linux".ljust(16)
        return bytes(h)

    def sh_rowsize() -> bytes:
        b = bytearray(808 if u64 else 480)
        b[0:INT_] = sig(b"\xf7\xf7\xf7\xf7")
        b[5 * INT_:6 * INT_] = pint(ROW_LEN)
        b[6 * INT_:7 * INT_] = pint(ROWS)
        b[9 * INT_:10 * INT_] = pint(len(COLS))
        b[15 * INT_:16 * INT_] = pint(0)
        return bytes(b)

    def sh_colsize() -> bytes:
        return (sig(b"\xf6\xf6\xf6\xf6") + pint(len(COLS))).ljust(24, b"\x00")

    def sh_counts() -> bytes:
        return sig(b"\x00\xfc\xff\xff").ljust(64, b"\x00")

    def text_pool():
        names = b""
        offsets = []
        base = 8
        for n, _ in COLS:
            offsets.append(base + len(names))
            names += n.encode()
        blob = p16(8 + len(names)) + b"\x00" * 6 + names
        return blob, offsets

    def sh_text(blob: bytes) -> bytes:
        body = sig(b"\xfd\xff\xff\xff") + blob
        return body.ljust(INT_ + ((len(blob) + 7) // 8) * 8, b"\x00")

    def sh_colname(offsets) -> bytes:
        b = bytearray(2 * INT_ + 12 + 8 * len(COLS))
        b[0:INT_] = sig(b"\xff\xff\xff\xff")
        for i, ((n, _), off) in enumerate(zip(COLS, offsets)):
            p = INT_ + 8 * (i + 1)
            b[p:p + 2] = p16(0)
            b[p + 2:p + 4] = p16(off)
            b[p + 4:p + 6] = p16(len(n))
        return bytes(b)

    def sh_colattrs() -> bytes:
        b = bytearray(2 * INT_ + 12 + (INT_ + 8) * len(COLS))
        b[0:INT_] = sig(b"\xfc\xff\xff\xff")
        data_off = 0
        for i, (_, t) in enumerate(COLS):
            p = INT_ + 8 + i * (INT_ + 8)
            b[p:p + INT_] = pint(data_off)
            b[p + INT_:p + INT_ + 4] = p32(8)
            b[p + INT_ + 6] = 1 if t == "d" else 2
            data_off += 8
        assert data_off == ROW_LEN
        return bytes(b)

    def sh_collist() -> bytes:
        return sig(b"\xfe\xff\xff\xff").ljust(64, b"\x00")

    def sh_format() -> bytes:
        return sig(b"\xfe\xfb\xff\xff").ljust(64, b"\x00")

    def meta_pg(shs) -> bytes:
        page = bytearray(PAGE)
        page[BIT:BIT + 2] = p16(0x0000)
        page[BIT + 2:BIT + 4] = p16(len(shs))
        page[BIT + 4:BIT + 6] = p16(len(shs))
        ptr = BIT + 8
        tail = PAGE
        for sh in shs:
            tail -= len(sh)
            page[tail:tail + len(sh)] = sh
            page[ptr:ptr + INT_] = pint(tail)
            page[ptr + INT_:ptr + 2 * INT_] = pint(len(sh))
            page[ptr + 2 * INT_] = 0
            page[ptr + 2 * INT_ + 1] = 0
            ptr += PTR
            assert ptr <= tail
        return bytes(page)

    def row(i: int) -> bytes:
        return pf64(float(i)) + pf64(i * 0.25) + f"row_{i:03d}".encode().ljust(8)

    def data_pg(rows) -> bytes:
        page = bytearray(PAGE)
        page[BIT:BIT + 2] = p16(0x0100)
        page[BIT + 2:BIT + 4] = p16(len(rows))
        pos = BIT + 8
        for r in rows:
            page[pos:pos + ROW_LEN] = r
            pos += ROW_LEN
        return bytes(page)

    blob, offsets = text_pool()
    meta = meta_pg([sh_rowsize(), sh_colsize(), sh_counts(), sh_text(blob),
                    sh_colname(offsets), sh_colattrs(), sh_collist()]
                   + [sh_format() for _ in COLS])
    rows = [row(i) for i in range(1, ROWS + 1)]
    with open(out, "wb") as f:
        f.write(hdr())
        f.write(meta)
        f.write(data_pg(rows[:ROWS_P1]))
        f.write(data_pg(rows[ROWS_P1:]))

    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == ["id", "val", "name"], df.columns
    assert len(df) == ROWS, len(df)
    for i in range(1, ROWS + 1):
        r = df.iloc[i - 1]
        assert r["id"] == float(i), (i, r["id"])
        assert r["val"] == i * 0.25, (i, r["val"])
        assert r["name"] == f"row_{i:03d}", (i, repr(r["name"]))
    kind = f"{'64' if u64 else '32'}-bit {'LE' if little else 'BE'}"
    print(f"OK: {out} validated by pd.read_sas ({kind}, {ROWS} rows)")


# ---------------------------------------------------------------------------
# Mix-page fixture: the layout every small real-world export uses —
# SAS packs the first rows onto the trailing meta page (page type
# 0x0200: metadata subheaders, then 8-aligned inline rows). Exercises
# the reader's mix branch (alignment correction + the
# min(mix_page_row_count, row_count, capacity) clamp).
# ---------------------------------------------------------------------------

MIX_ROWS_P0 = 40


def mix_page(subheaders, rows) -> bytes:
    page = bytearray(PAGE)
    page[BIT_OFFSET:BIT_OFFSET + 2] = u16(0x0200)  # mix
    page[BIT_OFFSET + 2:BIT_OFFSET + 4] = u16(len(subheaders) + len(rows))
    page[BIT_OFFSET + 4:BIT_OFFSET + 6] = u16(len(subheaders))
    ptr = BIT_OFFSET + 8
    tail = PAGE
    for sh in subheaders:
        tail -= len(sh)
        page[tail:tail + len(sh)] = sh
        page[ptr:ptr + 8] = u64(tail)
        page[ptr + 8:ptr + 16] = u64(len(sh))
        page[ptr + 16] = 0
        page[ptr + 17] = 0
        ptr += SH_PTR_LEN
    pos = ((ptr + 7) // 8) * 8  # rows start 8-aligned after the pointers
    # bounds-check BEFORE writing: a colliding layout must abort, not
    # clobber the tail-packed subheaders first
    assert pos + len(rows) * ROW_LEN <= tail, "mix page overflow"
    for r in rows:
        page[pos:pos + ROW_LEN] = r
        pos += ROW_LEN
    return bytes(page)


def make_mix(out: str) -> None:
    blob, offsets = text_blob()
    rs = bytearray(subheader_rowsize())
    rs[15 * INT:15 * INT + 8] = u64(MIX_ROWS_P0)  # rows on the mix page
    meta_shs = [bytes(rs), subheader_colsize(), subheader_counts(),
                subheader_text(blob), subheader_colname(offsets),
                subheader_colattrs(), subheader_collist()] \
        + [subheader_format() for _ in COLS]
    rows = [row_bytes(i) for i in range(1, ROWS + 1)]
    header_bytes = bytearray(header())
    header_bytes[204:208] = u32(2)  # mix page + 1 data page
    with open(out, "wb") as f:
        f.write(bytes(header_bytes))
        f.write(mix_page(meta_shs, rows[:MIX_ROWS_P0]))
        f.write(data_page(rows[MIX_ROWS_P0:]))

    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
    assert len(df) == ROWS, len(df)
    for i in range(1, ROWS + 1):
        r = df.iloc[i - 1]
        assert r["id"] == float(i) and r["val"] == i * 0.25
        assert r["name"] == f"row_{i:03d}"
    print(f"OK: {out} validated by pd.read_sas (mix page {MIX_ROWS_P0} rows + data page)")


# ---------------------------------------------------------------------------
# windows-1252 fixture: non-UTF8 header encoding (code 62) with
# non-ASCII characters in the character column — the clinical-export
# case the encoding switch exists for.
# ---------------------------------------------------------------------------

def make_w1252(out: str) -> None:
    def text(i: int) -> str:
        return f"é{i:02d}ü°"  # cp1252: 6 bytes

    blob, offsets = text_blob()
    meta = meta_page([
        subheader_rowsize(), subheader_colsize(), subheader_counts(),
        subheader_text(blob), subheader_colname(offsets),
        subheader_colattrs(), subheader_collist()]
        + [subheader_format() for _ in COLS])
    rows = [f64(float(i)) + f64(i * 0.25) + text(i).encode("cp1252").ljust(8)
            for i in range(1, ROWS + 1)]
    header_bytes = bytearray(header())
    header_bytes[70] = 62  # windows-1252
    with open(out, "wb") as f:
        f.write(bytes(header_bytes))
        f.write(meta)
        f.write(data_page(rows[:ROWS_P1]))
        f.write(data_page(rows[ROWS_P1:]))

    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="windows-1252")
    assert len(df) == ROWS
    for i in range(1, ROWS + 1):
        r = df.iloc[i - 1]
        assert r["id"] == float(i) and r["val"] == i * 0.25
        assert r["name"] == text(i), (i, repr(r["name"]))
    print(f"OK: {out} validated by pd.read_sas (windows-1252, non-ASCII strings)")


# ---------------------------------------------------------------------------
# RLE-compressed (SASYZCRL / COMPRESS=CHAR) fixture
#
# Rows live as one subheader per row on meta pages, pointer type=1 and
# pointer compression=4 (or 0 when the row is stored raw because the
# compressed form wouldn't be shorter). The command set below is the
# publicly documented one (pandas rle_decompress / parso
# CharDecompressor / readstat); pd.read_sas decompresses with its own
# independent implementation, so the validation at the bottom is real
# cross-parser evidence.
# ---------------------------------------------------------------------------

RLE_COLS = [("id", "d"), ("val", "d"), ("name", "s8"), ("tag", "s40")]
RLE_ROW_LEN = 8 + 8 + 8 + 40
RLE_ROWS = 100
RLE_ROWS_P1 = 30          # rows on the first (metadata-bearing) meta page
RLE_RAW_ROW = 60          # this row is stored uncompressed (length == row len)


def rle_compress(data: bytes) -> bytes:
    """Greedy SASYZCRL encoder over the public command table."""
    out = bytearray()
    i, n = 0, len(data)
    lit = 0  # start of pending literal

    def flush(end):
        nonlocal lit
        j = lit
        while j < end:
            chunk = min(end - j, 4159)
            if chunk > 64:
                v = chunk - 64
                out.append(0x00 | (v >> 8)); out.append(v & 0xFF)
            elif chunk > 48:
                out.append(0xB0 | (chunk - 49))
            elif chunk > 32:
                out.append(0xA0 | (chunk - 33))
            elif chunk > 16:
                out.append(0x90 | (chunk - 17))
            else:
                out.append(0x80 | (chunk - 1))
            out.extend(data[j:j + chunk])
            j += chunk
        lit = end

    while i < n:
        b = data[i]
        run = 1
        while i + run < n and data[i + run] == b:
            run += 1
        r = 0
        if b == 0x20 and run >= 18:
            r = min(run, 4112); v = r - 17
            flush(i); out.append(0x60 | (v >> 8)); out.append(v & 0xFF)
        elif b == 0x20 and run >= 3:
            r = min(run, 17)
            flush(i); out.append(0xE0 | (r - 2))
        elif b == 0x00 and run >= 18:
            r = min(run, 4112); v = r - 17
            flush(i); out.append(0x70 | (v >> 8)); out.append(v & 0xFF)
        elif b == 0x00 and run >= 3:
            r = min(run, 17)
            flush(i); out.append(0xF0 | (r - 2))
        elif b == 0x40 and run >= 3:
            r = min(run, 17)
            flush(i); out.append(0xD0 | (r - 2))
        elif run >= 19:
            r = min(run, 513); v = r - 18
            efb = min(15, v >> 4)
            nxt = v - efb * 16
            assert 0 <= nxt <= 255
            flush(i); out.append(0x40 | efb); out.append(nxt); out.append(b)
        elif run >= 3:
            r = min(run, 18)
            flush(i); out.append(0xC0 | (r - 3)); out.append(b)
        if r:
            i += r
            lit = i
        else:
            i += 1
    flush(n)
    return bytes(out)


def rle_text_blob():
    """First text blob must carry the compression literal; column-name
    offsets point past it (pandas finds SASYZCRL via substring scan of
    blob 0)."""
    sig = b"SASYZCRL"
    names = b""
    offsets = []
    base = 8 + len(sig)
    for n, _ in RLE_COLS:
        offsets.append(base + len(names))
        names += n.encode()
    blob = u16(8 + len(sig) + len(names)) + b"\x00" * 6 + sig + names
    return blob, offsets


def rle_rowsize() -> bytes:
    b = bytearray(808)
    b[0:8] = b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00"
    b[5 * INT:5 * INT + 8] = u64(RLE_ROW_LEN)
    b[6 * INT:6 * INT + 8] = u64(RLE_ROWS)
    b[9 * INT:9 * INT + 8] = u64(len(RLE_COLS))
    b[15 * INT:15 * INT + 8] = u64(0)
    return bytes(b)


def rle_colsize() -> bytes:
    return (b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00" + u64(len(RLE_COLS))).ljust(24, b"\x00")


def rle_colname(offsets) -> bytes:
    b = bytearray(2 * INT + 12 + 8 * len(RLE_COLS))
    b[0:8] = b"\xff\xff\xff\xff\xff\xff\xff\xff"
    for i, ((n, _), off) in enumerate(zip(RLE_COLS, offsets)):
        p = 16 + 8 * i
        b[p:p + 2] = u16(0)
        b[p + 2:p + 4] = u16(off)
        b[p + 4:p + 6] = u16(len(n))
    return bytes(b)


def rle_colattrs() -> bytes:
    b = bytearray(2 * INT + 12 + (INT + 8) * len(RLE_COLS))
    b[0:8] = b"\xfc\xff\xff\xff\xff\xff\xff\xff"
    data_off = 0
    for i, (_, t) in enumerate(RLE_COLS):
        p = 16 + 16 * i
        width = 8 if t == "d" else int(t[1:])
        b[p:p + 8] = u64(data_off)
        b[p + 8:p + 12] = u32(width)
        b[p + 14] = 1 if t == "d" else 2
        data_off += width
    assert data_off == RLE_ROW_LEN
    return bytes(b)


def rle_row_bytes(i: int) -> bytes:
    return (f64(float(i)) + f64(i * 0.25)
            + f"row_{i:03d}".encode().ljust(8)
            + f"tag_{i}".encode().ljust(40))


def meta_page_with_rows(metadata_shs, rows) -> bytes:
    """A meta page holding metadata subheaders (pointer type 0,
    compression 0) followed by row subheaders (pointer type 1,
    compression 4 for RLE payloads, 0 for raw rows)."""
    page = bytearray(PAGE)
    page[BIT_OFFSET:BIT_OFFSET + 2] = u16(0x0000)
    total = len(metadata_shs) + len(rows)
    page[BIT_OFFSET + 2:BIT_OFFSET + 4] = u16(total)
    page[BIT_OFFSET + 4:BIT_OFFSET + 6] = u16(total)
    ptr = BIT_OFFSET + 8
    tail = PAGE
    for sh in metadata_shs:
        tail -= len(sh)
        page[tail:tail + len(sh)] = sh
        page[ptr:ptr + 8] = u64(tail)
        page[ptr + 8:ptr + 16] = u64(len(sh))
        page[ptr + 16] = 0
        page[ptr + 17] = 0
        ptr += SH_PTR_LEN
    for body, is_raw in rows:
        tail -= len(body)
        page[tail:tail + len(body)] = body
        page[ptr:ptr + 8] = u64(tail)
        page[ptr + 8:ptr + 16] = u64(len(body))
        page[ptr + 16] = 0 if is_raw else 4   # pointer compression
        page[ptr + 17] = 1                    # pointer type: data row
        ptr += SH_PTR_LEN
        assert ptr <= tail, "compressed meta page overflow"
    return bytes(page)


def make_compressed(out: str, stale_rows: int = 0) -> None:
    """stale_rows > 0 models a shortened-in-place file: that many
    extra row subheaders (copies of the first rows) follow the real
    100 on the last page while the header still declares 100.
    pd.read_sas reads exactly row_count rows in page order — the
    validation below proves the stale tail is invisible to it, which
    is the behavior Sas.rowCountOverrides replicates."""
    blob, offsets = rle_text_blob()
    metadata = [
        rle_rowsize(),
        rle_colsize(),
        subheader_counts(),
        subheader_text(blob),
        rle_colname(offsets),
        rle_colattrs(),
        subheader_collist(),
    ] + [subheader_format() for _ in RLE_COLS]

    rows = []
    for i in range(1, RLE_ROWS + 1):
        raw = rle_row_bytes(i)
        if i == RLE_RAW_ROW:
            rows.append((raw, True))  # stored raw: length == row length
        else:
            comp = rle_compress(raw)
            assert comp != raw
            assert len(comp) < RLE_ROW_LEN, f"row {i} did not compress"
            rows.append((comp, False))

    for i in range(1, stale_rows + 1):  # stale tail: re-compressed early rows
        rows.append((rle_compress(rle_row_bytes(i)), False))

    header_bytes = bytearray(header())
    header_bytes[204:208] = u32(2)  # 2 meta pages, rows on both
    with open(out, "wb") as f:
        f.write(bytes(header_bytes))
        f.write(meta_page_with_rows(metadata, rows[:RLE_ROWS_P1]))
        f.write(meta_page_with_rows([], rows[RLE_ROWS_P1:]))

    # independent-parser validation (pandas decompresses with its own
    # rle_decompress — cross-implementation agreement, not self-check)
    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == [n for n, _ in RLE_COLS], df.columns
    assert len(df) == RLE_ROWS, len(df)
    for i in range(1, RLE_ROWS + 1):
        r = df.iloc[i - 1]
        assert r["id"] == float(i), (i, r["id"])
        assert r["val"] == i * 0.25, (i, r["val"])
        assert r["name"] == f"row_{i:03d}", (i, repr(r["name"]))
        assert r["tag"] == f"tag_{i}", (i, repr(r["tag"]))
    print(f"OK: {out} validated by pd.read_sas "
          f"({RLE_ROWS} rows x {len(RLE_COLS)} cols, RLE + 1 raw row"
          + (f", {stale_rows} stale subheaders truncated" if stale_rows else "") + ")")


# ---------------------------------------------------------------------------
# RDC-compressed (SASYZCR2 / COMPRESS=BINARY) fixture
#
# Same page/subheader layout as the RLE fixture; the row payloads use
# the RDC scheme: a big-endian 16-bit control word per 16 items, bit 0
# = literal byte, bit 1 = command byte (cmd<<4 | cnt) — cmd 0 short
# RLE (cnt+3), cmd 1 long RLE (cnt + next<<4 + 19), cmd 2 long
# back-reference, cmd 3..15 short back-reference of `cmd` bytes from
# offset cnt+3+(next<<4). The encoder emits RLE runs AND short
# back-references (the `pat` column repeats a 3-byte motif), so
# pd.read_sas's own rdc_decompress validates both command families.
# ---------------------------------------------------------------------------

RDC_COLS = [("id", "d"), ("val", "d"), ("name", "s8"), ("pat", "s24"), ("tag", "s40")]
RDC_ROW_LEN = 8 + 8 + 8 + 24 + 40
RDC_ROWS = 100
RDC_ROWS_P1 = 30
RDC_RAW_ROW = 60


def rdc_compress(data: bytes) -> bytes:
    tokens = []  # (ctrl_bit, bytes)
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        run = 1
        while i + run < n and data[i + run] == b:
            run += 1
        if run >= 19:
            r = min(run, 19 + 4095)
            cnt = r - 19
            tokens.append((1, bytes([0x10 | (cnt & 0x0F), (cnt >> 4) & 0xFF, b])))
            i += r
        elif run >= 3:
            r = min(run, 18)
            tokens.append((1, bytes([0x00 | (r - 3), b])))
            i += r
        elif i >= 3 and data[i:i + 3] == data[i - 3:i]:
            # short back-reference at offset 3: extend up to 15 bytes
            m = 3
            while m < 15 and i + m < n and data[i + m] == data[i + m - 3]:
                m += 1
            # ofs = cnt + 3 + (next << 4) = 3  ->  cnt = 0, next = 0
            tokens.append((1, bytes([(m << 4) | 0x00, 0x00])))
            i += m
        else:
            tokens.append((0, bytes([b])))
            i += 1
    out = bytearray()
    for g in range(0, len(tokens), 16):
        chunk = tokens[g:g + 16]
        ctrl = 0
        for j, (c, _) in enumerate(chunk):
            if c:
                ctrl |= 0x8000 >> j
        out.append(ctrl >> 8)
        out.append(ctrl & 0xFF)
        for _, bs in chunk:
            out.extend(bs)
    return bytes(out)


def rdc_row_bytes(i: int) -> bytes:
    motif = f"{i % 7}ab"  # 3-byte motif repeated -> short back-references
    return (f64(float(i)) + f64(i * 0.25)
            + f"row_{i:03d}".encode().ljust(8)
            + (motif * 8).encode()
            + f"tag_{i}".encode().ljust(40))


def make_rdc(out: str) -> None:
    sig = b"SASYZCR2"
    names = b""
    offsets = []
    base = 8 + len(sig)
    for n, _ in RDC_COLS:
        offsets.append(base + len(names))
        names += n.encode()
    blob = u16(8 + len(sig) + len(names)) + b"\x00" * 6 + sig + names

    def rowsize() -> bytes:
        b = bytearray(808)
        b[0:8] = b"\xf7\xf7\xf7\xf7\x00\x00\x00\x00"
        b[5 * INT:5 * INT + 8] = u64(RDC_ROW_LEN)
        b[6 * INT:6 * INT + 8] = u64(RDC_ROWS)
        b[9 * INT:9 * INT + 8] = u64(len(RDC_COLS))
        return bytes(b)

    def colsize() -> bytes:
        return (b"\xf6\xf6\xf6\xf6\x00\x00\x00\x00" + u64(len(RDC_COLS))).ljust(24, b"\x00")

    def colname() -> bytes:
        b = bytearray(2 * INT + 12 + 8 * len(RDC_COLS))
        b[0:8] = b"\xff\xff\xff\xff\xff\xff\xff\xff"
        for i, ((n, _), off) in enumerate(zip(RDC_COLS, offsets)):
            p = 16 + 8 * i
            b[p:p + 2] = u16(0)
            b[p + 2:p + 4] = u16(off)
            b[p + 4:p + 6] = u16(len(n))
        return bytes(b)

    def colattrs() -> bytes:
        b = bytearray(2 * INT + 12 + (INT + 8) * len(RDC_COLS))
        b[0:8] = b"\xfc\xff\xff\xff\xff\xff\xff\xff"
        data_off = 0
        for i, (_, t) in enumerate(RDC_COLS):
            p = 16 + 16 * i
            width = 8 if t == "d" else int(t[1:])
            b[p:p + 8] = u64(data_off)
            b[p + 8:p + 12] = u32(width)
            b[p + 14] = 1 if t == "d" else 2
            data_off += width
        assert data_off == RDC_ROW_LEN
        return bytes(b)

    metadata = [rowsize(), colsize(), subheader_counts(), subheader_text(blob),
                colname(), colattrs(), subheader_collist()] \
        + [subheader_format() for _ in RDC_COLS]

    rows = []
    for i in range(1, RDC_ROWS + 1):
        raw = rdc_row_bytes(i)
        if i == RDC_RAW_ROW:
            rows.append((raw, True))
        else:
            comp = rdc_compress(raw)
            assert len(comp) < RDC_ROW_LEN, f"row {i} did not compress"
            rows.append((comp, False))

    header_bytes = bytearray(header())
    header_bytes[204:208] = u32(2)
    with open(out, "wb") as f:
        f.write(bytes(header_bytes))
        f.write(meta_page_with_rows(metadata, rows[:RDC_ROWS_P1]))
        f.write(meta_page_with_rows([], rows[RDC_ROWS_P1:]))

    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == [n for n, _ in RDC_COLS], df.columns
    assert len(df) == RDC_ROWS, len(df)
    for i in range(1, RDC_ROWS + 1):
        r = df.iloc[i - 1]
        assert r["id"] == float(i), (i, r["id"])
        assert r["val"] == i * 0.25, (i, r["val"])
        assert r["name"] == f"row_{i:03d}", (i, repr(r["name"]))
        assert r["pat"] == f"{i % 7}ab" * 8, (i, repr(r["pat"]))
        assert r["tag"] == f"tag_{i}", (i, repr(r["tag"]))
    print(f"OK: {out} validated by pd.read_sas "
          f"({RDC_ROWS} rows x {len(RDC_COLS)} cols, RDC incl. back-references + 1 raw row)")


def main(out: str) -> None:
    blob, offsets = text_blob()
    meta = meta_page([
        subheader_rowsize(),
        subheader_colsize(),
        subheader_counts(),
        subheader_text(blob),
        subheader_colname(offsets),
        subheader_colattrs(),
        subheader_collist(),
    ] + [subheader_format() for _ in COLS])
    rows = [row_bytes(i) for i in range(1, ROWS + 1)]
    with open(out, "wb") as f:
        f.write(header())
        f.write(meta)
        f.write(data_page(rows[:ROWS_P1]))
        f.write(data_page(rows[ROWS_P1:]))

    # independent-parser validation: the fixture is only real if
    # pandas' own sas7bdat reader agrees on every value
    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
    assert list(df.columns) == ["id", "val", "name"], df.columns
    assert len(df) == ROWS, len(df)
    for i in range(1, ROWS + 1):
        r = df.iloc[i - 1]
        assert r["id"] == float(i), (i, r["id"])
        assert r["val"] == i * 0.25, (i, r["val"])
        assert r["name"] == f"row_{i:03d}", (i, repr(r["name"]))
    print(f"OK: {out} validated by pd.read_sas ({ROWS} rows x {len(COLS)} cols)")


def make_plain_stale(out: str, stale_rows: int = 10) -> None:
    """Models an UNCOMPRESSED file shortened in place: row_size still
    declares ROWS rows, but the trailing data page's u16 block count
    covers `stale_rows` old rows past that. pd.read_sas reads exactly
    row_count rows in page order — the validation proves the stale
    inline tail is invisible to it, which is the behavior the Scala
    census must match (same parity as the compressed stale fixture,
    on the inline-row path)."""
    blob, offsets = text_blob()
    meta_shs = [subheader_rowsize(), subheader_colsize(), subheader_counts(),
                subheader_text(blob), subheader_colname(offsets),
                subheader_colattrs(), subheader_collist()] \
        + [subheader_format() for _ in COLS]
    rows = [row_bytes(i) for i in range(1, ROWS + 1)]
    # stale tail: ids far outside 1..ROWS so leakage is unmistakable
    stale = [row_bytes(9000 + i) for i in range(1, stale_rows + 1)]
    with open(out, "wb") as f:
        f.write(header())
        f.write(meta_page(meta_shs))
        f.write(data_page(rows[:ROWS_P1]))
        f.write(data_page(rows[ROWS_P1:] + stale))

    import pandas as pd
    df = pd.read_sas(out, format="sas7bdat", encoding="utf-8")
    assert len(df) == ROWS, len(df)
    assert float(df["id"].max()) == float(ROWS), df["id"].max()
    assert df["name"].iloc[-1] == f"row_{ROWS:03d}", repr(df["name"].iloc[-1])
    assert abs(float(df["val"].sum()) - 0.25 * ROWS * (ROWS + 1) / 2) < 1e-9
    print(f"OK: {out} validated by pd.read_sas "
          f"({ROWS} rows, {stale_rows} stale inline rows truncated)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "fixtures/sas/graft_fixture.sas7bdat")
    make_compressed(
        sys.argv[2] if len(sys.argv) > 2 else "fixtures/sas/graft_fixture_rle.sas7bdat")
    make_rdc(
        sys.argv[3] if len(sys.argv) > 3 else "fixtures/sas/graft_fixture_rdc.sas7bdat")
    make_variant("fixtures/sas/graft_fixture_32le.sas7bdat", u64=False, little=True)
    make_variant("fixtures/sas/graft_fixture_64be.sas7bdat", u64=True, little=False)
    make_compressed("fixtures/sas/graft_fixture_rle_stale.sas7bdat", stale_rows=5)
    make_plain_stale("fixtures/sas/graft_fixture_plain_stale.sas7bdat", stale_rows=10)
    make_mix("fixtures/sas/graft_fixture_mix.sas7bdat")
    make_w1252("fixtures/sas/graft_fixture_w1252.sas7bdat")
