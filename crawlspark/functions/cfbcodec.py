"""Vendored OLE2 / Compound File Binary (CFB) codec + legacy Office
text extraction — stdlib + numpy-free, written from the public
MS-CFB / MS-DOC / MS-XLS specifications.

Closes the legacy-binary-office gap vs the reference importer
(importer/.../parser/impl/DefaultParser.java routes ``.doc``/``.xls``
through Tika's POI parsers): ``doc_text`` walks the Word 97-2003
piece table (FIB -> CLX -> PlcPcd, compressed-CP1252 and UTF-16LE
pieces), ``xls_text`` walks BIFF8 Workbook records (SST / LABEL /
LABELSST). Anything unparseable stays a typed binary leaf — parse,
never guess.

The reader supports the real-world format surface: v3/v4 sector
sizes, header + chained DIFAT, FAT chains, mini-FAT streams under
the 4096-byte cutoff, and red-black directory trees (walked as a
flat entry array — names only, tree shape ignored).

``encode_cfb`` is a minimal single-FAT-sector writer used to
synthesize deterministic fixtures in tests (the pngcodec/jpegcodec
pattern: prove real bytes end-to-end in a container with no Office
libraries). It writes spec-shaped containers: 512-byte sectors,
4096 mini cutoff, a real mini stream + mini FAT for small streams.
"""

from __future__ import annotations

import struct

CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

_MINI_CUTOFF = 4096
_MINI_SECTOR = 64


# ---------------------------------------------------------------------------
# container reader
# ---------------------------------------------------------------------------


def _u32s(buf: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(buf) // 4}I", buf[: len(buf) // 4 * 4]))


def _chain(data: bytes, fat: list[int], start: int, sector: int,
           base: int) -> bytes:
    """Follow a FAT chain; ``base`` is the byte offset of sector 0."""
    out = bytearray()
    sec = start
    seen = set()
    while sec != _ENDOFCHAIN and sec != _FREESECT:
        if sec in seen or sec >= len(fat):
            raise ValueError("cfbcodec: corrupt FAT chain")
        seen.add(sec)
        off = base + sec * sector
        out += data[off:off + sector]
        sec = fat[sec]
    return bytes(out)


def cfb_streams(data: bytes) -> dict[str, bytes]:
    """CFB container -> {stream name: bytes} (all directory levels,
    names flattened; duplicate names keep the first)."""
    if data[:8] != CFB_SIG:
        raise ValueError("cfbcodec: not a CFB container")
    (sector_shift,) = struct.unpack_from("<H", data, 30)
    (mini_shift,) = struct.unpack_from("<H", data, 32)
    (n_fat,) = struct.unpack_from("<I", data, 44)
    (first_dir,) = struct.unpack_from("<I", data, 48)
    (cutoff,) = struct.unpack_from("<I", data, 56)
    (first_minifat,) = struct.unpack_from("<I", data, 60)
    (n_minifat,) = struct.unpack_from("<I", data, 64)
    (first_difat,) = struct.unpack_from("<I", data, 68)
    (n_difat,) = struct.unpack_from("<I", data, 72)
    sector = 1 << sector_shift
    mini_sector = 1 << mini_shift
    base = 512  # sector 0 starts after the 512-byte header (v3 & v4)

    # DIFAT: 109 entries in the header, then chained DIFAT sectors
    difat = _u32s(data[76:512])
    sec = first_difat
    for _ in range(n_difat):
        off = base + sec * sector
        body = data[off:off + sector]
        difat += _u32s(body[:-4])
        (sec,) = struct.unpack_from("<I", body, sector - 4)
    fat: list[int] = []
    for fs in difat[:n_fat]:
        if fs == _FREESECT:
            break
        off = base + fs * sector
        fat += _u32s(data[off:off + sector])

    dir_raw = _chain(data, fat, first_dir, sector, base)
    entries = []
    for off in range(0, len(dir_raw), 128):
        e = dir_raw[off:off + 128]
        if len(e) < 128:
            break
        (name_len,) = struct.unpack_from("<H", e, 64)
        etype = e[66]
        if etype == 0 or name_len < 2:
            continue
        name = e[: name_len - 2].decode("utf-16-le", errors="replace")
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        entries.append({"name": name, "type": etype,
                        "start": start, "size": size})

    root = next((e for e in entries if e["type"] == 5), None)
    mini_stream = b""
    minifat: list[int] = []
    if root is not None and root["size"]:
        mini_stream = _chain(
            data, fat, root["start"], sector, base
        )[: root["size"]]
    if n_minifat and first_minifat != _ENDOFCHAIN:
        minifat = _u32s(_chain(data, fat, first_minifat, sector, base))

    out: dict[str, bytes] = {}
    for e in entries:
        if e["type"] != 2:  # streams only
            continue
        if e["size"] < cutoff:
            body = bytearray()
            sec = e["start"]
            seen: set[int] = set()
            while sec != _ENDOFCHAIN and sec != _FREESECT:
                if sec in seen or sec >= len(minifat):
                    raise ValueError("cfbcodec: corrupt mini chain")
                seen.add(sec)
                off = sec * mini_sector
                body += mini_stream[off:off + mini_sector]
                sec = minifat[sec]
            blob = bytes(body[: e["size"]])
        else:
            blob = _chain(data, fat, e["start"], sector, base)[: e["size"]]
        out.setdefault(e["name"], blob)
    return out


# ---------------------------------------------------------------------------
# minimal writer (fixture synthesis)
# ---------------------------------------------------------------------------


def encode_cfb(streams: dict[str, bytes]) -> bytes:
    """{name: bytes} -> a v3 CFB container. Small streams (<4096)
    land in a real mini stream with a mini FAT; larger streams use
    regular sectors. Single FAT sector (=> at most ~120 sectors of
    payload) — enough for fixtures, raises beyond."""
    sector = 512
    names = list(streams)

    # mini stream: concat of small streams padded to 64
    mini_alloc: dict[str, tuple[int, int]] = {}  # name -> (start, n)
    mini = bytearray()
    minifat: list[int] = []
    for n in names:
        b = streams[n]
        if len(b) >= _MINI_CUTOFF or not b:
            continue
        n_ms = (len(b) + _MINI_SECTOR - 1) // _MINI_SECTOR
        start = len(minifat)
        for i in range(n_ms - 1):
            minifat.append(start + i + 1)
        minifat.append(_ENDOFCHAIN)
        mini_alloc[n] = (start, n_ms)
        mini += b + b"\x00" * (n_ms * _MINI_SECTOR - len(b))

    # regular sectors, in order: dir | minifat | ministream | big
    fat: list[int] = [_FATSECT]  # sector 0 is the FAT itself

    def alloc(blob: bytes) -> tuple[int, int]:
        """-> (first sector, sector count) for a FAT-chained blob."""
        if not blob:
            return _ENDOFCHAIN, 0
        n = (len(blob) + sector - 1) // sector
        first = len(fat)
        for i in range(n - 1):
            fat.append(first + i + 1)
        fat.append(_ENDOFCHAIN)
        return first, n

    n_entries = len(names) + 1
    dir_sectors = (n_entries * 128 + sector - 1) // sector
    dir_first, _ = alloc(b"\x00" * (dir_sectors * sector))
    minifat_blob = struct.pack(f"<{len(minifat)}I", *minifat)
    minifat_first, minifat_n = alloc(minifat_blob)
    mini_first, _ = alloc(bytes(mini))
    big_alloc: dict[str, int] = {}
    for n in names:
        b = streams[n]
        if len(b) >= _MINI_CUTOFF:
            big_alloc[n], _ = alloc(b)
    if len(fat) > sector // 4:
        raise ValueError("cfbcodec: fixture too large for one FAT sector")

    def entry(name: str, etype: int, start: int, size: int,
              left: int = _FREESECT, right: int = _FREESECT,
              child: int = _FREESECT) -> bytes:
        wname = name.encode("utf-16-le") + b"\x00\x00"
        e = wname + b"\x00" * (64 - len(wname))
        e += struct.pack("<HBB", len(wname), etype, 1)
        e += struct.pack("<III", left, right, child)
        e += b"\x00" * 16  # CLSID
        e += b"\x00" * 4   # state bits
        e += b"\x00" * 16  # timestamps
        e += struct.pack("<I", start & 0xFFFFFFFF)
        e += struct.pack("<Q", size)
        return e

    # directory: root (child -> entry 1), then a right-sibling chain
    dirs = [entry(
        "Root Entry", 5,
        mini_first if mini else _ENDOFCHAIN, len(mini),
        child=1 if names else _FREESECT,
    )]
    for i, n in enumerate(names):
        b = streams[n]
        if n in big_alloc:
            start = big_alloc[n]
        elif n in mini_alloc:
            start = mini_alloc[n][0]
        else:
            start = _ENDOFCHAIN
        right = i + 2 if i + 1 < len(names) else _FREESECT
        dirs.append(entry(n, 2, start, len(b), right=right))
    dir_blob = b"".join(dirs)
    dir_blob += b"\x00" * (dir_sectors * sector - len(dir_blob))

    header = CFB_SIG
    header += b"\x00" * 16  # CLSID
    header += struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3)
    header += struct.pack("<H", 0xFFFE)  # little-endian
    header += struct.pack("<HH", 9, 6)  # sector/mini shifts
    header += b"\x00" * 6
    header += struct.pack("<I", 0)  # dir sector count (v3: 0)
    header += struct.pack("<I", 1)  # FAT sector count
    header += struct.pack("<I", dir_first)
    header += struct.pack("<I", 0)  # transaction signature
    header += struct.pack("<I", _MINI_CUTOFF)
    header += struct.pack("<I", minifat_first if minifat_n else _ENDOFCHAIN)
    header += struct.pack("<I", minifat_n)
    header += struct.pack("<I", _ENDOFCHAIN)  # first DIFAT sector
    header += struct.pack("<I", 0)  # DIFAT sector count
    difat = [0] + [_FREESECT] * 108
    header += struct.pack("<109I", *difat)
    assert len(header) == 512

    fat_blob = struct.pack(f"<{len(fat)}I", *fat)
    fat_blob += struct.pack("<I", _FREESECT) * (
        (sector - len(fat_blob) % sector) // 4 % (sector // 4)
    )
    fat_blob += b"\x00" * (-len(fat_blob) % sector)

    body = bytearray(fat_blob)
    body += dir_blob
    body += minifat_blob + b"\x00" * (-len(minifat_blob) % sector)
    body += bytes(mini) + b"\x00" * (-len(mini) % sector)
    for n in names:
        if n in big_alloc:
            b = streams[n]
            body += b + b"\x00" * (-len(b) % sector)
    return header + bytes(body)


# ---------------------------------------------------------------------------
# Word 97-2003 (.doc) text — MS-DOC FIB + piece table
# ---------------------------------------------------------------------------


def doc_text(data: bytes) -> str:
    """CFB ``.doc`` bytes -> document text via the piece table
    (CLX -> PlcPcd; compressed pieces are CP1252 at fc/2, others
    UTF-16LE at fc). Falls back to the FIB's [fcMin, fcMac) window
    when no CLX exists (pre-97 simple files)."""
    streams = cfb_streams(data)
    wd = streams.get("WordDocument")
    if wd is None or len(wd) < 0x200:
        return ""
    (flags,) = struct.unpack_from("<H", wd, 0x000A)
    table = streams.get("1Table" if flags & 0x0200 else "0Table")
    if table is None:  # tolerate a mislabelled table stream
        table = streams.get("0Table") or streams.get("1Table")
    (fc_clx,) = struct.unpack_from("<I", wd, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", wd, 0x01A6)
    pieces: list[str] = []
    if table is not None and lcb_clx:
        clx = table[fc_clx:fc_clx + lcb_clx]
        pos = 0
        plc = None
        while pos < len(clx):
            kind = clx[pos]
            if kind == 1:  # Prc (property data): skip
                (cb,) = struct.unpack_from("<H", clx, pos + 1)
                pos += 3 + cb
            elif kind == 2:  # Pcdt: the piece table
                (lcb,) = struct.unpack_from("<I", clx, pos + 1)
                plc = clx[pos + 5:pos + 5 + lcb]
                break
            else:
                break
        if plc and len(plc) >= 4 + 8:
            n = (len(plc) - 4) // 12
            cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
            for i in range(n):
                off = 4 * (n + 1) + 8 * i
                _a, fc_raw, _prm = struct.unpack_from("<HIH", plc, off)
                n_cp = cps[i + 1] - cps[i]
                if fc_raw & 0x40000000:  # compressed: CP1252 at fc/2
                    start = (fc_raw & 0x3FFFFFFF) // 2
                    raw = wd[start:start + n_cp]
                    pieces.append(raw.decode("cp1252", errors="replace"))
                else:
                    fc = fc_raw & 0x3FFFFFFF
                    raw = wd[fc:fc + 2 * n_cp]
                    pieces.append(
                        raw.decode("utf-16-le", errors="replace")
                    )
    if not pieces:
        (fc_min,) = struct.unpack_from("<I", wd, 0x0018)
        (fc_mac,) = struct.unpack_from("<I", wd, 0x001C)
        if fc_mac > fc_min:
            pieces.append(
                wd[fc_min:fc_mac].decode("cp1252", errors="replace")
            )
    text = "".join(pieces)
    # Word control characters: CR = paragraph, 0x07 = cell/row mark,
    # 0x0B = soft break; drop field/object placeholders
    text = (
        text.replace("\r\n", "\n").replace("\r", "\n")
        .replace("\x07", "\t").replace("\x0b", "\n")
    )
    return "".join(
        ch for ch in text if ch == "\n" or ch == "\t" or ord(ch) >= 32
    ).strip()


def make_doc_bytes(text: str, compressed: bool = False) -> bytes:
    """Deterministic minimal-but-valid ``.doc`` fixture: FIB with a
    one-piece CLX in the 1Table stream (fWhichTblStm set); the piece
    is CP1252-compressed or UTF-16LE per ``compressed``."""
    fib = bytearray(0x0200)
    struct.pack_into("<H", fib, 0x0000, 0xA5EC)  # wIdent
    struct.pack_into("<H", fib, 0x0002, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", fib, 0x000A, 0x0200)  # fWhichTblStm -> 1Table
    fc_text = 0x0800
    if compressed:
        payload = text.encode("cp1252")
        fc_raw = (fc_text * 2) | 0x40000000
    else:
        payload = text.encode("utf-16-le")
        fc_raw = fc_text
    n_cp = len(text)
    plc = struct.pack("<2I", 0, n_cp) + struct.pack(
        "<HIH", 0, fc_raw, 0
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", fib, 0x01A2, 0)         # fcClx
    struct.pack_into("<I", fib, 0x01A6, len(clx))  # lcbClx
    wd = bytes(fib) + b"\x00" * (fc_text - 0x0200) + payload
    return encode_cfb({"WordDocument": wd, "1Table": clx})


# ---------------------------------------------------------------------------
# Excel 97-2003 (.xls) text — BIFF8 Workbook records
# ---------------------------------------------------------------------------


def _biff_records(stream: bytes):
    pos = 0
    while pos + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, pos)
        yield rid, stream[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if rid == 0x000A and pos >= len(stream):  # EOF
            break


def _xl_unicode_string(buf: bytes, pos: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString (no continuation support — fine
    for fixture-scale SSTs)."""
    (n_chars,) = struct.unpack_from("<H", buf, pos)
    flags = buf[pos + 2]
    pos += 3
    rich = flags & 0x08
    ext = flags & 0x04
    n_runs = 0
    ext_len = 0
    if rich:
        (n_runs,) = struct.unpack_from("<H", buf, pos)
        pos += 2
    if ext:
        (ext_len,) = struct.unpack_from("<i", buf, pos)
        pos += 4
    if flags & 0x01:  # UTF-16LE
        s = buf[pos:pos + 2 * n_chars].decode("utf-16-le", "replace")
        pos += 2 * n_chars
    else:  # compressed (latin-1 low bytes)
        s = buf[pos:pos + n_chars].decode("latin-1")
        pos += n_chars
    pos += 4 * n_runs + max(ext_len, 0)
    return s, pos


def xls_text(data: bytes) -> str:
    """CFB ``.xls`` bytes -> cell text: SST strings (shared strings,
    the storage behind LabelSst cells) + inline LABEL records, in
    stream order."""
    streams = cfb_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        return ""
    out: list[str] = []
    for rid, body in _biff_records(wb):
        if rid == 0x00FC and len(body) >= 8:  # SST
            (n_unique,) = struct.unpack_from("<I", body, 4)
            pos = 8
            for _ in range(n_unique):
                if pos >= len(body):
                    break  # continuation not supported: keep parsed
                try:
                    s, pos = _xl_unicode_string(body, pos)
                except (struct.error, IndexError):
                    break
                out.append(s)
        elif rid == 0x0204 and len(body) >= 8:  # LABEL (BIFF8 inline)
            try:
                s, _ = _xl_unicode_string(body, 6)
                out.append(s)
            except (struct.error, IndexError):
                continue
    return "\n".join(s for s in out if s).strip()


def make_xls_bytes(strings: list[str]) -> bytes:
    """Deterministic minimal ``.xls`` fixture: BIFF8 Workbook stream
    with BOF, an SST holding ``strings``, and EOF."""
    def rec(rid: int, body: bytes) -> bytes:
        return struct.pack("<HH", rid, len(body)) + body

    bof = rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005,
                                  0x0DBB, 0x07CC, 0, 0))
    sst_body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        if all(ord(c) < 256 for c in s):
            sst_body += struct.pack("<HB", len(s), 0x00)
            sst_body += s.encode("latin-1")
        else:
            sst_body += struct.pack("<HB", len(s), 0x01)
            sst_body += s.encode("utf-16-le")
    wb = bof + rec(0x00FC, sst_body) + rec(0x000A, b"")
    return encode_cfb({"Workbook": wb})


def _ppt_records(stream: bytes, pos: int = 0, end: int | None = None):
    """Walk MS-PPT binary records ((verAndInstance, recType, recLen)
    8-byte headers); recurses into containers (recVer == 0xF),
    yielding (recType, body) for atoms in stream order."""
    end = len(stream) if end is None else end
    while pos + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", stream, pos)
        pos += 8
        if rlen > end - pos:
            break  # truncated/corrupt record: keep what parsed
        if ver_inst & 0x000F == 0x000F:  # container
            yield from _ppt_records(stream, pos, pos + rlen)
        else:
            yield rtype, stream[pos:pos + rlen]
        pos += rlen


_PPT_TEXT_CHARS = 0x0FA0  # TextCharsAtom (UTF-16LE)
_PPT_TEXT_BYTES = 0x0FA8  # TextBytesAtom (low bytes of UTF-16 chars)


def ppt_text(data: bytes) -> str:
    """CFB ``.ppt`` bytes -> slide/outline text: TextCharsAtom +
    TextBytesAtom bodies from the PowerPoint Document stream, in
    stream order (MS-PPT; Tika/POI extracts the same atoms). PPT
    stores paragraph breaks as CR and line breaks as VT — both
    normalize to newlines."""
    streams = cfb_streams(data)
    doc = streams.get("PowerPoint Document")
    if doc is None:
        return ""
    out: list[str] = []
    for rtype, body in _ppt_records(doc):
        if rtype == _PPT_TEXT_CHARS:
            s = body.decode("utf-16-le", errors="replace")
        elif rtype == _PPT_TEXT_BYTES:
            s = "".join(chr(b) for b in body)
        else:
            continue
        s = s.replace("\r", "\n").replace("\x0b", "\n").strip("\x00")
        if s:
            out.append(s)
    return "\n".join(s for s in out if s).strip()


def make_ppt_bytes(texts: list[str]) -> bytes:
    """Deterministic minimal ``.ppt`` fixture: a Document container
    holding one Text{Chars,Bytes}Atom per input string (Chars when
    any code point exceeds Latin-1)."""
    def rec(ver_inst: int, rtype: int, body: bytes) -> bytes:
        return struct.pack("<HHI", ver_inst, rtype, len(body)) + body

    atoms = b""
    for s in texts:
        if all(ord(c) < 256 for c in s):
            atoms += rec(0x0000, _PPT_TEXT_BYTES, s.encode("latin-1"))
        else:
            atoms += rec(0x0000, _PPT_TEXT_CHARS, s.encode("utf-16-le"))
    doc = rec(0x000F, 0x03E8, atoms)  # DocumentContainer
    return encode_cfb({"PowerPoint Document": doc})


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------


def detect_cfb_type(data: bytes) -> str:
    """CFB container -> a concrete legacy Office type by directory
    stream names, or application/x-cfb for unknown containers."""
    try:
        names = set(cfb_streams(data))
    except (ValueError, struct.error, IndexError):
        return "application/x-cfb"
    if "WordDocument" in names:
        return "application/msword"
    if "Workbook" in names or "Book" in names:
        return "application/vnd.ms-excel"
    if "PowerPoint Document" in names:
        return "application/vnd.ms-powerpoint"
    return "application/x-cfb"
