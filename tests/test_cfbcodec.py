"""Vendored OLE2/CFB codec (functions/cfbcodec.py): container
roundtrip over regular + mini FAT, Word piece-table text (both piece
encodings), BIFF8 Workbook text, detection by directory names, and
corrupt-input guards. Reference contract: the importer's Tika POI
path (importer/.../parser/impl/DefaultParser.java)."""

import pytest

from crawlspark.functions.cfbcodec import (
    CFB_SIG,
    cfb_streams,
    detect_cfb_type,
    doc_text,
    encode_cfb,
    make_doc_bytes,
    make_xls_bytes,
    xls_text,
)
from crawlspark.functions.parsers import detect_content_type, extract_text


def test_container_roundtrip_mini_and_regular_fat():
    big = bytes(range(256)) * 20  # 5120 B -> regular FAT chain
    streams = {"small": b"hello world", "big": big, "empty": b""}
    data = encode_cfb(streams)
    assert data[:8] == CFB_SIG
    got = cfb_streams(data)
    assert got == streams


def test_doc_text_piece_table_both_encodings():
    text = "Hello legacy Word!\rSecond paragraph éè"
    for compressed in (False, True):
        d = make_doc_bytes(text, compressed=compressed)
        t = doc_text(d)
        assert "Hello legacy Word!" in t, (compressed, t)
        assert "Second paragraph éè" in t
        # CR became a newline (Word paragraph mark)
        assert "\n" in t


def test_doc_text_unicode_only_piece():
    d = make_doc_bytes("Unicode 中文 text")
    assert "中文" in doc_text(d)


def test_xls_text_sst_strings():
    x = make_xls_bytes(["Revenue", "Q1 € 100", "North"])
    assert xls_text(x).splitlines() == ["Revenue", "Q1 € 100", "North"]


def test_detection_by_directory_names():
    assert detect_cfb_type(make_doc_bytes("a")) == "application/msword"
    assert (
        detect_cfb_type(make_xls_bytes(["a"]))
        == "application/vnd.ms-excel"
    )
    ppt = encode_cfb({"PowerPoint Document": b"\x00" * 16})
    assert detect_cfb_type(ppt) == "application/vnd.ms-powerpoint"
    assert (
        detect_cfb_type(encode_cfb({"Whatever": b"x"}))
        == "application/x-cfb"
    )


def test_parsers_dispatch_and_corrupt_guards():
    d = make_doc_bytes("Legacy doc body text")
    assert detect_content_type(d) == "application/msword"
    assert "Legacy doc body text" in extract_text(d)
    x = make_xls_bytes(["CellOne", "CellTwo"])
    assert detect_content_type(x) == "application/vnd.ms-excel"
    assert extract_text(x) == "CellOne\nCellTwo"
    # truncated container: detected as a typed binary leaf, no crash
    assert detect_content_type(d[:100]) == "application/x-cfb"
    assert extract_text(d[:100]) == ""
    with pytest.raises(ValueError):
        cfb_streams(b"not a container")


def test_ppt_text_atoms_in_stream_order():
    """MS-PPT TextBytesAtom + TextCharsAtom walk (recursing through
    container records), CR/VT newline normalization, UTF-16 path for
    non-Latin-1 text."""
    from crawlspark.functions.cfbcodec import make_ppt_bytes, ppt_text

    b = make_ppt_bytes(
        ["Slide one title", "bullet\rsecond line", "café — déjà"]
    )
    assert detect_cfb_type(b) == "application/vnd.ms-powerpoint"
    assert detect_content_type(b) == "application/vnd.ms-powerpoint"
    assert (
        extract_text(b)
        == "Slide one title\nbullet\nsecond line\ncafé — déjà"
    )
    # deterministic fixture bytes; truncation degrades to ""
    assert b == make_ppt_bytes(
        ["Slide one title", "bullet\rsecond line", "café — déjà"]
    )
    assert extract_text(b[:80]) == ""


def test_ppt_records_skip_corrupt_tail():
    """A record whose declared length overruns the stream ends the
    walk with everything before it kept."""
    import struct

    from crawlspark.functions.cfbcodec import encode_cfb, ppt_text

    good = struct.pack("<HHI", 0, 0x0FA8, 4) + b"keep"
    bad = struct.pack("<HHI", 0, 0x0FA8, 9999) + b"xx"
    blob = encode_cfb({"PowerPoint Document": good + bad})
    assert ppt_text(blob) == "keep"
