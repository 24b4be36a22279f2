"""Vendored PDF codec: real bytes -> pages in THIS container (no
pypdf), closing PdfPageSplitter's byte-level slot. The writer emits
spec-conformant classic-xref PDFs; the reader is exercised on those
AND on hand-assembled documents with uncompressed streams, multi-line
text, incremental-update /Prev chains and deliberate corruption."""

import re
import zlib

import pytest

from crawlspark.functions.pdfcodec import (
    PdfDocument,
    build_pdf,
    pdf_page_texts,
)


def test_roundtrip_multi_page_flate():
    pages = ["hello first page", "second\nwith two lines", "third (and) \\ escapes"]
    data = build_pdf(pages, compress=True)
    assert data.startswith(b"%PDF-")
    assert pdf_page_texts(data) == pages


def test_roundtrip_uncompressed():
    pages = ["plain stream", "page two"]
    data = build_pdf(pages, compress=False)
    assert b"FlateDecode" not in data
    assert pdf_page_texts(data) == pages


def test_single_page_and_empty_text():
    assert pdf_page_texts(build_pdf(["only"])) == ["only"]
    assert pdf_page_texts(build_pdf([""])) == [""]


def test_xref_offsets_are_validated():
    data = bytearray(build_pdf(["x"]))
    # corrupt the first xref entry's offset to point at garbage
    m = re.search(rb"\n(\d{10}) 00000 n", bytes(data))
    data[m.start(1) : m.end(1)] = b"0000000003"
    with pytest.raises(ValueError, match="xref offset"):
        PdfDocument(bytes(data)).page_texts()


def test_unsupported_is_loud():
    with pytest.raises(ValueError, match="bad header"):
        PdfDocument(b"GIF89a not a pdf")
    # xref stream (PDF 1.5): startxref points at an object, not "xref"
    doc = build_pdf(["x"])
    hacked = re.sub(
        rb"startxref\s+\d+", b"startxref\n9", doc
    )  # offset 9 is inside the header comment, not an xref table
    with pytest.raises(ValueError):
        PdfDocument(hacked).page_texts()
    # non-Flate filter
    body = b"BT (x) Tj ET"
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(body)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + body + b"\nendstream\nendobj\n"
    )
    offs = {n: raw.find(f"{n} 0 obj".encode()) for n in (1, 2, 3, 4)}
    xoff = len(raw)
    raw += b"xref\n0 5\n0000000000 65535 f \n" + b"".join(
        f"{offs[n]:010d} 00000 n \n".encode() for n in (1, 2, 3, 4)
    )
    raw += (
        b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n"
        + str(xoff).encode() + b"\n%%EOF\n"
    )
    with pytest.raises(ValueError, match="unsupported filter"):
        PdfDocument(raw).page_texts()


def test_incremental_update_prev_chain():
    """An appended update whose xref /Prev points at the original:
    updated objects win, untouched ones resolve through the chain."""
    base = build_pdf(["original page one", "page two"])
    # find the content object of page 1 (object 4) and append a
    # replacement with new text, plus an update xref
    new_stream = zlib.compress(b"BT /F1 12 Tf 72 720 Td (REPLACED) Tj ET")
    upd_off = len(base)
    upd = (
        b"4 0 obj\n<< /Length " + str(len(new_stream)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + new_stream + b"\nendstream\nendobj\n"
    )
    m = re.search(rb"startxref\s+(\d+)", base)
    prev_xref = int(m.group(1))
    xoff = upd_off + len(upd)
    upd += (
        b"xref\n4 1\n" + f"{upd_off:010d} 00000 n \n".encode()
        + b"trailer\n<< /Size 8 /Root 1 0 R /Prev "
        + str(prev_xref).encode() + b" >>\nstartxref\n"
        + str(xoff).encode() + b"\n%%EOF\n"
    )
    assert pdf_page_texts(base + upd) == ["REPLACED", "page two"]


def test_split_pdf_bytes_spark(spark):
    """The Spark splitter over a BINARY column of real PDFs: child
    refs, page numbers, single-page guard — the same contract as the
    text-convention splitter, now on bytes (PdfPageSplitter.java
    byte-level path, vendored parser in this container)."""
    import crawlspark.functions.transformers as TR

    df = spark.createDataFrame(
        [
            ("http://h/multi", bytearray(build_pdf(["p one", "p two", "p three"]))),
            ("http://h/solo", bytearray(build_pdf(["alone"]))),
        ],
        "ref string, pdf binary",
    )
    out = (
        TR.split_pdf_bytes(df, "pdf")
        .select(
            "parent_ref", "page_number", "total_pages", "child_ref",
            "page_text",
        )
        .collect()
    )
    rows = sorted(
        [(r["parent_ref"], r["page_number"], r["total_pages"],
          r["child_ref"], r["page_text"]) for r in out]
    )
    assert rows == [
        ("http://h/multi", 1, 3, "http://h/multi#1", "p one"),
        ("http://h/multi", 2, 3, "http://h/multi#2", "p two"),
        ("http://h/multi", 3, 3, "http://h/multi#3", "p three"),
        ("http://h/solo", 1, 1, "http://h/solo", "alone"),
    ]
