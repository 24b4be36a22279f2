"""Property sweeps over the vendored codecs and the embedded-archive
splitter (the reference's importer surface is Tika-backed and
fuzz-hardened upstream; these sweeps are our analog): arbitrary
member trees must round-trip through zip/tar encode -> recursive
split byte-identically, arbitrary printable pages must round-trip
through PDF encode -> page-walk -> text scan, and the content-type
detector must never misclassify the formats we emit."""

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark.functions.parsers import (
    EmbeddedConfig,
    _walk_embedded,
    detect_charset,
    detect_content_type,
)
from crawlspark.functions.pdfcodec import build_pdf, pdf_page_texts
from crawlspark.functions.pngcodec import decode_png, encode_png

# printable ASCII incl. the PDF-literal specials ( ) \ and newlines
_pdf_text = st.text(
    st.sampled_from(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 ()\\/<>[]{}#%!&'*+,-.:;=?@^_`|~\n"
    ),
    max_size=80,
)

_member_name = st.text(
    st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789_-."),
    min_size=1,
    max_size=12,
).filter(lambda s: s not in (".", "..") and not s.endswith("."))


@settings(max_examples=60, deadline=None)
@given(pages=st.lists(_pdf_text, min_size=1, max_size=5),
       compress=st.booleans())
def test_pdf_roundtrip_property(pages, compress):
    assert pdf_page_texts(build_pdf(pages, compress=compress)) == pages


@settings(max_examples=40, deadline=None)
@given(
    members=st.dictionaries(
        _member_name, st.binary(max_size=200), min_size=1, max_size=6
    )
)
def test_zip_split_roundtrip_property(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, body in members.items():
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), body)
    out: list = []
    _walk_embedded("d", buf.getvalue(), EmbeddedConfig(), 0, out)
    got = {
        r["embedded_reference"]: bytes(r["bytes"])
        for r in out
        if r["embed_depth"] == 1
    }
    assert got == members
    # every child ref carries the reference's parent!member contract
    assert all(r["ref"].startswith("d!") for r in out)


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=300))
def test_detector_total_and_stable(data):
    """Never raises, always a mime-shaped string, deterministic."""
    t = detect_content_type(data)
    assert "/" in t
    assert detect_content_type(data) == t
    cs = detect_charset(data)
    assert isinstance(cs, str)
    # the detected charset must actually decode the payload
    bytes(data).decode(cs, errors="replace")


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_png(px)
    assert detect_content_type(data) == "image/png"
    assert (decode_png(data) == px).all()


# ---------------------------------------------------------------------------
# WARC framing round-trip
# ---------------------------------------------------------------------------

_header_val = st.text(
    st.sampled_from(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
        "0123456789 :/.,;-_<>"
    ),
    min_size=0,
    max_size=40,
).map(str.strip)

_warc_body = st.binary(max_size=200)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["resource", "response", "metadata"]),
            _header_val,
            _warc_body,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_warc_build_parse_roundtrip(records):
    """Arbitrary (type, uri, binary body) records — bodies may contain
    CRLFs, WARC/ magic, anything — must round-trip through build_warc
    -> warc_records byte-identically (Content-Length framing, not
    delimiter scanning)."""
    from crawlspark.functions.warc import build_warc, warc_records

    raw = build_warc([
        (
            {"WARC-Type": t, "WARC-Record-ID": f"<urn:r{i}>",
             "WARC-Date": "2026-01-01T00:00:00Z",
             "WARC-Target-URI": uri},
            body,
        )
        for i, (t, uri, body) in enumerate(records)
    ])
    back = list(warc_records(raw))
    assert len(back) == len(records)
    for (t, uri, body), (h, b) in zip(records, back):
        assert h["warc-type"] == t
        assert h["warc-target-uri"] == uri
        assert b == body
