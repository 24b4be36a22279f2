"""WARC record framing, HTTP payload stripping, the ingestion chain
through the embedded splitter, and the committer round-trip (bytes
out == bytes in == the resolved op-log fold)."""

import glob
import gzip

import pytest

from crawlspark.functions.warc import (
    build_record,
    build_warc,
    http_payload,
    warc_records,
)


def _sample_warc() -> bytes:
    return build_warc([
        (
            {"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:a>",
             "WARC-Date": "2026-01-01T00:00:00Z"},
            b"software: crawlspark",
        ),
        (
            {"WARC-Type": "response", "WARC-Record-ID": "<urn:b>",
             "WARC-Date": "2026-01-01T00:00:00Z",
             "WARC-Target-URI": "http://h/page",
             "Content-Type": "application/http; msgtype=response"},
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html><body>warc page</body></html>",
        ),
        (
            {"WARC-Type": "resource", "WARC-Record-ID": "<urn:c>",
             "WARC-Date": "2026-01-01T00:00:00Z",
             "WARC-Target-URI": "http://h/raw",
             "Content-Type": "text/plain"},
            b"raw resource body",
        ),
    ])


def test_warc_parse_and_http_strip():
    recs = list(warc_records(_sample_warc()))
    assert [h["warc-type"] for h, _ in recs] == [
        "warcinfo", "response", "resource",
    ]
    assert recs[2][1] == b"raw resource body"
    assert http_payload(recs[1][1]) == (
        b"<html><body>warc page</body></html>"
    )
    # non-HTTP bodies pass through http_payload untouched
    assert http_payload(b"plain") == b"plain"


def test_warc_malformed_is_loud():
    with pytest.raises(ValueError, match="warc"):
        list(warc_records(b"WARC/1.0\r\nNo-Length: x\r\n\r\nbody"))
    with pytest.raises(ValueError, match="warc"):
        list(warc_records(b"NOTWARC"))


def test_warc_through_embedded_splitter_and_gzip():
    from crawlspark.functions.parsers import (
        EmbeddedConfig, _walk_embedded, detect_content_type,
    )

    raw = _sample_warc()
    assert detect_content_type(raw) == "application/warc"
    out: list = []
    _walk_embedded("w", raw, EmbeddedConfig(), 0, out)
    by_ref = {r["ref"]: r for r in out}
    # warcinfo skipped (still numbered); response stripped to entity
    assert set(by_ref) == {"w!rec-00001.response", "w!rec-00002.resource"}
    resp = by_ref["w!rec-00001.response"]
    assert resp["embedded_type"] == "warc-record"
    assert resp["content_type"] == "text/html"
    assert resp["bytes"] == b"<html><body>warc page</body></html>"
    # .warc.gz: the gzip container gunzips, then the warc recurses
    out2: list = []
    _walk_embedded("a.warc.gz", gzip.compress(raw), EmbeddedConfig(), 0, out2)
    refs = [r["ref"] for r in out2]
    assert any(r.endswith(".response") for r in refs)


def test_warc_committer_roundtrip(spark, tmp_path):
    from crawlspark.sinks.committers import (
        resolve_operations, warc_committer,
    )

    ops = spark.createDataFrame(
        [
            (1, "img-a", "upsert", b"\x01\x02", "png", "cap a", "c1"),
            (2, "img-b", "upsert", b"\x03", "jpeg", "cap b", "c2"),
            (3, "img-a", "upsert", b"\x09\x08", "png", "cap a2", "c3"),
            (4, "img-c", "upsert", b"\x04", "png", "cap c", "c4"),
            (5, "img-c", "delete", None, None, None, None),
        ],
        "seq long, image_id string, op string, bytes binary, "
        "fmt string, caption string, checksum string",
    )
    warc_committer(ops, str(tmp_path / "out"))
    got = {}
    for part in sorted(glob.glob(str(tmp_path / "out" / "*.warc"))):
        with open(part, "rb") as f:
            for h, body in warc_records(f.read()):
                got[h["warc-target-uri"]] = (
                    body, h["x-crawl-caption"], h["content-type"],
                )
    want = {
        r["image_id"]: r
        for r in resolve_operations(ops).collect()
    }
    assert set(got) == set(want) == {"img-a", "img-b"}
    assert got["img-a"] == (b"\x09\x08", "cap a2", "image/png")
    assert got["img-b"] == (b"\x03", "cap b", "image/jpeg")
    # determinism: committing again produces byte-identical parts
    warc_committer(ops, str(tmp_path / "out2"))
    a = b"".join(
        open(p, "rb").read()
        for p in sorted(glob.glob(str(tmp_path / "out" / "*.warc")))
    )
    b = b"".join(
        open(p, "rb").read()
        for p in sorted(glob.glob(str(tmp_path / "out2" / "*.warc")))
    )
    assert a == b
