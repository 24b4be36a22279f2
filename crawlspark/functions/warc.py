"""WARC (ISO 28500) record parsing and serialization — stdlib only.

Out-of-reference scope (the reference commits to search engines and
files; web-scale corpora move as WARC — Common Crawl et al.). This
module gives the importer a WARC ingestion path and the committer
stack a WARC sink:

* ``warc_records(data)`` parses a concatenated plain-WARC stream
  (``.warc.gz`` needs no special casing here: the gzip container in
  functions/parsers decompresses the multi-member stream first, and
  the result re-enters detection as ``application/warc``).
* ``http_payload(body)`` strips an ``application/http`` record body
  (status line + headers) down to its entity bytes — a ``response``
  record's HTML lands directly in text extraction.
* ``build_record`` / ``build_warc`` serialize records back out with
  exact Content-Length framing; used by the WARC committer sink and
  the round-trip tests.

Framing per the spec: ``WARC/1.0 CRLF headers CRLF CRLF body CRLF
CRLF``; header names are case-insensitive; Content-Length counts the
body bytes exactly.
"""

from __future__ import annotations

VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def warc_records(data: bytes):
    """Yield (headers: dict[str, str], body: bytes) per record.

    Header keys are returned lower-cased. Malformed framing raises
    ValueError (loud, like the archive splitter's bad-archive path).
    """
    buf = bytes(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and buf[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(
                f"warc: expected record header at byte {pos}"
            )
        head_end = buf.find(_SEP, pos)
        if head_end < 0:
            raise ValueError("warc: unterminated record header")
        head_lines = buf[pos:head_end].split(_CRLF)
        headers: dict[str, str] = {}
        for ln in head_lines[1:]:
            k, _, v = ln.decode("utf-8", "replace").partition(":")
            if k:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("warc: missing/bad Content-Length")
        body_start = head_end + len(_SEP)
        body = buf[body_start:body_start + length]
        if len(body) != length:
            raise ValueError("warc: truncated record body")
        yield headers, body
        pos = body_start + length


def http_payload(body: bytes) -> bytes:
    """application/http record body -> entity bytes (headers
    stripped). Bodies that do not start with an HTTP status/request
    line pass through unchanged."""
    if not (body.startswith(b"HTTP/") or b" HTTP/" in body[:100]):
        return body
    sep = body.find(_SEP)
    return body[sep + len(_SEP):] if sep >= 0 else body


def build_record(headers: dict[str, str], body: bytes) -> bytes:
    """One serialized record; Content-Length is (re)computed."""
    out = [VERSION]
    for k, v in headers.items():
        if k.lower() == "content-length":
            continue
        out.append(f"{k}: {v}".encode())
    out.append(b"Content-Length: %d" % len(body))
    return _CRLF.join(out) + _SEP + body + _SEP


def build_warc(records) -> bytes:
    """Concatenate (headers, body) pairs into one WARC stream."""
    return b"".join(build_record(h, b) for h, b in records)
