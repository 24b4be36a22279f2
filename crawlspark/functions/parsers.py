"""DefaultParser-class document parsing: content-type + charset
detection, recursive embedded-document (archive) splitting, and
binary -> text extraction for the stdlib-parseable formats.

Reference surface (the importer's parse stage, re-scoped to what a
container with no Tika can honestly do):

* ``ContentTypeDetector`` (importer/.../doc/ContentTypeDetector.java —
  Tika magic-byte detection): ``detect_content_type`` sniffs the
  magic prefixes of the formats this engine produces or crawls
  (PDF, PNG/JPEG/GIF/WebP, zip/gzip/tar, HTML/XML/JSON/text).
* ``CharsetDetector`` / ``CharsetTransformer`` (importer/.../charset/
  CharsetDetector.java, handler/transformer/impl/CharsetTransformer
  .java): BOM-first detection with a strict-UTF-8 probe fallback.
* ``RecursiveEmbeddedSplitter`` (importer/.../handler/parser/impl/
  RecursiveEmbeddedSplitter.java:66-200 + EmbeddedConfig.java):
  archive members become child documents with the reference's child
  contract — child ref = ``<parent>!<member-name>`` (line 183),
  ``embedded_reference`` = the member name, ``embedded_type`` =
  ``package-file``, recursion into nested archives bounded by
  ``max_embedded_depth`` (-1 = unlimited), content-type skip lists.
* ``DefaultParser`` text extraction (importer/.../handler/parser/
  impl/DefaultParser.java), for stdlib-parseable types: HTML/XML tag
  strip, PDF via the vendored codec (functions/pdfcodec.py), JSON
  string-value walk, charset-decoded plain text. Unknown binaries
  yield empty text with the detected type preserved — parse, never
  guess.

Spark shape: detection and per-member extraction are Arrow-batched
pandas UDFs (bytes never leave the executor); the member explode is a
JVM ``posexplode`` so downstream filters/joins stay columnar. Archive
recursion happens *inside* one UDF call per row — an archive's
members are a row-local tree, not a shuffle.
"""

from __future__ import annotations

import gzip
import io
import json
import re
import tarfile
import zipfile
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# content-type detection (ContentTypeDetector analog)
# ---------------------------------------------------------------------------

_MAGIC = [
    (b"%PDF-", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"PK\x05\x06", "application/zip"),  # empty archive
    (b"\x1f\x8b", "application/gzip"),
    (b"WARC/", "application/warc"),
    (b"{\\rtf", "application/rtf"),
]

_HTML_RE = re.compile(
    rb"^\s*(?:<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>])",
    re.IGNORECASE,
)
_XML_RE = re.compile(rb"^\s*<\?xml")


def detect_content_type(data: bytes | None) -> str:
    """Magic-byte sniff; text formats by shape; octet-stream when
    nothing matches (ContentTypeDetector.detect analog)."""
    if not data:
        return "application/octet-stream"
    head = bytes(data[:512])
    if head[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image/webp"
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        # OLE2/CFB container: .doc/.xls/.ppt by directory stream
        # names (Tika's POIFSContainerDetector analog)
        from .cfbcodec import detect_cfb_type

        return detect_cfb_type(bytes(data))
    for magic, ctype in _MAGIC:
        if head.startswith(magic):
            if ctype == "application/zip":
                # an office container is a zip with telltale members
                office = _sniff_office_zip(bytes(data))
                if office:
                    return office
            return ctype
    if len(data) > 262 and data[257:262] == b"ustar":
        return "application/x-tar"
    if _HTML_RE.search(head):
        return "text/html"
    if _XML_RE.search(head):
        return "application/xml"
    stripped = head.lstrip()
    if stripped[:1] in (b"{", b"["):
        try:
            json.loads(bytes(data).decode(detect_charset(data)))
            return "application/json"
        except (ValueError, UnicodeDecodeError):
            pass
        # JSON Lines: one object per line (>= 2 lines must parse)
        try:
            lines = [
                ln
                for ln in bytes(data)
                .decode(detect_charset(data))
                .splitlines()
                if ln.strip()
            ]
            if len(lines) >= 2 and all(
                isinstance(json.loads(ln), (dict, list))
                for ln in lines[:20]
            ):
                return "application/x-ndjson"
        except (ValueError, UnicodeDecodeError):
            pass
    # printable-text heuristic over the decoded head
    try:
        text = head.decode(detect_charset(data), errors="strict")
    except (UnicodeDecodeError, LookupError):
        return "application/octet-stream"
    if not text:
        return "application/octet-stream"
    printable = sum(ch.isprintable() or ch in "\n\r\t" for ch in text)
    if printable / len(text) >= 0.9:
        if _looks_like_mbox(text):
            return "application/mbox"
        if _looks_like_email(text):
            return "message/rfc822"
        return "text/plain"
    return "application/octet-stream"


_EMAIL_HEADERS = {
    "from", "to", "subject", "date", "received", "return-path",
    "message-id", "mime-version",
}
_HEADER_LINE_RE = re.compile(r"^([A-Za-z][A-Za-z0-9-]*):\s")


def _looks_like_email(text: str) -> bool:
    """RFC-822 shape: the head starts with a header block — >= 3
    header-formed lines among the first lines, at least two of them
    well-known mail headers."""
    lines = text.splitlines()[:10]
    if not lines or not _HEADER_LINE_RE.match(lines[0]):
        return False
    formed, known = 0, 0
    for ln in lines:
        if ln == "":
            break  # end of header block
        m = _HEADER_LINE_RE.match(ln)
        if m:
            formed += 1
            if m.group(1).lower() in _EMAIL_HEADERS:
                known += 1
    return formed >= 3 and known >= 2


_BOMS = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
]


def detect_charset(data: bytes | None, default: str = "utf-8") -> str:
    """BOM first, then a strict UTF-8 probe, then Latin-1 — the
    CharsetDetector precedence without ICU."""
    if not data:
        return default
    head = bytes(data[:4])
    for bom, enc in _BOMS:
        if head.startswith(bom):
            return enc
    try:
        bytes(data[:4096]).decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def detect_udf():
    """Arrow-batched (content_type, charset) detection over a binary
    column (UDF built lazily — needs an active session)."""

    @F.pandas_udf("struct<content_type: string, charset: string>")
    def _detect(data: pd.Series) -> pd.DataFrame:
        types, charsets = [], []
        for buf in data:
            b = bytes(buf) if buf is not None else None
            t = detect_content_type(b)
            types.append(t)
            charsets.append(
                detect_charset(b)
                if t.startswith("text/") or t in (
                    "application/json", "application/xml"
                )
                else None
            )
        return pd.DataFrame({"content_type": types, "charset": charsets})

    return _detect


# ---------------------------------------------------------------------------
# text extraction (DefaultParser analog, stdlib formats)
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(
    r"<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->|<[^>]+>",
    re.IGNORECASE | re.DOTALL,
)
_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&#39;": "'", "&apos;": "'", "&nbsp;": " ",
}


def _strip_markup(text: str) -> str:
    out = _TAG_RE.sub(" ", text)
    for ent, ch in _ENTITIES.items():
        out = out.replace(ent, ch)
    return re.sub(r"\s+", " ", out).strip()


# ---------------------------------------------------------------------------
# office containers (OOXML + OpenDocument) — zip + XML, stdlib-only
# ---------------------------------------------------------------------------
# The reference routes these through Tika's container detector +
# OOXML/ODF parsers (importer DefaultParser); structurally they are
# zip archives with well-known member names, so detection and text
# extraction need nothing beyond zipfile + ElementTree.

DOCX_TYPE = (
    "application/vnd.openxmlformats-officedocument."
    "wordprocessingml.document"
)
XLSX_TYPE = (
    "application/vnd.openxmlformats-officedocument."
    "spreadsheetml.sheet"
)
PPTX_TYPE = (
    "application/vnd.openxmlformats-officedocument."
    "presentationml.presentation"
)
ODF_PREFIX = "application/vnd.oasis.opendocument."
EPUB_TYPE = "application/epub+zip"
OFFICE_TYPES = (DOCX_TYPE, XLSX_TYPE, PPTX_TYPE)

_OOXML_MARKERS = [
    ("word/document.xml", DOCX_TYPE),
    ("xl/workbook.xml", XLSX_TYPE),
    ("ppt/presentation.xml", PPTX_TYPE),
]


def _sniff_office_zip(data: bytes) -> str | None:
    """A PK-magic blob that is really an office document: OOXML by
    part name, ODF by the (stored-first) ``mimetype`` member.
    Returns None for plain zips and unreadable archives."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if "mimetype" in names:
                mt = zf.read("mimetype").decode("ascii", "replace").strip()
                if mt.startswith(ODF_PREFIX) or mt == EPUB_TYPE:
                    return mt
            if "[Content_Types].xml" in names:
                for marker, ctype in _OOXML_MARKERS:
                    if marker in names:
                        return ctype
    except (zipfile.BadZipFile, OSError, KeyError, ValueError):
        return None
    return None


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xml_block_texts(xml_bytes: bytes, block_tags: set[str],
                     text_tags: set[str] | None) -> list[str]:
    """Join the ``text_tags`` runs inside each ``block_tags`` element
    (a paragraph / row / slide-shape), one output string per block.
    ``text_tags=None`` takes every text node (itertext) — the ODF
    mixed-content case where text sits directly in the paragraph."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return []
    blocks: list[str] = []
    for el in root.iter():
        if _local(el.tag) in block_tags:
            if text_tags is None:
                joined = "".join(el.itertext())
            else:
                joined = "".join(
                    (t.text or "")
                    for t in el.iter()
                    if _local(t.tag) in text_tags and t.text
                )
            if joined:
                blocks.append(joined)
    return blocks


def _extract_office_text(data: bytes, ctype: str) -> str:
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            if ctype == DOCX_TYPE:
                return "\n".join(_xml_block_texts(
                    zf.read("word/document.xml"), {"p"}, {"t"}
                ))
            if ctype == XLSX_TYPE:
                # shared strings + inline strings, in file order
                parts: list[str] = []
                if "xl/sharedStrings.xml" in zf.namelist():
                    parts += _xml_block_texts(
                        zf.read("xl/sharedStrings.xml"), {"si"}, {"t"}
                    )
                for name in sorted(zf.namelist()):
                    if name.startswith("xl/worksheets/sheet"):
                        parts += _xml_block_texts(
                            zf.read(name), {"is"}, {"t"}
                        )
                return "\n".join(parts)
            if ctype == PPTX_TYPE:
                parts = []
                for name in sorted(zf.namelist()):
                    if re.fullmatch(r"ppt/slides/slide\d+\.xml", name):
                        parts += _xml_block_texts(
                            zf.read(name), {"p"}, {"t"}
                        )
                return "\n".join(parts)
            if ctype.startswith(ODF_PREFIX):
                return "\n".join(_xml_block_texts(
                    zf.read("content.xml"), {"p", "h"}, None
                ))
    except (zipfile.BadZipFile, OSError, KeyError, ValueError):
        return ""
    return ""


def _extract_epub_text(data: bytes) -> str:
    """EPUB (OCF zip container): META-INF/container.xml names the OPF
    package file; the OPF ``spine`` orders ``manifest`` items by
    idref — the content documents are XHTML, stripped like any HTML.
    Reference: importer DefaultParser routes epub through Tika's
    EpubParser; structurally it is zip + two small XML indexes, so
    stdlib zipfile + ElementTree cover it. Missing/renamed members
    degrade to extracting every (X)HTML member in archive order."""
    import posixpath
    import xml.etree.ElementTree as ET

    def _root(xml_bytes: bytes):
        try:
            return ET.fromstring(xml_bytes)
        except ET.ParseError:
            return None

    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            docs: list[str] = []
            opf_path = None
            if "META-INF/container.xml" in names:
                c = _root(zf.read("META-INF/container.xml"))
                if c is not None:
                    for el in c.iter():
                        if (
                            _local(el.tag) == "rootfile"
                            and el.get("full-path") in names
                        ):
                            opf_path = el.get("full-path")
                            break
            if opf_path is not None:
                opf = _root(zf.read(opf_path))
                base = posixpath.dirname(opf_path)
                if opf is not None:
                    hrefs = {
                        el.get("id"): el.get("href")
                        for el in opf.iter()
                        if _local(el.tag) == "item" and el.get("href")
                    }
                    for el in opf.iter():
                        if _local(el.tag) != "itemref":
                            continue
                        href = hrefs.get(el.get("idref"))
                        if not href:
                            continue
                        member = posixpath.normpath(
                            posixpath.join(base, href)
                        )
                        if member in names:
                            docs.append(member)
            if not docs:  # lenient fallback: every XHTML member
                docs = sorted(
                    n for n in names
                    if n.lower().endswith((".xhtml", ".html", ".htm"))
                )
            parts = []
            for member in docs:
                body = zf.read(member)
                t = _strip_markup(
                    body.decode(detect_charset(body), errors="replace")
                )
                if t:
                    parts.append(t)
            return "\n".join(parts)
    except (zipfile.BadZipFile, OSError, KeyError, ValueError):
        return ""


def make_epub_bytes(chapters: list[str], title: str = "t") -> bytes:
    """Deterministic minimal EPUB builder (test/oracle fixture — the
    make_doc_bytes/make_xls_bytes pattern from cfbcodec): stored-first
    ``mimetype``, container.xml -> OEBPS/content.opf, one XHTML
    chapter per input string, spine in input order."""
    epoch = (1980, 1, 1, 0, 0, 0)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype", epoch),
            EPUB_TYPE,
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            zipfile.ZipInfo("META-INF/container.xml", epoch),
            '<?xml version="1.0"?><container version="1.0" '
            'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/>'
            "</rootfiles></container>",
        )
        items = "".join(
            f'<item id="c{i}" href="ch{i}.xhtml" '
            'media-type="application/xhtml+xml"/>'
            for i in range(len(chapters))
        )
        spine = "".join(
            f'<itemref idref="c{i}"/>' for i in range(len(chapters))
        )
        zf.writestr(
            zipfile.ZipInfo("OEBPS/content.opf", epoch),
            '<?xml version="1.0"?><package version="3.0" '
            'xmlns="http://www.idpf.org/2007/opf" unique-identifier="u">'
            f"<metadata><dc:title xmlns:dc="
            f'"http://purl.org/dc/elements/1.1/">{title}</dc:title>'
            f"</metadata><manifest>{items}</manifest>"
            f'<spine>{spine}</spine></package>',
        )
        for i, ch in enumerate(chapters):
            zf.writestr(
                zipfile.ZipInfo(f"OEBPS/ch{i}.xhtml", epoch),
                "<?xml version='1.0'?><html xmlns="
                "'http://www.w3.org/1999/xhtml'><body><p>"
                + ch
                + "</p></body></html>",
            )
    return buf.getvalue()


# ---------------------------------------------------------------------------
# RFC-822 / MIME email — stdlib `email` package
# ---------------------------------------------------------------------------


def _parse_email(data: bytes):
    import email
    from email import policy

    return email.message_from_bytes(data, policy=policy.default)


def _extract_email_text(data: bytes) -> str:
    """Subject line + the text bodies: every text/plain part, falling
    back to stripped text/html when a multipart carries no plain
    alternative (Tika's email parser shape)."""
    try:
        msg = _parse_email(data)
    except Exception:  # noqa: BLE001 — malformed mail -> no text
        return ""
    parts: list[str] = []
    subject = msg.get("Subject", "")
    if subject:
        parts.append(str(subject))
    plains, htmls = [], []
    for part in msg.walk():
        if part.is_multipart() or part.get_filename():
            continue  # containers and attachments are not body text
        ct = part.get_content_type()
        try:
            body = part.get_content()
        except Exception:  # noqa: BLE001
            continue
        if not isinstance(body, str):
            continue
        if ct == "text/plain":
            plains.append(body.strip())
        elif ct == "text/html":
            htmls.append(_strip_markup(body))
    parts += plains if plains else htmls
    return "\n".join(p for p in parts if p)


def _looks_like_mbox(text: str) -> bool:
    """mbox shape: a ``From `` separator line, then an RFC-822 header
    block."""
    lines = text.splitlines()
    if not lines or not lines[0].startswith("From "):
        return False
    return _looks_like_email("\n".join(lines[1:11]))


def _mbox_messages(data: bytes):
    """(member_name, rfc822 bytes) per message in an mbox stream.

    Messages start at ``From `` separator lines (at offset 0,
    preceded by a blank line or the file start — the mboxo framing);
    the separator itself is dropped and the common ``>From ``
    body-escape is undone (mboxrd unquoting, single level)."""
    lines = data.split(b"\n")
    starts = [
        i
        for i, ln in enumerate(lines)
        if ln.startswith(b"From ")
        and (i == 0 or lines[i - 1] == b"")
    ]
    if not starts:
        return
    starts.append(len(lines))
    for k in range(len(starts) - 1):
        body_lines = [
            ln[1:] if ln.startswith(b">From ") else ln
            for ln in lines[starts[k] + 1:starts[k + 1]]
        ]
        # drop the blank separator line before the next From_
        while body_lines and body_lines[-1] == b"":
            body_lines.pop()
        yield f"msg-{k:05d}.eml", b"\n".join(body_lines) + b"\n"


def _email_attachments(data: bytes):
    """(filename, payload bytes) per attachment — the email analog of
    an archive's member listing."""
    msg = _parse_email(data)
    i = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        name = part.get_filename()
        if not name:
            continue
        i += 1
        payload = part.get_payload(decode=True) or b""
        yield name, payload


def _json_strings(node) -> list[str]:
    if isinstance(node, str):
        return [node]
    if isinstance(node, dict):
        return [s for v in node.values() for s in _json_strings(v)]
    if isinstance(node, list):
        return [s for v in node for s in _json_strings(v)]
    return []


_RTF_CW = re.compile(r"\\([a-z]+)(-?\d+)? ?")
# destination groups whose content is metadata/binary, never body text
_RTF_DESTS = frozenset(
    "fonttbl colortbl stylesheet info pict header footer footnote "
    "generator themedata colorschememapping listtable "
    "listoverridetable latentstyles datastore xmlnstbl operator "
    "rsidtbl".split()
)


def _extract_rtf_text(data: bytes) -> str:
    """RTF body text: group-aware control-word walk (the 1987 spec's
    core grammar) — skips destination groups and ``{\\*...}``, maps
    ``\\par``/``\\line`` to newlines and ``\\tab`` to tabs, decodes
    ``\\'hh`` cp1252 escapes and ``\\uN`` unicode (with the ``\\ucN``
    ASCII-fallback skip). Minimal by design — formatting words drop,
    text survives."""
    s = data.decode("latin-1", errors="replace")
    out: list[str] = []
    i, n = 0, len(s)
    depth = 0
    skip_depth: int | None = None  # group depth where skipping began
    uc_stack = [1]
    pending_skip = 0  # \uN fallback chars still to swallow
    while i < n:
        c = s[i]
        if pending_skip and c not in "{}\\":
            pending_skip -= 1
            i += 1
            continue
        if c == "{":
            depth += 1
            uc_stack.append(uc_stack[-1])
            i += 1
            continue
        if c == "}":
            depth -= 1
            if len(uc_stack) > 1:
                uc_stack.pop()
            if skip_depth is not None and depth < skip_depth:
                skip_depth = None
            i += 1
            continue
        if c == "\\":
            m = _RTF_CW.match(s, i)
            if m:
                word, num = m.group(1), m.group(2)
                i = m.end()
                if word in _RTF_DESTS:
                    if skip_depth is None:
                        skip_depth = depth
                elif skip_depth is not None:
                    pass
                elif word in ("par", "line", "sect", "page"):
                    out.append("\n")
                elif word == "tab":
                    out.append("\t")
                elif word == "uc":
                    uc_stack[-1] = int(num or 1)
                elif word == "u":
                    cp = int(num or 0)
                    if cp < 0:
                        cp += 65536
                    out.append(chr(cp))
                    pending_skip = uc_stack[-1]
                continue
            nxt = s[i + 1] if i + 1 < n else ""
            if nxt == "'":
                hexpair = s[i + 2:i + 4]
                i += 4
                if pending_skip:
                    pending_skip -= 1
                elif skip_depth is None:
                    try:
                        out.append(
                            bytes([int(hexpair, 16)]).decode(
                                "cp1252", "replace"
                            )
                        )
                    except ValueError:
                        pass
                continue
            if nxt == "*":
                if skip_depth is None:
                    skip_depth = depth
                i += 2
                continue
            if nxt in "\\{}":
                if skip_depth is None and not pending_skip:
                    out.append(nxt)
                elif pending_skip:
                    pending_skip -= 1
                i += 2
                continue
            if nxt == "~":
                if skip_depth is None:
                    out.append(" ")
                i += 2
                continue
            i += 2  # other control symbol: formatting, dropped
            continue
        if skip_depth is None and c not in "\r\n":
            out.append(c)
        i += 1
    text = "".join(out)
    return re.sub(r"[ \t]*\n[ \t]*", "\n", text).strip()


def extract_text(
    data: bytes | None,
    content_type: str | None = None,
    ocr_fn=None,
) -> str:
    """One document's bytes -> extracted text by detected type.
    Unknown/binary types yield '' — never a mojibake guess. Image
    types go to ``ocr_fn`` (the Tika TesseractOCRParser slot —
    importer DefaultParser OCR path) when one is injected; without
    one an image stays a typed binary leaf, as before."""
    if not data:
        return ""
    b = bytes(data)
    ctype = content_type or detect_content_type(b)
    if ctype.startswith("image/"):
        return ocr_fn(b, ctype) if ocr_fn is not None else ""
    if ctype in ("text/html", "application/xml"):
        return _strip_markup(b.decode(detect_charset(b), errors="replace"))
    if ctype == "application/pdf":
        from .pdfcodec import pdf_page_texts

        try:
            return "\n".join(pdf_page_texts(b))
        except ValueError:
            return ""
    if ctype == "application/rtf":
        return _extract_rtf_text(b)
    if ctype == "application/json":
        try:
            doc = json.loads(b.decode(detect_charset(b)))
        except (ValueError, UnicodeDecodeError):
            return ""
        return " ".join(_json_strings(doc))
    if ctype == "application/x-ndjson":
        out = []
        for ln in b.decode(detect_charset(b), "replace").splitlines():
            if not ln.strip():
                continue
            try:
                out.append(" ".join(_json_strings(json.loads(ln))))
            except ValueError:
                continue
        return "\n".join(s for s in out if s)
    if ctype == "text/plain":
        return b.decode(detect_charset(b), errors="replace")
    if ctype in OFFICE_TYPES or ctype.startswith(ODF_PREFIX):
        return _extract_office_text(b, ctype)
    if ctype == EPUB_TYPE:
        return _extract_epub_text(b)
    if ctype == "application/msword":
        from .cfbcodec import doc_text

        try:
            return doc_text(b)
        except Exception:
            return ""
    if ctype == "application/vnd.ms-excel":
        from .cfbcodec import xls_text

        try:
            return xls_text(b)
        except Exception:
            return ""
    if ctype == "application/vnd.ms-powerpoint":
        from .cfbcodec import ppt_text

        try:
            return ppt_text(b)
        except Exception:
            return ""
    # application/x-cfb: typed binary leaf (detected, not
    # text-extracted); OCR remains the one Tika-breadth gap
    if ctype == "message/rfc822":
        return _extract_email_text(b)
    if ctype == "application/mbox":
        return "\n".join(
            t
            for _, m in _mbox_messages(b)
            if (t := _extract_email_text(m))
        )
    return ""


def parse_documents(
    df: DataFrame,
    col: str = "bytes",
    out_col: str = "text",
    ocr_fn=None,
) -> DataFrame:
    """DefaultParser stage: binary column -> detected content_type +
    charset + extracted text, all Arrow-batched, schema stable.

    ``ocr_fn`` fills the image-only-document slot: a (data,
    content_type) callable, the string "bitmap" (the in-container
    pure-Python reader in functions/ocr.py), or "module:attr"
    resolved lazily per executor (the translator-client pattern — a
    real Tesseract binding drops in the same way)."""

    @F.pandas_udf("string")
    def _extract(data: pd.Series) -> pd.Series:
        fn = None
        if ocr_fn is not None:
            from crawlspark.functions.ocr import resolve_ocr_fn

            fn = resolve_ocr_fn(ocr_fn)
        return pd.Series(
            [
                extract_text(
                    bytes(b) if b is not None else None, ocr_fn=fn
                )
                for b in data
            ]
        )

    det = detect_udf()(F.col(col))
    return (
        df.withColumn("_det", det)
        .withColumn("content_type", F.col("_det.content_type"))
        .withColumn("charset", F.col("_det.charset"))
        .drop("_det")
        .withColumn(out_col, _extract(F.col(col)))
    )


# ---------------------------------------------------------------------------
# recursive embedded-document splitting (RecursiveEmbeddedSplitter)
# ---------------------------------------------------------------------------

ARCHIVE_TYPES = ("application/zip", "application/gzip", "application/x-tar")
# containers the embedded splitter descends into: archives by member,
# emails by MIME attachment
CONTAINER_TYPES = ARCHIVE_TYPES + (
    "message/rfc822", "application/mbox", "application/warc",
)


@dataclass(frozen=True)
class EmbeddedConfig:
    """EmbeddedConfig.java analog (the splitter-relevant knobs)."""

    max_embedded_depth: int = -1  # -1 = unlimited, like the reference
    skip_embedded_content_types: tuple = ()
    skip_embedded_of_content_types: tuple = ()
    max_members: int = 10_000  # zip-bomb guard per archive (logged)
    max_member_bytes: int = 64 * 1024 * 1024  # per-member guard


def _archive_members(data: bytes, ctype: str, name_hint: str):
    """Yield (member_name, member_bytes) for one archive level."""
    if ctype == "application/zip":
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                yield info.filename, zf.read(info)
    elif ctype == "application/x-tar":
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                fh = tf.extractfile(member)
                yield member.name, fh.read() if fh else b""
    elif ctype == "application/gzip":
        # single-member stream; name = the container's name minus .gz
        # (gzip FNAME header wins when present)
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
            body = gz.read()
        inner = name_hint[:-3] if name_hint.endswith(".gz") else (
            name_hint + ".out"
        )
        yield inner, body
    elif ctype == "message/rfc822":
        yield from _email_attachments(data)
    elif ctype == "application/mbox":
        yield from _mbox_messages(data)
    elif ctype == "application/warc":
        from .warc import http_payload, warc_records

        for i, (headers, body) in enumerate(warc_records(data)):
            rtype = headers.get("warc-type", "resource")
            if rtype == "warcinfo":
                continue  # file metadata, not a document
            if headers.get("content-type", "").startswith(
                "application/http"
            ):
                body = http_payload(body)
            yield f"rec-{i:05d}.{rtype}", body


def _walk_embedded(
    ref: str,
    data: bytes,
    cfg: EmbeddedConfig,
    depth: int,
    out: list,
) -> None:
    ctype = detect_content_type(data)
    if ctype not in CONTAINER_TYPES:
        return
    if cfg.max_embedded_depth >= 0 and depth + 1 > cfg.max_embedded_depth:
        return  # over max depth — skipped, like the reference warn
    if ctype in cfg.skip_embedded_of_content_types:
        return  # skipEmbeddedOfContentTypes: don't descend into this
    n = 0
    try:
        members = list(_archive_members(data, ctype, ref.split("!")[-1]))
    except (zipfile.BadZipFile, tarfile.TarError, gzip.BadGzipFile,
            OSError, EOFError, ValueError) as exc:
        raise ValueError(f"embedded split: bad archive at {ref}: {exc}")
    for name, body in members:
        if n >= cfg.max_members:
            break
        if len(body) > cfg.max_member_bytes:
            continue
        child_ctype = detect_content_type(body)
        if child_ctype in cfg.skip_embedded_content_types:
            continue
        n += 1
        child_ref = f"{ref}!{name}"  # RecursiveEmbeddedSplitter.java:183
        out.append({
            "ref": child_ref,
            "embedded_reference": name,
            "embedded_type": (
                "mail-attachment" if ctype == "message/rfc822"
                else "mail-message" if ctype == "application/mbox"
                else "warc-record" if ctype == "application/warc"
                else "package-file"
            ),
            "embed_depth": depth + 1,
            "content_type": child_ctype,
            "bytes": body,
        })
        if child_ctype in CONTAINER_TYPES:
            # per-member non-fatal: a child whose bytes merely LOOK
            # like an archive (magic-byte collision) or is a corrupt
            # nested archive stays a leaf record — the reference's
            # embedded parse errors don't abort the parent document
            # (importer ParseState error accumulation); only the
            # top-level archive raises to the caller
            try:
                _walk_embedded(child_ref, body, cfg, depth + 1, out)
            except ValueError:
                pass


_CHILD_SCHEMA = (
    "array<struct<ref: string, embedded_reference: string, "
    "embedded_type: string, embed_depth: int, content_type: string, "
    "bytes: binary>>"
)


def split_embedded(
    df: DataFrame,
    col: str = "bytes",
    ref_col: str = "ref",
    cfg: EmbeddedConfig = EmbeddedConfig(),
) -> DataFrame:
    """Archive rows -> one child row per (recursively) embedded member
    with the reference's child contract; non-archive rows pass through
    the explode with zero children (dropped). The recursion is
    row-local inside one Arrow batch; the explode is JVM-side."""

    @F.pandas_udf(_CHILD_SCHEMA)
    def _children(refs: pd.Series, blobs: pd.Series) -> pd.Series:
        rows = []
        for ref, buf in zip(refs, blobs):
            out: list = []
            if buf is not None:
                _walk_embedded(str(ref), bytes(buf), cfg, 0, out)
            rows.append(out)
        return pd.Series(rows)

    kids = _children(F.col(ref_col), F.col(col))
    return (
        df.select(
            F.col(ref_col).alias("parent_ref"),
            F.explode(kids).alias("_kid"),
        )
        .select(
            "parent_ref",
            F.col("_kid.ref").alias("ref"),
            F.col("_kid.embedded_reference").alias("embedded_reference"),
            F.col("_kid.embedded_type").alias("embedded_type"),
            F.col("_kid.embed_depth").alias("embed_depth"),
            F.col("_kid.content_type").alias("content_type"),
            F.col("_kid.bytes").alias("bytes"),
        )
    )


# ---------------------------------------------------------------------------
# standalone importer (ImporterLauncher / crawler-fs analog)
# ---------------------------------------------------------------------------


def import_documents(
    spark,
    path: str,
    split_archives: bool = True,
    cfg: EmbeddedConfig = EmbeddedConfig(),
) -> DataFrame:
    """The reference's standalone Importer application over a
    directory tree (importer/.../ImporterLauncher.java; also the
    crawler-fs slot — ``binaryFile`` is Spark's local/remote file
    fetcher): read every file as (path, bytes), optionally split
    embedded archive members into child rows, then detect + extract.

    Output schema: ref, parent_ref (null for top-level files),
    embedded_reference, embed_depth, n_bytes, content_type, charset,
    text. The binaryFile source is distributed and prunable — at
    scale, partition pruning and maxPartitionBytes apply as for any
    file scan."""
    base = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.col("path").alias("ref"),
            F.col("content").alias("bytes"),
        )
    )
    docs = base.select(
        "ref",
        F.lit(None).cast("string").alias("parent_ref"),
        F.lit(None).cast("string").alias("embedded_reference"),
        F.lit(0).alias("embed_depth"),
        "bytes",
    )
    if split_archives:
        kids = split_embedded(base, cfg=cfg).select(
            "ref",
            "parent_ref",
            "embedded_reference",
            "embed_depth",
            "bytes",
        )
        docs = docs.unionByName(kids)
    return parse_documents(docs).select(
        "ref",
        "parent_ref",
        "embedded_reference",
        "embed_depth",
        F.length("bytes").alias("n_bytes"),
        "content_type",
        "charset",
        "text",
    )


# ---------------------------------------------------------------------------
# main-content extraction (boilerplate removal)
# ---------------------------------------------------------------------------
# The crawl-to-training-data step neither Tika nor the reference
# performs but every LLM corpus pipeline needs: strip navigation,
# link farms, and footers from fetched HTML, keeping the article
# body. The algorithm is the classic link-density block heuristic
# (jusText / Arc90-readability family): split the page into
# block-level text runs, score each by length and by the fraction of
# its characters living inside <a> tags, keep the prose. Entirely
# deterministic stdlib string work — it runs inside the same fused
# parse pass as link extraction at crawl time, or standalone over a
# stored html column.

_BLOCK_TAGS = (
    "p|div|td|th|li|dd|dt|h1|h2|h3|h4|h5|h6|article|section|main|"
    "blockquote|pre|figcaption|caption|summary|body"
)
# opening tags CAPTURE the tag name; close tags / <br> capture None —
# re.split then alternates [segment, tagname-or-None, segment, ...],
# so each text segment knows which block element opened it
_BLOCK_SPLIT_RE = re.compile(
    r"(?is)<(%s)(?:\s[^>]*)?>|</(?:%s)>|<br\s*/?>" % (
        _BLOCK_TAGS, _BLOCK_TAGS
    )
)
_DROP_RE = re.compile(
    r"(?is)<(script|style|noscript|svg|head|nav|footer|aside|form)"
    r"(?:\s[^>]*)?>.*?</\1>|<!--.*?-->"
)
_A_RE = re.compile(r"(?is)<a(?:\s[^>]*)?>(.*?)</a>")
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


def _block_stats(block_html: str) -> tuple[str, int, int]:
    """-> (plain text, n_chars, n_link_chars) for one block."""
    link_chars = sum(
        len(_strip_markup(m.group(1))) for m in _A_RE.finditer(block_html)
    )
    text = _strip_markup(block_html)
    return text, len(text), link_chars


def extract_main_text(
    html: str | None,
    min_words: int = 10,
    max_link_density: float = 0.33,
) -> str:
    """Article text of an HTML page, boilerplate removed.

    Keep rules (jusText-style, simplified to stay deterministic and
    dependency-free): a block is CONTENT when it has >= ``min_words``
    words AND its link density (chars inside <a> / chars) is <=
    ``max_link_density``; a short heading block is kept when the next
    kept block follows it (title attachment). Everything else —
    nav link lists, footers, share bars — drops. Blocks join with
    a blank line.
    """
    if not html:
        return ""
    body = _DROP_RE.sub(" ", html)
    blocks: list[tuple[str, bool, bool]] = []  # (text, content?, heading?)
    parts = _BLOCK_SPLIT_RE.split(body)
    cur_tag = None
    for j, piece in enumerate(parts):
        if j % 2 == 1:  # captured opening-tag name (None = close/<br>)
            if piece:
                cur_tag = piece.lower()
            continue
        if not piece or not piece.strip():
            continue
        heading = cur_tag in _HEADING_TAGS
        text, n_chars, link_chars = _block_stats(piece)
        if not text:
            continue
        density = (link_chars / n_chars) if n_chars else 1.0
        is_content = (
            len(text.split()) >= min_words
            and density <= max_link_density
        )
        blocks.append((text, is_content, heading))
    kept: list[str] = []
    for i, (text, is_content, heading) in enumerate(blocks):
        if is_content:
            kept.append(text)
        elif heading and any(
            c for _t, c, _h in blocks[i + 1:i + 3]
        ):
            kept.append(text)
    return "\n\n".join(kept)


def main_text_udf(min_words: int = 10, max_link_density: float = 0.33):
    """Arrow-vectorized main-content extraction over an html column."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def udf(html: "pd.Series") -> "pd.Series":
        return html.map(
            lambda h: extract_main_text(
                h, min_words=min_words,
                max_link_density=max_link_density,
            )
            if h is not None
            else None
        )

    return udf
