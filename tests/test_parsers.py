"""DefaultParser-class parsing: content-type/charset detection,
recursive embedded-archive splitting (child contract = the
reference's ``parent!member`` refs, package-file type, depth cap,
skip lists — RecursiveEmbeddedSplitter.java:66-200), and stdlib text
extraction (HTML/XML/PDF/JSON/plain)."""

import gzip
import io
import tarfile
import zipfile

import pytest

from crawlspark.functions.parsers import (
    EmbeddedConfig,
    detect_charset,
    detect_content_type,
    extract_text,
    parse_documents,
    split_embedded,
)
from crawlspark.functions.pdfcodec import build_pdf
from crawlspark.functions.pngcodec import encode_png


def _zip(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, body in entries.items():
            zf.writestr(zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0)), body)
    return buf.getvalue()


def _tar(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in entries.items():
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    return buf.getvalue()


def _gz(body: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(body)
    return buf.getvalue()


def test_detect_content_type_magic_and_shape():
    import numpy as np

    png = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    cases = [
        (build_pdf(["x"]), "application/pdf"),
        (png, "image/png"),
        (b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (b"GIF89a...", "image/gif"),
        (b"RIFF\x00\x00\x00\x00WEBPVP8 ", "image/webp"),
        (_zip({"a.txt": b"x"}), "application/zip"),
        (_gz(b"payload"), "application/gzip"),
        (_tar({"a.txt": b"x"}), "application/x-tar"),
        (b"<!DOCTYPE html><html><body>hi</body></html>", "text/html"),
        (b"  <html lang='en'><p>hi</p></html>", "text/html"),
        (b"<?xml version='1.0'?><root/>", "application/xml"),
        (b'{"k": ["v", 1]}', "application/json"),
        ("plain text café".encode(), "text/plain"),
        (b"\x00\x01\x02\x03 garbage \x80\x81", "application/octet-stream"),
        (None, "application/octet-stream"),
        (b"", "application/octet-stream"),
    ]
    for data, want in cases:
        assert detect_content_type(data) == want, (want, data[:20])


def test_detect_charset_boms_and_probe():
    assert detect_charset("café".encode()) == "utf-8"
    assert detect_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert detect_charset("hi".encode("utf-16")) in (
        "utf-16-le", "utf-16-be"
    )
    assert detect_charset(b"caf\xe9 latin") == "latin-1"
    assert detect_charset(b"") == "utf-8"


def test_extract_text_by_type():
    html = (b"<html><head><style>p{}</style><script>x<y</script></head>"
            b"<body><p>Hello &amp; <b>world</b></p></body></html>")
    assert extract_text(html) == "Hello & world"
    assert extract_text(b"<?xml version='1.0'?><a><b>deep</b> text</a>") == (
        "deep text"
    )
    assert extract_text(build_pdf(["page one", "page two"])) == (
        "page one\npage two"
    )
    assert extract_text(b'{"title": "T", "tags": ["a", "b"], "n": 3}') == (
        "T a b"
    )
    assert extract_text("café plain".encode()) == "café plain"
    assert extract_text(b"\x00\x01\x80binary") == ""
    assert extract_text(None) == ""


def test_split_embedded_recursive_contract():
    inner_zip = _zip({"deep.txt": b"deep text"})
    outer = _zip({
        "a.txt": b"alpha",
        "docs/b.html": b"<html><body>bee</body></html>",
        "nested.zip": inner_zip,
    })
    out = {
        r["ref"]: r
        for r in [
            {
                "ref": ref,
                "embedded_reference": name,
                "embedded_type": etype,
                "embed_depth": depth,
                "content_type": ctype,
                "bytes": body,
            }
            for ref, name, etype, depth, ctype, body in _collect(outer)
        ]
    }
    assert set(out) == {
        "doc!a.txt", "doc!docs/b.html", "doc!nested.zip",
        "doc!nested.zip!deep.txt",
    }
    assert out["doc!a.txt"]["content_type"] == "text/plain"
    assert out["doc!docs/b.html"]["content_type"] == "text/html"
    assert out["doc!nested.zip"]["content_type"] == "application/zip"
    deep = out["doc!nested.zip!deep.txt"]
    assert deep["embed_depth"] == 2
    assert deep["embedded_reference"] == "deep.txt"
    assert deep["embedded_type"] == "package-file"
    assert deep["bytes"] == b"deep text"


def _collect(data: bytes, cfg: EmbeddedConfig = EmbeddedConfig()):
    from crawlspark.functions.parsers import _walk_embedded

    out: list = []
    _walk_embedded("doc", data, cfg, 0, out)
    return [
        (r["ref"], r["embedded_reference"], r["embedded_type"],
         r["embed_depth"], r["content_type"], r["bytes"])
        for r in out
    ]


def test_split_embedded_depth_cap_and_skips():
    nested = _zip({"in.zip": _zip({"x.txt": b"x"})})
    # depth 1: the inner zip appears as a member but is not descended
    refs = [r[0] for r in _collect(
        nested, EmbeddedConfig(max_embedded_depth=1)
    )]
    assert refs == ["doc!in.zip"]
    # skip list drops text members but keeps descending
    refs = [r[0] for r in _collect(
        _zip({"a.txt": b"x", "b.zip": _zip({"c.txt": b"y"})}),
        EmbeddedConfig(skip_embedded_content_types=("text/plain",)),
    )]
    assert refs == ["doc!b.zip"]


def test_split_embedded_gzip_and_tar_names():
    rows = _collect(_gz(b"hello gz"))
    # container ref 'doc' has no .gz suffix -> synthesized member name
    assert rows[0][0] == "doc!doc.out" and rows[0][5] == b"hello gz"
    rows = _collect(_tar({"t/a.txt": b"tar text"}))
    assert rows[0][0] == "doc!t/a.txt"


def test_split_embedded_corrupt_archive_is_loud():
    bad = b"PK\x03\x04" + b"\x00" * 40  # zip magic, garbage body
    with pytest.raises(ValueError, match="bad archive"):
        _collect(bad)


def test_split_embedded_spark(spark):
    """The Spark stage: archive binary column -> child rows, then
    parse_documents extracts text per detected type."""
    outer = _zip({
        "a.txt": "café text".encode(),
        "n.zip": _zip({"p.pdf": build_pdf(["inner pdf page"])}),
    })
    df = spark.createDataFrame(
        [("http://h/arch.zip", bytearray(outer)),
         ("http://h/plain", bytearray(b"not an archive"))],
        "ref string, bytes binary",
    )
    kids = split_embedded(df).cache()
    rows = {r["ref"]: r for r in kids.collect()}
    assert set(rows) == {
        "http://h/arch.zip!a.txt",
        "http://h/arch.zip!n.zip",
        "http://h/arch.zip!n.zip!p.pdf",
    }
    assert rows["http://h/arch.zip!n.zip!p.pdf"]["embed_depth"] == 2
    parsed = {
        r["ref"]: (r["content_type"], r["text"])
        for r in parse_documents(kids).collect()
    }
    assert parsed["http://h/arch.zip!a.txt"] == (
        "text/plain", "café text"
    )
    assert parsed["http://h/arch.zip!n.zip!p.pdf"] == (
        "application/pdf", "inner pdf page"
    )
    kids.unpersist()


def test_parse_documents_detect_columns(spark):
    df = spark.createDataFrame(
        [
            ("a", bytearray(b"<html><body>x</body></html>")),
            ("b", bytearray("café".encode())),
            ("c", bytearray(build_pdf(["pg"]))),
            ("d", None),
        ],
        "ref string, bytes binary",
    )
    got = {
        r["ref"]: (r["content_type"], r["charset"], r["text"])
        for r in parse_documents(df).collect()
    }
    assert got["a"] == ("text/html", "utf-8", "x")
    assert got["b"] == ("text/plain", "utf-8", "café")
    assert got["c"] == ("application/pdf", None, "pg")
    assert got["d"] == ("application/octet-stream", None, "")


def test_parse_documents_ocr_slot(spark):
    """The image-only-document OCR slot (Tika TesseractOCRParser
    analog): without an ocr_fn an image stays a typed binary leaf
    (text ''); with the in-container bitmap reader the parser
    recovers the rendered text from real PNG bytes; a custom callable
    slots in unchanged (the translator-client injection pattern)."""
    from crawlspark.functions.ocr import render_text_png

    df = spark.createDataFrame(
        [
            ("img", bytearray(render_text_png("READ ME 42"))),
            ("htm", bytearray(b"<html><body>x</body></html>")),
        ],
        "ref string, bytes binary",
    )
    plain = {
        r["ref"]: (r["content_type"], r["text"])
        for r in parse_documents(df).collect()
    }
    assert plain["img"] == ("image/png", "")
    ocr = {
        r["ref"]: (r["content_type"], r["text"])
        for r in parse_documents(df, ocr_fn="bitmap").collect()
    }
    assert ocr["img"] == ("image/png", "READ ME 42")
    assert ocr["htm"] == ("text/html", "x")  # non-images unaffected
    custom = {
        r["ref"]: r["text"]
        for r in parse_documents(
            df, ocr_fn=lambda d, ct: f"LEN{len(d)}"
        ).collect()
    }
    assert custom["img"].startswith("LEN")


def test_cli_import_directory(spark, tmp_path):
    """`crawlspark import`: a directory tree of mixed files -> parsed
    parquet with archive members as child rows (the standalone
    Importer application, ImporterLauncher.java analog)."""
    from crawlspark.cli import main

    src = tmp_path / "files"
    (src / "sub").mkdir(parents=True)
    (src / "page.html").write_bytes(
        b"<html><body>web page</body></html>"
    )
    (src / "sub" / "doc.pdf").write_bytes(build_pdf(["pdf body"]))
    (src / "bundle.zip").write_bytes(
        _zip({"inner.txt": b"zipped text"})
    )
    out = tmp_path / "parsed"
    assert main(
        ["import", "--in", str(src), "--out", str(out)]
    ) == 0
    rows = {
        r["ref"].split("/")[-1].split("!")[-1]: r
        for r in spark.read.parquet(str(out)).collect()
    }
    assert rows["page.html"]["content_type"] == "text/html"
    assert rows["page.html"]["text"] == "web page"
    assert rows["doc.pdf"]["content_type"] == "application/pdf"
    assert rows["doc.pdf"]["text"] == "pdf body"
    assert rows["bundle.zip"]["content_type"] == "application/zip"
    kid = rows["inner.txt"]
    assert kid["embed_depth"] == 1
    assert kid["parent_ref"].endswith("bundle.zip")
    assert kid["text"] == "zipped text"
    # --no-split-embedded keeps only the 3 top-level files
    out2 = tmp_path / "parsed2"
    assert main(
        ["import", "--in", str(src), "--out", str(out2),
         "--no-split-embedded"]
    ) == 0
    assert spark.read.parquet(str(out2)).count() == 3


# ---------------------------------------------------------------------------
# office containers (OOXML + ODF)
# ---------------------------------------------------------------------------

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_A = 'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'


def _docx(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t>{p}</w:t></w:r></w:p>" for p in paragraphs
    )
    return _zip({
        "[Content_Types].xml": b"<Types/>",
        "word/document.xml": (
            f'<w:document {_W}><w:body>{body}</w:body></w:document>'
        ).encode(),
    })


def _xlsx(strings: list[str]) -> bytes:
    sst = "".join(f"<si><t>{s}</t></si>" for s in strings)
    return _zip({
        "[Content_Types].xml": b"<Types/>",
        "xl/workbook.xml": b"<workbook/>",
        "xl/sharedStrings.xml": f"<sst>{sst}</sst>".encode(),
        "xl/worksheets/sheet1.xml": b"<worksheet/>",
    })


def _pptx(slides: list[list[str]]) -> bytes:
    entries = {
        "[Content_Types].xml": b"<Types/>",
        "ppt/presentation.xml": b"<presentation/>",
    }
    for i, texts in enumerate(slides, 1):
        body = "".join(
            f"<a:p><a:r><a:t>{t}</a:t></a:r></a:p>" for t in texts
        )
        entries[f"ppt/slides/slide{i}.xml"] = (
            f"<sld {_A}>{body}</sld>".encode()
        )
    return _zip(entries)


def _odt(paragraphs: list[str]) -> bytes:
    t = 'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    body = "".join(
        f"<text:p>{p}</text:p>" for p in paragraphs
    )
    return _zip({
        "mimetype": b"application/vnd.oasis.opendocument.text",
        "content.xml": (
            f"<office:document-content {t} "
            'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0">'
            f"<office:body>{body}</office:body>"
            "</office:document-content>"
        ).encode(),
    })


def test_detect_office_containers():
    from crawlspark.functions.parsers import (
        DOCX_TYPE, PPTX_TYPE, XLSX_TYPE, detect_content_type,
    )

    assert detect_content_type(_docx(["hi"])) == DOCX_TYPE
    assert detect_content_type(_xlsx(["a"])) == XLSX_TYPE
    assert detect_content_type(_pptx([["s"]])) == PPTX_TYPE
    assert (
        detect_content_type(_odt(["p"]))
        == "application/vnd.oasis.opendocument.text"
    )
    # a plain zip (no office markers) stays a zip
    assert (
        detect_content_type(_zip({"readme.txt": b"x"}))
        == "application/zip"
    )


def test_extract_office_text():
    from crawlspark.functions.parsers import extract_text

    assert (
        extract_text(_docx(["first para", "second para"]))
        == "first para\nsecond para"
    )
    assert extract_text(_xlsx(["cell one", "cell two"])) == (
        "cell one\ncell two"
    )
    assert extract_text(_pptx([["title"], ["bullet a", "bullet b"]])) == (
        "title\nbullet a\nbullet b"
    )
    # ODF mixed content: text directly in the paragraph plus spans
    from crawlspark.functions import parsers as P
    odt = _zip({
        "mimetype": b"application/vnd.oasis.opendocument.text",
        "content.xml": (
            b'<doc xmlns:text="urn:x"><text:p>lead '
            b"<text:span>inner</text:span> tail</text:p></doc>"
        ),
    })
    assert P.extract_text(odt) == "lead inner tail"


def test_office_docs_flow_through_parse_documents(spark):
    from crawlspark.functions.parsers import DOCX_TYPE, parse_documents

    df = spark.createDataFrame(
        [("d1", bytearray(_docx(["spark text"]))),
         ("d2", bytearray(b"plain body"))],
        "doc_id string, bytes binary",
    )
    rows = {
        r["doc_id"]: r
        for r in parse_documents(df).select(
            "doc_id", "content_type", "text"
        ).collect()
    }
    assert rows["d1"]["content_type"] == DOCX_TYPE
    assert rows["d1"]["text"] == "spark text"
    assert rows["d2"]["content_type"] == "text/plain"


# ---------------------------------------------------------------------------
# RFC-822 / MIME email
# ---------------------------------------------------------------------------


def _eml(attachments: dict[str, bytes] | None = None,
         html_only: bool = False) -> bytes:
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = "alice@example.com"
    msg["To"] = "bob@example.com"
    msg["Subject"] = "quarterly numbers"
    msg["Date"] = "Mon, 17 Aug 2026 10:00:00 +0000"
    if html_only:
        msg.set_content(
            "<html><body><p>see the <b>chart</b></p></body></html>",
            subtype="html",
        )
    else:
        msg.set_content("hello from the body")
    for name, body in (attachments or {}).items():
        msg.add_attachment(
            body, maintype="application", subtype="octet-stream",
            filename=name,
        )
    return bytes(msg)


def test_detect_and_extract_email():
    from crawlspark.functions.parsers import (
        detect_content_type, extract_text,
    )

    raw = _eml()
    assert detect_content_type(raw) == "message/rfc822"
    assert extract_text(raw) == "quarterly numbers\nhello from the body"
    # html-only multipart falls back to stripped markup
    assert extract_text(_eml(html_only=True)) == (
        "quarterly numbers\nsee the chart"
    )
    # ordinary prose with a colon is NOT an email
    assert detect_content_type(b"note: buy milk\nand bread\n") == (
        "text/plain"
    )


def test_email_attachments_split_recursively():
    inner_zip = _zip({"inner.txt": b"deep text"})
    raw = _eml(attachments={"report.csv": b"a,b\n1,2\n",
                            "bundle.zip": inner_zip})
    kids = _collect(raw)
    by_ref = {k[0]: k for k in kids}
    ref, name, etype, depth, ctype, body = by_ref["doc!report.csv"]
    assert etype == "mail-attachment" and body == b"a,b\n1,2\n"
    # the zip attachment recurses into its own members
    ref, name, etype, depth, ctype, body = by_ref[
        "doc!bundle.zip!inner.txt"
    ]
    assert body == b"deep text" and etype == "package-file"
    assert depth == 2


def _mbox(msgs: list[bytes]) -> bytes:
    out = []
    for m in msgs:
        out.append(b"From alice@example.com Mon Aug 17 10:00:00 2026")
        # mboxo body escape for lines starting "From "
        out.append(
            b"\n".join(
                b">" + ln if ln.startswith(b"From ") else ln
                for ln in m.rstrip(b"\n").split(b"\n")
            )
        )
        out.append(b"")  # blank separator line
    return b"\n".join(out) + b"\n"


def test_mbox_detect_split_and_extract():
    from crawlspark.functions.parsers import (
        detect_content_type, extract_text,
    )

    m1 = _eml()
    m2 = _eml(html_only=True)
    raw = _mbox([m1, m2])
    assert detect_content_type(raw) == "application/mbox"
    kids = _collect(raw)
    refs = [k[0] for k in kids]
    assert "doc!msg-00000.eml" in refs and "doc!msg-00001.eml" in refs
    by_ref = {k[0]: k for k in kids}
    assert by_ref["doc!msg-00000.eml"][2] == "mail-message"
    assert by_ref["doc!msg-00000.eml"][4] == "message/rfc822"
    # the split member parses back as the original message
    assert extract_text(by_ref["doc!msg-00000.eml"][5]) == (
        "quarterly numbers\nhello from the body"
    )
    # mbox-level extraction joins the per-message texts
    assert extract_text(raw) == (
        "quarterly numbers\nhello from the body\n"
        "quarterly numbers\nsee the chart"
    )


def test_mbox_from_escape_roundtrip():
    from crawlspark.functions.parsers import extract_text

    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = "a@x.com"
    msg["To"] = "b@y.com"
    msg["Subject"] = "s"
    msg["Date"] = "Mon, 17 Aug 2026 10:00:00 +0000"
    msg.set_content("line one\nFrom here on out\nline three")
    raw = _mbox([bytes(msg)])
    kids = _collect(raw)
    assert len(kids) == 1
    assert extract_text(kids[0][5]) == (
        "s\nline one\nFrom here on out\nline three"
    )


def test_ndjson_detect_and_extract():
    from crawlspark.functions.parsers import (
        detect_content_type, extract_text,
    )

    nd = (b'{"title": "row one", "n": 1}\n'
          b'{"title": "row two", "tags": ["a", "b"]}\n')
    assert detect_content_type(nd) == "application/x-ndjson"
    assert extract_text(nd) == "row one\nrow two a b"
    # a single JSON document stays application/json
    assert detect_content_type(b'{"k": "v"}') == "application/json"
    # broken lines are skipped, not fatal (lenient like Tika text)
    messy = b'{"a": "keep"}\nnot json\n{"b": "also"}\n'
    # a non-JSON line makes detection fall through to text/plain,
    # but explicit-ctype extraction still harvests the good lines
    assert detect_content_type(messy) == "text/plain"
    assert extract_text(messy, "application/x-ndjson") == "keep\nalso"


# --- main-content extraction (boilerplate removal) --------------------------


PAGE = """
<html><head><title>T</title><style>p{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<div class="menu"><a href="/x">one</a> <a href="/y">two</a> <a href="/z">three</a></div>
<h1>The Article Title</h1>
<p>This is the first real paragraph of the article body with plenty of
words that establish it firmly as content rather than navigation.</p>
<p>A second substantial paragraph continues the story with even more
prose so the block classifier has no trouble keeping it around.</p>
<p>Read <a href="/next">the next installment</a> of this long series
whenever it happens to ship to subscribers.</p>
<div><a href="/t1">tag1</a> <a href="/t2">tag2</a> <a href="/t3">tag3</a>
<a href="/t4">tag4</a> <a href="/t5">tag5</a> <a href="/t6">tag6</a>
<a href="/t7">tag7</a> <a href="/t8">tag8</a> <a href="/t9">tag9</a>
<a href="/ta">tag10</a> <a href="/tb">tag11</a> <a href="/tc">tag12</a></div>
<footer>Copyright 2026 <a href="/legal">Legal</a> <a href="/priv">Privacy</a></footer>
</body></html>
"""


def test_extract_main_text_keeps_article_drops_chrome():
    from crawlspark.functions.parsers import extract_main_text

    got = extract_main_text(PAGE)
    assert "first real paragraph" in got
    assert "second substantial paragraph" in got
    # heading attached to following content
    assert got.startswith("The Article Title")
    # mixed block below the link-density cap stays
    assert "next installment" in got
    # nav / link farm / footer dropped
    assert "Home" not in got and "About" not in got
    assert "tag1" not in got and "tag12" not in got
    assert "Copyright" not in got
    # CSS never leaks
    assert "color:red" not in got


def test_extract_main_text_link_density_cap():
    from crawlspark.functions.parsers import extract_main_text

    linky = (
        "<body><p>"
        + " ".join(f'<a href="/{i}">word{i} word{i}b</a>' for i in range(8))
        + "</p></body>"
    )
    assert extract_main_text(linky) == ""
    prose = "<body><p>" + " ".join(
        f"word{i}" for i in range(15)
    ) + "</p></body>"
    assert "word14" in extract_main_text(prose)


def test_extract_main_text_edge_inputs():
    from crawlspark.functions.parsers import extract_main_text

    assert extract_main_text(None) == ""
    assert extract_main_text("") == ""
    assert extract_main_text("just bare text with not enough words") == ""
    long_bare = " ".join(f"w{i}" for i in range(30))
    assert extract_main_text(f"<p>{long_bare}</p>") == long_bare


def test_main_text_udf(spark):
    from crawlspark.functions.parsers import main_text_udf

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, PAGE), (2, None)], "id long, html string"
    ).select("id", main_text_udf()(F.col("html")).alias("main"))
    rows = {r["id"]: r["main"] for r in df.collect()}
    assert "first real paragraph" in rows[1]
    assert rows[2] is None


# --- RTF -----------------------------------------------------------------


def test_rtf_detect_and_extract():
    from crawlspark.functions.parsers import (
        detect_content_type,
        extract_text,
    )

    rtf = (
        rb"{\rtf1\ansi\ansicpg1252\deff0"
        rb"{\fonttbl{\f0\fswiss Helvetica;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"{\*\generator CrawlWriter 1.0;}"
        rb"{\info{\title Secret Title}}"
        rb"\f0\fs24 Hello \b bold\b0  world.\par"
        rb"Caf\'e9 costs 3 \'80 today.\par"
        rb"Tab\tab separated \{braces\} and a \\ backslash.\par}"
    )
    assert detect_content_type(rtf) == "application/rtf"
    text = extract_text(rtf)
    assert "Hello bold world." in text
    assert "Caf\u00e9 costs 3 \u20ac today." in text
    assert "Tab\tseparated {braces} and a \\ backslash." in text
    # font table / colortbl / generator / info never leak
    assert "Helvetica" not in text
    assert "CrawlWriter" not in text and "Secret Title" not in text
    # three \par -> line structure
    assert text.count("\n") == 2


def test_rtf_unicode_and_uc_fallback_skip():
    from crawlspark.functions.parsers import extract_text

    # \uN emits the code point and swallows \uc fallback chars;
    # negative N wraps mod 65536 (RTF's signed-16-bit form)
    rtf = rb"{\rtf1 \uc1\u945? and \u-3841? ok}"
    text = extract_text(rtf)
    assert text == "\u03b1 and \uf0ff ok"
    # \uc2 swallows two fallback characters
    rtf2 = rb"{\rtf1 \uc2\u945?? end}"
    assert extract_text(rtf2) == "\u03b1 end"


def test_epub_detect_and_extract_spine_order():
    """EPUB = OCF zip: detected by the stored-first mimetype member
    (Tika EpubParser analog); text extracted chapter-by-chapter in
    SPINE order, not archive/alphabetical order."""
    from crawlspark.functions.parsers import (
        EPUB_TYPE,
        detect_content_type,
        extract_text,
        make_epub_bytes,
    )

    b = make_epub_bytes(["zulu last-name chapter", "alpha second"])
    assert detect_content_type(b) == EPUB_TYPE
    assert extract_text(b) == "zulu last-name chapter\nalpha second"
    # deterministic bytes (oracle fixture contract)
    assert b == make_epub_bytes(["zulu last-name chapter", "alpha second"])


def test_epub_fallbacks():
    import io
    import zipfile

    from crawlspark.functions.parsers import (
        EPUB_TYPE,
        detect_content_type,
        extract_text,
    )

    # mimetype says epub but no container.xml/OPF: lenient fallback
    # extracts every (X)HTML member in name order
    buf = io.BytesIO()
    epoch = (1980, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype", epoch),
            EPUB_TYPE,
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            zipfile.ZipInfo("b.xhtml", epoch),
            "<html><body>second</body></html>",
        )
        zf.writestr(
            zipfile.ZipInfo("a.xhtml", epoch),
            "<html><body>first</body></html>",
        )
    raw = buf.getvalue()
    assert detect_content_type(raw) == EPUB_TYPE
    assert extract_text(raw) == "first\nsecond"
    # truncated blob degrades to plain zip -> empty text, no raise
    assert extract_text(raw[:30]) == ""
    # OPF pointing at missing members -> falls back, never raises
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype", epoch),
            EPUB_TYPE,
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr(
            zipfile.ZipInfo("META-INF/container.xml", epoch),
            '<container xmlns="urn:x"><rootfiles><rootfile '
            'full-path="missing.opf"/></rootfiles></container>',
        )
    assert extract_text(buf2.getvalue()) == ""
