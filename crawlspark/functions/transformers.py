"""Importer transformer surface: the reference's handler taxonomy as
Column expressions.

The reference's importer applies a chain of ~40 transformers to doc
content/metadata (importer/src/main/java/com/norconex/importer/handler/
transformer/impl/ — SURVEY.md §2.11). Spark-first, each is a one-line
Column function (JVM-side, codegen'd) rather than a handler object;
conditions (handler/condition/impl/) are boolean Columns guarding
application via ``F.when``. This module is the explicit mapping table
so a reference user can find each handler by name.

| reference handler            | here                      |
|------------------------------|---------------------------|
| CharacterCaseTransformer     | character_case            |
| ReplaceTransformer (regex)   | replace_regex             |
| SubstringTransformer         | substring                 |
| StripBefore/After/Between    | strip_before/after/between|
| TextBetweenTransformer       | text_between              |
| TruncateTransformer          | truncate                  |
| CollapseRepeatingTransformer | collapse_repeating        |
| DocumentLengthTransformer    | document_length           |
| CountMatchesTransformer      | count_matches             |
| TitleGeneratorTransformer    | title_generator           |
| LanguageTransformer          | operators.textops.langid  |
| UuidTransformer              | uuid_deterministic        |
| CurrentDate/DateFormat       | date_format_col           |
| ConstantTransformer          | meta_set / F.lit          |
| CopyTransformer              | meta_copy                 |
| RenameTransformer            | meta_rename               |
| DeleteTransformer            | meta_delete               |
| KeepOnlyTransformer          | meta_keep_only            |
| MergeTransformer             | meta_merge                |
| ForceSingleValueTransformer  | meta_force_single         |
| HierarchyTransformer         | meta_hierarchy            |
| TextStatisticsTransformer    | text_statistics           |
| UrlExtractorTransformer      | extract_urls              |
| CsvSplitter                  | split_csv / split_explode |
| DomSplitter                  | split_dom                 |
| XmlStreamSplitter            | split_xml_stream          |
| PdfPageSplitter              | split_pdf_pages           |
| Conditions (Blank/Numeric/…) | cond_* boolean Columns    |

Metadata model: the reference's ``Properties`` is a multi-valued
string map (importer/.../doc/Doc.java:47-75) — here a
``map<string, array<string>>`` Column. The ``meta_*`` family below
operates on that column with JVM-side map functions (map_concat,
map_filter, transform_keys) — no Python, fully codegen'd.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


# -- string ops ---------------------------------------------------------------

def character_case(col, mode: str = "lower") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return {
        "lower": F.lower(c),
        "upper": F.upper(c),
        "title": F.initcap(c),
    }[mode]


def replace_regex(col, pattern: str, replacement: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, replacement)


def substring(col, start: int, length: int | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, start, length if length is not None else 1 << 30)


def strip_before(col, sep: str) -> Column:
    """Remove everything up to and including the first ``sep``."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.instr(c, sep)
    return F.when(idx > 0, F.substring_index(c, sep, -1)).otherwise(c)


def strip_after(col, sep: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring_index(c, sep, 1)


def strip_between(col, open_s: str, close_s: str) -> Column:
    """Remove text between (and including) open/close markers."""
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    pat = _re.escape(open_s) + ".*?" + _re.escape(close_s)
    return F.regexp_replace(c, pat, "")


def text_between(col, open_s: str, close_s: str) -> Column:
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    pat = _re.escape(open_s) + "(.*?)" + _re.escape(close_s)
    return F.regexp_extract(c, pat, 1)


def truncate(col, max_len: int, suffix: str = "") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > max_len,
        F.concat(F.substring(c, 1, max_len - len(suffix)), F.lit(suffix)),
    ).otherwise(c)


def collapse_repeating(col, token: str = " ") -> Column:
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "(" + _re.escape(token) + ")+", token)


# -- derivations ---------------------------------------------------------------

def document_length(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def count_matches(col, pattern: str) -> Column:
    """Occurrences of a regex in the text (CountMatchesTransformer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, pattern)) - 1


def title_generator(col, max_len: int = 60) -> Column:
    """First sentence/fragment, truncated — TitleGeneratorTransformer's
    heuristic mode."""
    c = F.col(col) if isinstance(col, str) else col
    first = F.substring_index(F.trim(c), ".", 1)
    return truncate(first, max_len, "...")


def uuid_deterministic(*cols) -> Column:
    """Stable doc UUID from identity columns (UuidTransformer made
    deterministic: checkpoint replay must regenerate identical ids)."""
    return F.md5(F.concat_ws("\x1f", *[F.col(c) if isinstance(c, str) else c for c in cols]))


def date_format_col(col, fmt: str = "yyyy-MM-dd") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, fmt)


def text_statistics(col) -> Column:
    """struct(chars, words, sentences, avg_word_len) — the
    TextStatisticsTransformer bundle."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.trim(c), r"\s+")
    return F.struct(
        F.length(c).alias("chars"),
        F.size(words).alias("words"),
        (F.size(F.split(c, r"[.!?]")) - 1).alias("sentences"),
        F.round(
            F.length(F.regexp_replace(c, r"\s+", "")) / F.size(words), 4
        ).alias("avg_word_len"),
    )


def extract_urls(col) -> Column:
    """All http(s) URLs in free text (UrlExtractorTransformer)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.regexp_extract_all(c, F.lit(r'(https?://[^\s"<>]+)'), F.lit(1))
    )


def split_explode(df, col, pattern: str, out_col: str = "part"):
    """Splitter family: one row per fragment (Csv/XmlStream splitters)."""
    c = F.col(col) if isinstance(col, str) else col
    return df.withColumn(out_col, F.explode(F.split(c, pattern)))


# -- conditions (handler/condition/impl) ---------------------------------------

# -- metadata (Properties) map ops -------------------------------------------
# meta: map<string, array<string>> — the Doc.metadata model
# (importer/.../doc/Doc.java:47-75; multi-valued string map).

def _meta(meta) -> Column:
    """NULL metadata behaves as an empty Properties (the reference's
    Doc always owns a Properties object): without this coalesce every
    map_filter/map_concat would propagate NULL and e.g. meta_set on a
    null-map doc would yield null instead of a single-entry map."""
    return F.coalesce(
        meta,
        F.map_from_entries(
            F.array().cast("array<struct<key:string,value:array<string>>>")
        ),
    )


def _rx_quote(s: str) -> str:
    """Literal-text regex quoting (java.util.regex.Pattern.quote):
    F.split takes a Java regex, so a literal separator like '|' or '.'
    must be \\Q..\\E-quoted or it splits on every character."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def meta_set(meta, field: str, *values) -> Column:
    """ConstantTransformer: set ``field`` to literal values
    (overwrites — onSet REPLACE, the reference default)."""
    meta = _meta(meta)
    vals = F.array(*[F.lit(str(v)) for v in values])
    return F.map_concat(
        F.map_filter(meta, lambda k, _: k != F.lit(field)),
        F.create_map(F.lit(field), vals),
    )


def meta_copy(meta, src: str, dst: str) -> Column:
    """CopyTransformer: duplicate ``src``'s values under ``dst``
    (no-op when ``src`` is absent)."""
    meta = _meta(meta)
    return F.when(
        meta.getItem(src).isNotNull(),
        F.map_concat(
            F.map_filter(meta, lambda k, _: k != F.lit(dst)),
            F.create_map(F.lit(dst), meta.getItem(src)),
        ),
    ).otherwise(meta)


def meta_rename(meta, src: str, dst: str) -> Column:
    """RenameTransformer: move ``src`` to ``dst``."""
    meta = _meta(meta)
    return F.transform_keys(
        meta, lambda k, _: F.when(k == F.lit(src), F.lit(dst)).otherwise(k)
    )


def meta_delete(meta, *fields: str) -> Column:
    """DeleteTransformer: drop the named fields."""
    meta = _meta(meta)
    arr = F.array(*[F.lit(f) for f in fields])
    return F.map_filter(meta, lambda k, _: ~F.array_contains(arr, k))


def meta_keep_only(meta, *fields: str) -> Column:
    """KeepOnlyTransformer: keep just the named fields."""
    meta = _meta(meta)
    arr = F.array(*[F.lit(f) for f in fields])
    return F.map_filter(meta, lambda k, _: F.array_contains(arr, k))


def meta_merge(meta, dst: str, *srcs: str) -> Column:
    """MergeTransformer: concatenate the values of ``srcs`` (in the
    given order, absent fields skipped) into ``dst``."""
    meta = _meta(meta)
    merged = F.flatten(
        F.filter(
            F.array(*[meta.getItem(s) for s in srcs]),
            lambda a: a.isNotNull(),
        )
    )
    return F.map_concat(
        F.map_filter(meta, lambda k, _: k != F.lit(dst)),
        F.create_map(F.lit(dst), merged),
    )


def meta_force_single(meta, field: str) -> Column:
    """ForceSingleValueTransformer: keep only the first value of
    ``field`` (reference default action: keepFirst)."""
    meta = _meta(meta)
    return F.when(
        F.size(F.coalesce(meta.getItem(field), F.array())) > 1,
        F.map_concat(
            F.map_filter(meta, lambda k, _: k != F.lit(field)),
            F.create_map(
                F.lit(field), F.slice(meta.getItem(field), 1, 1)
            ),
        ),
    ).otherwise(meta)


def meta_hierarchy(meta, src: str, dst: str, sep: str = "/") -> Column:
    """HierarchyTransformer: from a ``sep``-separated path value,
    write every ancestor prefix path as a value of ``dst`` (e.g.
    "/a/b/c" -> ["/a", "/a/b", "/a/b/c"])."""
    meta = _meta(meta)
    first = F.coalesce(
        meta.getItem(src).getItem(0), F.lit(None).cast("string")
    )
    segs = F.filter(F.split(first, _rx_quote(sep)), lambda s: s != F.lit(""))
    prefixes = F.transform(
        segs,
        lambda _, i: F.concat(
            F.lit(sep),
            F.array_join(F.slice(segs, 1, i + F.lit(1)), sep),
        ),
    )
    return F.when(
        first.isNotNull(),
        F.map_concat(
            F.map_filter(meta, lambda k, _: k != F.lit(dst)),
            F.create_map(F.lit(dst), prefixes),
        ),
    ).otherwise(meta)


def split_csv(df, col, delim: str = ",", out_col: str = "cell"):
    """CsvSplitter: one child row per delimited cell with its position
    (importer/.../splitter/impl/CsvSplitter.java analog). The
    separator is LITERAL text (Pattern.quote), matching the
    reference's CSV format — not a regex."""
    return df.select(
        "*",
        F.posexplode(F.split(F.col(col), _rx_quote(delim))).alias(
            "pos", out_col
        ),
    )


def split_dom(
    df,
    col,
    tag: str,
    ref_col: str = "ref",
    out_col: str = "fragment",
):
    """DomSplitter (importer/.../splitter/impl/DomSplitter.java:146-183)
    for an element-TAG selector: one child row per matching element's
    outer markup, with the reference's child-doc contract —
    ``child_ref = <parent ref> + "!" + <embedded ref>`` and the
    embedded reference kept in its own column
    (DocMetaConstants.EMBEDDED_REFERENCE). The reference's embedRef is
    jsoup's cssSelector(); the deterministic analog here is
    ``<tag>:nth(<match index>)``.

    Guard parity (DomSplitter.java:152-158): when exactly ONE element
    matches and it IS the whole body (the parent matching itself), no
    children are produced — otherwise a recursive splitter chain would
    loop forever.

    Spark-first: the DOM walk the reference does in jsoup is, for a
    tag selector, a regexp_extract_all + posexplode — one generated
    projection, no Python, no shuffle. Selectors that genuinely need
    a DOM (``div.story``, ``#main p``, ``ul > li``) route through the
    vendored CSS engine (functions/domselect.py) as an Arrow-batched
    pandas UDF in the same slot — per-element OUTER markup
    re-serialized from the parse tree, document order preserved.
    """
    from crawlspark.functions.domselect import is_bare_tag

    c = F.col(col) if isinstance(col, str) else col
    if not is_bare_tag(tag):
        sel = tag

        @F.pandas_udf("array<string>")
        def _dom_frags(s: pd.Series) -> pd.Series:
            from crawlspark.functions.domselect import select

            out = []
            for doc in s:
                if not doc:
                    out.append([])
                    continue
                nodes = select(doc, sel)
                # DomSplitter.java:152-158 self-match guard: the one
                # match IS the document's single top-level element
                if (
                    len(nodes) == 1
                    and nodes[0].parent is not None
                    and nodes[0].parent.tag == "#root"
                    and sum(
                        1
                        for ch in nodes[0].parent.children
                        if not isinstance(ch, str)
                    )
                    == 1
                ):
                    out.append([])
                    continue
                out.append([n.outer_html() for n in nodes])
            return pd.Series(out)

        embed = F.concat(F.lit(f"{tag}:nth("), F.col("pos"), F.lit(")"))
        return (
            df.select("*", F.posexplode(_dom_frags(c)).alias("pos", out_col))
            .withColumn("embedded_ref", embed)
            .withColumn(
                "child_ref",
                F.concat(F.col(ref_col), F.lit("!"), F.col("embedded_ref")),
            )
            .withColumnRenamed(ref_col, "parent_ref")
        )
    frag_rx = f"(?s)<{tag}[^>]*>.*?</{tag}>"
    frags = F.regexp_extract_all(c, F.lit(frag_rx), F.lit(0))
    whole = F.trim(c)
    self_match = (F.size(frags) == 1) & (frags.getItem(0) == whole)
    frags = F.when(self_match, F.array().cast("array<string>")).otherwise(
        frags
    )
    embed = F.concat(F.lit(f"{tag}:nth("), F.col("pos"), F.lit(")"))
    return (
        df.select(
            "*", F.posexplode(frags).alias("pos", out_col)
        )
        .withColumn("embedded_ref", embed)
        .withColumn(
            "child_ref",
            F.concat(F.col(ref_col), F.lit("!"), F.col("embedded_ref")),
        )
        .withColumnRenamed(ref_col, "parent_ref")
    )


def _sax_split(doc: str, path: list[str]) -> list[str]:
    """XmlStreamSplitter's SAX walk (XmlStreamSplitter.java:181-258):
    stream the document, re-serializing every element whose FULL path
    from the root equals ``path``. Returns the child fragments in
    document order, attributes re-emitted and text XML-escaped exactly
    like the reference's esc()/characters handlers (whitespace-only
    character runs dropped)."""
    import re as _re
    import xml.sax
    from xml.sax.saxutils import escape, quoteattr

    frags: list[str] = []

    class H(xml.sax.ContentHandler):
        def __init__(self) -> None:
            self.cur: list[str] = []
            self.buf: list[str] | None = None

        def startElement(self, name, attrs):
            self.cur.append(name)
            if self.cur == path:
                self.buf = []
            if self.buf is not None:
                a = "".join(
                    f" {k}={quoteattr(attrs[k])}" for k in attrs.getNames()
                )
                self.buf.append(f"<{name}{a}>")

        def characters(self, content):
            if self.buf is not None:
                self.buf.append(escape(_re.sub(r"^\s+$", "", content)))

        def endElement(self, name):
            if self.buf is not None:
                self.buf.append(f"</{name}>")
                if self.cur == path:
                    frags.append("".join(self.buf))
                    self.buf = None
            self.cur.pop()

    try:
        xml.sax.parseString(doc.encode("utf-8", errors="replace"), H())
    except xml.sax.SAXParseException:
        pass  # non-lenient body: malformed XML yields no children
    return frags


def split_xml_stream(
    df,
    col,
    path: str,
    ref_col: str = "ref",
    out_col: str = "fragment",
):
    """XmlStreamSplitter (importer/.../splitter/impl/
    XmlStreamSplitter.java:129-258): split a large XML document on the
    element at the FULL slash-separated ``path`` from the root (e.g.
    ``/animals/species/animal``) — unlike split_dom, an identically
    named element outside that path is NOT split. Child contract
    matches the reference: ``child_ref = parent + "!" + <index>`` with
    the 0-based split index as the embedded reference
    (XmlStreamSplitter.java:225-237).

    Streaming is per-row here (a SAX pass inside an Arrow-batched
    pandas UDF — the genuinely non-columnar slot): each row's XML is
    streamed, never DOM-materialized, so a 1 GB single-document XML
    costs O(depth) memory exactly like the reference."""
    segs = [s for s in path.split("/") if s]

    @F.pandas_udf("array<string>")
    def sax(ser: pd.Series) -> pd.Series:
        return ser.map(lambda x: _sax_split(x, segs) if x else [])

    c = F.col(col) if isinstance(col, str) else col
    return (
        df.select("*", F.posexplode(sax(c)).alias("pos", out_col))
        .withColumn("embedded_ref", F.col("pos").cast("string"))
        .withColumn(
            "child_ref",
            F.concat(F.col(ref_col), F.lit("!"), F.col("embedded_ref")),
        )
        .withColumnRenamed(ref_col, "parent_ref")
    )


def split_pdf_bytes(
    df,
    col,
    ref_col: str = "ref",
    out_col: str = "page_text",
    page_prefix: str = "#",
):
    """PdfPageSplitter over REAL PDF BYTES (importer/.../splitter/impl/
    PdfPageSplitter.java:100-160, the byte-level path): a binary
    column of PDF documents -> one child row per page with the
    reference's child contract (child_ref = ``<parent><prefix><pageNo>``,
    page_number / total_pages metadata; single-page docs annotated
    1/1 under the parent ref, not split). Page walking + text
    extraction use pypdf when importable (the cluster path) and the
    vendored stdlib parser (functions/pdfcodec.py — classic xref,
    FlateDecode, Tj/TJ scan) otherwise, so the real-bytes path runs
    in CI without third-party deps. Arrow-batched; the explode itself
    stays a JVM posexplode."""

    @F.pandas_udf("array<string>")
    def _pages(s: pd.Series) -> pd.Series:
        from crawlspark.functions.pdfcodec import pdf_page_texts

        out = []
        for buf in s:
            if buf is None:
                out.append([])
                continue
            out.append(pdf_page_texts(bytes(buf)))
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    pages = _pages(c)
    return (
        df.withColumn("total_pages", F.size(pages))
        .select("*", F.posexplode(pages).alias("_p0", out_col))
        .withColumn("page_number", F.col("_p0") + 1)
        .drop("_p0")
        .withColumn(
            "child_ref",
            F.when(
                F.col("total_pages") <= 1, F.col(ref_col)
            ).otherwise(
                F.concat(
                    F.col(ref_col),
                    F.lit(page_prefix),
                    F.col("page_number"),
                )
            ),
        )
        .withColumnRenamed(ref_col, "parent_ref")
    )


def split_pdf_pages(
    df,
    col,
    ref_col: str = "ref",
    out_col: str = "page_text",
    page_prefix: str = "#",
):
    """PdfPageSplitter (importer/.../splitter/impl/
    PdfPageSplitter.java:100-160): one child doc per PDF page, child
    ref = ``<parent><prefix><pageNo>`` (DEFAULT_REFERENCE_PAGE_PREFIX
    "#"), with ``page_number``/``total_pages`` metadata
    (DOC_PDF_PAGE_NO / DOC_PDF_TOTAL_PAGES). Single-page documents are
    NOT split (the reference annotates the parent 1/1 and returns) —
    they come back as one row with page_number = total_pages = 1.

    The binary-PDF page walk needs pdfbox/pypdf (absent from this
    container); the implemented path is the extracted-TEXT convention:
    page boundaries are form feeds (\\f — what pdftotext and PDFBox's
    own text stripper emit between pages). A pypdf-backed byte-level
    splitter drops into the same posexplode slot when the library is
    importable."""
    c = F.col(col) if isinstance(col, str) else col
    pages = F.split(c, "\f")
    return (
        df.withColumn("total_pages", F.size(pages))
        .select(
            "*", F.posexplode(pages).alias("_p0", out_col)
        )
        .withColumn("page_number", F.col("_p0") + 1)
        .drop("_p0")
        .withColumn(
            "child_ref",
            F.when(
                F.col("total_pages") <= 1, F.col(ref_col)
            ).otherwise(
                F.concat(
                    F.col(ref_col),
                    F.lit(page_prefix),
                    F.col("page_number"),
                )
            ),
        )
        .withColumnRenamed(ref_col, "parent_ref")
    )


def cond_blank(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (F.trim(c) == "")


def cond_numeric(col, op: str, value: float) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("double")
    return {
        ">": d > value,
        ">=": d >= value,
        "<": d < value,
        "<=": d <= value,
        "==": d == value,
    }[op]


def cond_text(col, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(pattern)


def cond_reference(url_col, pattern: str) -> Column:
    return cond_text(url_col, pattern)


def cond_date(col, op: str, value: str) -> Column:
    """DateCondition (importer/.../condition/impl/DateCondition.java):
    compare a date/timestamp field against a fixed ISO date. (The
    reference's TODAY-relative operands resolve to a fixed date at
    config load; pass that resolved date here — the engine stays
    deterministic, no wall-clock in the plan.)"""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast("timestamp")
    v = F.lit(value).cast("timestamp")
    return {
        ">": d > v,
        ">=": d >= v,
        "<": d < v,
        "<=": d <= v,
        "==": d == v,
    }[op]


def cond_dom(col, tag: str) -> Column:
    """DOMCondition for a tag selector: does the markup contain a
    matching element (same element grammar as split_dom)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(f"(?s)<{tag}[^>]*>.*?</{tag}>")


def apply_when(df, condition: Column, col_name: str, then_expr: Column):
    """Guarded handler application (condition -> transformer), the
    ``if`` wrapper of the reference's handler flow."""
    return df.withColumn(
        col_name, F.when(condition, then_expr).otherwise(F.col(col_name))
    )


# -- remaining named-handler parity (transformer/impl/ round-out) ------------

def charset_transform(col, target: str = "utf-8") -> Column:
    """CharsetTransformer (transformer/impl/Charset*.java): binary
    content -> text in the target charset, source charset detected
    per document (BOM + UTF-8 probe, the parsers.detect_charset
    rules). Arrow-batched — charset detection needs byte-level
    Python, same as the reference needs ICU."""

    @F.pandas_udf("string")
    def _recode(data: pd.Series) -> pd.Series:
        from .parsers import detect_charset

        def one(b):
            if b is None:
                return None
            b = bytes(b)
            text = b.decode(detect_charset(b), errors="replace")
            # target charset round-trip (lossy chars replaced), so
            # the output is guaranteed encodable in `target`
            return text.encode(target, errors="replace").decode(
                target, errors="replace"
            )

        return pd.Series([one(b) for b in data])

    c = F.col(col) if isinstance(col, str) else col
    return _recode(c)


def current_date(now_ms: int, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """CurrentDateTransformer with the clock INJECTED (a config
    value, never a wall-clock read — checkpoint replay must
    regenerate identical stamps; same rule as the WARC sink date)."""
    return F.date_format(
        F.timestamp_millis(F.lit(now_ms)), fmt
    )


def debug_passthrough(df, label: str = "debug", n: int = 5):
    """DebugTransformer: log a sample + schema, return the frame
    unchanged (driver-side peek — NOT in any hot path)."""
    import logging

    log = logging.getLogger("crawlspark.transformers")
    log.info("%s: schema=%s sample=%s", label, df.schema.simpleString(),
             [r.asDict() for r in df.take(n)])
    return df


def field_report(df, meta_col: str = "meta"):
    """FieldReportTransformer: census of metadata fields across the
    corpus — (field, n_docs, n_values). One explode + groupBy."""
    return (
        df.select(F.explode(F.col(meta_col)).alias("field", "vals"))
        .groupBy("field")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("vals")).cast("long").alias("n_values"),
        )
    )


def regex_extract_fields(col, pattern: str, fields: list[str]) -> Column:
    """RegexTransformer's field-extraction mode: capture groups ->
    named metadata entries (group i -> fields[i-1]), as a
    map<string, array<string>> ready for meta_merge. Documents where
    the pattern misses yield empty-string groups, matching
    regexp_extract's no-match contract."""
    c = F.col(col) if isinstance(col, str) else col
    return F.map_from_arrays(
        F.array(*[F.lit(f) for f in fields]),
        F.array(*[
            F.array(F.regexp_extract(c, pattern, i + 1))
            for i in range(len(fields))
        ]),
    )


def save_documents(df, out_dir: str, ref_col: str = "ref",
                   bytes_col: str = "bytes") -> None:
    """SaveDocumentTransformer: write each document's raw bytes to
    disk under a sanitized path derived from its reference —
    distributed (foreachPartition), deterministic names, no driver
    collect. The corpus-dump primitive KeepDownloads-style workflows
    use."""
    import os
    import re as _re

    os.makedirs(out_dir, exist_ok=True)

    def write(rows) -> None:
        for row in rows:
            name = _re.sub(r"[^A-Za-z0-9._-]+", "_", row[ref_col])[:200]
            body = row[bytes_col]
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(bytes(body) if body is not None else b"")

    df.select(ref_col, bytes_col).foreachPartition(write)


def fake_translate_udf():
    """Deterministic stand-in translator for CI — a clearly-marked
    FAKE (no translation service exists in this container): the
    output is the source text tagged ``[src->tgt]``. A real client
    (any service) slots into ``split_translate`` as a pandas UDF of
    the same (text, src, tgt) -> text shape."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def udf(text: pd.Series, src: pd.Series, tgt: pd.Series) -> pd.Series:
        return "[" + src + "->" + tgt + "] " + text.fillna("")

    return udf


def client_translate_udf(client=None, module: str | None = None):
    """Real-translation adapter for ``split_translate`` — the
    import-gated client pattern (same seam as sinks/kafka.py's
    ``send_fn``): CI keeps the deterministic fake, a deployment
    plugs in an installed client without touching the operator.

    The client contract is one batched call per (src, tgt) pair per
    Arrow batch: ``fn(texts: list[str], src: str, tgt: str) ->
    list[str]`` (same length, same order) — so a service client
    amortizes its round-trip over the batch instead of paying one
    RPC per document (TranslatorSplitter.java:150-398 translates
    serially; this is the vectorized shape of that contract).

    * ``client``: the callable itself (must be picklable — it ships
      in the UDF closure).
    * ``module``: an import path ``"package.mod:attr"`` resolved
      LAZILY ON EACH EXECUTOR — the import-gated slot: where the
      package is absent the task raises ImportError naming it, and
      nothing is imported at plan-build time.
    """
    if (client is None) == (module is None):
        raise ValueError(
            "client_translate_udf: pass exactly one of client= or "
            "module="
        )
    import pandas as pd
    from pyspark.sql import types as T

    state: dict = {}

    def _resolve():
        if "fn" not in state:
            if client is not None:
                state["fn"] = client
            else:
                import importlib

                mod_name, _, attr = module.partition(":")
                try:
                    m = importlib.import_module(mod_name)
                except ImportError as exc:
                    raise ImportError(
                        f"client_translate_udf: translation client "
                        f"module {mod_name!r} is not installed on "
                        f"this executor"
                    ) from exc
                state["fn"] = getattr(m, attr or "translate")
        return state["fn"]

    @F.pandas_udf(T.StringType())
    def udf(text: pd.Series, src: pd.Series, tgt: pd.Series) -> pd.Series:
        fn = _resolve()
        out = pd.Series([""] * len(text), dtype=object)
        frame = pd.DataFrame(
            {"t": text.fillna(""), "s": src, "g": tgt}
        )
        for (s, g), grp in frame.groupby(["s", "g"], sort=True):
            translated = fn(grp["t"].tolist(), s, g)
            if len(translated) != len(grp):
                raise RuntimeError(
                    f"translation client returned {len(translated)} "
                    f"texts for {len(grp)} inputs ({s}->{g})"
                )
            out.iloc[grp.index] = list(translated)
        return out

    return udf


def split_translate(
    df,
    target_langs: tuple[str, ...],
    source_lang: str | None = None,
    source_lang_col: str | None = None,
    translate_udf=None,
    ref_col: str = "ref",
    text_col: str = "content",
):
    """TranslatorSplitter analog (importer/.../splitter/impl/
    TranslatorSplitter.java:150-398): one child document per target
    language — child ref ``parent!translation-<lang>`` (:382-383),
    ``embedded_reference = translation-<lang>``, ``language`` set to
    the target and ``translated_from`` to the source (:388-393).
    The source language comes from ``source_lang_col`` when given,
    else the fixed ``source_lang`` (sourceLanguageField /
    sourceLanguage config precedence); missing both raises, like the
    reference's validation (:466).

    Spark shape: explode the target-language array (docs x langs
    rows, no shuffle), then ONE vectorized translate UDF call per
    row — the reference translates serially per doc per language;
    here every (doc, lang) pair is an independent task row. The
    translator is injectable; CI uses the deterministic fake.
    """
    if source_lang_col is None and source_lang is None:
        raise ValueError(
            "split_translate: no source language (set source_lang or "
            "source_lang_col)"
        )
    if not target_langs:
        raise ValueError("split_translate: no target languages")
    tr = translate_udf or fake_translate_udf()
    src = (
        F.col(source_lang_col)
        if source_lang_col is not None
        else F.lit(source_lang)
    )
    out = df.withColumn("translated_from", src).withColumn(
        "language",
        F.explode(F.array(*[F.lit(l) for l in target_langs])),
    )
    embed = F.concat(F.lit("translation-"), F.col("language"))
    return out.select(
        F.concat(F.col(ref_col), F.lit("!"), embed).alias(ref_col),
        embed.alias("embedded_reference"),
        "language",
        "translated_from",
        tr(F.col(text_col), F.col("translated_from"),
           F.col("language")).alias(text_col),
    )
