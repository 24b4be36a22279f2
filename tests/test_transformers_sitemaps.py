"""Unit tests for the importer-transformer surface and sitemap parser."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawlspark.functions import transformers as TR
from crawlspark.functions.sitemaps import (
    parse_sitemap,
    sitemap_locations,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "Hello World. Second sentence!  Extra   spaces", "2021-03-04"),
            (2, "visit http://a.b/x and https://c.d/y now", "2022-12-31"),
            (3, "", None),
        ],
        schema="id int, text string, d string",
    )


def test_string_transformers(spark, df):
    out = df.select(
        TR.character_case("text", "upper").alias("up"),
        TR.replace_regex("text", r"\s+", "_").alias("rep"),
        TR.truncate("text", 11, "...").alias("tr"),
        TR.collapse_repeating("text", " ").alias("col1"),
        TR.strip_after("text", ".").alias("sa"),
        TR.text_between("text", "Hello", "Second").alias("tb"),
        TR.document_length("text").alias("dl"),
        TR.title_generator("text").alias("title"),
    ).collect()
    r = out[0]
    assert r["up"].startswith("HELLO WORLD")
    assert r["rep"].startswith("Hello_World.")
    assert r["tr"] == "Hello Wo..."
    assert "   " not in r["col1"]
    assert r["sa"] == "Hello World"
    assert r["tb"].strip() == "World."
    assert r["dl"] == len("Hello World. Second sentence!  Extra   spaces")
    assert r["title"] == "Hello World"


def test_derivations(spark, df):
    out = df.select(
        "id",
        TR.count_matches("text", r"\s+").alias("nws"),
        TR.uuid_deterministic("id", "text").alias("uid"),
        TR.extract_urls("text").alias("urls"),
        TR.text_statistics("text").alias("st"),
    ).collect()
    assert out[1]["urls"] == ["http://a.b/x", "https://c.d/y"]
    # deterministic uuid: same input -> same id across runs
    assert out[0]["uid"] == out[0]["uid"] and len(out[0]["uid"]) == 32
    assert out[0]["st"]["words"] == 6
    assert out[0]["st"]["sentences"] == 2


def test_conditions(spark, df):
    out = df.select(
        TR.cond_blank("text").alias("b"),
        TR.cond_text("text", "World").alias("t"),
    ).collect()
    assert [r["b"] for r in out] == [False, False, True]
    assert [r["t"] for r in out] == [True, False, False]


def test_apply_when(spark, df):
    out = TR.apply_when(
        df,
        TR.cond_text("text", "World"),
        "text",
        TR.character_case("text", "upper"),
    ).collect()
    assert out[0]["text"].startswith("HELLO")
    assert out[1]["text"].startswith("visit")


SITEMAP_XML = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://a.b/d1/x.html</loc><lastmod>2024-01-02</lastmod>
<changefreq>daily</changefreq><priority>0.8</priority></url>
<url><loc>http://a.b/d1/y.html</loc><priority>oops</priority></url>
<url><loc>http://other.c/z.html</loc></url>
<url><loc></loc></url>
</urlset>"""

INDEX_XML = """<sitemapindex>
<sitemap><loc>http://a.b/sitemap1.xml</loc></sitemap>
<sitemap><loc>http://a.b/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap():
    recs, children = parse_sitemap("http://a.b/sitemap.xml", SITEMAP_XML)
    urls = [r["url"] for r in recs]
    assert urls == ["http://a.b/d1/x.html", "http://a.b/d1/y.html"]
    assert recs[0]["changefreq"] == "daily" and recs[0]["priority"] == 0.8
    # priority parse error -> 0 (SitemapParser.java:118)
    assert recs[1]["priority"] == 0.0
    assert children == []


def test_parse_sitemap_index():
    recs, children = parse_sitemap("http://a.b/sitemap_index.xml", INDEX_XML)
    assert recs == []
    assert children == [
        "http://a.b/sitemap1.xml",
        "http://a.b/sitemap2.xml",
    ]


def test_sitemap_locations():
    locs = sitemap_locations(
        "http://a.b", ["http://a.b/custom_map.xml"]
    )
    assert locs == [
        "http://a.b/custom_map.xml",
        "http://a.b/sitemap.xml",
        "http://a.b/sitemap_index.xml",
    ]


def test_meta_map_ops(spark):
    meta_df = spark.createDataFrame(
        [
            (1, {"title": ["T1", "T2"], "path": ["/a/b/c"]}),
            (2, {"author": ["x"]}),
        ],
        schema="id int, meta map<string, array<string>>",
    )
    m = F.col("meta")
    out = (
        meta_df.select(
            "id",
            "meta",
            TR.meta_set(m, "lang", "en").alias("m_set"),
            TR.meta_copy(m, "title", "headline").alias("m_copy"),
            TR.meta_rename(m, "title", "name").alias("m_ren"),
            TR.meta_delete(m, "title").alias("m_del"),
            TR.meta_keep_only(m, "title").alias("m_keep"),
            TR.meta_merge(m, "all", "title", "author").alias("m_merge"),
            TR.meta_force_single(m, "title").alias("m_single"),
            TR.meta_hierarchy(m, "path", "crumbs").alias("m_hier"),
        )
        .orderBy("id")
        .collect()
    )
    r1, r2 = out
    assert r1["m_set"]["lang"] == ["en"]
    assert r1["m_copy"]["headline"] == ["T1", "T2"]
    assert r1["m_copy"]["title"] == ["T1", "T2"]
    assert "headline" not in r2["m_copy"]  # src absent -> no-op
    assert r1["m_ren"]["name"] == ["T1", "T2"] and "title" not in r1["m_ren"]
    assert "title" not in r1["m_del"] and "path" in r1["m_del"]
    assert set(r1["m_keep"].keys()) == {"title"}
    assert set(r2["m_keep"].keys()) == set()
    assert r1["m_merge"]["all"] == ["T1", "T2"]  # author absent in row 1
    assert r2["m_merge"]["all"] == ["x"]
    assert r1["m_single"]["title"] == ["T1"]
    assert r2["m_single"] == r2["meta"]  # single-valued field untouched
    assert r1["m_hier"]["crumbs"] == ["/a", "/a/b", "/a/b/c"]
    assert "crumbs" not in r2["m_hier"]  # path absent -> no-op


def test_split_csv(spark):
    df2 = spark.createDataFrame(
        [(1, "a,b,c")], schema="id int, row string"
    )
    cells = TR.split_csv(df2, "row").collect()
    assert [(r["pos"], r["cell"]) for r in cells] == [
        (0, "a"),
        (1, "b"),
        (2, "c"),
    ]


def test_sitemap_entry_cap_logged(caplog, monkeypatch):
    """sitemaps.org 50k-entry cap: an oversized file is truncated at
    the cap with a warning, never silently (protects the per-host
    collect_list in SitemapResolution)."""
    import logging

    from crawlspark.functions import sitemaps as sm

    monkeypatch.setattr(sm, "MAX_SITEMAP_ENTRIES", 5)
    urls = "".join(
        f"<url><loc>http://h.x/p{i}</loc></url>" for i in range(8)
    )
    xml = f"<urlset>{urls}</urlset>"
    with caplog.at_level(logging.WARNING, logger="crawlspark.sitemaps"):
        recs, kids = sm.parse_sitemap("http://h.x/sitemap.xml", xml)
    assert len(recs) == 5
    assert [r["url"] for r in recs] == [f"http://h.x/p{i}" for i in range(5)]
    assert any("protocol cap" in r.message for r in caplog.records)

    idx = "".join(
        f"<sitemap><loc>http://h.x/s{i}.xml</loc></sitemap>"
        for i in range(8)
    )
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="crawlspark.sitemaps"):
        recs, kids = sm.parse_sitemap(
            "http://h.x/sitemap.xml", f"<sitemapindex>{idx}</sitemapindex>"
        )
    assert len(kids) == 5
    assert any("protocol cap" in r.message for r in caplog.records)


def test_split_dom(spark):
    """DomSplitter parity: child ref = parent + '!' + embedRef, all
    matching elements at any depth, self-match guard
    (DomSplitter.java:146-183)."""
    df = spark.createDataFrame(
        [
            (
                "http://h/a",
                '<html><body><div class="c"><item>one</item></div>'
                "<item id=\"2\">two</item></body></html>",
            ),
            # exactly one match == the whole body -> NO children
            ("http://h/self", "<item>solo</item>"),
            ("http://h/none", "<p>nothing here</p>"),
        ],
        schema="ref string, html string",
    )
    out = (
        TR.split_dom(df, "html", "item")
        .select("parent_ref", "pos", "child_ref", "embedded_ref", "fragment")
        .collect()
    )
    assert len(out) == 2
    assert out[0]["parent_ref"] == "http://h/a"
    assert out[0]["child_ref"] == "http://h/a!item:nth(0)"
    assert out[0]["fragment"] == "<item>one</item>"
    assert out[1]["fragment"] == '<item id="2">two</item>'
    assert out[1]["embedded_ref"] == "item:nth(1)"


def test_split_xml_stream_path_scoped(spark):
    """XmlStreamSplitter parity (XmlStreamSplitter.java:129-258): the
    reference's own /animals/species/animal example — an <animal>
    OUTSIDE the full path is not split; attributes re-emitted; embed
    ref is the 0-based index."""
    xml = (
        "<animals>"
        '<species name="mouse"><animal><name>Itchy</name>'
        "<race>cartoon</race></animal></species>"
        '<species name="cat"><animal><name>Scratchy</name>'
        "<race>cartoon</race></animal></species>"
        "<pen><animal><name>Decoy</name></animal></pen>"
        "</animals>"
    )
    df = spark.createDataFrame(
        [("http://h/zoo", xml), ("http://h/bad", "<oops")],
        schema="ref string, xml string",
    )
    out = (
        TR.split_xml_stream(df, "xml", "/animals/species/animal")
        .select("parent_ref", "child_ref", "embedded_ref", "fragment")
        .collect()
    )
    assert len(out) == 2  # Itchy + Scratchy; Decoy skipped; bad XML -> none
    assert out[0]["child_ref"] == "http://h/zoo!0"
    assert out[0]["fragment"] == (
        "<animal><name>Itchy</name><race>cartoon</race></animal>"
    )
    assert out[1]["embedded_ref"] == "1"
    assert "Scratchy" in out[1]["fragment"]


def test_split_xml_stream_escaping():
    """Text content re-escaped like the reference's esc() and
    whitespace-only runs dropped (XmlStreamSplitter.java:207-213)."""
    frags = TR._sax_split(
        "<r> <x><v>a &amp; b &lt; c</v></x> </r>", ["r", "x"]
    )
    assert frags == ["<x><v>a &amp; b &lt; c</v></x>"]


def test_split_pdf_pages(spark):
    """PdfPageSplitter parity: form-feed page walk, '#'-prefixed child
    refs, single-page docs annotated 1/1 and not split
    (PdfPageSplitter.java:100-160)."""
    df = spark.createDataFrame(
        [
            ("http://h/doc.pdf", "page one\ftwo\fthree"),
            ("http://h/single.pdf", "only page"),
        ],
        schema="ref string, text string",
    )
    out = (
        TR.split_pdf_pages(df, "text")
        .select(
            "parent_ref", "child_ref", "page_number", "total_pages",
            "page_text",
        )
        .collect()
    )
    multi = [r for r in out if r["parent_ref"] == "http://h/doc.pdf"]
    single = [r for r in out if r["parent_ref"] == "http://h/single.pdf"]
    assert [r["page_number"] for r in multi] == [1, 2, 3]
    assert multi[1]["child_ref"] == "http://h/doc.pdf#2"
    assert multi[0]["total_pages"] == 3
    assert multi[2]["page_text"] == "three"
    assert len(single) == 1
    assert single[0]["page_number"] == 1
    assert single[0]["total_pages"] == 1
    assert single[0]["child_ref"] == "http://h/single.pdf"  # unsplit


def test_cond_date_and_dom(spark, df):
    out = df.select(
        "id",
        TR.cond_date("d", ">", "2022-01-01").alias("after"),
        TR.cond_dom(F.lit("<p><item x=1>v</item></p>"), "item").alias(
            "has_item"
        ),
        TR.cond_dom(F.lit("<p>no</p>"), "item").alias("no_item"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["after"] is False  # 2021-03-04
    assert by_id[2]["after"] is True   # 2022-12-31
    assert by_id[3]["after"] is None   # null date propagates
    assert by_id[1]["has_item"] and not by_id[1]["no_item"]


def test_split_dom_css_selector(spark):
    """DomSplitter with a real CSS selector routes through the
    vendored DOM engine: class-scoped descendant split, outer markup
    re-serialized, self-match guard preserved, document order kept."""
    df = spark.createDataFrame(
        [
            (
                "http://h/a",
                '<html><body><div class="wrap">'
                '<item kind="x">one</item><skip>no</skip>'
                "<item>two</item></div>"
                "<item>outside</item></body></html>",
            ),
            # one match == the single top-level element -> no children
            ("http://h/self", '<item class="wrap">solo</item>'),
        ],
        schema="ref string, html string",
    )
    out = (
        TR.split_dom(df, "html", "div.wrap item")
        .select("parent_ref", "pos", "child_ref", "fragment")
        .collect()
    )
    assert [(r["parent_ref"], r["pos"], r["fragment"]) for r in out] == [
        ("http://h/a", 0, '<item kind="x">one</item>'),
        ("http://h/a", 1, "<item>two</item>"),
    ]
    assert out[0]["child_ref"] == "http://h/a!div.wrap item:nth(0)"
    # self-match guard through the DOM path too
    solo = TR.split_dom(
        spark.createDataFrame(
            [("http://h/s", '<item class="w">solo</item>')],
            schema="ref string, html string",
        ),
        "html",
        "item.w",
    ).collect()
    assert solo == []


def test_remaining_named_transformers(spark, tmp_path):
    """Charset / CurrentDate / FieldReport / Regex-extract /
    SaveDocument round out the reference's named transformer list."""
    from crawlspark.functions.transformers import (
        charset_transform,
        current_date,
        field_report,
        regex_extract_fields,
        save_documents,
    )

    df = spark.createDataFrame(
        [
            ("d1", bytearray("café utf8".encode("utf-8"))),
            ("d2", bytearray("caf\xe9 latin".encode("latin-1"))),
        ],
        "ref string, bytes binary",
    )
    got = {
        r["ref"]: r["text"]
        for r in df.withColumn(
            "text", charset_transform("bytes")
        ).collect()
    }
    assert got == {"d1": "café utf8", "d2": "café latin"}

    # injected clock -> deterministic stamp
    stamped = df.select(
        current_date(1735689600000, "yyyy-MM-dd").alias("d")
    ).first()
    assert stamped["d"] == "2025-01-01"

    # regex field extraction -> meta map
    rx = spark.createDataFrame(
        [("item-42 by alice",), ("no match here",)], "t string"
    ).select(
        regex_extract_fields(
            "t", r"item-(\d+) by (\w+)", ["item_id", "author"]
        ).alias("m")
    ).collect()
    assert rx[0]["m"] == {"item_id": ["42"], "author": ["alice"]}
    assert rx[1]["m"] == {"item_id": [""], "author": [""]}

    # field census over a meta column
    meta_df = spark.createDataFrame(
        [({"a": ["1"], "b": ["x", "y"]},), ({"a": ["2"]},)],
        "meta map<string, array<string>>",
    )
    rep = {
        r["field"]: (r["n_docs"], r["n_values"])
        for r in field_report(meta_df).collect()
    }
    assert rep == {"a": (2, 2), "b": (1, 2)}

    # raw corpus dump: sanitized deterministic names, exact bytes
    save_documents(df, str(tmp_path / "dump"))
    import os

    names = sorted(os.listdir(tmp_path / "dump"))
    assert names == ["d1", "d2"]
    with open(tmp_path / "dump" / "d2", "rb") as f:
        assert f.read() == "caf\xe9 latin".encode("latin-1")


def test_split_translate_contract(spark):
    """TranslatorSplitter.java:382-393 child contract: ref suffix,
    embedded_reference, language/translated_from metadata; source
    from field beats fixed config; validation errors."""
    import pytest

    from crawlspark.functions.transformers import split_translate

    docs = spark.createDataFrame(
        [("doc:1", "hello", "en"), ("doc:2", "hallo", "de")],
        "ref string, content string, lang string",
    )
    out = split_translate(
        docs, ("fr", "es"), source_lang_col="lang"
    ).collect()
    got = {r["ref"]: r for r in out}
    assert set(got) == {
        "doc:1!translation-fr", "doc:1!translation-es",
        "doc:2!translation-fr", "doc:2!translation-es",
    }
    r = got["doc:1!translation-fr"]
    assert r["embedded_reference"] == "translation-fr"
    assert r["language"] == "fr"
    assert r["translated_from"] == "en"
    assert r["content"] == "[en->fr] hello"  # deterministic CI fake
    assert got["doc:2!translation-es"]["content"] == "[de->es] hallo"

    # fixed source language when no field
    fixed = split_translate(
        docs.drop("lang"), ("fr",), source_lang="en"
    ).collect()
    assert all(r["translated_from"] == "en" for r in fixed)

    # custom translator slots in (same (text, src, tgt) shape)
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def upper_tr(text: pd.Series, src: pd.Series,
                 tgt: pd.Series) -> pd.Series:
        return text.str.upper()

    custom = split_translate(
        docs, ("fr",), source_lang_col="lang", translate_udf=upper_tr
    ).collect()
    assert {r["content"] for r in custom} == {"HELLO", "HALLO"}

    with pytest.raises(ValueError, match="no source language"):
        split_translate(docs, ("fr",))
    with pytest.raises(ValueError, match="no target languages"):
        split_translate(docs, (), source_lang="en")


def test_client_translate_adapter_seam(spark, tmp_path):
    """client_translate_udf: the import-gated real-client slot. A
    client registered as an importable module (simulating an
    installed translation package) is resolved lazily on executors
    and called ONCE per (src,tgt) pair per batch; a missing module
    raises ImportError naming it; passing both/neither knobs raises."""
    import pytest

    from crawlspark.functions.transformers import (
        client_translate_udf,
        split_translate,
    )

    # a fake INSTALLED client package (kafka-python pattern: the test
    # stands in for the real dependency), shipped to executors the
    # way a deployment ships any client: addPyFile / --py-files
    mod_file = tmp_path / "fake_mt_client.py"
    mod_file.write_text(
        "def translate(texts, src, tgt):\n"
        "    return [f'<{src}:{tgt}>{t}' for t in texts]\n"
    )
    spark.sparkContext.addPyFile(str(mod_file))
    docs = spark.createDataFrame(
        [("r1", "hello"), ("r2", "world")],
        "ref string, content string",
    ).coalesce(1)
    out = {
        (r["ref"], r["language"]): r["content"]
        for r in split_translate(
            docs,
            ("fr", "de"),
            source_lang="en",
            translate_udf=client_translate_udf(
                module="fake_mt_client:translate"
            ),
        ).collect()
    }
    assert out[("r1!translation-fr", "fr")] == "<en:fr>hello"
    assert out[("r2!translation-de", "de")] == "<en:de>world"
    assert len(out) == 4

    # missing module: the task fails with a clear ImportError
    docs = spark.createDataFrame([("r", "x")], "ref string, content string")
    bad = split_translate(
        docs, ("fr",), source_lang="en",
        translate_udf=client_translate_udf(
            module="definitely_not_installed_mt"
        ),
    )
    with pytest.raises(Exception, match="not installed"):
        bad.collect()

    with pytest.raises(ValueError, match="exactly one"):
        client_translate_udf()
    with pytest.raises(ValueError, match="exactly one"):
        client_translate_udf(client=lambda t, s, g: t, module="x:y")
