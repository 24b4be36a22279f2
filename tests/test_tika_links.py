"""TikaLinkExtractor analog tests (reference:
crawler/web/src/test/.../link/impl/HtmlDomTikaLinkExtractorTest.java —
the Tika-specific branches: tel:/mailto: reported, link-tag body URLs
NOT reported, nofollow rel variants, link data text/title/rel, quoted
meta-refresh URLs)."""

from crawlspark.functions.links import (
    extract_links,
    extract_links_tika,
    extract_links_tika_urls,
)

BASE = "http://www.site.test/"
DIR = BASE + "sub/"
DOC = DIR + "page.html"

PAGE = """
<html lang="en">
<head>
  <title>extractor exercise</title>
  <meta charset="UTF-8">
  <meta http-equiv="refresh" content="10;URL='/hop-target.html'" />
  <base href=""/>
</head>
<body>
Intro text.
<script><!---
 document.write('<img src="/never/script/'+v+'" border="0">');
// --->
</script>
<script language="javascript"><!---
 document.write('<a href="/never/anchor/'+w+'">' + 'x' + '</a>');
// --->
</script>
<a href="//www.site.test/dslash.html">Double Leading Slash</a>
<a href="?q=mark">Question mark</a>
<a href="#frag">Hash mark</a>
<a href="/rooted.html">Rooted</a>
<a href="sibling.html">Sibling</a>
<a href="http://other.test/abs.html">Absolute</a>
<a href="http&#x3a;&#x2f;&#x2f;www&#x2e;site&#x2e;test&#x2f;entities">Encoded</a>
<a alt="foo"
href="/twoLines.html">Across two lines</a>
<a badhref="/never/badattr.html">not an href</a>
<a title="ATitle" href="titled.html" target="TOP">Titled anchor</a>
<div data-url="/never/dataURL.html"></div>
<img src="/pic1.gif" />
<img src="/pic2.gif" >
<object data="/never/objectData.html"></object>
<a href = "/never/nf.html" rel = " nofollow ">No follow</a>
<a href="" class="logo" title="home">Empty href skipped</a>
<a href="/?a=1&amp;b=2&amp;c=3">Amp unescape</a>
<link>/never/bodyUrlNoAttr.html</link>
<link attr="ignored">/never/bodyUrlAttr.html</link>
<a href="tel:123">Phone</a>
<a href="mailto:someone@site.test">Email</a>
<!--
<a href="/never/commented.html">In a comment</a>
-->
<a href="/two spaces.html">Spaces kept</a>
</body>
</html>
"""


def test_tika_extraction_expected_set():
    links = extract_links_tika(DOC, PAGE)
    urls = {d["url"] for d in links}
    assert urls == {
        BASE + "hop-target.html",
        BASE + "dslash.html",
        DOC + "?q=mark",
        DOC + "#frag",
        BASE + "rooted.html",
        DIR + "sibling.html",
        "http://other.test/abs.html",
        BASE + "entities",
        BASE + "twoLines.html",
        DIR + "titled.html",
        BASE + "pic1.gif",
        BASE + "pic2.gif",
        BASE + "?a=1&b=2&c=3",
        "tel:123",
        "mailto:someone@site.test",
        BASE + "two spaces.html",
    }
    # none of the must-not-extract candidates leak through
    assert not any("/never/" in u for u in urls)


def test_tika_link_data():
    by_url = {d["url"]: d for d in extract_links_tika(DOC, PAGE)}
    titled = by_url[DIR + "titled.html"]
    assert titled["text"] == "Titled anchor"
    assert titled["title"] == "ATitle"
    assert titled["tag"] == "a" and titled["attr"] == "href"
    img = by_url[BASE + "pic1.gif"]
    assert img["tag"] == "img" and img["attr"] == "src"
    assert img["text"] is None
    # document order is dense and starts at 0
    poss = [d["pos"] for d in extract_links_tika(DOC, PAGE)]
    assert poss == list(range(len(poss)))


def test_tika_anchor_text_is_tag_stripped():
    html = '<a href="/x.html">[<font color="red">6</font>]Yes Text</a>'
    (link,) = extract_links_tika(BASE, html)
    assert link["text"] == "[6]Yes Text"


def test_tika_nofollow_rel_variants():
    html = """
    <a href="/nf-spaces.html" rel=" nofollow ">A</a>
    <a href="/nf-case.html" rel="NoFoLlOw">B</a>
    <a href="/nf-multi.html" rel="noopener nofollow ugc">C</a>
    <a href="/follow.html" rel="noopener">D</a>
    """
    urls = [d["url"] for d in extract_links_tika(BASE, html)]
    assert urls == [BASE + "follow.html"]
    # ignore_nofollow keeps them all
    urls = [
        d["url"]
        for d in extract_links_tika(BASE, html, ignore_nofollow=True)
    ]
    assert urls == [
        BASE + "nf-spaces.html",
        BASE + "nf-case.html",
        BASE + "nf-multi.html",
        BASE + "follow.html",
    ]


def test_tika_link_and_script_tags_take_src_href():
    html = """
    <link rel="stylesheet" href="/style.css">
    <script src="/app.js"></script>
    <iframe src="/frame.html"></iframe>
    """
    links = extract_links_tika(BASE, html)
    assert [(d["tag"], d["url"]) for d in links] == [
        ("link", BASE + "style.css"),
        ("script", BASE + "app.js"),
        ("iframe", BASE + "frame.html"),
    ]
    assert links[0]["rel"] == "stylesheet"


def test_tika_ignore_link_data():
    html = '<a href="/x.html" title="T">text</a>'
    (link,) = extract_links_tika(BASE, html, ignore_link_data=True)
    assert link["url"] == BASE + "x.html"
    assert link["text"] is None and link["title"] is None


def test_tika_base_href():
    html = """
    <html><head><base href="http://elsewhere.test/root/"></head><body>
    <a href="a/b.html">rel</a>
    <a href="/d.html">rooted</a>
    <a href="http://third.test/e.html">abs</a>
    </body></html>
    """
    urls = [d["url"] for d in extract_links_tika(DOC, html)]
    assert urls == [
        "http://elsewhere.test/root/a/b.html",
        "http://elsewhere.test/d.html",
        "http://third.test/e.html",
    ]


def test_quoted_meta_refresh_also_in_html_extractor():
    # the shared regex upgrade benefits the default extractor too
    html = (
        "<meta http-equiv='refresh' "
        "content='0; url=\"/quoted.html\"'>"
    )
    assert [u for u, _ in extract_links(BASE, html)] == [
        BASE + "quoted.html"
    ]


def test_tika_urls_adapter_contract():
    pairs = extract_links_tika_urls(DOC, PAGE)
    assert all(isinstance(u, str) and isinstance(p, int) for u, p in pairs)
    assert [p for _, p in pairs] == list(range(len(pairs)))


def test_tika_udf_roundtrip(spark):
    from crawlspark.functions.links import extract_links_tika_udf

    df = spark.createDataFrame(
        [(BASE, '<a href="/u.html" title="T">anchor text</a>')],
        schema="url string, html string",
    ).select(extract_links_tika_udf("url", "html").alias("links"))
    row = df.collect()[0]
    (link,) = row["links"]
    assert link["url"] == BASE + "u.html"
    assert link["pos"] == 0
    assert link["text"] == "anchor text"
    assert link["title"] == "T"
