"""Unit tests for link/canonical/robots-meta extraction (reference
analog: crawler/web/src/test/.../link/impl/HtmlLinkExtractorTest.java)."""

from crawlspark.functions.links import (
    extract_canonical,
    extract_links,
    extract_robots_meta,
)

HTML = """
<html><head>
<base href="http://a.b/dir/">
<link rel="canonical" href="http://a.b/canonical"/>
<meta name="robots" content="noindex,nofollow">
</head><body>
<a href="page1.html">one</a>
<a rel="nofollow" href="skipme.html">nf</a>
<img src="/img/pic.png">
<iframe src="http://c.d/frame"></iframe>
<a href="page1.html">dup</a>
<a href="mailto:x@y">mail</a>
<meta http-equiv="refresh" content="0; url=http://a.b/refreshed">
</body></html>
"""


def test_extract_links_order_and_filters():
    links = extract_links("http://a.b/start.html", HTML)
    urls = [u for u, _ in links]
    assert urls == [
        "http://a.b/dir/page1.html",  # base-href resolved
        "http://a.b/img/pic.png",
        "http://c.d/frame",
        "http://a.b/refreshed",
    ]
    assert [p for _, p in links] == [0, 1, 2, 3]


def test_nofollow_and_schemes():
    html = '<a href="ftp://f.g/x">f</a><a href="file:///etc/passwd">no</a>'
    links = extract_links("http://a.b/", html)
    assert [u for u, _ in links] == ["ftp://f.g/x"]


def test_max_url_length():
    long_href = "http://a.b/" + "x" * 3000
    assert extract_links("http://a.b/", f'<a href="{long_href}">l</a>') == []


def test_canonical_head_only():
    assert extract_canonical("http://a.b/start.html", HTML) == "http://a.b/canonical"
    body_only = "<body><link rel=canonical href=http://x.y/c></body>"
    # no <head>: falls back to doc prefix scan — still found here
    assert extract_canonical("http://a.b/", body_only) == "http://x.y/c"
    # reversed attribute order
    rev = "<head><link href='http://x.y/c2' rel='canonical'></head>"
    assert extract_canonical("http://a.b/", rev) == "http://x.y/c2"
    assert extract_canonical("http://a.b/", "<p>none</p>") is None


def test_robots_meta():
    assert extract_robots_meta(HTML) == (True, True)
    assert extract_robots_meta('<meta name="robots" content="noindex">') == (
        True,
        False,
    )
    assert extract_robots_meta("<p>x</p>") == (False, False)
    assert extract_robots_meta(None) == (False, False)


def test_extract_links_regex():
    from crawlspark.functions.links import extract_links_regex

    text = (
        "see https://a.b/x and also https://a.b/x again, "
        "plus http://c.d/y?z=1 but not ftp://no.pe/f"
    )
    got = extract_links_regex(
        "http://base/", text, [r"https?://[^\s,]+"]
    )
    assert got == [("https://a.b/x", 0), ("http://c.d/y?z=1", 1)]
    assert extract_links_regex("http://base/", None, [r"x"]) == []


def test_extract_links_xml_feed():
    from crawlspark.functions.links import extract_links_xml_feed

    rss = (
        "<rss><channel>"
        "<item><link>http://a.b/one</link>"
        '<enclosure url="/media/ep1.mp3" type="audio/mpeg"/></item>'
        '<item><link href="http://a.b/atomish"/></item>'
        "<item><link>relative/two</link></item>"
        "</channel></rss>"
    )
    got = extract_links_xml_feed("http://feeds.a.b/f.xml", rss)
    urls = [u for u, _ in got]
    assert urls == [
        "http://a.b/one",
        "http://feeds.a.b/media/ep1.mp3",
        "http://a.b/atomish",
        "http://feeds.a.b/relative/two",
    ]


def test_extract_links_dom():
    from crawlspark.functions.links import extract_links_dom

    html = (
        '<html><body><area href="/map1">'
        '<a href="/skip-not-area">x</a>'
        '<area shape="rect" href="http://o.t/map2"></body></html>'
    )
    got = extract_links_dom("http://h.x/page", html, "area")
    assert got == [
        ("http://h.x/map1", 0),
        ("http://o.t/map2", 1),
    ]
    assert extract_links_dom("http://h.x/", None, "a") == []


def test_extract_links_dom_css_selectors():
    """Selector depth beyond a bare tag (DomLinkExtractor.java jsoup
    grammar): class, id, attribute, descendant and direct-child
    combinators all walk the real DOM (functions/domselect.py);
    pseudo-classes raise instead of silently matching nothing."""
    import pytest

    from crawlspark.functions.links import extract_links_dom

    html = (
        "<html><body>"
        '<div class="story lead"><a href="/in-story">s</a>'
        '<ul><li><a href="/in-li" rel="nofollow">l</a></li></ul></div>'
        '<div class="aside"><a href="/in-aside">a</a></div>'
        '<a id="primary" href="/primary">p</a>'
        "</body></html>"
    )
    base = "http://h.x/page"

    got = extract_links_dom(base, html, "div.story a")
    assert [u for u, _ in got] == ["http://h.x/in-story", "http://h.x/in-li"]

    got = extract_links_dom(base, html, "a#primary")
    assert [u for u, _ in got] == ["http://h.x/primary"]

    got = extract_links_dom(base, html, "a[rel=nofollow]")
    assert [u for u, _ in got] == ["http://h.x/in-li"]

    # direct child: the story div's IMMEDIATE a only, not the li one
    got = extract_links_dom(base, html, "div.story > a")
    assert [u for u, _ in got] == ["http://h.x/in-story"]

    # multi-class compound + backtracking shape (a > b c)
    got = extract_links_dom(base, html, "div.story.lead a")
    assert [u for u, _ in got] == ["http://h.x/in-story", "http://h.x/in-li"]

    with pytest.raises(ValueError, match="pseudo-class"):
        extract_links_dom(base, html, "a:visited")
