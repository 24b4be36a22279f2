"""Unit tests for the canonicalizer (reference analog:
crawler/web/src/test/.../url/impl/GenericUrlNormallizerTest.java)."""

from crawlspark.functions.urls import (
    normalize_url,
    resolve_href,
    url_host,
    url_root,
)


def test_default_pipeline():
    # REMOVE_FRAGMENT + LOWERCASE_SCHEME_HOST + REMOVE_DEFAULT_PORT
    assert (
        normalize_url("HTTP://WWW.Example.COM:80/Path/Page.html#frag")
        == "http://www.example.com/Path/Page.html"
    )
    # path case preserved, host case folded
    assert normalize_url("https://A.B:443/KeepCase") == "https://a.b/KeepCase"
    # non-default port kept
    assert normalize_url("http://a.b:8080/x") == "http://a.b:8080/x"


def test_escape_sequences():
    # UPPERCASE_ESCAPESEQUENCE
    assert normalize_url("http://a.b/p%3fq") == "http://a.b/p%3Fq"
    # DECODE_UNRESERVED_CHARACTERS (%41 = 'A', %7E = '~')
    assert normalize_url("http://a.b/%41%7Ez") == "http://a.b/A~z"
    # ENCODE_NON_URI_CHARACTERS (space)
    assert normalize_url("http://a.b/a b") == "http://a.b/a%20b"


def test_empty_path_and_query():
    assert normalize_url("http://a.b") == "http://a.b/"
    assert normalize_url("http://a.b?x=1") == "http://a.b/?x=1"


def test_rejects():
    assert normalize_url(None) is None
    assert normalize_url("") is None
    assert normalize_url("mailto:x@y.z") is None
    assert normalize_url("javascript:void(0)") is None
    assert normalize_url("http://") is None


def test_optional_ops():
    assert (
        normalize_url("http://www.a.b/x", remove_www=True) == "http://a.b/x"
    )
    assert (
        normalize_url("http://a.b/x?b=2&a=1", sort_query=True)
        == "http://a.b/x?a=1&b=2"
    )
    assert (
        normalize_url("http://a.b/d/index.html", remove_directory_index=True)
        == "http://a.b/d/"
    )
    assert (
        normalize_url("http://a.b/d/", remove_trailing_slash=True)
        == "http://a.b/d"
    )
    assert (
        normalize_url(
            "http://a.b/x;jsessionid=abc123?y=1", remove_session_ids=True
        )
        == "http://a.b/x?y=1"
    )


def test_idempotent():
    urls = [
        "HTTP://WWW.Example.COM:80/Path/Page.html#frag",
        "http://a.b/a b?q=%3f",
        "https://x.y:8443/%41",
    ]
    for u in urls:
        once = normalize_url(u)
        assert normalize_url(once) == once


def test_host_and_root():
    assert url_host("http://A.B:8080/x") == "a.b"
    assert url_root("http://A.B:8080/x") == "http://a.b:8080"
    assert url_root("https://a.b:443/x") == "https://a.b"
    assert url_root("notaurl") is None


def test_fast_canonical_regex_is_fixed_point():
    """Every URL the vectorized fast path accepts must be a fixed
    point of normalize_url (hypothesis sweep over the fast grammar +
    adversarial hand cases near its edges)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawlspark.functions.urls import _FAST_CANONICAL_RE

    host_chars = "abcdefghijklmnopqrstuvwxyz0123456789.-"
    path_chars = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
        "-._~:@!$&'()*+,;=/"
    )

    @settings(max_examples=300, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "https", "ftp"]),
        h0=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789"),
        host=st.text(host_chars, max_size=12),
        path=st.text(path_chars, max_size=16),
        query=st.text(path_chars + "?", max_size=10),
    )
    def check(scheme, h0, host, path, query):
        u = f"{scheme}://{h0}{host}/{path}"
        if query:
            u += "?" + query
        if _FAST_CANONICAL_RE.match(u):
            assert normalize_url(u) == u

    check()

    # edges the fast path must NOT accept (normalize changes them)
    for u in [
        "http://a.b",            # empty path -> '/'
        "http://a.b?x=1",        # query with empty path
        "http://a.b/p?",         # lone '?'
        "http://a.b/p#f",        # fragment
        "HTTP://a.b/p",          # scheme case
        "http://A.b/p",          # host case
        "http://a.b:80/p",       # default port
        "http://u@a.b/p",        # userinfo
        "http://a.b/p%3f",       # escape needing uppercase
        "http://a.b/a b",        # raw space
        "http://a.b/p\n",        # trailing newline
        " http://a.b/p",         # leading space
    ]:
        from crawlspark.functions.urls import _FAST_CANONICAL_RE as R

        assert not R.match(u), u


def test_url_host_col_matches_python(spark):
    """url_host_col (the JVM hot-path form) must agree with url_host
    on the canonical grammar it is used on."""
    import pyspark.sql.functions as F

    from crawlspark.functions.urls import url_host_col

    urls = [
        "http://a.b/x",
        "https://host9.example/p/q?r=1",
        "ftp://f.example/",
        "http://a.b:8080/x",
        "http://user:pw@a.b:8080/x?q=1",
        "http://user@a.b/x",
        "http://a.b/path@with/at?q@x=1",
        None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["h"]
        for r in df.select(url_host_col(F.col("url")).alias("h")).collect()
    ]
    want = [url_host(u) for u in urls]
    assert got == want


def test_resolve_href():
    assert resolve_href("http://a.b/d/p.html", "x.html") == "http://a.b/d/x.html"
    assert resolve_href("http://a.b/d/", "/abs") == "http://a.b/abs"
    assert resolve_href("http://a.b/", "http://c.d/e") == "http://c.d/e"
    assert resolve_href("http://a.b/", "javascript:void(0)") is None
    assert resolve_href("http://a.b/", "mailto:x@y") is None
