"""Real-socket HTTP fetcher parity: the same site served by a local
HTTP server and crawled over real sockets must produce the identical
fetch sequence, outcomes and documents as the pages-table join mode.

Covers the HttpClientFetcher.java:315-402 fetch capture, the
ApacheRedirectCaptureStrategy capture-don't-follow contract, the
MultiFetcher.java:94-138 transient retry, and the
StandardRobotsTxtProvider.java:104-113 robots one-redirect retry.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.httpfetch import (
    HttpFetcherConfig,
    fetch_robots_df,
    http_fetch_batches,
    make_http_fetcher,
)

RULES = "User-agent: *\nDisallow: /private\n"


def _page(*links: str) -> str:
    a = "".join(f'<a href="{l}">x</a>' for l in links)
    return f"<html><head><title>t</title></head><body>{a}</body></html>"


@pytest.fixture(scope="module")
def server():
    routes: dict = {}
    flaky_hits = {"n": 0}

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/flaky":
                flaky_hits["n"] += 1
                if flaky_hits["n"] <= 2:
                    self.send_response(503)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = b"<html><body>ok</body></html>"
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/html; charset=utf-8"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            st, hdrs, body = routes.get(
                self.path, (404, {}, b"<html><body>nope</body></html>")
            )
            self.send_response(st)
            for k, v in hdrs.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_HEAD(self):
            st, hdrs, body = routes.get(
                self.path, (404, {}, b"")
            )
            self.send_response(st)
            for k, v in hdrs.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    html_hdr = {"Content-Type": "text/html; charset=utf-8"}

    def add(path, html):
        routes[path] = (200, dict(html_hdr), html.encode())

    add("/", _page(f"{base}/a", "/b", "/private/x", "/redir", "/missing"))
    add("/a", _page("/b"))
    add("/b", _page())
    add("/private/x", _page())
    routes["/redir"] = (301, {"Location": "/a"}, b"")
    routes["/robots.txt"] = (302, {"Location": "/rules.txt"}, b"")
    routes["/rules.txt"] = (
        200,
        {"Content-Type": "text/plain"},
        RULES.encode(),
    )
    yield base, routes
    srv.shutdown()


def _pages_table(spark, base, routes):
    rows = []
    for path, (st, hdrs, body) in routes.items():
        if path in ("/robots.txt", "/rules.txt"):
            continue
        redirect = hdrs.get("Location")
        if redirect and not redirect.startswith("http"):
            redirect = base + redirect
        rows.append(
            (base + path, st, body.decode() or None, redirect)
        )
    rows.append((base + "/missing", 404, "<html><body>nope</body></html>", None))
    return spark.createDataFrame(
        rows, "url string, status int, html string, redirect_to string"
    )


def test_robots_fetched_with_redirect_retry(spark, server):
    base, _ = server
    roots = spark.createDataFrame(
        [("127.0.0.1", base)], "host string, root string"
    )
    got = fetch_robots_df(spark, roots).collect()
    assert len(got) == 1
    assert got[0]["body"] == RULES


def test_transient_retry_inside_fetch_slot(server):
    base, _ = server
    gen = http_fetch_batches(HttpFetcherConfig(retries=2))
    out = next(gen(iter([pd.DataFrame({"url": [base + "/flaky"]})])))
    # two 503s then 200 — retried inside the slot (MultiFetcher)
    assert int(out["http_status"].iloc[0]) == 200
    assert "ok" in out["html"].iloc[0]


def test_socket_crawl_matches_join_crawl(spark, server, tmp_path):
    base, routes = server
    cfg = CrawlConfig(max_depth=3, default_delay_ms=1000)
    robots_direct = spark.createDataFrame(
        [("127.0.0.1", RULES)], "host string, body string"
    )
    eng_join = CrawlEngine(
        spark,
        str(tmp_path / "join"),
        cfg,
        _pages_table(spark, base, routes),
        robots_direct,
    )
    eng_join.bootstrap([base + "/"])
    eng_join.run()

    roots = spark.createDataFrame(
        [("127.0.0.1", base)], "host string, root string"
    )
    robots_fetched = fetch_robots_df(spark, roots)
    eng_sock = CrawlEngine(
        spark,
        str(tmp_path / "sock"),
        cfg,
        None,
        robots_fetched,
        fetcher=make_http_fetcher(
            HttpFetcherConfig(connect_timeout_s=5, read_timeout_s=5)
        ),
    )
    eng_sock.bootstrap([base + "/"])
    eng_sock.run()

    a = eng_join.fetch_log().toPandas()
    b = eng_sock.fetch_log().toPandas()
    assert a["url"].tolist() == b["url"].tolist()
    assert a["outcome"].tolist() == b["outcome"].tolist()
    # robots honored over real sockets: /private/x never fetched
    assert not any("/private/" in u for u in b["url"])
    # the redirect was captured, not followed: /redir fetched once,
    # /a fetched as its own entry
    da = eng_join.docs_df().toPandas().sort_values("image_id")
    db = eng_sock.docs_df().toPandas().sort_values("image_id")
    assert da["image_id"].tolist() == db["image_id"].tolist()
    assert da["checksum"].tolist() == db["checksum"].tolist()


def test_head_headers_df(spark, server):
    """Real HEAD requests produce the engine's headers-dim schema —
    Last-Modified/ETag captured, no body fetched (the HttpMethod.HEAD
    directive over sockets)."""
    from crawlspark.sources.httpfetch import fetch_headers_df

    base, routes = server
    routes["/stamped"] = (
        200,
        {
            "Content-Type": "text/html",
            "Last-Modified": "Wed, 01 May 2024 00:00:00 GMT",
            "ETag": '"v42"',
        },
        b"<html><body>s</body></html>",
    )
    urls = spark.createDataFrame(
        [(f"{base}/stamped",), (f"{base}/missing",)], "url string"
    )
    got = {r["url"]: r for r in fetch_headers_df(spark, urls).collect()}
    s = got[f"{base}/stamped"]
    assert s["h_status"] == 200
    assert s["last_modified"] == "Wed, 01 May 2024 00:00:00 GMT"
    assert s["etag"] == '"v42"'
    assert got[f"{base}/missing"]["h_status"] == 404


def test_fetch_sitemaps_df(spark, server):
    """Sitemap bodies fetched over real sockets (redirect honored,
    404 -> null) and parsed by the standard parser."""
    from crawlspark.functions.sitemaps import parse_sitemap
    from crawlspark.sources.httpfetch import fetch_sitemaps_df

    base, routes = server
    routes["/sitemap.xml"] = (301, {"Location": "/sm2.xml"}, b"")
    routes["/sm2.xml"] = (
        200,
        {"Content-Type": "application/xml"},
        b'<?xml version="1.0"?><urlset>'
        b"<url><loc>http://h.x/a</loc><lastmod>2024-01-02</lastmod></url>"
        b"<url><loc>http://h.x/b</loc></url></urlset>",
    )
    locs = spark.createDataFrame(
        [
            ("127.0.0.1", f"{base}/sitemap.xml"),
            ("127.0.0.1", f"{base}/no-such-map.xml"),
        ],
        "host string, url string",
    )
    got = fetch_sitemaps_df(spark, locs).collect()
    bodies = [r["xml"] for r in got]
    assert sum(b is not None for b in bodies) == 1
    xml = next(b for b in bodies if b)
    entries, children = parse_sitemap("http://h.x/sitemap.xml", xml)
    assert children == []
    assert [e["url"] for e in entries] == ["http://h.x/a", "http://h.x/b"]


def test_discover_sitemaps_df(spark, server):
    """Robots Sitemap: directive wins over default paths; hosts with
    no resolvable sitemap yield null xml; resolution stops at the
    first 200 (locator + resolver over real sockets)."""
    from crawlspark.sources.httpfetch import (
        discover_sitemaps_df,
        fetch_robots_df,
    )

    base, routes = server
    routes["/rules.txt"] = (
        200,
        {"Content-Type": "text/plain"},
        (RULES + f"Sitemap: {base}/custom-map.xml\n").encode(),
    )
    routes["/custom-map.xml"] = (
        200,
        {"Content-Type": "application/xml"},
        b'<?xml version="1.0"?><urlset>'
        b"<url><loc>http://h.x/from-directive</loc></url></urlset>",
    )
    roots = spark.createDataFrame(
        [("127.0.0.1", base), ("no-such-host.invalid", "http://no-such-host.invalid")],
        "host string, root string",
    )
    robots = fetch_robots_df(spark, roots)
    got = {
        r["host"]: r["xml"]
        for r in discover_sitemaps_df(spark, roots, robots).collect()
    }
    assert "from-directive" in (got["127.0.0.1"] or "")
    assert got["no-such-host.invalid"] is None


def test_engine_headers_dim_from_real_head(spark, server, tmp_path):
    """The metadata-checksum band runs over a REAL-HEAD headers dim
    (no pages table): engine accepts headers_df, tracks metadata
    checksums, and the crawl completes with the same fetch sequence."""
    from crawlspark.sources.httpfetch import fetch_headers_df

    base, routes = server
    # headers for every route the crawl can touch
    urls = spark.createDataFrame(
        [
            (base + p,)
            for p in routes
            if p not in ("/robots.txt", "/rules.txt")
        ]
        + [(base + "/missing",)],
        "url string",
    )
    headers = fetch_headers_df(spark, urls)
    cfg = CrawlConfig(
        max_depth=3,
        default_delay_ms=1000,
        metadata_checksummer="last_modified",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "head"),
        cfg,
        None,
        spark.createDataFrame([("127.0.0.1", RULES)], "host string, body string"),
        fetcher=make_http_fetcher(
            HttpFetcherConfig(connect_timeout_s=5, read_timeout_s=5)
        ),
        headers_df=headers,
    )
    eng.bootstrap([base + "/"])
    eng.run()
    log = eng.fetch_log().toPandas()
    assert len(log) > 0
    assert not any("/private/" in u for u in log["url"])


def test_max_body_bytes_truncates_during_stream(server):
    """The body cap is enforced WHILE streaming (preload_content=False
    + chunked read) — a large response is cut at max_body_bytes and the
    fetch still succeeds; an uncapped fetch of the same route returns
    the full body."""
    from crawlspark.sources.httpfetch import fetch_url

    base, routes = server
    big = "<html><body>" + ("z" * 500_000) + "</body></html>"
    routes["/big"] = (
        200,
        {"Content-Type": "text/html; charset=utf-8"},
        big.encode(),
    )
    capped = HttpFetcherConfig(max_body_bytes=1024)
    st, body, redir = fetch_url(f"{base}/big", capped)
    assert st == 200 and redir is None
    assert len(body.encode()) <= 1024
    assert body == big[: len(body)]
    uncapped = HttpFetcherConfig(max_body_bytes=0)
    st2, body2, _ = fetch_url(f"{base}/big", uncapped)
    assert st2 == 200 and body2 == big
    # pool still usable after the truncated (closed) connection
    st3, body3, _ = fetch_url(f"{base}/big", capped)
    assert st3 == 200 and len(body3.encode()) <= 1024


def test_e2e_socket_crawl_with_sitemaps_matches_join_and_oracle(
    spark, tmp_path
):
    """The composed end-to-end --http path (the MockServer feature
    suite shape, WebCrawlingTestCapturer.java:41-66): ONE crawl where
    robots, the sitemap tree and every page are fetched over real
    sockets — asserted against BOTH the pages-join engine and the
    pure-Python CrawlSimulator for the identical fetch order,
    outcomes, and committed document set."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from crawlspark.oracle.simulator import CrawlSimulator
    from crawlspark.sources.httpfetch import discover_sitemaps_df

    routes: dict = {}

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            st, hdrs, body = routes.get(
                self.path, (404, {}, b"<html><body>nope</body></html>")
            )
            self.send_response(st)
            for k, v in hdrs.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        hh = {"Content-Type": "text/html; charset=utf-8"}
        robots_body = (
            "User-agent: *\nDisallow: /private\n"
            f"Sitemap: {base}/sitemap.xml\n"
        )
        sm_xml = (
            '<?xml version="1.0"?><urlset>'
            f"<url><loc>{base}/sm1</loc></url>"
            f"<url><loc>{base}/sm2</loc></url>"
            "</urlset>"
        )
        routes["/robots.txt"] = (
            200, {"Content-Type": "text/plain"}, robots_body.encode()
        )
        routes["/sitemap.xml"] = (
            200, {"Content-Type": "application/xml"}, sm_xml.encode()
        )
        routes["/"] = (200, dict(hh), _page(
            f"{base}/a", "/private/x", "/r", "/missing"
        ).encode())
        routes["/a"] = (200, dict(hh), _page("/b").encode())
        routes["/b"] = (200, dict(hh), _page().encode())
        routes["/sm1"] = (200, dict(hh), _page("/sm3").encode())
        routes["/sm2"] = (200, dict(hh), _page().encode())
        routes["/sm3"] = (200, dict(hh), _page().encode())
        routes["/private/x"] = (200, dict(hh), _page().encode())
        routes["/r"] = (301, {"Location": "/a"}, b"")

        cfg = CrawlConfig(
            max_depth=2, default_delay_ms=1000, use_sitemaps=True
        )
        seeds = [base + "/"]

        # 1) pure-Python oracle
        pages = {}
        for path, (st, hdrs, body) in routes.items():
            if path in ("/robots.txt", "/sitemap.xml"):
                continue
            redir = hdrs.get("Location")
            pages[base + path] = {
                "url": base + path,
                "status": st,
                "html": body.decode() or None,
                "redirect_to": (base + redir) if redir else None,
            }
        pages[base + "/missing"] = {
            "url": base + "/missing", "status": 404,
            "html": "<html><body>nope</body></html>", "redirect_to": None,
        }
        sim = CrawlSimulator(
            pages,
            {"127.0.0.1": robots_body},
            cfg,
            sitemaps={"127.0.0.1": {"/sitemap.xml": sm_xml}},
        ).run(seeds)

        # 2) pages-join engine
        eng_join = CrawlEngine(
            spark,
            str(tmp_path / "join"),
            cfg,
            spark.createDataFrame(
                list(pages.values()),
                "url string, status int, html string, redirect_to string",
            ),
            spark.createDataFrame(
                [("127.0.0.1", robots_body)], "host string, body string"
            ),
            sitemaps_df=spark.createDataFrame(
                [("127.0.0.1", "/sitemap.xml", sm_xml)],
                "host string, path string, xml string",
            ),
        )
        eng_join.bootstrap(seeds)
        eng_join.run()

        # 3) everything over real sockets
        hcfg = HttpFetcherConfig(connect_timeout_s=5, read_timeout_s=5)
        roots = spark.createDataFrame(
            [("127.0.0.1", base)], "host string, root string"
        )
        robots_fetched = fetch_robots_df(spark, roots, hcfg)
        sm_fetched = discover_sitemaps_df(spark, roots, robots_fetched, hcfg)
        eng_sock = CrawlEngine(
            spark,
            str(tmp_path / "sock"),
            cfg,
            None,
            robots_fetched,
            fetcher=make_http_fetcher(hcfg),
            sitemaps_df=sm_fetched,
        )
        eng_sock.bootstrap(seeds)
        eng_sock.run()

        a = eng_join.fetch_log().toPandas()
        b = eng_sock.fetch_log().toPandas()
        want = pd.DataFrame(sim.fetch_log)
        for col in ("url", "outcome"):
            assert a[col].tolist() == want[col].tolist(), col
            assert b[col].tolist() == want[col].tolist(), col
        assert (
            b["scheduled_at_ms"].tolist()
            == want["scheduled_at_ms"].tolist()
        )
        # sitemap URLs actually crawled over sockets, robots honored
        assert base + "/sm1" in set(b["url"])
        assert not any("/private/" in u for u in b["url"])
        da = eng_join.docs_df().toPandas().sort_values("image_id")
        db = eng_sock.docs_df().toPandas().sort_values("image_id")
        assert da["image_id"].tolist() == db["image_id"].tolist()
        assert da["checksum"].tolist() == db["checksum"].tolist()
    finally:
        srv.shutdown()
