"""Reference-filter variants, URL scope, and fetch-retry parity.

Reference analogs: ExtensionReferenceFilter / SegmentCountUrlFilter
(core/.../filter/impl/, web/.../filter/impl/SegmentCountUrlFilter.java),
GenericUrlScopeResolver (web/.../scope/impl/GenericUrlScopeResolver.java
:79-152 — scope vs the *referring* URL), MultiFetcher retries
(core/fetch/MultiFetcher.java:94-138).
"""

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site, fetch_one, make_fetcher


def run_both(spark, tmp_path, params, cfg, fetcher_retries=None):
    site = build_site(params)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), cfg).run(seeds)
    if fetcher_retries is None:
        eng = CrawlEngine(
            spark,
            str(tmp_path / "crawl"),
            cfg,
            site.spark_pages_df(spark),
            site.spark_robots_df(spark),
        )
    else:
        eng = CrawlEngine(
            spark,
            str(tmp_path / "crawl"),
            cfg,
            None,
            site.spark_robots_df(spark),
            fetcher=make_fetcher(params, retries=fetcher_retries),
        )
    eng.bootstrap(seeds)
    eng.run()
    return sim, eng


def assert_fetch_parity(sim, eng):
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_extension_filter(spark, tmp_path):
    # blocking .html leaves only the host roots crawlable
    cfg = CrawlConfig(
        max_depth=2, default_delay_ms=500, blocked_extensions=("HTML",)
    )
    params = SiteParams(seed=3, n_hosts=2, depth=2, branching=3, n_seed_hosts=2)
    sim, eng = run_both(spark, tmp_path, params, cfg)
    assert_fetch_parity(sim, eng)
    seen = eng.urlseen().toPandas()
    assert (seen["outcome"] == "FILTERED").sum() > 0
    fetched = eng.fetch_log().toPandas()
    assert set(fetched["url"]) == {
        "http://site0000.example.test/",
        "http://site0001.example.test/",
    }


def test_segment_count_filter(spark, tmp_path):
    # /d{d}/p{i}.html has 2 segments; cap at 1 -> only roots fetched
    cfg = CrawlConfig(
        max_depth=2, default_delay_ms=500, max_path_segments=1
    )
    params = SiteParams(seed=3, n_hosts=2, depth=2, branching=3, n_seed_hosts=2)
    sim, eng = run_both(spark, tmp_path, params, cfg)
    assert_fetch_parity(sim, eng)
    assert (eng.fetch_log().toPandas()["url"].str.endswith("/")).all()


def test_stay_on_domain(spark, tmp_path):
    cfg = CrawlConfig(max_depth=3, default_delay_ms=500, stay_on_domain=True)
    params = SiteParams(
        seed=11, n_hosts=3, depth=3, branching=3, cross_pct=0.6, n_seed_hosts=1
    )
    sim, eng = run_both(spark, tmp_path, params, cfg)
    assert_fetch_parity(sim, eng)
    # scope must actually bite: the oracle recorded dropped links and
    # everything fetched stays on the seed host
    assert sim.metrics["URLS_OUT_OF_SCOPE"] > 0
    m = eng.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    assert m["URLS_OUT_OF_SCOPE"] == sim.metrics["URLS_OUT_OF_SCOPE"]
    hosts = set(eng.fetch_log().toPandas()["host"])
    assert hosts == {"site0000.example.test"}


def test_stay_on_domain_off_crawls_cross_hosts(spark, tmp_path):
    cfg = CrawlConfig(max_depth=3, default_delay_ms=500)
    params = SiteParams(
        seed=11, n_hosts=3, depth=3, branching=3, cross_pct=0.6, n_seed_hosts=1
    )
    sim, eng = run_both(spark, tmp_path, params, cfg)
    assert len(set(eng.fetch_log().toPandas()["host"])) > 1


def _port_site():
    """Hand-built two-port site: the root links to a default-port page
    and an :8080 page (GenericUrlScopeResolver stayOnPort compares
    RESOLVED ports — 80 for http when unspecified)."""
    html_root = (
        "<html><head><title>r</title></head><body>"
        '<a href="http://a.test/x.html">a</a>'
        '<a href="http://a.test:8080/y.html">b</a>'
        "</body></html>"
    )
    mk = lambda u, h: {
        "url": u,
        "host": "a.test",
        "status": 200,
        "redirect_to": None,
        "html": h,
        "depth_from_seed": 0,
        "last_modified": None,
        "etag": None,
    }
    leaf = "<html><head><title>l</title></head><body>leaf</body></html>"
    pages = {
        "http://a.test/": mk("http://a.test/", html_root),
        "http://a.test/x.html": mk("http://a.test/x.html", leaf),
        "http://a.test:8080/y.html": mk("http://a.test:8080/y.html", leaf),
    }
    return pages


@pytest.mark.parametrize("stay", [True, False])
def test_stay_on_port(spark, tmp_path, stay):
    from crawlspark.sources.webgen import PAGES_COLUMNS, PAGES_SCHEMA

    cfg = CrawlConfig(max_depth=2, default_delay_ms=500, stay_on_port=stay)
    pages = _port_site()
    robots = {"a.test": None}
    sim = CrawlSimulator(pages, robots, cfg).run(["http://a.test/"])
    pages_pdf = pd.DataFrame(list(pages.values())).reindex(
        columns=PAGES_COLUMNS
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / f"port{stay}"),
        cfg,
        spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA),
        spark.createDataFrame(
            pd.DataFrame([{"host": "a.test", "body": None}]),
            schema="host string, body string",
        ),
    )
    eng.bootstrap(["http://a.test/"])
    eng.run()
    assert_fetch_parity(sim, eng)
    fetched = {r["url"] for r in sim.fetch_log}
    if stay:
        assert fetched == {"http://a.test/", "http://a.test/x.html"}
        assert sim.metrics["URLS_OUT_OF_SCOPE"] == 1
    else:
        assert "http://a.test:8080/y.html" in fetched


def test_stay_on_sitemap(spark, tmp_path):
    """stayOnSitemap (GenericUrlScopeResolver.java:121-127): when the
    referring site's sitemap resolved PRESENT, extracted links are out
    of scope — only seeds + sitemap-listed URLs are fetched."""
    cfg = CrawlConfig(
        max_depth=2,
        default_delay_ms=500,
        use_sitemaps=True,
        stay_on_sitemap=True,
    )
    params = SiteParams(seed=9, n_hosts=2, depth=2, branching=3, n_seed_hosts=2)
    site = build_site(params)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(
        site.pages_dict(),
        site.robots_dict(),
        cfg,
        sitemaps=site.sitemaps_dict(),
    ).run(seeds)
    eng = CrawlEngine(
        spark,
        str(tmp_path / "smscope"),
        cfg,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
        sitemaps_df=site.spark_sitemaps_df(spark),
    )
    eng.bootstrap(seeds)
    eng.run()
    assert_fetch_parity(sim, eng)
    assert sim.metrics["URLS_OUT_OF_SCOPE"] > 0
    # nothing beyond the roots and the sitemap-listed depth-1 pages
    fetched = {r["url"] for r in sim.fetch_log}
    assert not any("/d2/" in u for u in fetched)


def test_fetch_retry_parity(spark, tmp_path):
    """Flaky pages 503 on attempt 0; with one retry the engine matches
    the oracle's final-attempt view exactly."""
    params = SiteParams(
        seed=21, n_hosts=2, depth=2, branching=4, flaky_pct=0.4, n_seed_hosts=2
    )
    # the transient really happens:
    flaky_urls = [
        u
        for u in build_site(params).pages_dict()
        if fetch_one(params, u, attempt=0)[0] == 503
    ]
    assert flaky_urls, "site must contain flaky pages"
    assert fetch_one(params, flaky_urls[0], attempt=1)[0] != 503

    cfg = CrawlConfig(max_depth=2, default_delay_ms=500, fetch_retries=1)
    sim, eng = run_both(spark, tmp_path, params, cfg, fetcher_retries=1)
    assert_fetch_parity(sim, eng)
    # none of the flaky pages surfaced as BAD_STATUS
    log = eng.fetch_log().toPandas()
    bad = log[log["outcome"] == "BAD_STATUS"]["url"].tolist()
    assert not set(bad) & set(flaky_urls)


def test_no_retry_surfaces_transient(spark, tmp_path):
    params = SiteParams(
        seed=21, n_hosts=2, depth=2, branching=4, flaky_pct=0.4, n_seed_hosts=2
    )
    cfg = CrawlConfig(max_depth=2, default_delay_ms=500)
    site = build_site(params)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    eng = CrawlEngine(
        spark,
        str(tmp_path / "crawl0"),
        cfg,
        None,
        site.spark_robots_df(spark),
        fetcher=make_fetcher(params, retries=0),
    )
    eng.bootstrap(seeds)
    eng.run()
    log = eng.fetch_log().toPandas()
    assert (log["outcome"] == "BAD_STATUS").any()
