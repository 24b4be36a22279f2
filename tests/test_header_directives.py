"""HTTP response-header directive parity: Link rel=canonical header
(GenericCanonicalLinkDetector.java:100-119 — metadata-phase detector,
checked before the HTML head) and X-Robots-Tag
(StandardRobotsMetaProvider.java:37-92 — same directives as the meta
tag, OR'd)."""

import pandas as pd

from crawlspark.config import CrawlConfig
from crawlspark.functions.links import (
    canonical_from_header,
    effective_canonical,
    parse_x_robots,
)
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site


def test_canonical_from_header_parsing():
    u = "http://h.test/a/b.html"
    assert (
        canonical_from_header(u, '<http://h.test/c.html>; rel="canonical"')
        == "http://h.test/c.html"
    )
    # relative target resolves against the page URL
    assert (
        canonical_from_header(u, "</c.html>; rel=canonical")
        == "http://h.test/c.html"
    )
    # other rels don't match
    assert canonical_from_header(u, '<http://h.test/n>; rel="next"') is None
    assert canonical_from_header(u, None) is None


def test_effective_canonical_precedence():
    u = "http://h.test/p"
    # header wins when non-self
    assert effective_canonical(u, "http://h.test/q", "http://h.test/r") == (
        "http://h.test/q"
    )
    # self header-canonical falls through to the HTML head's
    assert effective_canonical(u, u, "http://h.test/r") == "http://h.test/r"
    assert effective_canonical(u, None, "http://h.test/r") == "http://h.test/r"
    assert effective_canonical(u, u, None) is None


def test_parse_x_robots():
    assert parse_x_robots("noindex, nofollow") == (True, True)
    assert parse_x_robots("NOINDEX") == (True, False)
    assert parse_x_robots("none of these") == (False, False)
    assert parse_x_robots(None) == (False, False)


def test_header_directives_crawl_parity(spark, tmp_path):
    """canonical_pct=0 and noindex_pct=0, so every NONCANONICAL /
    NOINDEX outcome is header-driven."""
    cfg = CrawlConfig(max_depth=2, default_delay_ms=500)
    params = SiteParams(
        seed=31,
        n_hosts=2,
        depth=2,
        branching=4,
        n_seed_hosts=2,
        header_canonical_pct=0.3,
        x_robots_pct=0.25,
    )
    site = build_site(params)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), cfg).run(seeds)
    outcomes = {r["outcome"] for r in sim.fetch_log}
    assert "NONCANONICAL" in outcomes, "header canonical must fire"
    assert "NOINDEX" in outcomes, "x-robots noindex must fire"

    eng = CrawlEngine(
        spark,
        str(tmp_path / "hdr"),
        cfg,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
    )
    eng.bootstrap(seeds)
    eng.run()
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col
