"""Politeness scope parity: CRAWLER (one global lock) and THREAD
(deterministic seq%K slots) vs the pure-Python oracle — the
BaseDelayResolverConfig scope semantics beyond the SITE default
(SiteDelay/CrawlerDelay/ThreadDelay, SURVEY §2.5)."""

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig, validate
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site

SITE = SiteParams(
    seed=77,
    n_hosts=3,
    depth=2,
    branching=3,
    dup_pct=0.1,
    cross_pct=0.3,
    n_seed_hosts=2,
)


def _run_both(spark, tmp_path, cfg):
    site = build_site(SITE)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), cfg).run(
        seeds
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "crawl"),
        cfg,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
    )
    eng.bootstrap(seeds)
    eng.run()
    return sim, eng


@pytest.mark.parametrize(
    "scope,threads",
    [("CRAWLER", 1), ("THREAD", 2), ("THREAD", 3)],
)
def test_scope_schedule_parity(spark, tmp_path, scope, threads):
    cfg = CrawlConfig(
        max_depth=2,
        default_delay_ms=1000,
        delay_scope=scope,
        delay_threads=threads,
    )
    sim, eng = _run_both(spark, tmp_path, cfg)
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want)
    assert got["url"].tolist() == want["url"].tolist()
    assert (
        got["scheduled_at_ms"].tolist()
        == want["scheduled_at_ms"].tolist()
    ), f"{scope} schedule diverged"


def test_crawler_scope_is_globally_serial(spark, tmp_path):
    """No two fetches may share a schedule slot under CRAWLER scope,
    and consecutive slots are >= the resolved delay apart."""
    cfg = CrawlConfig(
        max_depth=2, default_delay_ms=500, delay_scope="CRAWLER"
    )
    _, eng = _run_both(spark, tmp_path, cfg)
    sched = sorted(
        eng.fetch_log().toPandas()["scheduled_at_ms"].tolist()
    )
    diffs = [b - a for a, b in zip(sched, sched[1:])]
    assert all(d >= 500 for d in diffs), diffs[:5]


def test_scope_validation():
    assert validate(CrawlConfig(delay_scope="BOGUS"))
    assert validate(CrawlConfig(delay_threads=0))
    assert not validate(CrawlConfig(delay_scope="THREAD", delay_threads=4))
