"""Delay-resolver variants (SURVEY.md §2.5): precedence robots >
time-of-day schedule > per-URL pattern > default
(AbstractDelayResolver.java:84-115; GenericDelayResolver.java:84-151;
ReferenceDelayResolver.java), engine vs oracle."""

import re

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.operators.politeness import resolve_delay
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site

HOUR = 3_600_000


def test_resolve_delay_precedence():
    pats = [(re.compile(r"/slow/"), 9000)]
    scheds = ((8, 18, 700), (22, 6, 5000))  # second wraps midnight
    # robots beats everything
    assert resolve_delay("http://h/slow/x", 9 * HOUR, 1234, scheds, pats, 3000) == 1234
    # schedule window (daytime)
    assert resolve_delay("http://h/x", 9 * HOUR, None, scheds, pats, 3000) == 700
    # wrap-around window (23:00 and 05:00 both inside 22->6)
    assert resolve_delay("http://h/x", 23 * HOUR, None, scheds, pats, 3000) == 5000
    assert resolve_delay("http://h/x", 5 * HOUR, None, scheds, pats, 3000) == 5000
    # gap hour (19:00): schedules miss -> pattern
    assert resolve_delay("http://h/slow/x", 19 * HOUR, None, scheds, pats, 3000) == 9000
    # nothing matches -> default
    assert resolve_delay("http://h/x", 19 * HOUR, None, scheds, pats, 3000) == 3000


PARAMS = SiteParams(seed=13, n_hosts=5, depth=2, branching=3, n_seed_hosts=5)
# hosts divisible by 5 (site0000) have no robots.txt -> schedule/pattern
# paths actually execute; others keep their robots crawl-delay
CFG = CrawlConfig(
    max_depth=2,
    default_delay_ms=1000,
    delay_schedules=((0, 12, 650),),
    delay_patterns=((r"/d2/", 1500),),
)


@pytest.fixture(scope="module")
def both(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("delays")
    site = build_site(PARAMS)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), CFG).run(seeds)
    eng = CrawlEngine(
        spark,
        str(tmp / "crawl"),
        CFG,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
    )
    eng.bootstrap(seeds)
    eng.run()
    return site, sim, eng


def test_schedule_parity(both):
    _, sim, eng = both
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want)
    for col in ["url", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_schedule_actually_used(both):
    """site0000 has no robots: its fetches must be spaced by the
    650 ms schedule window, not the 1000 ms default."""
    _, sim, eng = both
    log = eng.fetch_log().toPandas()
    h0 = log[log["host"] == "site0000.example.test"].sort_values(
        "scheduled_at_ms"
    )
    gaps = h0["scheduled_at_ms"].diff().dropna()
    assert (gaps >= 650).all()
    assert (gaps == 650).any(), "650ms schedule delay never applied"
