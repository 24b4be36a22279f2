"""maxCrawlDuration stop parity (CrawlerConfig maxCrawlDuration /
ActivityChecker analog, on the VIRTUAL politeness clock, checked at
superstep boundaries like max_docs — a documented deviation from the
reference's wall-clock mid-crawl stop)."""

import pandas as pd

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site

PARAMS = SiteParams(seed=13, n_hosts=2, depth=3, branching=3, n_seed_hosts=2)


def _run_both(spark, tmp_path, cfg, name):
    site = build_site(PARAMS)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), cfg).run(seeds)
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        cfg,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
    )
    eng.bootstrap(seeds)
    eng.run()
    return sim, eng


def test_duration_stop_parity(spark, tmp_path):
    # host delays are 1-3 s; a 5 s budget cuts the crawl after the
    # level whose schedule first crosses it
    cfg = CrawlConfig(
        max_depth=3, default_delay_ms=1000, max_crawl_duration_ms=5000
    )
    sim, eng = _run_both(spark, tmp_path, cfg, "dur")
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col

    # the limit actually bites: unlimited run fetches strictly more
    cfg_unl = CrawlConfig(max_depth=3, default_delay_ms=1000)
    sim_unl, _ = _run_both(spark, tmp_path, cfg_unl, "unl")
    assert len(sim.fetch_log) < len(sim_unl.fetch_log)
    # the crossing level itself completed (boundary semantics): some
    # fetch was scheduled past the limit
    assert max(r["scheduled_at_ms"] for r in sim.fetch_log) >= 5000

    # cut entries remain QUEUED (resumable), not rejected
    seen = eng.urlseen().toPandas()
    assert (seen["status"] == "QUEUED").sum() > 0
