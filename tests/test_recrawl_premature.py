"""PREMATURE recrawl parity (RecrawlableResolverStage.java:38-93 /
GenericRecrawlableResolver minimum-frequency semantics): URLs crawled
too recently are skipped without a fetch or a politeness slot; due URLs
proceed normally and produce UNMODIFIED/MODIFIED as usual."""

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine, load_baseline
from crawlspark.sources.webgen import SiteParams, build_site

PARAMS = SiteParams(
    seed=77, n_hosts=2, depth=2, branching=3, cross_pct=0.3, n_seed_hosts=2
)
CFG0 = CrawlConfig(max_depth=2, default_delay_ms=1000)
# second run starts "3 seconds" after the virtual epoch; URLs fetched
# later than t=1500 in run 0 are not yet due (min recrawl 1.5s)
CFG1 = CrawlConfig(
    max_depth=2,
    default_delay_ms=1000,
    min_recrawl_ms=1500,
    virtual_now_ms=3000,
)


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prem")
    site = build_site(PARAMS)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]

    sim0 = CrawlSimulator(site.pages_dict(), site.robots_dict(), CFG0).run(seeds)
    sim1 = CrawlSimulator(
        site.pages_dict(),
        site.robots_dict(),
        CFG1,
        baseline=sim0.baseline_dict(),
    ).run(seeds)

    eng0 = CrawlEngine(
        spark,
        str(tmp / "r0"),
        CFG0,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
    )
    eng0.bootstrap(seeds)
    eng0.run()
    eng1 = CrawlEngine(
        spark,
        str(tmp / "r1"),
        CFG1,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
        baseline_df=load_baseline(spark, str(tmp / "r0")),
    )
    eng1.bootstrap(seeds)
    eng1.run()
    return sim0, sim1, eng1


def test_premature_actually_splits(runs):
    _, sim1, _ = runs
    outs = {r["outcome"] for r in sim1.fetch_log}
    assert "PREMATURE" in outs
    # some URLs must still be due (fetched) or the scenario is vacuous
    assert "UNMODIFIED" in outs or "MODIFIED" in outs


def test_premature_fetch_sequence_parity(runs):
    _, sim1, eng1 = runs
    got = eng1.fetch_log().toPandas()
    want = pd.DataFrame(sim1.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_three_run_chain_carries_premature_state(runs, spark, tmp_path_factory):
    """A URL skipped PREMATURE in run 1 must keep its run-0 fetch time
    and checksum in run 1's baseline, so run 2 (everything due) sees
    UNMODIFIED — not NEW — for it (GenericRecrawlableResolver keeps the
    prior fetch date + cached doc)."""
    sim0, sim1, eng1 = runs
    b1 = sim1.baseline_dict()
    b0 = sim0.baseline_dict()
    prem_urls = [r["url"] for r in sim1.fetch_log if r["outcome"] == "PREMATURE"]
    assert prem_urls
    for u in prem_urls:
        assert b1[u]["sched_ms"] == b0[u]["sched_ms"], u
        assert b1[u]["checksum"] == b0[u]["checksum"], u
    # engine baseline agrees row-for-row on the premature urls
    eb1 = {
        r["url"]: r
        for r in load_baseline(spark, str(eng1.workdir)).collect()
    }
    for u in prem_urls:
        assert eb1[u]["sched_ms"] == b1[u]["sched_ms"], u
        assert eb1[u]["checksum"] == b1[u]["checksum"], u
    # run 2 far in the future: every url due again; premature-in-run-1
    # urls with unchanged content must come back UNMODIFIED, never NEW
    cfg2 = CrawlConfig(max_depth=2, default_delay_ms=1000, virtual_now_ms=10**9)
    site = build_site(PARAMS)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim2 = CrawlSimulator(
        site.pages_dict(), site.robots_dict(), cfg2, baseline=b1
    ).run(seeds)
    out2 = {r["url"]: r["outcome"] for r in sim2.fetch_log}
    assert not any(out2.get(u) == "NEW" for u in prem_urls)
    assert any(out2.get(u) == "UNMODIFIED" for u in prem_urls)


# between the fixture's lastmod dates (Jan 2 and Jan 3 2024), so both
# the premature and the due branch of the lastmod comparison fire
RECRAWL_EPOCH_MS = 1704196800000  # 2024-01-02T12:00:00Z
CFG_SM0 = CrawlConfig(max_depth=2, default_delay_ms=1000, use_sitemaps=True)
CFG_SM1 = CrawlConfig(
    max_depth=2,
    default_delay_ms=1000,
    use_sitemaps=True,
    recrawl_sitemap_check=True,
    recrawl_min_frequencies=(("/d2/", 10**12),),
    virtual_epoch_ms=RECRAWL_EPOCH_MS,
    virtual_now_ms=2 * 86_400_000,
)


@pytest.fixture(scope="module")
def sitemap_runs(spark, tmp_path_factory):
    """Full GenericRecrawlableResolver: sitemap lastmod decides for
    sitemap-discovered URLs (FIRST support), changefreq for entries
    without lastmod, the per-pattern minimum frequency for /d2/ pages,
    and everything else is due."""
    tmp = tmp_path_factory.mktemp("recrawl_sm")
    site = build_site(PARAMS)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    maps = site.sitemaps_dict()

    sim0 = CrawlSimulator(
        site.pages_dict(), site.robots_dict(), CFG_SM0, sitemaps=maps
    ).run(seeds)
    sim1 = CrawlSimulator(
        site.pages_dict(),
        site.robots_dict(),
        CFG_SM1,
        baseline=sim0.baseline_dict(),
        sitemaps=maps,
    ).run(seeds)

    eng0 = CrawlEngine(
        spark, str(tmp / "r0"), CFG_SM0,
        site.spark_pages_df(spark), site.spark_robots_df(spark),
        sitemaps_df=site.spark_sitemaps_df(spark),
    )
    eng0.bootstrap(seeds)
    eng0.run()
    eng1 = CrawlEngine(
        spark, str(tmp / "r1"), CFG_SM1,
        site.spark_pages_df(spark), site.spark_robots_df(spark),
        baseline_df=load_baseline(spark, str(tmp / "r0")),
        sitemaps_df=site.spark_sitemaps_df(spark),
    )
    eng1.bootstrap(seeds)
    eng1.run()
    return sim0, sim1, eng1


def test_sitemap_resolver_branches_fire(sitemap_runs):
    sim0, sim1, _ = sitemap_runs
    base = sim0.baseline_dict()
    out1 = {r["url"]: r["outcome"] for r in sim1.fetch_log}
    lastmod_prem = lastmod_due = freq_pattern_prem = 0
    for url, b in base.items():
        if url not in out1:
            continue
        if b.get("sm_lastmod") is not None:
            # lastmod vs epoch Jan 15: later dates -> due (recrawled)
            if out1[url] == "PREMATURE":
                lastmod_prem += 1
            else:
                lastmod_due += 1
        elif "/d2/" in url:
            if out1[url] == "PREMATURE":
                freq_pattern_prem += 1
    assert lastmod_prem > 0, "some sitemap lastmod dates predate the epoch"
    assert lastmod_due > 0, "some sitemap lastmod dates postdate the epoch"
    assert freq_pattern_prem > 0, "/d2/ min-frequency must hold pages back"
    # changefreq-only entries (daily) are due at virtual_now = 2 days
    cf_only = [
        u for u, b in base.items()
        if b.get("sm_changefreq") and not b.get("sm_lastmod") and u in out1
    ]
    assert cf_only and all(out1[u] != "PREMATURE" for u in cf_only)


def test_sitemap_resolver_parity(sitemap_runs):
    _, sim1, eng1 = sitemap_runs
    got = eng1.fetch_log().toPandas()
    want = pd.DataFrame(sim1.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_premature_metrics_and_no_politeness_slot(runs):
    _, sim1, eng1 = runs
    m = eng1.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    assert m["REJECTED_PREMATURE"] == sim1.metrics["REJECTED_PREMATURE"] > 0
    assert m["DOCUMENT_FETCHED"] == sim1.metrics["DOCUMENT_FETCHED"]
    # premature rows keep avail as their log time and never push a
    # host's schedule: per-host fetched times must still be spaced
    log = eng1.fetch_log().toPandas()
    fetched = log[log["outcome"] != "PREMATURE"]
    for host, grp in fetched.groupby("host"):
        times = sorted(grp["scheduled_at_ms"])
        assert all(b - a >= 1000 for a, b in zip(times, times[1:]))


def test_calendar_changefreq_month_boundary(spark):
    """monthly/yearly are CALENDAR periods (plusMonths/plusYears —
    GenericRecrawlableResolver.java:224-244), not fixed 30/365-day
    spans: a crawl on Jan 31 2024 is due again Feb 29 2024 (29 days —
    leap clamp), which the old fixed 30-day span would have called
    premature. Engine Column and pure-Python simulator must agree at
    the boundary on both sides."""
    from datetime import datetime, timezone

    from crawlspark.config import CrawlConfig
    from crawlspark.oracle.simulator import CrawlSimulator, SimEntry
    from crawlspark.plans.superstep import _recrawlable_col

    jan31 = int(
        datetime(2024, 1, 31, tzinfo=timezone.utc).timestamp() * 1000
    )
    feb29 = int(
        datetime(2024, 2, 29, tzinfo=timezone.utc).timestamp() * 1000
    )
    feb28_2025 = int(
        datetime(2025, 2, 28, tzinfo=timezone.utc).timestamp() * 1000
    )

    def engine_due(freq: str, now_ms: int) -> bool:
        cfg = CrawlConfig(
            recrawl_sitemap_check=True,
            recrawl_sitemap_support="first",
            virtual_epoch_ms=jan31,
            virtual_now_ms=now_ms,
        )
        df = spark.createDataFrame(
            [("http://h.x/u", 0, 0, None, freq)],
            "url string, avail_ms long, base_sched long, "
            "base_sm_lastmod string, base_sm_changefreq string",
        )
        return bool(
            df.select(_recrawlable_col(cfg).alias("r")).first()["r"]
        )

    def sim_due(freq: str, now_ms: int) -> bool:
        cfg = CrawlConfig(
            recrawl_sitemap_check=True,
            recrawl_sitemap_support="first",
            virtual_epoch_ms=jan31,
            virtual_now_ms=now_ms,
        )
        sim = CrawlSimulator({}, {}, cfg)
        e = SimEntry(
            url="http://h.x/u", host="h.x", depth=0, seq=0, avail_ms=0
        )
        return sim._recrawlable({"sched_ms": 0, "sm_changefreq": freq}, e)

    month_ms = feb29 - jan31          # 29 days: the calendar period
    year_ms = feb28_2025 - jan31      # Jan 31 '24 + 1y -> Feb 28 '25? no:
    # plusMonths(12) from Jan 31 2024 = Jan 31 2025; use that instead
    jan31_2025 = int(
        datetime(2025, 1, 31, tzinfo=timezone.utc).timestamp() * 1000
    )
    year_ms = jan31_2025 - jan31

    for freq, due_at in [("monthly", month_ms), ("yearly", year_ms)]:
        for now, want in [(due_at - 1, False), (due_at, True)]:
            assert engine_due(freq, now) is want, (freq, now, want)
            assert sim_due(freq, now) is want, (freq, now, want)

    # the leap clamp itself: 30-day fixed span would NOT be due at
    # 29 days; the calendar period is
    assert month_ms == 29 * 86_400_000
