"""Kill/resume identical-replay contract: a crawl interrupted after K
supersteps and resumed from the on-disk checkpoint must produce the
byte-identical fetch sequence and committed set as an uninterrupted
run, which itself matches the pure-Python oracle. Reference analog:
requeue-on-resume (CrawlerEntryLedger.java:206-241,487-511) + the
north rule's per-partition-lineage replay requirement."""

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site


def _site():
    return build_site(
        SiteParams(
            seed=77,
            n_hosts=3,
            depth=3,
            branching=3,
            dup_pct=0.2,
            redirect_pct=0.1,
            cross_pct=0.3,
            n_seed_hosts=2,
        )
    )


def test_kill_after_k_steps_resume_replays_identically(spark, tmp_path):
    site = _site()
    cfg = CrawlConfig(max_depth=3, default_delay_ms=1000)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    pages = spark.createDataFrame(site.pages)
    robots = spark.createDataFrame(site.robots)

    # uninterrupted reference run
    full = CrawlEngine(spark, str(tmp_path / "full"), cfg, pages, robots)
    full.bootstrap(seeds)
    full.run()
    full_log = full.fetch_log().toPandas()

    # interrupted run: 2 supersteps, then the engine object is dropped
    # (the "kill") and a NEW engine resumes from the checkpoint
    part = CrawlEngine(spark, str(tmp_path / "part"), cfg, pages, robots)
    part.bootstrap(seeds)
    assert part.step() is not None
    assert part.step() is not None
    del part
    resumed = CrawlEngine.resume(
        spark, str(tmp_path / "part"), cfg, pages, robots
    )
    resumed.run()
    res_log = resumed.fetch_log().toPandas()

    # identical fetch sequence (order AND schedule), identical docs
    assert res_log["url"].tolist() == full_log["url"].tolist()
    assert (
        res_log["scheduled_at_ms"].tolist()
        == full_log["scheduled_at_ms"].tolist()
    )
    full_docs = full.docs_df().toPandas().sort_values("image_id")
    res_docs = resumed.docs_df().toPandas().sort_values("image_id")
    assert res_docs["image_id"].tolist() == full_docs["image_id"].tolist()
    assert res_docs["caption"].tolist() == full_docs["caption"].tolist()

    # and both equal the independent pure-Python oracle
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), cfg).run(
        seeds
    )
    assert res_log["url"].tolist() == [r["url"] for r in sim.fetch_log]
