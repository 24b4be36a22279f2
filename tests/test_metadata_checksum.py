"""Metadata checksum band parity (MetadataChecksumStage /
MetadataDedupStage / LastModifiedMetadataChecksummer — the reference
web crawler's default metadata checksummer, WebCrawlerConfig.java:557 —
plus the HEAD-before-GET directive, WebDocPipelines.java:89-99):
an incremental recrawl decides UNMODIFIED from response headers; in
HEAD mode the body is never fetched or parsed for such rows (no link
extraction), and in GET mode links are extracted before the rejection."""

import dataclasses

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine, load_baseline
from crawlspark.sources.webgen import SiteParams, build_site

PARAMS_R0 = SiteParams(
    seed=555,
    n_hosts=3,
    depth=2,
    branching=3,
    dup_pct=0.15,
    cross_pct=0.35,
    n_seed_hosts=2,
)
PARAMS_R1 = dataclasses.replace(
    PARAMS_R0, revision=1, mutate_pct=0.25, touch_pct=0.2, gone_pct=0.05
)


def _run_pair(spark, tmp, cfg):
    site0 = build_site(PARAMS_R0)
    site1 = build_site(PARAMS_R1)
    seeds = [r["url"] for r in site0.seeds.to_dict("records")]

    sim0 = CrawlSimulator(site0.pages_dict(), site0.robots_dict(), cfg).run(seeds)
    sim1 = CrawlSimulator(
        site1.pages_dict(),
        site1.robots_dict(),
        cfg,
        baseline=sim0.baseline_dict(),
    ).run(seeds)

    eng0 = CrawlEngine(
        spark, str(tmp / "r0"), cfg,
        site0.spark_pages_df(spark), site0.spark_robots_df(spark),
    )
    eng0.bootstrap(seeds)
    eng0.run()
    eng1 = CrawlEngine(
        spark, str(tmp / "r1"), cfg,
        site1.spark_pages_df(spark), site1.spark_robots_df(spark),
        baseline_df=load_baseline(spark, str(tmp / "r0")),
    )
    eng1.bootstrap(seeds)
    eng1.run()
    return sim0, sim1, eng0, eng1


def _assert_log_parity(sim, eng):
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


CFG_GET = CrawlConfig(
    max_depth=2,
    default_delay_ms=1000,
    metadata_checksummer="last_modified",
)
CFG_HEAD = dataclasses.replace(CFG_GET, head_before_get=True)


@pytest.fixture(scope="module")
def get_mode(spark, tmp_path_factory):
    return _run_pair(spark, tmp_path_factory.mktemp("meta_get"), CFG_GET)


@pytest.fixture(scope="module")
def head_mode(spark, tmp_path_factory):
    return _run_pair(spark, tmp_path_factory.mktemp("meta_head"), CFG_HEAD)


def test_get_mode_parity(get_mode):
    _, sim1, _, eng1 = get_mode
    _assert_log_parity(sim1, eng1)


def test_get_mode_scenario_not_vacuous(get_mode):
    _, sim1, _, _ = get_mode
    outs = [r["outcome"] for r in sim1.fetch_log]
    # unchanged pages: header matched -> UNMODIFIED; touched pages:
    # header differs, content same -> content-UNMODIFIED; mutated ->
    # MODIFIED. All three paths must fire for the scenario to count.
    assert outs.count("UNMODIFIED") > 0
    assert outs.count("MODIFIED") > 0
    meta_unmod = [
        u for u, e in sim1.ledger.items()
        if e.outcome == "UNMODIFIED" and e.meta_ck is not None
    ]
    assert meta_unmod, "some UNMODIFIED must be decided by metadata"


def test_get_mode_metrics_parity(get_mode):
    _, sim1, _, eng1 = get_mode
    m = eng1.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    for key in [
        "REJECTED_UNMODIFIED",
        "DOCUMENT_COMMITTED_UPSERT",
        "DOCUMENT_FETCHED",
        "URLS_EXTRACTED",
    ]:
        assert m.get(key, 0) == sim1.metrics.get(key, 0), key


def test_head_mode_parity(head_mode):
    _, sim1, _, eng1 = head_mode
    _assert_log_parity(sim1, eng1)


def test_head_mode_skips_body(head_mode):
    """In HEAD mode a meta-UNMODIFIED row contributes no extracted
    links — total URLS_EXTRACTED must be strictly lower than in GET
    mode on the identical site/baseline (same config otherwise)."""
    _, sim1_head, _, eng1 = head_mode
    m = eng1.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    assert m.get("URLS_EXTRACTED", 0) == sim1_head.metrics.get("URLS_EXTRACTED", 0)
    # meta-unmodified rows exist and none of them extracted links:
    # rebuild the GET-mode run's count for comparison
    site0 = build_site(PARAMS_R0)
    site1 = build_site(PARAMS_R1)
    seeds = [r["url"] for r in site0.seeds.to_dict("records")]
    sim0g = CrawlSimulator(site0.pages_dict(), site0.robots_dict(), CFG_GET).run(seeds)
    sim1g = CrawlSimulator(
        site1.pages_dict(), site1.robots_dict(), CFG_GET,
        baseline=sim0g.baseline_dict(),
    ).run(seeds)
    assert (
        sim1_head.metrics["URLS_EXTRACTED"] < sim1g.metrics["URLS_EXTRACTED"]
    )


def test_head_mode_orphans_recover_children(head_mode):
    """Children of skipped (meta-UNMODIFIED) pages are not re-linked
    this run; the orphan pass requeues them so the final URL-seen set
    still converges (engine vs oracle)."""
    _, sim1, _, eng1 = head_mode
    got = (
        eng1.urlseen().toPandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        pd.DataFrame(sim1.urlseen()).sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "status", "outcome", "depth"]],
        want[["url", "status", "outcome", "depth"]],
        check_dtype=False,
    )
    assert sim1.metrics.get("ORPHANS_REQUEUED", 0) > 0


CFG_META_DEDUP = CrawlConfig(
    max_depth=2,
    default_delay_ms=1000,
    metadata_checksummer="etag",
    metadata_dedup=True,
    head_before_get=True,
)


def test_metadata_dedup_first_wins(spark, tmp_path_factory):
    """ETag is content-derived, so dup-content pages share a metadata
    checksum: with metadata_dedup on, later ones reject DUPLICATE at
    the metadata stage (HEAD mode: before the body is fetched)."""
    tmp = tmp_path_factory.mktemp("meta_dedup")
    site = build_site(PARAMS_R0)
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(
        site.pages_dict(), site.robots_dict(), CFG_META_DEDUP
    ).run(seeds)
    eng = CrawlEngine(
        spark, str(tmp / "r0"), CFG_META_DEDUP,
        site.spark_pages_df(spark), site.spark_robots_df(spark),
    )
    eng.bootstrap(seeds)
    eng.run()
    _assert_log_parity(sim, eng)
    assert sim.metrics.get("REJECTED_DUPLICATE", 0) > 0
    m = eng.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    assert m.get("REJECTED_DUPLICATE", 0) == sim.metrics["REJECTED_DUPLICATE"]
