"""Importer filter stages + spoiled-strategy parity.

Reference analogs: MetadataFiltersStage
(core/.../importer/stages/MetadataFiltersStage.java:40-70),
DocumentFiltersStage (core/.../importer/stages/DocumentFiltersStage
.java), GenericSpoiledReferenceStrategizer state->strategy mapping
(core/.../spoil/impl/GenericSpoiledReferenceStrategizer.java:69)
with GRACE_ONCE triggered only when the previous run was also
spoiled (ProcessFinalize.java:192).
"""

import dataclasses

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.functions.filters import filters_reject
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine, load_baseline
from crawlspark.sources.webgen import SiteParams, build_site

PARAMS = SiteParams(
    seed=55, n_hosts=3, depth=2, branching=3, dup_pct=0.2, n_seed_hosts=3
)


def run_both(spark, tmp_path, params, cfg, name="crawl"):
    site = build_site(params)
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


def assert_fetch_parity(sim, eng):
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_filters_reject_include_exclude_semantics():
    # any exclude hit rejects; includes need at least one hit
    f = [("url", r"\.pdf$", "exclude")]
    assert filters_reject({"url": "http://x/a.pdf"}, f)
    assert not filters_reject({"url": "http://x/a.html"}, f)
    f = [("url", r"/keep/", "include"), ("url", r"/also/", "include")]
    assert not filters_reject({"url": "http://x/keep/a"}, f)
    assert not filters_reject({"url": "http://x/also/a"}, f)
    assert filters_reject({"url": "http://x/other/a"}, f)
    # null field values match nothing
    assert filters_reject({"url": None}, f)


def test_metadata_filters_get_mode(spark, tmp_path):
    """GET mode: the filter runs after fetch+parse — the page is
    FILTERED but its links were already extracted, so children of
    filtered pages still crawl (stage order, WebDocPipelines.java)."""
    cfg = CrawlConfig(
        max_depth=2,
        default_delay_ms=500,
        metadata_filters=(("last_modified", r"Mon, 0[1-9] Jan", "exclude"),),
    )
    sim, eng = run_both(spark, tmp_path, PARAMS, cfg)
    assert_fetch_parity(sim, eng)
    assert sim.metrics["REJECTED_FILTER_IMPORT"] > 0
    m = eng.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    assert (
        m["REJECTED_FILTER_IMPORT"] == sim.metrics["REJECTED_FILTER_IMPORT"]
    )
    log = pd.DataFrame(sim.fetch_log)
    filtered = log[log["outcome"] == "FILTERED"]
    # a filtered non-leaf page's children still fetched
    parents = [u for u in filtered["url"] if "/d1/" in u or u.endswith("/")]
    assert parents, "need a filtered page with children"
    fetched = set(log["url"])
    child_seen = any(
        c.startswith(p.rsplit("/", 1)[0] if "/d1/" in p else p + "d1/")
        for p in parents
        for c in fetched
        if "/d" in c
    )
    assert child_seen


def test_metadata_filters_head_mode(spark, tmp_path):
    """HEAD mode: the filter rejects on headers alone — the body is
    never fetched, so no links are extracted from filtered pages."""
    base = dict(
        max_depth=2,
        default_delay_ms=500,
        metadata_filters=(("last_modified", r"Mon, [01][0-9] Jan", "exclude"),),
    )
    cfg_head = CrawlConfig(**base, head_before_get=True)
    cfg_get = CrawlConfig(**base)
    sim_h, eng_h = run_both(spark, tmp_path, PARAMS, cfg_head, "head")
    assert_fetch_parity(sim_h, eng_h)
    assert sim_h.metrics["REJECTED_FILTER_IMPORT"] > 0
    sim_g, _ = run_both(spark, tmp_path, PARAMS, cfg_get, "get")
    # HEAD mode crawls a subset: filtered pages contribute no links
    urls_h = {r["url"] for r in sim_h.fetch_log}
    urls_g = {r["url"] for r in sim_g.fetch_log}
    assert urls_h < urls_g


def test_document_filters(spark, tmp_path):
    """DocumentFiltersStage over the body, between the metadata
    stages and the document checksum — filtered rows never register
    a checksum (no dedup rank slot)."""
    cfg = CrawlConfig(
        max_depth=2,
        default_delay_ms=500,
        document_filters=((r"d=2 ", "exclude"),),
    )
    sim, eng = run_both(spark, tmp_path, PARAMS, cfg)
    assert_fetch_parity(sim, eng)
    assert sim.metrics["REJECTED_FILTER_IMPORT"] > 0
    log = pd.DataFrame(sim.fetch_log)
    d2 = log[log["url"].str.contains("/d2/")]
    assert set(d2["outcome"]) == {"FILTERED"}
    # committed docs identical between engine and oracle
    docs = eng.docs_df().toPandas()
    got = docs[docs["op"] == "upsert"].sort_values("image_id")
    want = pd.DataFrame(sim.committed).sort_values("image_id")
    assert got["image_id"].tolist() == want["image_id"].tolist()


GRACE_R0 = SiteParams(
    seed=77, n_hosts=2, depth=2, branching=3, cross_pct=0.3, n_seed_hosts=2
)
GRACE_R1 = dataclasses.replace(
    GRACE_R0, revision=1, bad_pct=0.25, gone_pct=0.1
)
GRACE_R2 = dataclasses.replace(GRACE_R1, revision=2)
GRACE_CFG = CrawlConfig(max_depth=2, default_delay_ms=500)


@pytest.fixture(scope="module")
def grace_chain(spark, tmp_path_factory):
    """Three-run chain: healthy -> server breaks (500) -> still broken.
    BAD_STATUS maps to GRACE_ONCE: kept on the first spoiled run,
    deleted when the PREVIOUS run was also spoiled."""
    tmp = tmp_path_factory.mktemp("grace")
    sites = [build_site(p) for p in (GRACE_R0, GRACE_R1, GRACE_R2)]
    seeds = [r["url"] for r in sites[0].seeds.to_dict("records")]

    sims, engs = [], []
    sim_base = None
    for k, site in enumerate(sites):
        sim = CrawlSimulator(
            site.pages_dict(), site.robots_dict(), GRACE_CFG,
            baseline=sim_base,
        ).run(seeds)
        sims.append(sim)
        sim_base = sim.baseline_dict()
        eng = CrawlEngine(
            spark,
            str(tmp / f"run{k}"),
            GRACE_CFG,
            site.spark_pages_df(spark),
            site.spark_robots_df(spark),
            baseline_df=(
                load_baseline(spark, str(tmp / f"run{k - 1}"))
                if k else None
            ),
        )
        eng.bootstrap(seeds)
        eng.run()
        engs.append(eng)
    return sims, engs


def test_grace_chain_exercises_both_paths(grace_chain):
    sims, _ = grace_chain
    bad1 = {
        r["url"] for r in sims[1].fetch_log if r["outcome"] == "BAD_STATUS"
    }
    assert bad1, "revision 1 must break some pages"
    # run 2: graced (no delete for BAD_STATUS; NOT_FOUND still deletes)
    assert not bad1 & set(sims[1].deletes)
    # run 3: grace expired -> deleted (for pages still reachable)
    bad2 = {
        r["url"] for r in sims[2].fetch_log if r["outcome"] == "BAD_STATUS"
    }
    assert bad2 & set(sims[2].deletes)


def test_grace_chain_parity(grace_chain):
    sims, engs = grace_chain
    for k in (1, 2):
        got = engs[k].fetch_log().toPandas()
        want = pd.DataFrame(sims[k].fetch_log)
        assert len(got) == len(want), k
        for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
            assert got[col].tolist() == want[col].tolist(), (k, col)
        deletes = engs[k].deletes_df()
        got_del = (
            sorted(deletes.toPandas()["image_id"].tolist())
            if deletes is not None
            else []
        )
        assert got_del == sorted(sims[k].deletes), k


def test_spoiled_strategy_ignore(spark, tmp_path):
    """An IGNORE mapping (and unlisted outcomes) never deletes."""
    cfg = dataclasses.replace(
        GRACE_CFG,
        spoiled_strategies=(("NOT_FOUND", "IGNORE"),),
    )
    site0, site1 = build_site(GRACE_R0), build_site(GRACE_R1)
    seeds = [r["url"] for r in site0.seeds.to_dict("records")]
    sim0 = CrawlSimulator(
        site0.pages_dict(), site0.robots_dict(), cfg
    ).run(seeds)
    sim1 = CrawlSimulator(
        site1.pages_dict(), site1.robots_dict(), cfg,
        baseline=sim0.baseline_dict(),
    ).run(seeds)
    spoiled = {
        r["url"]
        for r in sim1.fetch_log
        if r["outcome"] in ("NOT_FOUND", "BAD_STATUS")
    }
    assert spoiled
    assert not spoiled & set(sim1.deletes)

    eng0 = CrawlEngine(
        spark, str(tmp_path / "r0"), cfg,
        site0.spark_pages_df(spark), site0.spark_robots_df(spark),
    )
    eng0.bootstrap(seeds)
    eng0.run()
    eng1 = CrawlEngine(
        spark, str(tmp_path / "r1"), cfg,
        site1.spark_pages_df(spark), site1.spark_robots_df(spark),
        baseline_df=load_baseline(spark, str(tmp_path / "r0")),
    )
    eng1.bootstrap(seeds)
    eng1.run()
    deletes = eng1.deletes_df()
    got_del = (
        sorted(deletes.toPandas()["image_id"].tolist())
        if deletes is not None
        else []
    )
    assert got_del == sorted(sim1.deletes)
