"""Incremental recrawl parity: run 1 -> baseline -> run 2 on a mutated
revision of the same site (reference analogs:
ModifiedFileDetectionTest, FileNotFoundDeletionTest, orphan handling
in cases/feature/)."""

import dataclasses

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine, load_baseline
from crawlspark.sources.webgen import SiteParams, build_site

PARAMS_R0 = SiteParams(
    seed=2024,
    n_hosts=3,
    depth=3,
    branching=3,
    dup_pct=0.15,
    redirect_pct=0.05,
    canonical_pct=0.08,
    cross_pct=0.35,
    n_seed_hosts=2,
)
PARAMS_R1 = dataclasses.replace(
    PARAMS_R0, revision=1, mutate_pct=0.3, gone_pct=0.1
)
CFG = CrawlConfig(max_depth=3, default_delay_ms=1000)


@pytest.fixture(scope="module")
def two_runs(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("incr")
    site0 = build_site(PARAMS_R0)
    site1 = build_site(PARAMS_R1)
    seeds = [r["url"] for r in site0.seeds.to_dict("records")]

    sim0 = CrawlSimulator(site0.pages_dict(), site0.robots_dict(), CFG).run(seeds)
    sim1 = CrawlSimulator(
        site1.pages_dict(),
        site1.robots_dict(),
        CFG,
        baseline=sim0.baseline_dict(),
    ).run(seeds)

    def engine_run(site, workdir, baseline=None):
        eng = CrawlEngine(
            spark,
            str(workdir),
            CFG,
            site.spark_pages_df(spark),
            site.spark_robots_df(spark),
            baseline_df=baseline,
        )
        eng.bootstrap(seeds)
        eng.run()
        return eng

    eng0 = engine_run(site0, tmp / "run0")
    eng1 = engine_run(
        site1, tmp / "run1", baseline=load_baseline(spark, str(tmp / "run0"))
    )
    return sim0, sim1, eng0, eng1


def test_revision_actually_mutates(two_runs):
    sim0, sim1, _, _ = two_runs
    outcomes = {r["outcome"] for r in sim1.fetch_log}
    assert "MODIFIED" in outcomes
    assert "UNMODIFIED" in outcomes


def test_incremental_fetch_sequence_parity(two_runs):
    _, sim1, _, eng1 = two_runs
    got = eng1.fetch_log().toPandas()
    want = pd.DataFrame(sim1.fetch_log)
    assert len(got) == len(want)
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_incremental_committed_parity(two_runs):
    _, sim1, _, eng1 = two_runs
    docs = eng1.docs_df().toPandas()
    got = docs[docs["op"] == "upsert"].sort_values("image_id")
    want = pd.DataFrame(sim1.committed).sort_values("image_id")
    assert got["image_id"].tolist() == want["image_id"].tolist()
    assert got["checksum"].tolist() == want["checksum"].tolist()


def test_spoiled_and_orphan_deletes_parity(two_runs):
    _, sim1, _, eng1 = two_runs
    deletes = eng1.deletes_df()
    got = sorted(deletes.toPandas()["image_id"].tolist()) if deletes is not None else []
    want = sorted(sim1.deletes)
    assert got == want
    # the mutated site must actually exercise the delete path
    assert len(want) > 0


def test_incremental_metrics(two_runs):
    _, sim1, _, eng1 = two_runs
    m = eng1.metrics_df().toPandas().groupby("event")["count"].sum().to_dict()
    want = dict(sim1.metrics)
    for key in [
        "REJECTED_UNMODIFIED",
        "DOCUMENT_COMMITTED_UPSERT",
        "DOCUMENT_COMMITTED_DELETE",
        "ORPHANS_REQUEUED",
        "DOCUMENT_FETCHED",
    ]:
        assert m.get(key, 0) == want.get(key, 0), key


def test_first_run_unaffected_by_feature(two_runs):
    sim0, _, eng0, _ = two_runs
    got = eng0.fetch_log().toPandas()
    want = pd.DataFrame(sim0.fetch_log)
    assert got["url"].tolist() == want["url"].tolist()
    assert (eng0.docs_df().toPandas()["op"] == "upsert").all()
