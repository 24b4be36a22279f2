"""Redirect one-requeue rule parity (WebImporterPipelineUtil.java:
103-160): a redirect target already PROCESSED with a bad outcome and
not in the current redirect trail is queued once more (requeueEntry
bypasses the queue pipeline); targets in their own trail (cycles) and
targets in a good state are rejected."""

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import PAGES_COLUMNS, PAGES_SCHEMA

HOST = "h.example.test"
B = f"http://{HOST}"


def _page(url, status, html=None, redirect_to=None):
    return {
        "url": url,
        "host": HOST,
        "status": status,
        "redirect_to": redirect_to,
        "html": html,
        "depth_from_seed": 0,
        "last_modified": None,
        "etag": None,
        "link_header": None,
        "x_robots": None,
    }


def _links(*hrefs):
    return (
        "<html><body>"
        + "".join(f'<a href="{h}">l</a>' for h in hrefs)
        + "</body></html>"
    )


PAGES = [
    # root links to /x (redirect chain head), /y (delayed re-redirect
    # source), and /c1 (a pure 2-cycle)
    _page(f"{B}/", 200, _links(f"{B}/x", f"{B}/y", f"{B}/c1")),
    _page(f"{B}/x", 301, redirect_to=f"{B}/t"),
    # /t itself redirects: processed with outcome REDIRECT (bad state)
    _page(f"{B}/t", 301, redirect_to=f"{B}/z"),
    _page(f"{B}/z", 200, _links()),
    _page(f"{B}/y", 200, _links(f"{B}/y2")),
    # /y2 redirects to the already-processed bad-state /t -> requeue
    _page(f"{B}/y2", 301, redirect_to=f"{B}/t"),
    # pure cycle: c1 -> c2 -> c1; c1 is in c2's trail -> reject
    _page(f"{B}/c1", 301, redirect_to=f"{B}/c2"),
    _page(f"{B}/c2", 301, redirect_to=f"{B}/c1"),
]
CFG = CrawlConfig(max_depth=3, default_delay_ms=1000, honor_robots=False)
SEEDS = [f"{B}/"]


@pytest.fixture(scope="module")
def both(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("requeue")
    pages = {p["url"]: p for p in PAGES}
    sim = CrawlSimulator(pages, {HOST: None}, CFG).run(SEEDS)
    pages_df = spark.createDataFrame(
        pd.DataFrame(PAGES)[PAGES_COLUMNS], schema=PAGES_SCHEMA
    )
    robots_df = spark.createDataFrame(
        [(HOST, None)], "host string, body string"
    )
    eng = CrawlEngine(spark, str(tmp / "c"), CFG, pages_df, robots_df)
    eng.bootstrap(SEEDS)
    eng.run()
    return sim, eng


def test_bad_state_target_requeued_once(both):
    sim, _ = both
    urls = [r["url"] for r in sim.fetch_log]
    assert urls.count(f"{B}/t") == 2, urls
    # the requeued /t redirects to /z again; /z is then in a good
    # state (NEW) so no third fetch of anything happens
    assert urls.count(f"{B}/z") == 1


def test_cycle_target_rejected(both):
    sim, _ = both
    urls = [r["url"] for r in sim.fetch_log]
    assert urls.count(f"{B}/c1") == 1
    assert urls.count(f"{B}/c2") == 1


def test_requeue_fetch_sequence_parity(both):
    sim, eng = both
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (got["url"].tolist(), want["url"].tolist())
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_requeue_urlseen_parity(both):
    sim, eng = both
    got = (
        eng.urlseen().toPandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        pd.DataFrame(sim.urlseen()).sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["url", "status", "outcome", "depth"]],
        want[["url", "status", "outcome", "depth"]],
        check_dtype=False,
    )


def test_disabled_flag_restores_blanket_rejection(spark, tmp_path_factory):
    cfg = CrawlConfig(
        max_depth=3, default_delay_ms=1000, honor_robots=False,
        redirect_requeue=False,
    )
    pages = {p["url"]: p for p in PAGES}
    sim = CrawlSimulator(pages, {HOST: None}, cfg).run(SEEDS)
    urls = [r["url"] for r in sim.fetch_log]
    assert urls.count(f"{B}/t") == 1
    tmp = tmp_path_factory.mktemp("requeue_off")
    pages_df = spark.createDataFrame(
        pd.DataFrame(PAGES)[PAGES_COLUMNS], schema=PAGES_SCHEMA
    )
    robots_df = spark.createDataFrame(
        [(HOST, None)], "host string, body string"
    )
    eng = CrawlEngine(spark, str(tmp / "c"), cfg, pages_df, robots_df)
    eng.bootstrap(SEEDS)
    eng.run()
    got = eng.fetch_log().toPandas()
    assert got["url"].tolist() == urls
