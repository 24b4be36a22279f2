"""Reference-trail variant marking (ProcessFinalize.java:205-219):
a site linking both ``HTTP://Host/A`` and ``http://host/a`` fetches
the page exactly once (normalized-url URL-seen), and with
``record_url_variants`` the ledger row carries the raw spellings."""

from pyspark.sql import functions as F

from crawlspark.config import CrawlConfig
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine

HOST = "h.example"
ROOT = f"http://{HOST}/"
CANON_A = f"http://{HOST}/a"
VARIANT_A = "HTTP://H.example:80/a"  # same page, pre-normalization form
UPPER_PATH = f"http://{HOST}/B"  # path case is significant: a DIFFERENT url


def _html(links):
    return (
        "<html><body>"
        + "".join(f'<a href="{l}">x</a>' for l in links)
        + "</body></html>"
    )


def _site(spark):
    pages = [
        (ROOT, 200, _html([VARIANT_A, CANON_A, UPPER_PATH]), None),
        (CANON_A, 200, _html([]), None),
        (UPPER_PATH, 200, _html([]), None),
    ]
    pages_df = spark.createDataFrame(
        pages, "url string, status int, html string, redirect_to string"
    )
    robots_df = spark.createDataFrame(
        [(HOST, None)], "host string, body string"
    )
    return pages_df, robots_df


def test_variant_not_refetched_and_trail_recorded(spark, tmp_path):
    cfg = CrawlConfig(
        max_depth=2, default_delay_ms=1000, record_url_variants=True
    )
    pages_df, robots_df = _site(spark)
    eng = CrawlEngine(spark, str(tmp_path / "v"), cfg, pages_df, robots_df)
    eng.bootstrap([ROOT])
    eng.run()
    log = eng.fetch_log().toPandas()
    # one fetch per distinct normalized url — the raw variant linking
    # the same page is deduped, the case-different PATH is not
    assert sorted(log["url"]) == sorted([ROOT, CANON_A, UPPER_PATH])
    # oracle agreement on the fetch sequence (it normalizes the same way)
    sim = CrawlSimulator(
        {u: {"status": s, "html": h, "redirect_to": r}
         for u, s, h, r in [
             (ROOT, 200, _html([VARIANT_A, CANON_A, UPPER_PATH]), None),
             (CANON_A, 200, _html([]), None),
             (UPPER_PATH, 200, _html([]), None),
         ]},
        {HOST: None},
        cfg,
    ).run([ROOT])
    assert log["url"].tolist() == [r["url"] for r in sim.fetch_log]
    # the raw spelling is recorded on the canonical row's trail
    led = (
        eng.levels.read()
        .filter(
            (F.col("url") == CANON_A) & (F.col("status") == "PROCESSED")
        )
        .select("raw_variants")
        .collect()
    )
    assert len(led) == 1
    # the recorded spelling is the RESOLVED absolute form (urljoin
    # lowercases the scheme during href resolution, before the
    # normalizer runs — same as the reference's resolved reference)
    assert led[0]["raw_variants"] == ["http://H.example:80/a"]


def test_variants_off_by_default_column_null(spark, tmp_path):
    cfg = CrawlConfig(max_depth=2, default_delay_ms=1000)
    pages_df, robots_df = _site(spark)
    eng = CrawlEngine(spark, str(tmp_path / "nv"), cfg, pages_df, robots_df)
    eng.bootstrap([ROOT])
    eng.run()
    vals = (
        eng.levels.read().select("raw_variants").distinct().collect()
    )
    assert [v["raw_variants"] for v in vals] == [None]


def test_loser_variant_absorbed_by_winner(spark, tmp_path):
    """Variants from same-superstep duplicate discoveries (the
    first_wins 'losers') must land on the winning row: here the
    canonical spelling is linked FIRST (so it wins the dedup) and the
    raw variant second — the loser's raw spelling still gets recorded
    (ProcessFinalize.java:205-219 marks ALL reference variations)."""
    cfg = CrawlConfig(
        max_depth=2, default_delay_ms=1000, record_url_variants=True
    )
    pages = [
        (ROOT, 200, _html([CANON_A, VARIANT_A]), None),
        (CANON_A, 200, _html([]), None),
    ]
    pages_df = spark.createDataFrame(
        pages, "url string, status int, html string, redirect_to string"
    )
    robots_df = spark.createDataFrame(
        [(HOST, None)], "host string, body string"
    )
    eng = CrawlEngine(spark, str(tmp_path / "lv"), cfg, pages_df, robots_df)
    eng.bootstrap([ROOT])
    eng.run()
    led = (
        eng.levels.read()
        .filter(
            (F.col("url") == CANON_A) & (F.col("status") == "PROCESSED")
        )
        .select("raw_variants")
        .collect()
    )
    assert len(led) == 1
    assert led[0]["raw_variants"] == ["http://H.example:80/a"]
