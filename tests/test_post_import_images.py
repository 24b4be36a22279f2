"""PostImportLinksStage parity + ImageTransformer / featured-image
selection (PostImportLinksStage.java:42-90; importer ImageTransformer;
FeaturedImageResolver.java:99-254 minDimensions/largest)."""

import numpy as np
import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.functions.links import extract_post_links
from crawlspark.oracle.simulator import CrawlSimulator
from crawlspark.plans.superstep import CrawlEngine
from crawlspark.sources.webgen import SiteParams, build_site


def test_extract_post_links_unit():
    html = (
        '<a href="http://h.test/a.html">a</a>'
        '<span data-post-url="http://h.test/a.html">dup</span>'
        '<span data-post-url="/rel.html">rel</span>'
        '<span data-post-url="http://h.test/z.html#frag">z</span>'
        '<span data-post-url="mailto:x@y">bad</span>'
    )
    extracted = [("http://h.test/a.html", 0)]
    got = extract_post_links("http://h.test/base/", html, extracted)
    # dup of extracted dropped, relative resolved, fragment stripped,
    # unsupported scheme dropped, sorted
    assert got == [
        "http://h.test/rel.html",
        "http://h.test/z.html",
    ]
    assert extract_post_links("http://h.test/", None, []) == []


def test_post_import_crawl_parity(spark, tmp_path):
    p = SiteParams(
        seed=21,
        n_hosts=2,
        depth=3,
        branching=3,
        post_pct=0.5,
        dup_pct=0.1,
        variant_pct=0.2,
        n_seed_hosts=2,
    )
    site = build_site(p)
    cfg = CrawlConfig(
        max_depth=3, default_delay_ms=1000, post_import_links=True
    )
    seeds = [r["url"] for r in site.seeds.to_dict("records")]
    sim = CrawlSimulator(site.pages_dict(), site.robots_dict(), cfg).run(
        seeds
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "post"),
        cfg,
        site.spark_pages_df(spark),
        site.spark_robots_df(spark),
    )
    eng.bootstrap(seeds)
    stats = eng.run()
    got = eng.fetch_log().toPandas()
    want = pd.DataFrame(sim.fetch_log)
    assert len(got) == len(want), (len(got), len(want))
    for col in ["url", "depth", "outcome", "scheduled_at_ms"]:
        assert got[col].tolist() == want[col].tolist(), col
    # the stage actually fired on both sides
    n_post = sum(s.metrics.get("URLS_POST_IMPORTED", 0) for s in stats)
    assert n_post > 0
    assert n_post == sim.metrics["URLS_POST_IMPORTED"]

    # disabled => strictly fewer or equal fetches, and no metric
    cfg_off = CrawlConfig(max_depth=3, default_delay_ms=1000)
    sim_off = CrawlSimulator(
        site.pages_dict(), site.robots_dict(), cfg_off
    ).run(seeds)
    assert len(sim_off.fetch_log) <= len(sim.fetch_log)


def test_image_transform_ops(spark):
    from crawlspark.functions.images import (
        apply_ops,
        pick_featured,
        resize_pixels,
        transform_image_udf,
    )
    from crawlspark.sources.docgen import (
        decode_image,
        encode_image,
        pixels_for,
    )
    import pyspark.sql.functions as F

    px = pixels_for("img://a", 32, 24)
    assert resize_pixels(px, 16, 12).shape == (12, 16, 3)
    assert resize_pixels(px, 64, 48).shape == (48, 64, 3)
    assert apply_ops(px, (("rotate", 90),)).shape == (32, 24, 3)
    assert apply_ops(px, (("crop", 4, 2, 10, 10),)).shape == (10, 10, 3)
    assert np.array_equal(
        apply_ops(px, (("flip", "h"), ("flip", "h"))), px
    )
    with pytest.raises(ValueError):
        apply_ops(px, (("rotate", 45),))

    # Spark surface: scale+rotate chain, png re-encode, lossless check
    df = spark.createDataFrame(
        [("a", encode_image(px, "png"), "png")],
        "image_id string, bytes binary, fmt string",
    )
    from crawlspark.sources.docgen import have_pil

    codecs = ["fake"] + (["real"] if have_pil() else [])
    expect = resize_pixels(px, 16, 12)[::-1, ::-1]
    for codec in codecs:
        t = transform_image_udf(
            (("scale", 16, 12), ("rotate", 180)), "png", codec=codec
        )
        row = (
            df.withColumn("t", t(F.col("bytes"), F.col("fmt")))
            .select("t.*")
            .collect()[0]
        )
        assert (row["w"], row["h"], row["fmt"]) == (16, 12, "png"), codec
        # png is lossless under both codecs -> bit-exact pixels
        assert np.array_equal(decode_image(row["bytes"]), expect), codec

    # featured-image pick: minDimensions filter + largest-by-area
    cand = spark.createDataFrame(
        [
            (
                "page1",
                [
                    {"url": "i1", "w": 10, "h": 10},
                    {"url": "i2", "w": 100, "h": 90},
                    {"url": "i3", "w": 95, "h": 96},
                ],
            ),
            ("page2", [{"url": "tiny", "w": 5, "h": 5}]),
        ],
        "page string, imgs array<struct<url:string,w:int,h:int>>",
    )
    got = cand.select(
        "page",
        pick_featured(F.col("imgs"), min_w=20, min_h=20).alias("pick"),
        pick_featured(F.col("imgs"), largest=False).alias("first_pick"),
    ).collect()
    by_page = {r["page"]: r for r in got}
    assert by_page["page1"]["pick"]["url"] == "i3"  # 95*96 > 100*90
    assert by_page["page1"]["first_pick"]["url"] == "i1"
    assert by_page["page2"]["pick"] is None  # nothing meets min dims
