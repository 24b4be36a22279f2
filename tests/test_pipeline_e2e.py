"""End-to-end composition: the crawl's own committed corpus flows
through the full training-data operator chain — dedup (exact +
MinHash + phash near-dup), quality scoring, decontamination,
deterministic splits, sampling weights — proving the operator
families compose over real engine output, not just over the fixture
tables. This is the "switch your pipeline to this repo" path."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """Crawl a duplicate-heavy synthetic site and shape the committed
    docs as a text corpus (doc_id, source, text, phash)."""
    from crawlspark.config import CrawlConfig
    from crawlspark.plans.superstep import CrawlEngine
    from crawlspark.sinks.committers import resolve_operations
    from crawlspark.sources.webgen import SiteParams, build_site

    site = build_site(
        SiteParams(
            seed=77, n_hosts=4, depth=3, branching=4, dup_pct=0.35,
            redirect_pct=0.05, cross_pct=0.3, n_seed_hosts=4,
        )
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("e2e")),
        CrawlConfig(max_depth=3, default_delay_ms=100),
        spark.createDataFrame(site.pages),
        spark.createDataFrame(site.robots),
    )
    eng.bootstrap([r["url"] for r in site.seeds.to_dict("records")])
    eng.run()
    docs = resolve_operations(eng.docs_df())
    one = docs.select(
        F.col("seq").alias("doc_id"),
        F.regexp_extract("image_id", r"^[a-z]+://([^/]+)", 1).alias(
            "source"
        ),
        F.col("caption").alias("text"),
        "phash",
    )
    # the engine's within-run DUPLICATE outcome makes one crawl's
    # committed docs content-unique; the cross-crawl merge (two
    # snapshots, overlapping pages) is where corpus-level dedup
    # actually runs — model it by unioning a partial re-crawl
    second = one.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    return one.unionByName(second).cache()


def test_corpus_shape(corpus):
    n = corpus.count()
    assert n > 50
    assert corpus.filter(F.col("text").isNull()).count() == 0
    assert corpus.select("source").distinct().count() == 4


def test_exact_dedup_finds_site_duplicates(corpus):
    from crawlspark.operators.textops import exact_dup_groups

    groups = exact_dup_groups(corpus).collect()
    # the overlapping snapshot guarantees non-vacuous dup groups
    assert len(groups) > 0
    assert all(r["n_dups"] >= 2 for r in groups)


def test_minhash_pairs_cover_exact_duplicates(corpus):
    from crawlspark.operators.textops import (
        fingerprints,
        minhash_dup_pairs,
    )

    fps = fingerprints(corpus).toPandas()
    by_fp: dict = {}
    for r in fps.itertuples():
        by_fp.setdefault(r.fingerprint, []).append(r.doc_id)
    exact_pairs = {
        (min(a, b), max(a, b))
        for ids in by_fp.values()
        for a in ids
        for b in ids
        if a < b
    }
    got = {
        (r["a"], r["b"])
        for r in minhash_dup_pairs(corpus, threshold=0.9).collect()
    }
    # identical texts have identical signatures -> every exact pair
    # must surface through the LSH band join
    assert exact_pairs <= got
    assert len(got) >= len(exact_pairs)


def test_phash_neardup_on_crawled_payloads(corpus):
    from crawlspark.operators.similarity import hamming64_dup_pairs

    sigs = corpus.select("doc_id", F.col("phash").alias("sig"))
    pairs = hamming64_dup_pairs(sigs, max_dist=0).collect()
    # duplicate pages render duplicate images -> distance-0 pairs
    assert len(pairs) > 0


def test_quality_decontaminate_split_mix_compose(corpus):
    from crawlspark.operators.textops import (
        decontaminate,
        quality_scores,
        source_mix,
        split_assign,
        stratified_sample,
    )

    n = corpus.count()
    q = quality_scores(corpus)
    assert q.count() == n

    bench = corpus.filter(F.col("doc_id") % 13 == 0)
    rest = corpus.filter(F.col("doc_id") % 13 != 0)
    deco = decontaminate(rest, bench, n=3)
    assert deco.count() == rest.count()
    flagged = deco.filter(F.col("contaminated")).count()
    # duplicate-heavy site: some corpus docs share 3-grams with bench
    assert flagged > 0

    splits = split_assign(
        corpus, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    by_split = {
        r["split"]: r["n"]
        for r in splits.groupBy("split").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert sum(by_split.values()) == n  # total partition, no drops

    mix = source_mix(corpus).collect()
    assert len(mix) == 4
    assert sum(r["weight_ppm"] for r in mix) <= 1_000_000
    assert all(r["n_unique_docs"] <= r["n_docs"] for r in mix)

    sampled = stratified_sample(
        corpus, rates={}, default_rate=0.5, strata_col="source"
    )
    assert 0 < sampled.count() < n
