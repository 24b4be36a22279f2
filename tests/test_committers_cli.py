"""Committer sinks (SURVEY.md §2.12) + CLI (§2.14 Commands): the op
log folds to final state (last op per key wins, deletes drop keys),
file committers round-trip, and the spark-submit CLI crawls/exports."""

import pandas as pd
import pytest

from crawlspark.sinks import committers as C


@pytest.fixture()
def ops(spark):
    rows = [
        # key a: upsert then delete -> gone
        ("a", b"x1", "ck1", 1, "upsert"),
        ("a", None, None, 5, "delete"),
        # key b: upsert then newer upsert -> latest kept
        ("b", b"y1", "ck2", 2, "upsert"),
        ("b", b"y2", "ck3", 6, "upsert"),
        # key c: single upsert
        ("c", b"z", "ck4", 3, "upsert"),
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, checksum string, seq long, op string"
    )


def test_resolve_operations(ops):
    got = (
        C.resolve_operations(ops)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got["image_id"].tolist() == ["b", "c"]
    assert got[got.image_id == "b"]["checksum"].iloc[0] == "ck3"


def test_memory_committer(ops):
    mc = C.MemoryCommitter().commit(ops)
    reqs = mc.requests()
    assert {r["image_id"] for r in reqs if r["op"] == "upsert"} == {"b", "c"}
    assert {r["image_id"] for r in reqs if r["op"] == "delete"} == {"a"}


def test_file_committers(ops, spark, tmp_path):
    C.csv_committer(ops, str(tmp_path / "csv"))
    C.json_committer(ops, str(tmp_path / "json"))
    C.parquet_committer(ops, str(tmp_path / "pq"))
    csv = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    js = spark.read.json(str(tmp_path / "json"))
    pq = spark.read.parquet(str(tmp_path / "pq"))
    assert csv.count() == js.count() == pq.count() == 2
    assert "bytes_b64" in js.columns and "bytes_len" in csv.columns


def test_cli_crawl_and_export(spark, tmp_path):
    """Drive the CLI in-process (same session via getOrCreate)."""
    from crawlspark.cli import main
    from crawlspark.sources.webgen import SiteParams, build_site

    site = build_site(SiteParams(seed=5, n_hosts=2, depth=1, branching=3))
    site_pages = site.spark_pages_df(spark)
    site_pages.write.mode("overwrite").parquet(str(tmp_path / "pages"))
    site.spark_robots_df(spark).write.mode("overwrite").parquet(
        str(tmp_path / "robots")
    )
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text(
        "\n".join(r["url"] for r in site.seeds.to_dict("records")) + "\n"
    )
    rc = main(
        [
            "crawl",
            "--workdir", str(tmp_path / "run"),
            "--pages", str(tmp_path / "pages"),
            "--robots", str(tmp_path / "robots"),
            "--seeds", str(seeds_file),
            "--max-depth", "1",
            "--delay-ms", "500",
        ]
    )
    assert rc == 0
    rc = main(
        [
            "export",
            "--workdir", str(tmp_path / "run"),
            "--out", str(tmp_path / "out"),
            "--format", "parquet",
        ]
    )
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    assert "caption" in out.columns and "phash" in out.columns
