"""Committer sinks (SURVEY.md §2.12) + CLI (§2.14 Commands): the op
log folds to final state (last op per key wins, deletes drop keys),
file committers round-trip, and the spark-submit CLI crawls/exports."""

import re

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
    C.orc_committer(ops, str(tmp_path / "orc"))
    csv = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    js = spark.read.json(str(tmp_path / "json"))
    pq = spark.read.parquet(str(tmp_path / "pq"))
    orc = spark.read.orc(str(tmp_path / "orc"))
    assert csv.count() == js.count() == pq.count() == orc.count() == 2
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
    # same run through the SQL committer: table equals the folded log
    rc = main(
        [
            "export",
            "--workdir", str(tmp_path / "run"),
            "--out", str(tmp_path / "docs.db"),
            "--format", "sql",
        ]
    )
    assert rc == 0
    import sqlite3

    con = sqlite3.connect(str(tmp_path / "docs.db"))
    n_sql = con.execute("SELECT count(*) FROM docs").fetchone()[0]
    caps = dict(
        con.execute("SELECT image_id, caption FROM docs").fetchall()
    )
    con.close()
    assert n_sql == out.count()
    assert caps == {
        r["image_id"]: r["caption"]
        for r in out.select("image_id", "caption").collect()
    }


def test_cli_store_admin(spark, tmp_path, capsys):
    """clean / storeexport / storeimport / configcheck (CliClean,
    CliStoreExport, cluster CacheImporter.java:41-157 analogs)."""
    from crawlspark.cli import main
    from crawlspark.sources.webgen import SiteParams, build_site

    site = build_site(SiteParams(seed=7, n_hosts=1, depth=1, branching=2))
    site.spark_pages_df(spark).write.mode("overwrite").parquet(
        str(tmp_path / "pages")
    )
    site.spark_robots_df(spark).write.mode("overwrite").parquet(
        str(tmp_path / "robots")
    )
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text(
        "\n".join(r["url"] for r in site.seeds.to_dict("records")) + "\n"
    )
    run = tmp_path / "run"
    assert main(
        [
            "crawl",
            "--workdir", str(run),
            "--pages", str(tmp_path / "pages"),
            "--robots", str(tmp_path / "robots"),
            "--seeds", str(seeds_file),
            "--delay-ms", "100",
        ]
    ) == 0

    # archive, wipe, restore, resume-from-restored must be a no-op crawl
    assert main(["storeexport", "--workdir", str(run), "--out", str(tmp_path / "arch")]) == 0
    assert (tmp_path / "arch" / "checkpoint.json").exists()
    assert main(["clean", "--workdir", str(run)]) == 0
    assert not (run / "checkpoint.json").exists()
    # exporting a cleaned store fails loudly, not silently-empty
    assert main(["storeexport", "--workdir", str(run), "--out", str(tmp_path / "a2")]) == 1
    assert main(["storeimport", "--workdir", str(run), "--from", str(tmp_path / "arch")]) == 0
    assert (run / "checkpoint.json").exists()
    assert main(
        [
            "resume",
            "--workdir", str(run),
            "--pages", str(tmp_path / "pages"),
            "--robots", str(tmp_path / "robots"),
        ]
    ) == 0
    out = capsys.readouterr().out
    assert "resume done: 0 fetched" in out


def test_cli_configcheck(tmp_path, capsys):
    from crawlspark.cli import main

    assert main(["configcheck", "--workdir", str(tmp_path), "--max-depth", "2"]) == 0
    assert "config OK" in capsys.readouterr().out
    assert main(
        ["configcheck", "--workdir", str(tmp_path), "--include", "([bad"]
    ) == 1
    assert "bad regex" in capsys.readouterr().err


def test_config_validate_fields():
    from crawlspark.config import CrawlConfig, validate

    assert validate(CrawlConfig()) == []
    errs = validate(
        CrawlConfig(
            max_docs=0,
            orphan_strategy="NOPE",
            spoiled_strategies=(("NOT_FOUND", "EXPLODE"),),
            metadata_checksummer="bogus",
            stay_on_sitemap=True,
        )
    )
    joined = "\n".join(errs)
    assert "max_docs" in joined
    assert "orphan_strategy" in joined
    assert "EXPLODE" in joined
    assert "metadata_checksummer" in joined
    assert "stay_on_sitemap requires use_sitemaps" in joined
    # HEAD pass with nothing to run in it is a config error
    errs = validate(CrawlConfig(head_before_get=True))
    assert any("head_before_get" in e for e in errs)


def test_xml_committer(ops, spark, tmp_path):
    """XmlFileCommitter analog via Spark's native XML source."""
    C.xml_committer(ops, str(tmp_path / "xml"))
    back = (
        spark.read.format("xml").option("rowTag", "doc")
        .load(str(tmp_path / "xml"))
    )
    assert back.count() == 2
    assert {r["image_id"] for r in back.collect()} == {"b", "c"}
    assert "bytes_b64" in back.columns


def test_cli_site_mode_retries(spark, tmp_path, capsys):
    """--site fetcher mode: flaky pages 503 on first attempt; with
    --retries 1 every page commits (MultiFetcher.java:94-138 analog),
    and no join-path warning is printed."""
    from crawlspark.cli import main

    rc = main(
        [
            "crawl",
            "--workdir", str(tmp_path / "run_site"),
            "--site", "5:2:1:3:0.5",
            "--max-depth", "1",
            "--delay-ms", "10",
            "--retries", "1",
        ]
    )
    out = capsys.readouterr()
    assert rc == 0
    assert "crawl done" in out.out
    assert "--retries only applies" not in out.err
    # every fetched page commits: the flaky 503s succeeded on retry
    m = re.search(r"(\d+) fetched, (\d+) committed", out.out)
    fetched, committed = int(m.group(1)), int(m.group(2))
    assert fetched == committed > 0


def test_cli_site_mode_no_retries_fails_flaky(spark, tmp_path, capsys):
    """Same site without retries: flaky pages stay BAD_STATUS, so
    fewer documents commit than fetch."""
    from crawlspark.cli import main

    rc = main(
        [
            "crawl",
            "--workdir", str(tmp_path / "run_site2"),
            "--site", "5:2:1:3:0.5",
            "--max-depth", "1",
            "--delay-ms", "10",
        ]
    )
    out = capsys.readouterr()
    assert rc == 0
    m = re.search(r"(\d+) fetched, (\d+) committed", out.out)
    fetched, committed = int(m.group(1)), int(m.group(2))
    assert committed < fetched


def test_cli_crawl_releases_all_cached_frames(spark, tmp_path):
    """CLI teardown releases every persisted frame (r4 ADVICE: wire
    release_caches + engine.release into teardown): a crawl run adds
    ZERO net persistent RDDs to the session — repeated CLI calls on
    one long-lived JVM cannot accumulate storage. (Delta, not
    absolute: frames persisted by OTHER code before the run are
    deliberately out of release()'s reach.)"""
    from crawlspark.cli import main
    from crawlspark.plans.superstep import _persistent_rdd_ids
    from crawlspark.sources.webgen import SiteParams, build_site

    before = set(_persistent_rdd_ids(spark))

    site = build_site(
        SiteParams(seed=3, n_hosts=2, depth=2, branching=2,
                   n_seed_hosts=1)
    )
    spark.createDataFrame(site.pages).write.mode("overwrite").parquet(
        str(tmp_path / "pages")
    )
    spark.createDataFrame(site.robots).write.mode("overwrite").parquet(
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
            "--max-depth", "2",
            "--delay-ms", "500",
        ]
    )
    assert rc == 0
    leaked = set(_persistent_rdd_ids(spark)) - before
    assert not leaked, sorted(leaked)
