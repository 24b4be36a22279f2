"""Filesystem crawler (crawler-fs analog): BFS depth assignment,
folder-vs-file contract, include/exclude filters, symlink policy,
lastmod_size incremental delta with orphan DELETED rows, lazy
content read with truncation. Reference contract:
FolderPathsExtractorStage.java:44-81, FsDocMetadata.java:19-28,
FsMetadataChecksummer.java:33-64."""

import os

from crawlspark.sources.fsfetch import (
    FsCrawlConfig,
    fs_crawl,
    fs_delta,
    fs_metadata_checksum_col,
    fs_read_documents,
)


def _tree(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "deep").mkdir()
    (tmp_path / "top.txt").write_text("top file")
    (tmp_path / "a" / "one.txt").write_text("one")
    (tmp_path / "a" / "two.log").write_text("two-log")
    (tmp_path / "a" / "deep" / "three.txt").write_text("three!")
    os.symlink("/nonexistent", tmp_path / "a" / "dangling")
    return tmp_path


def test_fs_crawl_depths_and_files_only(spark, tmp_path):
    root = _tree(tmp_path)
    got = {
        r["path"]: r.asDict()
        for r in fs_crawl(spark, [str(root)]).collect()
    }
    # only FILES are documents (folders never committed)
    assert set(got) == {
        str(root / "top.txt"),
        str(root / "a" / "one.txt"),
        str(root / "a" / "two.log"),
        str(root / "a" / "deep" / "three.txt"),
    }
    # depth: children of the seed dir are depth 1, grandchildren 2...
    assert got[str(root / "top.txt")]["depth"] == 1
    assert got[str(root / "a" / "one.txt")]["depth"] == 2
    assert got[str(root / "a" / "deep" / "three.txt")]["depth"] == 3
    # file metadata (FsDocMetadata FILE_SIZE / LAST_MODIFIED)
    assert got[str(root / "top.txt")]["size"] == len("top file")
    assert got[str(root / "top.txt")]["last_modified"] > 0
    # refs carry the file:// scheme
    assert all(d["ref"] == "file://" + d["path"] for d in got.values())


def test_fs_crawl_seed_file_max_depth_filters(spark, tmp_path):
    root = _tree(tmp_path)
    # a seed FILE is a depth-0 document
    seed_file = fs_crawl(spark, [str(root / "top.txt")]).collect()
    assert len(seed_file) == 1 and seed_file[0]["depth"] == 0
    # max_depth stops descent
    shallow = fs_crawl(
        spark, [str(root)], FsCrawlConfig(max_depth=1)
    ).collect()
    assert {r["path"] for r in shallow} == {str(root / "top.txt")}
    # exclude filter
    no_logs = fs_crawl(
        spark, [str(root)], FsCrawlConfig(exclude_patterns=(r"\.log$",))
    ).collect()
    assert all(not r["path"].endswith(".log") for r in no_logs)
    assert len(no_logs) == 3
    # include filter group: at least one must match
    only_txt = fs_crawl(
        spark, [str(root)], FsCrawlConfig(include_patterns=(r"\.txt$",))
    ).collect()
    assert {os.path.basename(r["path"]) for r in only_txt} == {
        "top.txt", "one.txt", "three.txt",
    }


def test_fs_delta_new_modified_unmodified_deleted(spark, tmp_path):
    root = _tree(tmp_path)
    first = fs_crawl(spark, [str(root)])
    baseline = first.withColumn(
        "checksum", fs_metadata_checksum_col()
    ).select("ref", "checksum").toPandas()
    # mutate: modify one, delete one, add one
    (root / "a" / "one.txt").write_text("one but longer now")
    os.unlink(root / "a" / "two.log")
    (root / "new.txt").write_text("fresh")
    second = fs_crawl(spark, [str(root)])
    delta = fs_delta(
        second, spark.createDataFrame(baseline)
    )
    got = {r["ref"]: r["outcome"] for r in delta.collect()}
    assert got["file://" + str(root / "new.txt")] == "NEW"
    assert got["file://" + str(root / "a" / "one.txt")] == "MODIFIED"
    assert got["file://" + str(root / "top.txt")] == "UNMODIFIED"
    assert got["file://" + str(root / "a" / "two.log")] == "DELETED"
    # no-baseline run: everything NEW
    fresh = fs_delta(second, None)
    assert {r["outcome"] for r in fresh.collect()} == {"NEW"}


def test_fs_read_documents_and_truncation(spark, tmp_path):
    root = _tree(tmp_path)
    files = fs_crawl(spark, [str(root)])
    docs = {
        r["path"]: bytes(r["bytes"])
        for r in fs_read_documents(files).collect()
    }
    assert docs[str(root / "a" / "deep" / "three.txt")] == b"three!"
    capped = {
        r["path"]: bytes(r["bytes"])
        for r in fs_read_documents(files, max_bytes=3).collect()
    }
    assert capped[str(root / "top.txt")] == b"top"


def test_fscrawl_cli_roundtrip(spark, tmp_path):
    """CLI surface: first run all-NEW, second run vs --baseline sees
    the modification and the delete; --read-bytes loads content."""
    from crawlspark.cli import main

    (tmp_path / "data").mkdir()
    root = _tree(tmp_path / "data")
    out1 = str(tmp_path / "ledger1")
    assert main([
        "fscrawl", "--root", str(root), "--out", out1, "--cores", "2",
    ]) == 0
    first = spark.read.parquet(out1)
    assert {r["outcome"] for r in first.collect()} == {"NEW"}
    (root / "top.txt").write_text("top file changed")
    os.unlink(root / "a" / "two.log")
    out2 = str(tmp_path / "ledger2")
    assert main([
        "fscrawl", "--root", str(root), "--out", out2,
        "--baseline", out1, "--read-bytes", "--cores", "2",
    ]) == 0
    got = {
        r["ref"]: r for r in spark.read.parquet(out2).collect()
    }
    assert got["file://" + str(root / "top.txt")]["outcome"] == "MODIFIED"
    assert bytes(
        got["file://" + str(root / "top.txt")]["bytes"]
    ) == b"top file changed"
    assert got["file://" + str(root / "a" / "two.log")]["outcome"] == (
        "DELETED"
    )
    assert got["file://" + str(root / "a" / "two.log")]["bytes"] is None


def test_fs_crawl_symlink_cycle_terminates(spark, tmp_path):
    """follow_symlinks=True with a dir -> ancestor link: the visited
    real-directory guard (st_dev:st_ino anti-join) breaks the cycle
    instead of BFS-ing forever with ever-deepening paths."""
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "f.txt").write_text("f")
    os.symlink(tmp_path, tmp_path / "a" / "loop")
    got = fs_crawl(
        spark, [str(tmp_path)], FsCrawlConfig(follow_symlinks=True)
    ).collect()
    # each real file reported exactly once (shallowest path wins)
    assert len(got) == 1
    assert got[0]["path"] == str(tmp_path / "a" / "f.txt")


def test_fs_delta_baseline_tombstones_filtered(spark, tmp_path):
    """A baseline that is itself a previous fs_delta output: DELETED
    tombstones must not be re-reported as DELETED again, and a file
    deleted then recreated with the same checksum is NEW."""
    from pyspark.sql import functions as F

    (tmp_path / "kept.txt").write_text("kept")
    cur = fs_crawl(spark, [str(tmp_path)])
    # simulate a previous run's FULL output: kept.txt live plus a
    # tombstone for gone.txt, whose checksum happens to equal the
    # recreated file's checksum
    kept_ck = (
        cur.withColumn("checksum", fs_metadata_checksum_col())
        .collect()[0]["checksum"]
    )
    baseline = spark.createDataFrame(
        [
            ("file://" + str(tmp_path / "kept.txt"), kept_ck,
             "UNMODIFIED"),
            ("file://" + str(tmp_path / "recreated.txt"), "9_9",
             "DELETED"),
        ],
        "ref string, checksum string, outcome string",
    )
    (tmp_path / "recreated.txt").write_text("x")
    cur2 = fs_crawl(spark, [str(tmp_path)])
    out = {
        r["ref"].rsplit("/", 1)[-1]: r["outcome"]
        for r in fs_delta(cur2, baseline).collect()
    }
    assert out == {"kept.txt": "UNMODIFIED", "recreated.txt": "NEW"}
