"""Filesystem crawler — the crawler-fs analog.

Re-expresses Norconex's filesystem crawler from scratch as its own
small dataflow sharing the web engine's components, mirroring the
reference's architecture (crawler/fs is a separate crawler over
crawler/core, not a fetcher bolted into the web crawler):

* folder entries fetch their child paths and enqueue them at
  depth+1 (FolderPathsExtractorStage.java:44-76); only files become
  documents (:79-81 "return fsEntry.isFile()");
* per-file metadata carries FILE_SIZE and LAST_MODIFIED
  (FsDocMetadata.java:19-28, AbstractVfsFetcher metadata load);
* the incremental metadata checksum is ``"<lastModified>_<size>"``
  (FsMetadataChecksummer.java:33-64), driving the same
  NEW/MODIFIED/UNMODIFIED/orphan delta the web engine computes;
* include/exclude reference filters and max depth behave as the
  core queue pipeline's (DepthValidationStage /
  ReferenceFiltersStage semantics over paths).

Spark shape: a driver-paced BFS over DIRECTORY LEVELS (the same
superstep pattern as the web engine) — each level lists all its
directories in one distributed ``mapInPandas`` pass (os.scandir in
the workers; parallelism = directories per level, which at a
10^8-file tier is the natural fan-out), files accumulate as
DataFrame parts, and content loads lazily through
``fs_read_documents`` (bytes only for the docs that survive the
delta — the column-pruned "HEAD-before-GET" of a filesystem). Local
paths only in CI; the listing/read callables are injectable for
SMB/remote mounts (the reference's other VFS providers).
"""

from __future__ import annotations

import os
import stat as stat_mod
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FILES_SCHEMA = (
    "ref string, path string, depth int, size long, last_modified long"
)
_LIST_SCHEMA = (
    "path string, depth int, is_dir boolean, size long, "
    "last_modified long, dev_ino string"
)


@dataclass(frozen=True)
class FsCrawlConfig:
    max_depth: int = -1  # -1 unlimited (core DepthValidationStage)
    include_patterns: tuple[str, ...] = ()
    exclude_patterns: tuple[str, ...] = ()
    follow_symlinks: bool = False
    list_partitions: int = 0  # 0 = default parallelism


def _accept(path: str, cfg: FsCrawlConfig) -> bool:
    """ReferenceFiltersStage group semantics over a path: any exclude
    match rejects; when includes exist at least one must match."""
    import re

    for p in cfg.exclude_patterns:
        if re.search(p, path):
            return False
    if cfg.include_patterns:
        return any(re.search(p, path) for p in cfg.include_patterns)
    return True


def _list_level(batches: Iterator[pd.DataFrame], follow: bool
                ) -> Iterator[pd.DataFrame]:
    """One directory level -> its children (distributed os.scandir)."""
    for pdf in batches:
        rows = []
        for path, depth in zip(pdf["path"], pdf["depth"]):
            try:
                entries = sorted(
                    os.scandir(path), key=lambda e: e.name
                )
            except OSError:
                continue  # unreadable dir: skipped, like a VFS error
            for e in entries:
                try:
                    st = e.stat(follow_symlinks=follow)
                except OSError:
                    continue
                is_dir = stat_mod.S_ISDIR(st.st_mode)
                if e.is_symlink() and not follow:
                    continue
                rows.append(
                    (
                        e.path,
                        int(depth) + 1,
                        bool(is_dir),
                        0 if is_dir else int(st.st_size),
                        int(st.st_mtime_ns // 1_000_000),
                        # real directory identity: lets the BFS break
                        # symlink cycles (dir -> ancestor) without a
                        # driver-held visited set
                        f"{st.st_dev}:{st.st_ino}" if is_dir else None,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["path", "depth", "is_dir", "size",
                     "last_modified", "dev_ino"],
        )


def fs_crawl(
    spark: SparkSession,
    roots: list[str],
    cfg: FsCrawlConfig = FsCrawlConfig(),
) -> DataFrame:
    """Walk the roots; return the FILE ledger
    (ref, path, depth, size, last_modified), ref = ``file://<path>``.

    Seed files are depth 0 documents; seed directories list at depth
    0 so their children are depth 1 — the reference's seed contract.
    """
    n_part = cfg.list_partitions or max(
        2, spark.sparkContext.defaultParallelism
    )
    file_parts: list[DataFrame] = []
    dir_rows, file_rows = [], []
    for r in roots:
        r = r.removeprefix("file://")
        try:
            st = os.stat(r) if cfg.follow_symlinks else os.lstat(r)
        except OSError:
            continue
        if stat_mod.S_ISDIR(st.st_mode):
            dir_rows.append((r, 0, f"{st.st_dev}:{st.st_ino}"))
        elif _accept(r, cfg):
            file_rows.append(
                (r, 0, False, int(st.st_size),
                 int(st.st_mtime_ns // 1_000_000))
            )
    if file_rows:
        file_parts.append(
            spark.createDataFrame(
                [(p, d, s, m) for p, d, _i, s, m in file_rows],
                "path string, depth int, size long, last_modified long",
            )
        )
    level = (
        spark.createDataFrame(
            dir_rows, "path string, depth int, dev_ino string"
        ).select("path", "depth")
        if dir_rows
        else None
    )
    # visited REAL directories (st_dev:st_ino) — with follow_symlinks
    # a link to an ancestor would otherwise make the level BFS loop
    # forever with ever-deepening paths. Kept as a distributed frame
    # (anti-join per level), never a driver set, so the guard holds
    # at any directory count.
    seen = (
        spark.createDataFrame(
            dir_rows, "path string, depth int, dev_ino string"
        ).select("dev_ino").distinct().localCheckpoint()
        if (dir_rows and cfg.follow_symlinks)
        else None
    )
    while level is not None:
        listed = (
            level.repartition(n_part)
            .mapInPandas(
                lambda it: _list_level(it, cfg.follow_symlinks),
                schema=_LIST_SCHEMA,
            )
            .localCheckpoint()  # cut lineage per level, like the engine
        )
        if cfg.max_depth >= 0:
            # entries deeper than max_depth reject TOO_DEEP
            listed = listed.filter(F.col("depth") <= cfg.max_depth)
        files = listed.filter(~F.col("is_dir")).select(
            "path", "depth", "size", "last_modified"
        )
        file_parts.append(files)
        nxt = listed.filter(F.col("is_dir"))
        if cfg.max_depth >= 0:
            # a dir AT max_depth only yields too-deep children
            nxt = nxt.filter(F.col("depth") < cfg.max_depth)
        if seen is not None:
            nxt = (
                nxt.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("dev_ino")
                        .orderBy("depth", "path")
                    ),
                )
                .filter(F.col("rn") == 1)
                .drop("rn")
                .join(seen, "dev_ino", "left_anti")
                .localCheckpoint()
            )
            seen = seen.unionByName(
                nxt.select("dev_ino")
            ).localCheckpoint()
        nxt = nxt.select("path", "depth")
        level = nxt if nxt.limit(1).count() else None

    spark_empty = spark.createDataFrame(
        [], "path string, depth int, size long, last_modified long"
    )
    allf = spark_empty
    for part in file_parts:
        allf = allf.unionByName(part)
    import re as _re  # driver-side pattern precheck (compile errors early)

    for p in cfg.include_patterns + cfg.exclude_patterns:
        _re.compile(p)
    inc, exc = cfg.include_patterns, cfg.exclude_patterns
    if exc:
        for p in exc:
            allf = allf.filter(~F.col("path").rlike(p))
    if inc:
        cond = None
        for p in inc:
            c = F.col("path").rlike(p)
            cond = c if cond is None else (cond | c)
        allf = allf.filter(cond)
    return allf.select(
        F.concat(F.lit("file://"), F.col("path")).alias("ref"),
        "path",
        "depth",
        "size",
        "last_modified",
    )


def fs_metadata_checksum_col():
    """FsMetadataChecksummer.java:33-64: ``<lastModified>_<size>``."""
    return F.concat_ws(
        "_",
        F.col("last_modified").cast("string"),
        F.col("size").cast("string"),
    )


def fs_delta(current: DataFrame, baseline: DataFrame | None) -> DataFrame:
    """Incremental outcome per ref vs a previous run's ledger
    (ref, checksum): NEW / MODIFIED / UNMODIFIED, plus the baseline's
    orphans as DELETED rows — the web engine's ChecksumStageUtil +
    orphan-pass ladder applied to the fs checksum."""
    cur = current.withColumn("checksum", fs_metadata_checksum_col())
    if baseline is None:
        return cur.withColumn("outcome", F.lit("NEW"))
    # A baseline that is itself a previous fs_delta output carries
    # DELETED tombstone rows; those are not live documents. Left in,
    # they would be re-reported DELETED forever and would make a
    # deleted-then-recreated file (same checksum) read UNMODIFIED
    # instead of NEW — the reference's orphan pass only considers the
    # previous run's live ledger (CrawlerOrphanService analog).
    if "outcome" in baseline.columns:
        baseline = baseline.filter(F.col("outcome") != "DELETED")
    base = baseline.select(
        F.col("ref"), F.col("checksum").alias("base_checksum")
    )
    joined = cur.join(base, "ref", "left").withColumn(
        "outcome",
        F.when(F.col("base_checksum").isNull(), "NEW")
        .when(F.col("base_checksum") == F.col("checksum"), "UNMODIFIED")
        .otherwise("MODIFIED"),
    ).drop("base_checksum")
    orphans = (
        base.join(cur.select("ref"), "ref", "left_anti")
        .select(
            "ref",
            F.lit(None).cast("string").alias("path"),
            F.lit(None).cast("int").alias("depth"),
            F.lit(None).cast("long").alias("size"),
            F.lit(None).cast("long").alias("last_modified"),
            F.col("base_checksum").alias("checksum"),
            F.lit("DELETED").alias("outcome"),
        )
    )
    return joined.unionByName(orphans)


def fs_read_documents(files: DataFrame, max_bytes: int = -1) -> DataFrame:
    """Load content for a file ledger: + (bytes binary) column,
    read worker-side (the fetch of this crawler). ``max_bytes``
    truncates oversized files (the web fetcher's max_body_bytes
    analog); unreadable files yield null bytes rather than failing
    the job."""
    out_schema = files.sparkSession.createDataFrame(
        [], files.schema
    ).selectExpr("*", "cast(null as binary) bytes").schema

    def read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for p in pdf["path"]:
                try:
                    with open(p, "rb") as f:
                        blobs.append(
                            f.read(max_bytes) if max_bytes >= 0
                            else f.read()
                        )
                except OSError:
                    blobs.append(None)
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            yield pdf

    return files.mapInPandas(read, schema=out_schema)
