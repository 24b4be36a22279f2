"""Snapshot-versioned parquet tables (Iceberg-style, zero-dependency).

The reference keeps crawl state in mutable KV stores (MVStore /
Hazelcast CacheMaps, crawler/core/.../ledger/CrawlerEntryLedger.java).
We invert that into immutable table *snapshots*: every superstep
commits a new snapshot directory plus a JSON manifest, which gives us

* atomic per-superstep commits (write dir, then swap the manifest);
* time travel (any prior superstep's state is still on disk) — the
  ledger_a/ledger_b baseline flip of CrawlerEntryLedger.java:619-658
  becomes "read last run's final snapshot";
* exact resume: a killed run replays from the last manifest with
  identical inputs (requeue semantics analog of
  CrawlerEntryLedger.java:206-241,487-511).

On a cluster with a catalog this class is swapped for Iceberg
(``df.writeTo(table)`` + snapshot ids); the engine only uses
``write``/``read``/``latest_id``, which map 1:1.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _manifest(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def latest_id(self) -> int | None:
        if not os.path.exists(self._manifest):
            return None
        with open(self._manifest) as f:
            return json.load(f)["snapshot"]

    def _snap_dir(self, sid: int) -> str:
        return os.path.join(self.path, f"snap-{sid:06d}")

    def write(self, df: DataFrame, snapshot_id: int) -> None:
        """Commit a new snapshot: data first, manifest swap last."""
        target = self._snap_dir(snapshot_id)
        if os.path.exists(target):
            shutil.rmtree(target)
        df.write.mode("overwrite").parquet(target)
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snapshot_id}, f)
        os.replace(tmp, self._manifest)  # atomic on POSIX

    def read(self, snapshot_id: int | None = None) -> DataFrame | None:
        sid = snapshot_id if snapshot_id is not None else self.latest_id()
        if sid is None:
            return None
        return self.spark.read.parquet(self._snap_dir(sid))

    def prune(self, keep_last: int = 3) -> None:
        """Drop old snapshot dirs (keep the newest N for time travel)."""
        sid = self.latest_id()
        if sid is None:
            return
        for name in os.listdir(self.path):
            if name.startswith("snap-"):
                n = int(name.split("-")[1])
                if n <= sid - keep_last:
                    shutil.rmtree(os.path.join(self.path, name))


class AppendTable:
    """Append-only parquet table (ledger levels / documents / metrics).

    An explicit ``schema`` makes empty parts and the no-parts case read
    back as an empty DataFrame instead of failing schema inference —
    required for the ledger, whose per-superstep parts may legally hold
    zero rows of a given status.
    """

    def __init__(self, spark: SparkSession, path: str, schema=None):
        self.spark = spark
        self.path = path
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    def _reader(self):
        r = self.spark.read
        return r.schema(self.schema) if self.schema is not None else r

    def append(self, df: DataFrame, part: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"part-{part}"))

    def parts(self) -> list[str]:
        return sorted(d for d in os.listdir(self.path) if d.startswith("part-"))

    def read(self) -> DataFrame | None:
        parts = [os.path.join(self.path, d) for d in self.parts()]
        if not parts:
            if self.schema is not None:
                return self.spark.createDataFrame([], self.schema)
            return None
        return self._reader().parquet(*parts)

    def read_part(self, part: str) -> DataFrame:
        return self._reader().parquet(os.path.join(self.path, f"part-{part}"))

    def truncate_after(self, part: str) -> None:
        """Resume support: drop parts written after a checkpoint."""
        for d in os.listdir(self.path):
            if d.startswith("part-") and d[5:] > part:
                shutil.rmtree(os.path.join(self.path, d))
