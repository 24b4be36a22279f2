"""The crawl engine: a driver-side BFS superstep loop over DataFrames.

Each superstep processes the entire QUEUED frontier level at once —
the batch-synchronous re-expression of the reference's
"N threads polling a FIFO queue until empty"
(cmd/crawl/pipeline/process/CrawlerProcessStep.java:41-43,162-176).
Strict FIFO is preserved as a *total order*, not a data structure:
every ledger row carries a dense ``seq`` assigned in discovery order
(parents before children, per-document link order within a parent), so
"the fetch sequence" is simply ORDER BY seq — identical to the
reference's MVStore monotone queue keys (MVStoreCacheQueue.java:27-35).

Ledger storage is split so per-superstep writes are O(level), never
O(ledger) — the property that survives a 10^10-URL frontier:

* ``archive`` — append-only parts, one per superstep, holding rows
  whose state is final (PROCESSED and REJECTED). Nothing here is ever
  rewritten; on Iceberg these are plain appends to a table bucketed by
  ``seen_key`` so the URL-seen anti-join prunes partitions.
* ``frontier`` — a snapshot per superstep holding only the QUEUED
  level (small); fully consumed by the next superstep.

Superstep dataflow (all declarative; Catalyst/AQE plan it):

  batch   = frontier snapshot                          (parquet scan)
  sched   = per-host politeness recurrence             (applyInPandas)
  fetched = batch LEFT JOIN pages ON url               (the fetch slot*)
  parsed  = canonical/robots-meta/links/md5/baseline   (Arrow UDFs + joins)
  outcome = CASE ladder + checksum first-wins window   (JVM)
  docs    = NEW/MODIFIED rows + image payload          (Arrow UDF)
  cands   = redirect ∪ canonical ∪ explode(links)
  queue pipeline: normalize → first-wins → Bloom prefilter +
                  exact anti-join vs archive∪frontier → depth/filters/
                  robots → assign dense seq            (range-partitioned)
  commit  = archive part + frontier/checksums/host-state snapshots +
            checkpoint manifest (atomic swap last)

*The fetch slot: tests/bench join a synthetic ``pages`` table
(FIXTURES.md §1 — the MockWebsite analog). A real-HTTP fetcher drops
into the same slot as a ``mapInPandas`` over (url) batches doing async
HTTP with per-fetcher retries (MultiFetcher.java:94-138 semantics);
everything downstream is unchanged.

Other scale notes: candidate dedup is a partitioned-Bloom prefilter +
exact anti-join on ``xxhash64(canonical_url)``; seq assignment is
range-partition + per-partition offsets (no global window); the
politeness recurrence is O(rows) numpy per host. No collect() ever
holds row data on the driver — only per-partition counts, metric
dicts, and the Bloom bitmap. Run metrics live in the checkpoint
manifest (driver json), not in Spark jobs.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig
from ..functions.links import extract_canonical_udf, extract_links_udf, robots_meta_udf
from ..functions.urls import normalize_url_udf, url_host_udf
from ..operators.dedup import BloomPrefilter, assign_seq, first_wins
from ..operators.politeness import schedule_hosts
from ..operators.robots_filter import build_robots_rules, host_delays, robots_verdict
from ..sources.docgen import make_document_udf
from .ledger import AppendTable, SnapshotTable

_TIMING = os.environ.get("CRAWLSPARK_TIMING", "") == "1"


class _Tick:
    """Opt-in per-phase wall timing (CRAWLSPARK_TIMING=1)."""

    def __init__(self, superstep: int):
        self.superstep = superstep
        self.t = time.time()

    def __call__(self, phase: str) -> None:
        if _TIMING:
            now = time.time()
            print(
                f"[timing] ss={self.superstep} {phase}: {now - self.t:.2f}s",
                flush=True,
            )
            self.t = now


LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seen_key", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("seq", T.LongType()),
        T.StructField("avail_ms", T.LongType()),
        T.StructField("sched_ms", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("outcome", T.StringType()),
        T.StructField("trail", T.ArrayType(T.StringType())),
        T.StructField("superstep", T.IntegerType()),
    ]
)

CAND_COLS = ["raw_url", "depth", "avail_ms", "trail", "parent_seq", "out_pos"]


@dataclass
class StepStats:
    superstep: int
    fetched: int = 0
    committed: int = 0
    queued_new: int = 0
    metrics: dict | None = None


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        cfg: CrawlConfig,
        pages_df: DataFrame,
        robots_df: DataFrame,
        baseline_df: DataFrame | None = None,
    ):
        """``baseline_df``: previous run's ledger delta input
        (url, checksum, depth, seq) — enables NEW/MODIFIED/UNMODIFIED
        outcomes, the orphan pass, and spoiled deletes (the ledger_a/
        ledger_b generation flip of CrawlerEntryLedger.java:619-658).
        Build it with ``load_baseline(spark, prev_workdir)``."""
        self.spark = spark
        self.workdir = workdir
        self.cfg = cfg
        self.baseline = baseline_df.cache() if baseline_df is not None else None
        self._orphans_done = baseline_df is None
        os.makedirs(workdir, exist_ok=True)
        self.pages = pages_df.select(
            F.col("url"),
            F.col("status").alias("http_status"),
            "html",
            "redirect_to",
        )
        self.rules = build_robots_rules(robots_df, cfg.user_agent).cache()
        self.delays = host_delays(self.rules).cache()
        self.archive = AppendTable(spark, os.path.join(workdir, "ledger_archive"))
        self.frontier = SnapshotTable(spark, os.path.join(workdir, "frontier"))
        self.host_state = SnapshotTable(spark, os.path.join(workdir, "host_state"))
        self.checksums = SnapshotTable(spark, os.path.join(workdir, "checksums"))
        self.documents = AppendTable(spark, os.path.join(workdir, "documents"))
        self.superstep = 0
        self.max_seq = 0
        self.committed_total = 0
        self.queued_remaining = 0
        self._metric_rows: list[tuple[str, str, int]] = []

    def _ledger_df(self) -> DataFrame:
        """All URL-seen rows: final archive parts ∪ live frontier."""
        fr = self.frontier.read()
        ar = self.archive.read()
        if ar is None:
            return fr
        return ar.unionByName(fr)

    # -- checkpoint manifest (per-run lineage) -----------------------------
    @property
    def _ckpt(self) -> str:
        return os.path.join(self.workdir, "checkpoint.json")

    def _save_ckpt(self) -> None:
        state = {
            "superstep": self.superstep,
            "max_seq": self.max_seq,
            "committed_total": self.committed_total,
            "queued_remaining": self.queued_remaining,
            "orphans_done": self._orphans_done,
            "frontier_snapshot": self.frontier.latest_id(),
            "host_state_snapshot": self.host_state.latest_id(),
            "checksums_snapshot": self.checksums.latest_id(),
            "metrics": self._metric_rows,
        }
        tmp = self._ckpt + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._ckpt)

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        workdir: str,
        cfg: CrawlConfig,
        pages_df: DataFrame,
        robots_df: DataFrame,
        baseline_df: DataFrame | None = None,
    ) -> "CrawlEngine":
        """Rebuild engine state from the last committed checkpoint.

        Replays identically: archive parts and snapshots are immutable,
        the manifest is swapped atomically after all writes, and every
        downstream computation is a pure function of (snapshots,
        config) — the analog of the reference's requeue-on-resume
        (CrawlerEntryLedger.java:206-241,487-511).
        """
        eng = cls(spark, workdir, cfg, pages_df, robots_df, baseline_df)
        with open(eng._ckpt) as f:
            state = json.load(f)
        eng.superstep = state["superstep"]
        eng.max_seq = state["max_seq"]
        eng.committed_total = state["committed_total"]
        eng.queued_remaining = state["queued_remaining"]
        eng._orphans_done = state.get("orphans_done", baseline_df is None)
        eng._metric_rows = [tuple(r) for r in state.get("metrics", [])]
        # drop any partial writes from a crashed superstep
        part = (
            f"{state['superstep'] - 1:06d}"
            if state["superstep"] > 0
            else "0-bootstrap"
        )
        eng.documents.truncate_after(part)
        eng.archive.truncate_after(part)
        return eng

    # -- bootstrap ---------------------------------------------------------
    def bootstrap(self, seed_urls: list[str]) -> None:
        """Seed enqueue (QueueBootstrapper analog; skipped on resume —
        QueueBootstrapper.java:74-79)."""
        rows = [(u, 0, 0, [], -1, i) for i, u in enumerate(seed_urls)]
        cand = self.spark.createDataFrame(
            rows,
            schema="raw_url string, depth int, avail_ms long, "
            "trail array<string>, parent_seq long, out_pos int",
        )
        empty = self.spark.createDataFrame([], LEDGER_SCHEMA)
        new_rows, stats = self._queue_pipeline(cand, empty, len(seed_urls))
        self.frontier.write(new_rows.filter(F.col("status") == "QUEUED"), 0)
        rejected = new_rows.filter(F.col("status") != "QUEUED")
        # "0-bootstrap" sorts before "000000" so resume truncation
        # (drop parts > last completed superstep) never removes it.
        self.archive.append(rejected, "0-bootstrap")
        new_rows.unpersist()
        self.host_state.write(
            self.spark.createDataFrame([], "host string, last_sched_ms long"), 0
        )
        self.checksums.write(
            self.spark.createDataFrame([], "checksum string, seq long"), 0
        )
        self.queued_remaining = stats["DOCUMENT_QUEUED"]
        self._record_metrics(stats, "0-bootstrap")
        self._save_ckpt()

    # -- queue pipeline (§2.2 stage order) ---------------------------------
    def _queue_pipeline(
        self, cand: DataFrame, ledger: DataFrame, n_cand: int
    ) -> tuple[DataFrame, dict]:
        """Candidates -> new ledger rows (QUEUED or REJECTED_*), plus
        metric counts. Stage order fixed at WebDocPipelines.java:58-65.
        ``n_cand`` is precomputed by the caller (avoids re-running the
        candidate lineage just for a count)."""
        cfg = self.cfg
        c = cand.withColumn("url", normalize_url_udf(F.col("raw_url"))).drop(
            "raw_url"
        )
        c = c.filter(F.col("url").isNotNull())
        c = first_wins(c, "url", ["parent_seq", "out_pos"])

        # URL-seen: Bloom prefilter (probable) + exact anti-join (exact).
        c = c.withColumn("seen_key", F.xxhash64(F.col("url")))
        ledger_keys = ledger.select("url", "seen_key")
        if self.queued_remaining + self.max_seq >= cfg.bloom_prefilter_min_ledger:
            bloom = BloomPrefilter(cfg.bloom_bits)
            bloom.add_df(ledger_keys)
            maybe, fresh = bloom.filter_candidates(c)
            maybe_new = maybe.join(ledger_keys.select("url"), "url", "left_anti")
            c = fresh.unionByName(maybe_new)
        else:
            c = c.join(ledger_keys.select("url"), "url", "left_anti")

        c = c.withColumn("host", url_host_udf(F.col("url")))

        too_deep = (
            (F.lit(cfg.max_depth) >= 0) & (F.col("depth") > cfg.max_depth)
            if cfg.max_depth >= 0
            else F.lit(False)
        )
        filtered = F.lit(False)
        for pat in cfg.exclude_patterns:
            filtered = filtered | F.col("url").rlike(pat)
        if cfg.include_patterns:
            any_inc = F.lit(False)
            for pat in cfg.include_patterns:
                any_inc = any_inc | F.col("url").rlike(pat)
            filtered = filtered | ~any_inc

        if cfg.honor_robots:
            verdict = robots_verdict(c.select("url", "host"), self.rules)
            c = c.join(verdict, "url", "left")
        else:
            c = c.withColumn("robots_ok", F.lit(True))

        c = c.withColumn(
            "outcome",
            F.when(too_deep, "TOO_DEEP")
            .when(filtered, "FILTERED")
            .when(~F.coalesce(F.col("robots_ok"), F.lit(True)), "ROBOTS_TXT")
            .otherwise(F.lit(None).cast("string")),
        ).withColumn(
            "status",
            F.when(F.col("outcome").isNull(), "QUEUED").otherwise("REJECTED"),
        )

        # cache before assign_seq: range partitioning samples its input
        # (an extra pass), which must not re-run the UDF/join lineage
        c = c.cache()
        seq_df = assign_seq(c, ["parent_seq", "out_pos"], self.max_seq)
        new_rows = seq_df.select(
            "url",
            "seen_key",
            "host",
            "depth",
            "seq",
            "avail_ms",
            F.lit(None).cast("long").alias("sched_ms"),
            "status",
            "outcome",
            "trail",
            F.lit(self.superstep).cast("int").alias("superstep"),
        ).cache()

        by_status = {
            (r["status"], r["outcome"]): r["count"]
            for r in new_rows.groupBy("status", "outcome").count().collect()
        }
        n_new = sum(by_status.values())
        stats = {
            "DOCUMENT_QUEUED": by_status.get(("QUEUED", None), 0),
            "REJECTED_TOO_DEEP": by_status.get(("REJECTED", "TOO_DEEP"), 0),
            "REJECTED_FILTER": by_status.get(("REJECTED", "FILTERED"), 0),
            "REJECTED_ROBOTS_TXT": by_status.get(("REJECTED", "ROBOTS_TXT"), 0),
            "CANDIDATES": n_cand,
            "DUPLICATE_OR_BAD_SKIPPED": n_cand - n_new,
        }
        self.max_seq += n_new
        c.unpersist()
        if hasattr(seq_df, "_assign_seq_cache"):
            seq_df._assign_seq_cache.unpersist()
        return new_rows, stats

    # -- one superstep ------------------------------------------------------
    def step(self) -> StepStats | None:
        """Process the whole QUEUED level; None when the crawl is done."""
        cfg = self.cfg
        if self.queued_remaining <= 0:
            return None
        if cfg.max_docs is not None and self.committed_total >= cfg.max_docs:
            return None
        tick = _Tick(self.superstep)
        batch = self.frontier.read().drop("sched_ms")

        sched = schedule_hosts(
            batch, self.delays, self.host_state.read(), cfg.default_delay_ms
        )
        fetched = sched.join(self.pages, "url", "left")

        is200 = F.col("http_status") == 200
        parsed = (
            fetched.withColumn(
                "canonical",
                F.when(
                    is200,
                    normalize_url_udf(
                        extract_canonical_udf(F.col("url"), F.col("html"))
                    ),
                ),
            )
            .withColumn("rm", F.when(is200, robots_meta_udf(F.col("html"))))
            .withColumn("checksum", F.when(is200, F.md5(F.col("html"))))
        )
        noncanon = (
            is200
            & F.col("canonical").isNotNull()
            & (F.col("canonical") != F.col("url"))
        )
        noindex = F.coalesce(F.col("rm.noindex"), F.lit(False))
        nofollow = F.coalesce(F.col("rm.nofollow"), F.lit(False))
        followable = (
            is200
            & ~noncanon
            & ~nofollow
            & (F.lit(cfg.max_depth < 0) | (F.col("depth") < F.lit(cfg.max_depth)))
        )
        parsed = parsed.withColumn(
            "links",
            F.when(followable, extract_links_udf(F.col("url"), F.col("html"))),
        )

        # incremental delta: previous run's checksum for this url
        # (ChecksumStageUtil.java:46-104 — no baseline => NEW, equal =>
        # UNMODIFIED, different => MODIFIED)
        committable = is200 & ~noncanon & ~noindex
        if self.baseline is not None:
            parsed = parsed.join(
                self.baseline.select("url", F.col("checksum").alias("base_ck")),
                "url",
                "left",
            )
        else:
            parsed = parsed.withColumn("base_ck", F.lit(None).cast("string"))
        unmod = F.col("base_ck").isNotNull() & (
            F.col("base_ck") == F.col("checksum")
        )

        # first-reference-wins content dedup (DedupService.java:88-99):
        # rank only rows that would register a checksum — noindex,
        # noncanonical, and UNMODIFIED rows never register, so they
        # must not occupy a rank slot.
        registers = committable & ~unmod
        w = (
            Window.partitionBy("checksum")
            .orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        parsed = parsed.withColumn(
            "dup_rank",
            F.when(
                registers, F.sum(F.when(registers, 1).otherwise(0)).over(w)
            ).otherwise(F.lit(None)),
        )
        old_ck = self.checksums.read().select(
            F.col("checksum"), F.lit(True).alias("ck_seen")
        )
        parsed = parsed.join(old_ck, "checksum", "left")

        is_redirect = F.col("http_status").isin(301, 302)
        parsed = parsed.withColumn(
            "outcome",
            F.when(F.col("http_status").isNull(), "NOT_FOUND")
            .when(F.col("http_status") == 404, "NOT_FOUND")
            .when(F.col("http_status") >= 500, "BAD_STATUS")
            .when(is_redirect, "REDIRECT")
            .when(noncanon, "NONCANONICAL")
            .when(noindex, "NOINDEX")
            .when(unmod, "UNMODIFIED")
            .when(
                F.coalesce(F.col("ck_seen"), F.lit(False))
                | (F.col("dup_rank") > 1),
                "DUPLICATE",
            )
            .when(F.col("base_ck").isNotNull(), "MODIFIED")
            .otherwise("NEW"),
        ).cache()

        # ---- outputs of this level ----
        processed = parsed.select(
            "url",
            "seen_key",
            "host",
            "depth",
            "seq",
            "avail_ms",
            "sched_ms",
            F.lit("PROCESSED").alias("status"),
            "outcome",
            "trail",
            F.lit(self.superstep).cast("int").alias("superstep"),
        )

        committed = parsed.filter(
            F.col("outcome").isin("NEW", "MODIFIED")
        ).select(F.col("url").alias("image_id"), "checksum", "seq", "depth")
        doc_udf = make_document_udf(cfg.image_w, cfg.image_h)
        docs = committed.withColumn("d", doc_udf(F.col("image_id"))).select(
            "image_id",
            F.col("d.bytes").alias("bytes"),
            F.col("d.w").alias("w"),
            F.col("d.h").alias("h"),
            F.col("d.fmt").alias("fmt"),
            F.col("d.caption").alias("caption"),
            F.col("d.phash").alias("phash"),
            "checksum",
            "seq",
            "depth",
            F.lit("upsert").alias("op"),
        )
        # spoiled: previously committed, now NOT_FOUND -> delete op
        # (GenericSpoiledReferenceStrategizer NOT_FOUND->DELETE mapping)
        if cfg.spoiled_delete:
            spoiled = parsed.filter(
                (F.col("outcome") == "NOT_FOUND") & F.col("base_ck").isNotNull()
            ).select(
                F.col("url").alias("image_id"),
                F.lit(None).cast("binary").alias("bytes"),
                F.lit(None).cast("int").alias("w"),
                F.lit(None).cast("int").alias("h"),
                F.lit(None).cast("string").alias("fmt"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("string").alias("checksum"),
                "seq",
                "depth",
                F.lit("delete").alias("op"),
            )
            docs = docs.unionByName(spoiled)

        # ---- next-level candidates ----
        redirects = parsed.filter(
            (F.col("outcome") == "REDIRECT")
            & (F.size("trail") < cfg.max_redirect_trail)
            & F.col("redirect_to").isNotNull()
        ).select(
            F.col("redirect_to").alias("raw_url"),
            "depth",
            F.col("sched_ms").alias("avail_ms"),
            F.concat(F.col("trail"), F.array(F.col("url"))).alias("trail"),
            F.col("seq").alias("parent_seq"),
            F.lit(0).alias("out_pos"),
        )
        canonicals = parsed.filter(
            (F.col("outcome") == "NONCANONICAL")
            & ~F.array_contains(F.col("trail"), F.col("canonical"))
        ).select(
            F.col("canonical").alias("raw_url"),
            "depth",
            F.col("sched_ms").alias("avail_ms"),
            F.concat(F.col("trail"), F.array(F.col("url"))).alias("trail"),
            F.col("seq").alias("parent_seq"),
            F.lit(0).alias("out_pos"),
        )
        links = (
            parsed.filter(F.col("links").isNotNull())
            .select(
                "depth",
                "sched_ms",
                F.col("seq").alias("parent_seq"),
                F.explode("links").alias("l"),
            )
            .select(
                F.col("l.url").alias("raw_url"),
                (F.col("depth") + 1).alias("depth"),
                F.col("sched_ms").alias("avail_ms"),
                F.array().cast("array<string>").alias("trail"),
                "parent_seq",
                F.col("l.pos").alias("out_pos"),
            )
        )
        cand = redirects.unionByName(canonicals).unionByName(links)

        # ---- level metrics (single aggregation job), which also gives
        # the exact candidate count so the queue pipeline needs no
        # extra count action over its UDF-heavy lineage ----
        agg_rows = (
            parsed.groupBy("outcome")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.coalesce(F.size("links"), F.lit(0))).alias("n_links"),
                F.sum(
                    F.when(
                        F.size("trail") >= cfg.max_redirect_trail, 1
                    ).otherwise(0)
                ).alias("n_loops"),
                F.sum(
                    F.when(
                        (F.size("trail") < cfg.max_redirect_trail)
                        & F.col("redirect_to").isNotNull(),
                        1,
                    ).otherwise(0)
                ).alias("n_redir_enq"),
                F.sum(
                    F.when(
                        ~F.coalesce(
                            F.array_contains(F.col("trail"), F.col("canonical")),
                            F.lit(False),
                        ),
                        1,
                    ).otherwise(0)
                ).alias("n_canon_enq"),
                F.sum(
                    F.when(F.col("base_ck").isNotNull(), 1).otherwise(0)
                ).alias("n_had_baseline"),
            )
            .collect()
        )
        tick("parse+agg")
        out_counts = {r["outcome"]: r["n"] for r in agg_rows}
        n_links = sum(r["n_links"] for r in agg_rows)
        redirect_loops = sum(
            r["n_loops"] for r in agg_rows if r["outcome"] == "REDIRECT"
        )
        n_cand = int(n_links)
        for r in agg_rows:
            if r["outcome"] == "REDIRECT":
                n_cand += int(r["n_redir_enq"])
            elif r["outcome"] == "NONCANONICAL":
                n_cand += int(r["n_canon_enq"])

        new_rows, qstats = self._queue_pipeline(cand, self._ledger_df(), n_cand)
        tick("queue_pipeline")

        spoiled_deletes = (
            sum(
                r["n_had_baseline"]
                for r in agg_rows
                if r["outcome"] == "NOT_FOUND"
            )
            if cfg.spoiled_delete
            else 0
        )
        stats = dict(qstats)
        stats.update(
            {
                "DOCUMENT_FETCHED": sum(out_counts.values()),
                "DOCUMENT_COMMITTED_UPSERT": out_counts.get("NEW", 0)
                + out_counts.get("MODIFIED", 0),
                "REJECTED_UNMODIFIED": out_counts.get("UNMODIFIED", 0),
                "DOCUMENT_COMMITTED_DELETE": spoiled_deletes,
                "REJECTED_NOTFOUND": out_counts.get("NOT_FOUND", 0),
                "REJECTED_BAD_STATUS": out_counts.get("BAD_STATUS", 0),
                "DOCUMENT_REDIRECTED": out_counts.get("REDIRECT", 0),
                "REJECTED_NONCANONICAL": out_counts.get("NONCANONICAL", 0),
                "REJECTED_NOINDEX": out_counts.get("NOINDEX", 0),
                "REJECTED_DUPLICATE": out_counts.get("DUPLICATE", 0),
                "REJECTED_REDIRECT_LOOP": redirect_loops,
                "URLS_EXTRACTED": int(n_links or 0),
            }
        )

        # ---- commit: O(level) writes only, manifest swap last ----
        sid = self.superstep + 1
        part = f"{self.superstep:06d}"
        self.archive.append(
            processed.unionByName(new_rows.filter(F.col("status") != "QUEUED")),
            part,
        )
        tick("archive_write")
        self.frontier.write(
            new_rows.filter(F.col("status") == "QUEUED"), sid
        )
        tick("frontier_write")

        new_state = (
            parsed.groupBy("host")
            .agg(F.max("sched_ms").alias("last_sched_ms"))
            .unionByName(self.host_state.read())
            .groupBy("host")
            .agg(F.max("last_sched_ms").alias("last_sched_ms"))
        )
        self.host_state.write(new_state, sid)
        tick("host_state_write")

        ck_next = self.checksums.read().unionByName(
            committed.select("checksum", "seq")
        )
        self.checksums.write(ck_next, sid)
        tick("checksums_write")

        self.documents.append(docs, part)
        tick("documents_write")
        self._record_metrics(stats, part)

        parsed.unpersist()
        new_rows.unpersist()

        self.committed_total += stats["DOCUMENT_COMMITTED_UPSERT"]
        self.queued_remaining = (
            self.queued_remaining
            - stats["DOCUMENT_FETCHED"]
            + stats["DOCUMENT_QUEUED"]
        )
        st = StepStats(
            superstep=self.superstep,
            fetched=stats["DOCUMENT_FETCHED"],
            committed=stats["DOCUMENT_COMMITTED_UPSERT"],
            queued_new=stats["DOCUMENT_QUEUED"],
            metrics=stats,
        )
        self.superstep = sid
        self._save_ckpt()
        return st

    def _inject_orphans(self) -> None:
        """Orphan pass: every baseline URL never rediscovered this run
        (RequeueOrphansForProcessingStep analog). PROCESS requeues them
        through the normal queue pipeline in baseline-seq order;
        DELETE emits delete ops for previously committed ones."""
        orphans = self.baseline.join(
            self._ledger_df().select("url"), "url", "left_anti"
        ).cache()
        strategy = self.cfg.orphan_strategy
        sid = self.superstep + 1
        part = f"{self.superstep:06d}"
        if strategy == "PROCESS":
            cand = orphans.select(
                F.col("url").alias("raw_url"),
                F.col("depth").cast("int").alias("depth"),
                F.lit(0).cast("long").alias("avail_ms"),
                F.array().cast("array<string>").alias("trail"),
                F.col("seq").cast("long").alias("parent_seq"),
                F.lit(0).alias("out_pos"),
            )
            n = orphans.count()
            new_rows, stats = self._queue_pipeline(cand, self._ledger_df(), n)
            stats["ORPHANS_REQUEUED"] = n
            self.archive.append(
                new_rows.filter(F.col("status") != "QUEUED"), part
            )
            self.frontier.write(
                new_rows.filter(F.col("status") == "QUEUED"), sid
            )
            new_rows.unpersist()
            self.queued_remaining += stats["DOCUMENT_QUEUED"]
            self._record_metrics(stats, part)
        elif strategy == "DELETE":
            deletes = orphans.filter(F.col("checksum").isNotNull()).select(
                F.col("url").alias("image_id"),
                F.lit(None).cast("binary").alias("bytes"),
                F.lit(None).cast("int").alias("w"),
                F.lit(None).cast("int").alias("h"),
                F.lit(None).cast("string").alias("fmt"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("string").alias("checksum"),
                F.col("seq").cast("long").alias("seq"),
                F.col("depth").cast("int").alias("depth"),
                F.lit("delete").alias("op"),
            )
            self.documents.append(deletes, part)
            n_del = deletes.count()
            self.frontier.write(self.frontier.read(), sid)
            self._record_metrics({"DOCUMENT_COMMITTED_DELETE": n_del}, part)
        else:  # IGNORE
            self.frontier.write(self.frontier.read(), sid)
        orphans.unpersist()
        self.host_state.write(self.host_state.read(), sid)
        self.checksums.write(self.checksums.read(), sid)
        self.superstep = sid
        self._save_ckpt()

    def run(self, max_supersteps: int = 10_000) -> list[StepStats]:
        out = []
        for _ in range(max_supersteps):
            st = self.step()
            if st is None:
                hit_max_docs = (
                    self.cfg.max_docs is not None
                    and self.committed_total >= self.cfg.max_docs
                )
                if not self._orphans_done and not hit_max_docs:
                    self._orphans_done = True
                    self._inject_orphans()
                    continue
                break
            out.append(st)
        return out

    # -- outputs -------------------------------------------------------------
    def _record_metrics(self, stats: dict, part: str) -> None:
        self._metric_rows.extend(
            (part, k, int(v)) for k, v in stats.items()
        )

    def fetch_log(self) -> DataFrame:
        """(url, host, depth, scheduled_at_ms, outcome) in fetch order."""
        return (
            self.archive.read()
            .filter(F.col("status") == "PROCESSED")
            .select(
                "seq",
                "url",
                "host",
                "depth",
                F.col("sched_ms").alias("scheduled_at_ms"),
                "outcome",
            )
            .orderBy("seq")
        )

    def urlseen(self) -> DataFrame:
        return self._ledger_df().select("url", "status", "outcome", "depth")

    def docs_df(self) -> DataFrame | None:
        return self.documents.read()

    def deletes_df(self) -> DataFrame | None:
        docs = self.documents.read()
        return docs.filter(F.col("op") == "delete") if docs is not None else None

    def metrics_df(self) -> DataFrame | None:
        if not self._metric_rows:
            return None
        return self.spark.createDataFrame(
            self._metric_rows, schema="superstep string, event string, count long"
        )


def load_baseline(spark: SparkSession, prev_workdir: str) -> DataFrame:
    """Previous run's ledger as the incremental baseline:
    (url, checksum, depth, seq) — checksum only for urls whose last
    document op was an upsert (the ledger_a->baseline flip of
    CrawlerEntryLedger.java:619-658 re-expressed as reading the prior
    run's final state)."""
    archive = AppendTable(
        spark, os.path.join(prev_workdir, "ledger_archive")
    ).read()
    docs = AppendTable(spark, os.path.join(prev_workdir, "documents")).read()
    base = archive.filter(F.col("status") == "PROCESSED").select(
        "url", "depth", "seq"
    )
    if docs is None:
        return base.withColumn("checksum", F.lit(None).cast("string"))
    cks = (
        docs.filter(F.col("op") == "upsert")
        .select(F.col("image_id").alias("url"), "checksum")
        .dropDuplicates(["url"])
    )
    return base.join(cks, "url", "left")
