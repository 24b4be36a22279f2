"""Single-threaded reference crawl simulator — the behavioral oracle.

Implements, in plain Python over plain dicts, the exact crawl
semantics the Spark engine must reproduce (SURVEY.md §2-§3 invariant
list), mirroring the reference's test strategy of asserting committed
sets against a MemoryCommitter (WebCrawlingTestCapturer.java:41-66):

* strict FIFO by global discovery ``seq`` (MVStoreCacheQueue.java:27-35);
* exact-URL dedup at enqueue (CrawlerEntryLedger.java:361);
* depth+1 on extracted links; same depth on redirect/canonical targets
  (LinkExtractorStage.java:203 vs WebImporterPipelineUtil.java:153-154);
* robots longest-match, Allow wins only when strictly longer
  (RobotsTxtFiltersStage.java:94);
* per-site politeness serialization with delay precedence
  robots crawl-delay > default (AbstractDelayResolver.java:100-115;
  SiteDelay.java:44-58): sched = max(avail, last[host] + delay) where
  avail = the discovering parent's own scheduled time (a URL cannot be
  fetched before the page that revealed it);
* content-checksum dedup, first reference wins (DedupService.java:88-99);
* redirect trail capped at ``max_redirect_trail`` — the loop-break of
  WebImporterPipelineUtil.java:103-116;
* canonical pages: non-canonical doc rejected, canonical queued at the
  same depth, loop-break via the trail (CanonicalStage.java:140-163);
* noindex docs: links still extracted, doc not committed (stage order
  WebDocPipelines.java:105-107).

Documented deviations from the reference (identical in engine+oracle):
robots/filter-rejected candidates are recorded in the ledger (their
re-evaluation is deterministic, so "seen" is equivalent); metrics
count unique URLs, not repeat rejection events.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from ..config import CrawlConfig
from ..functions.links import extract_canonical, extract_links, extract_robots_meta
from ..functions.robots import RobotsMatcher, parse_robots_txt
from ..functions.urls import normalize_url, url_host
from ..operators.politeness import resolve_delay


def match_target(url: str) -> str:
    """Path(+query) a robots rule is matched against."""
    parts = urlsplit(url)
    t = parts.path or "/"
    if parts.query:
        t += "?" + parts.query
    return t


def content_checksum(html: str) -> str:
    """Content checksum: md5 hex of the body
    (Md5DocumentChecksummer.java:34-55 analog)."""
    return hashlib.md5(html.encode()).hexdigest()


@dataclass
class SimEntry:
    url: str
    host: str
    depth: int
    seq: int
    avail_ms: int
    trail: tuple[str, ...] = ()
    status: str = "QUEUED"
    outcome: str | None = None
    sched_ms: int | None = None
    # carried-forward content checksum for PREMATURE rows (the prior
    # run's cached doc state — GenericRecrawlableResolver keeps it)
    checksum: str | None = None
    # metadata checksum, set where the metadata stages ran (before the
    # body in HEAD mode, after noindex/canonical in GET mode)
    meta_ck: str | None = None
    # sitemap directives recorded at discovery (recrawlable resolver)
    sm_lastmod: str | None = None
    sm_changefreq: str | None = None


@dataclass
class SimResult:
    fetch_log: list[dict] = field(default_factory=list)
    ledger: dict[str, SimEntry] = field(default_factory=dict)
    committed: list[dict] = field(default_factory=list)
    deletes: list[str] = field(default_factory=list)
    metrics: Counter = field(default_factory=Counter)
    # dense row counter: seq of the next ledger ROW (a redirect requeue
    # adds a second row for an existing url, so len(ledger) no longer
    # tracks it)
    next_seq: int = 0

    def commit_entry(self, entry: SimEntry) -> None:
        entry.seq = self.next_seq
        self.next_seq += 1
        self.ledger[entry.url] = entry

    def baseline_dict(self) -> dict[str, dict]:
        """This run's ledger as the next run's incremental baseline
        (mirrors plans.superstep.load_baseline)."""
        return {
            url: {
                # the cached checksum: set for NEW/MODIFIED/UNMODIFIED/
                # DUPLICATE at the checksum stage, carried forward on
                # PREMATURE; None for rows that never reached it
                "checksum": e.checksum,
                "meta_ck": e.meta_ck,
                "sm_lastmod": e.sm_lastmod,
                "sm_changefreq": e.sm_changefreq,
                "outcome": e.outcome,
                "depth": e.depth,
                "seq": e.seq,
                "sched_ms": e.sched_ms,
            }
            for url, e in self.ledger.items()
            if e.status == "PROCESSED"
        }

    def urlseen(self) -> list[dict]:
        return [
            {
                "url": e.url,
                "status": e.status,
                "outcome": e.outcome,
                "depth": e.depth,
            }
            for e in self.ledger.values()
        ]


class CrawlSimulator:
    def __init__(
        self,
        pages: dict[str, dict],
        robots: dict[str, str | None],
        cfg: CrawlConfig = CrawlConfig(),
        baseline: dict[str, dict] | None = None,
        sitemaps: dict[str, str] | None = None,
    ):
        """``baseline``: previous run's ledger as url -> {checksum,
        depth, seq} (checksum None if the url was never committed) —
        drives the incremental NEW/MODIFIED/UNMODIFIED delta
        (ChecksumStageUtil.java:46-104), the orphan pass
        (RequeueOrphansForProcessingStep), and spoiled deletes."""
        self.pages = pages
        self.cfg = cfg
        self.baseline = baseline or {}
        # UrlNormalizerStage slot — the same compiled pipeline the
        # engine uses when the config names its own op list
        if cfg.url_normalizations is None:
            self._normalize = normalize_url
        else:
            from ..functions.urlnorm import engine_normalizer

            self._normalize = engine_normalizer(
                cfg.url_normalizations,
                cfg.url_replacements,
                cfg.url_ip_resolver,
            )
        self._matchers: dict[str, RobotsMatcher] = {}
        # robots crawl-delay per host; None = no directive (schedule/
        # pattern/default resolvers apply per request)
        self._robots_delays: dict[str, int | None] = {}
        for host, body in robots.items():
            rules = parse_robots_txt(body, cfg.user_agent)
            self._matchers[host] = RobotsMatcher(rules)
            self._robots_delays[host] = (
                int(rules.crawl_delay * 1000)
                if rules.crawl_delay is not None
                else None
            )
        import re as _re

        self._delay_patterns = [
            (_re.compile(p), d) for p, d in cfg.delay_patterns
        ]
        import re

        self._includes = [re.compile(p) for p in cfg.include_patterns]
        self._excludes = [re.compile(p) for p in cfg.exclude_patterns]
        self._blocked_ext = {e.lower() for e in cfg.blocked_extensions}
        self._ext_re = re.compile(r"\.([^./]+)$")
        # host -> {path: xml}; a bare host -> xml mapping is normalized
        # to the flat single-file layout
        self.sitemaps: dict[str, dict[str, str]] = {
            h: (v if isinstance(v, dict) else {"/sitemap.xml": v})
            for h, v in (sitemaps or {}).items()
        }
        self._sitemap_resolved: set[str] = set()
        self._recrawl_active = bool(self.baseline) and (
            cfg.min_recrawl_ms is not None
            or cfg.recrawl_min_frequencies
            or cfg.recrawl_sitemap_check
        )
        self._recrawl_patterns = [
            (re.compile(p), int(v)) for p, v in cfg.recrawl_min_frequencies
        ]

    def _recrawlable(self, b: dict, e: SimEntry) -> bool:
        """GenericRecrawlableResolver.java:98-244 (mirrors the engine's
        _recrawlable_col exactly): sitemap directives under FIRST,
        then first-matching min frequency (min_recrawl_ms catch-all),
        sitemap under LAST, else recrawlable."""
        from ..functions.sitemaps import (
            CHANGEFREQ_CALENDAR_MONTHS,
            CHANGEFREQ_PERIOD_MS,
            add_months_clamped,
        )

        cfg = self.cfg
        now = cfg.virtual_now_ms + e.avail_ms
        sched0 = b["sched_ms"]
        sm_lastmod = b.get("sm_lastmod")
        sm_freq = (b.get("sm_changefreq") or "").lower() or None

        def sm_recrawl() -> bool:
            if sm_lastmod is not None:
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(sm_lastmod)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                lastmod_ms = int(dt.timestamp() * 1000)
                return lastmod_ms > cfg.virtual_epoch_ms + sched0
            if sm_freq == "always":
                return True
            if sm_freq == "never":
                return False
            months = CHANGEFREQ_CALENDAR_MONTHS.get(sm_freq)
            if months is not None:
                # calendar month/year add, day clamped — mirrors the
                # engine's timestampadd(MONTH) on the virtual clock
                return (
                    add_months_clamped(
                        cfg.virtual_epoch_ms + sched0, months
                    )
                    <= cfg.virtual_epoch_ms + now
                )
            period = CHANGEFREQ_PERIOD_MS.get(sm_freq)
            if period is not None:
                return sched0 + period <= now
            return True

        has_sm = sm_lastmod is not None or sm_freq is not None
        if cfg.recrawl_sitemap_check and cfg.recrawl_sitemap_support == "first":
            if has_sm:
                return sm_recrawl()
        freq_ms = None
        for rx, v in self._recrawl_patterns:
            if rx.search(e.url):
                freq_ms = v
                break
        if freq_ms is None and cfg.min_recrawl_ms is not None:
            freq_ms = cfg.min_recrawl_ms
        if freq_ms is not None:
            return sched0 + freq_ms <= now
        if cfg.recrawl_sitemap_check and cfg.recrawl_sitemap_support == "last":
            if has_sm:
                return sm_recrawl()
        return True

    def _filtered(self, url: str) -> bool:
        """ReferenceFilters ∪ ExtensionReferenceFilter ∪
        SegmentCountUrlFilter — any hit rejects (FILTERED)."""
        if any(rx.search(url) for rx in self._excludes):
            return True
        if self._includes and not any(
            rx.search(url) for rx in self._includes
        ):
            return True
        path = urlsplit(url).path or ""
        if self._blocked_ext:
            m = self._ext_re.search(path)
            if m and m.group(1).lower() in self._blocked_ext:
                return True
        if self.cfg.max_path_segments >= 0:
            if (
                len([s for s in path.split("/") if s])
                > self.cfg.max_path_segments
            ):
                return True
        return False

    def _in_scope(self, link_url: str, ref_url: str) -> bool:
        """Stay-on-domain/protocol/port/sitemap vs the referring URL
        (GenericUrlScopeResolver.java:79-152); out-of-scope links are
        dropped at extraction (LinkExtractorStage.java:118-123), never
        entering the queue pipeline."""
        cfg = self.cfg
        if not (
            cfg.stay_on_domain
            or cfg.stay_on_protocol
            or cfg.stay_on_port
            or cfg.stay_on_sitemap
        ):
            return True
        lp, rp = urlsplit(link_url), urlsplit(ref_url)
        if cfg.stay_on_protocol and (lp.scheme or "").lower() != (
            rp.scheme or ""
        ).lower():
            return False
        if cfg.stay_on_domain:
            lh = (lp.hostname or "").lower()
            rh = (rp.hostname or "").lower()
            if lh != rh and not (
                cfg.include_subdomains and lh.endswith("." + rh)
            ):
                return False
        if cfg.stay_on_port:
            def resolved_port(parts):
                if parts.port is not None:
                    return parts.port
                return {"http": 80, "https": 443}.get(
                    (parts.scheme or "").lower(), -1
                )

            if resolved_port(lp) != resolved_port(rp):
                return False
        if cfg.stay_on_sitemap and cfg.use_sitemaps:
            # site has a (present) sitemap: extracted links are never
            # sitemap records, so they are all out of scope
            rh = (rp.hostname or "").lower()
            if rh in self.sitemaps:
                return False
        return True

    def _apply_spoiled(self, res: SimResult, e, base, base_ck) -> None:
        """GenericSpoiledReferenceStrategizer state->strategy mapping:
        DELETE drops the committed doc; GRACE_ONCE only when the
        previous run was also spoiled (ProcessFinalize.java:192); a
        graced row keeps the cached checksum (the doc still exists)."""
        from ..functions.checksums import GOOD_OUTCOMES

        strat = dict(self.cfg.spoiled_strategies).get(e.outcome)
        prev_out = base.get("outcome") if base else None
        prev_bad = prev_out is not None and prev_out not in GOOD_OUTCOMES
        if (
            self.cfg.spoiled_delete
            and base_ck is not None
            and (strat == "DELETE" or (strat == "GRACE_ONCE" and prev_bad))
        ):
            res.deletes.append(e.url)
            res.metrics["DOCUMENT_COMMITTED_DELETE"] += 1
        else:
            e.checksum = base_ck

    # -- queue pipeline (§2.2 stage order) --------------------------------
    def _enqueue(
        self,
        res: SimResult,
        queue: list[SimEntry],
        raw_url: str,
        depth: int,
        avail_ms: int,
        trail: tuple[str, ...] = (),
        redirect: bool = False,
        sm_lastmod: str | None = None,
        sm_changefreq: str | None = None,
    ) -> None:
        url = self._normalize(raw_url)
        if url is None:
            res.metrics["REJECTED_BAD_URL"] += 1
            return
        if url in res.ledger:
            ex = res.ledger[url]
            if (
                redirect
                and self.cfg.redirect_requeue
                and ex.status == "PROCESSED"
            ):
                # one-requeue rule (WebImporterPipelineUtil.java:
                # 103-160): in the trail = 3rd encounter, loop ->
                # reject; good prior state -> reject; else requeue
                # once, bypassing the queue pipeline (requeueEntry)
                from ..functions.checksums import GOOD_OUTCOMES

                if url not in trail and ex.outcome not in GOOD_OUTCOMES:
                    entry = SimEntry(url, ex.host, depth, 0, avail_ms, trail)
                    res.commit_entry(entry)
                    queue.append(entry)
                    res.metrics["DOCUMENT_QUEUED"] += 1
                    return
            res.metrics["DUPLICATE_URL_SKIPPED"] += 1
            return
        host = url_host(url)
        entry = SimEntry(
            url,
            host,
            depth,
            0,
            avail_ms,
            trail,
            sm_lastmod=sm_lastmod,
            sm_changefreq=sm_changefreq,
        )
        if self.cfg.max_depth >= 0 and depth > self.cfg.max_depth:
            entry.status, entry.outcome = "REJECTED", "TOO_DEEP"
            res.commit_entry(entry)
            res.metrics["REJECTED_TOO_DEEP"] += 1
            return
        if self._filtered(url):
            entry.status, entry.outcome = "REJECTED", "FILTERED"
            res.commit_entry(entry)
            res.metrics["REJECTED_FILTER"] += 1
            return
        if self.cfg.honor_robots:
            m = self._matchers.get(host)
            if m is not None and not m.allowed(match_target(url)):
                entry.status, entry.outcome = "REJECTED", "ROBOTS_TXT"
                res.commit_entry(entry)
                res.metrics["REJECTED_ROBOTS_TXT"] += 1
                return
        # SitemapResolution — once per host, triggered by its first
        # candidate to reach this stage (i.e. past depth/filters/
        # robots); the sitemap's URLs enqueue recursively BEFORE the
        # trigger (SitemapResolutionStage precedes QueueReferenceStage)
        if self.cfg.use_sitemaps and host not in self._sitemap_resolved:
            self._sitemap_resolved.add(host)
            files = self.sitemaps.get(host)
            if files:
                from urllib.parse import urlsplit

                from ..functions.sitemaps import resolve_sitemap_tree

                # scheme+netloc from the trigger URL (port-aware, the
                # engine's rep_url analog); bare host as fallback
                sp = urlsplit(url)
                base = (
                    f"{sp.scheme}://{sp.netloc}"
                    if sp.scheme and sp.netloc
                    else f"http://{host}"
                )
                recs = resolve_sitemap_tree(
                    f"{base}/sitemap.xml",
                    {f"{base}{p}": x for p, x in files.items()},
                )
                for rec in recs:
                    res.metrics["SITEMAP_URLS"] += 1
                    self._enqueue(
                        res,
                        queue,
                        rec["url"],
                        0,
                        avail_ms,
                        sm_lastmod=rec.get("lastmod"),
                        sm_changefreq=rec.get("changefreq"),
                    )
                # the sitemap may have contained this very URL — the
                # trigger then dies at QueueReference's dedup, and its
                # seq slot moves past the locs it revealed
                if url in res.ledger:
                    res.metrics["DUPLICATE_URL_SKIPPED"] += 1
                    return
        res.commit_entry(entry)
        queue.append(entry)
        res.metrics["DOCUMENT_QUEUED"] += 1

    # -- process loop (§3.3) ----------------------------------------------
    def run(self, seeds: list[str]) -> SimResult:
        res = SimResult()
        queue: list[SimEntry] = []
        for raw in seeds:
            self._enqueue(res, queue, raw, depth=0, avail_ms=0)

        last_sched: dict[str, int] = {}
        seen_checksums: dict[str, int] = {}
        # MetadataDedupStage's findOrTrackMetadata store
        seen_meta: set[str] = set()
        meta_kind = self.cfg.metadata_checksummer
        meta_fields = self.cfg.metadata_checksum_fields
        qi = 0
        step = 0
        # highest politeness-clock value scheduled (max_crawl_duration;
        # PREMATURE rows carry the prior run's fetch time — excluded)
        max_sched_seen = 0
        # max_docs is evaluated at superstep (BFS batch) boundaries,
        # exactly like the engine's driver loop guard.
        batch_end = len(queue)
        orphans_done = not self.baseline
        stopped = False
        while True:
            if qi >= len(queue):
                # main drain complete: orphan pass (baseline entries
                # never rediscovered this run), once, in baseline seq
                # order — then keep processing what it enqueued.
                if orphans_done or stopped:
                    break
                orphans_done = True
                orphans = sorted(
                    (
                        (b.get("seq", 0), url, b)
                        for url, b in self.baseline.items()
                        if url not in res.ledger
                    ),
                )
                if self.cfg.orphan_strategy == "PROCESS":
                    for _seq, url, b in orphans:
                        res.metrics["ORPHANS_REQUEUED"] += 1
                        self._enqueue(
                            res, queue, url, b.get("depth", 0), 0
                        )
                elif self.cfg.orphan_strategy == "DELETE":
                    for _seq, url, b in orphans:
                        if b["checksum"] is not None:
                            res.deletes.append(url)
                            res.metrics["DOCUMENT_COMMITTED_DELETE"] += 1
                batch_end = len(queue)
                if qi >= len(queue):
                    break
                continue
            if qi == batch_end:
                if (
                    self.cfg.max_docs is not None
                    and len(res.committed) >= self.cfg.max_docs
                ):
                    stopped = True
                    break
                # maxCrawlDuration on the virtual politeness clock,
                # superstep-boundary check exactly like the engine's
                if (
                    self.cfg.max_crawl_duration_ms is not None
                    and max_sched_seen >= self.cfg.max_crawl_duration_ms
                ):
                    stopped = True
                    break
                batch_end = len(queue)
            e = queue[qi]
            qi += 1
            # RecrawlableResolver runs BEFORE the delay resolver
            # (stage order, WebDocPipelines.java:67-116): a premature
            # URL consumes no politeness slot and is not fetched.
            if self._recrawl_active:
                b = self.baseline.get(e.url)
                if (
                    b is not None
                    and b.get("sched_ms") is not None
                    and not self._recrawlable(b, e)
                ):
                    e.status, e.outcome = "PROCESSED", "PREMATURE"
                    # keep the prior fetch time + cached checksums so a
                    # 3rd run still sees the original due-time and delta
                    e.sched_ms = b["sched_ms"]
                    e.checksum = b["checksum"]
                    e.meta_ck = b.get("meta_ck")
                    # sitemap directives: this run's enqueue-time
                    # values when present, else the cached ones
                    e.sm_lastmod = e.sm_lastmod or b.get("sm_lastmod")
                    e.sm_changefreq = (
                        e.sm_changefreq or b.get("sm_changefreq")
                    )
                    res.metrics["REJECTED_PREMATURE"] += 1
                    res.fetch_log.append(
                        {
                            "step": step,
                            "url": e.url,
                            "host": e.host,
                            "depth": e.depth,
                            "scheduled_at_ms": e.sched_ms,
                            "outcome": e.outcome,
                        }
                    )
                    step += 1
                    continue
            # politeness serialization key per delay_scope (SITE: the
            # host; CRAWLER: one global lock; THREAD: deterministic
            # seq%K slot) — mirrors operators.politeness.scope_key_col
            scope = getattr(self.cfg, "delay_scope", "SITE")
            if scope == "CRAWLER":
                skey = "__crawler__"
            elif scope == "THREAD":
                skey = f"__thread_{e.seq % self.cfg.delay_threads}"
            else:
                skey = e.host
            prev = last_sched.get(skey)
            t_probe = e.avail_ms if prev is None else max(e.avail_ms, prev)
            delay = resolve_delay(
                e.url,
                t_probe,
                self._robots_delays.get(e.host),
                self.cfg.delay_schedules,
                self._delay_patterns,
                self.cfg.default_delay_ms,
            )
            sched = e.avail_ms if prev is None else max(e.avail_ms, prev + delay)
            last_sched[skey] = sched
            e.sched_ms = sched
            max_sched_seen = max(max_sched_seen, sched)
            e.status = "PROCESSED"
            res.metrics["DOCUMENT_FETCHED"] += 1

            base = self.baseline.get(e.url)
            base_ck = base["checksum"] if base else None
            row = self.pages.get(e.url)
            if row is None or row["status"] == 404:
                e.outcome = "NOT_FOUND"
                res.metrics["REJECTED_NOTFOUND"] += 1
                self._apply_spoiled(res, e, base, base_ck)
            elif row["status"] >= 500:
                e.outcome = "BAD_STATUS"
                res.metrics["REJECTED_BAD_STATUS"] += 1
                self._apply_spoiled(res, e, base, base_ck)
            elif row["status"] in (301, 302):
                e.outcome = "REDIRECT"
                res.metrics["DOCUMENT_REDIRECTED"] += 1
                trail = e.trail + (e.url,)
                if len(trail) <= self.cfg.max_redirect_trail:
                    self._enqueue(
                        res,
                        queue,
                        row["redirect_to"],
                        e.depth,
                        sched,
                        trail,
                        redirect=True,
                    )
                else:
                    res.metrics["REJECTED_REDIRECT_LOOP"] += 1
            else:
                mck = None
                if meta_kind is not None:
                    from ..functions.checksums import meta_checksum

                    mck = meta_checksum(row, meta_kind, meta_fields)
                base_meta = base.get("meta_ck") if base else None
                meta_band = (
                    meta_kind is not None or bool(self.cfg.metadata_filters)
                )

                def _meta_filtered() -> bool:
                    if not self.cfg.metadata_filters:
                        return False
                    from ..functions.filters import filters_reject

                    return filters_reject(
                        {
                            "url": e.url,
                            "last_modified": row.get("last_modified"),
                            "etag": row.get("etag"),
                        },
                        self.cfg.metadata_filters,
                    )

                if meta_band and self.cfg.head_before_get:
                    # HEAD phase (WebDocPipelines.java:89-99): the
                    # metadata stages run on headers alone; rejected
                    # rows never fetch the body — no links extracted.
                    # MetadataFiltersStage precedes the checksum.
                    rejected = None
                    if _meta_filtered():
                        rejected = "FILTERED"
                        e.checksum = base_ck
                        res.metrics["REJECTED_FILTER_IMPORT"] += 1
                    else:
                        e.meta_ck = mck
                        if (
                            mck is not None
                            and base_meta is not None
                            and mck == base_meta
                        ):
                            rejected = "UNMODIFIED"
                            res.metrics["REJECTED_UNMODIFIED"] += 1
                        elif self.cfg.metadata_dedup and mck is not None:
                            if mck in seen_meta:
                                rejected = "DUPLICATE"
                                res.metrics["REJECTED_DUPLICATE"] += 1
                            else:
                                seen_meta.add(mck)
                    if rejected is not None:
                        e.outcome = rejected
                        # the cached doc state stays the baseline's
                        e.checksum = base_ck
                        res.fetch_log.append(
                            {
                                "step": step,
                                "url": e.url,
                                "host": e.host,
                                "depth": e.depth,
                                "scheduled_at_ms": sched,
                                "outcome": e.outcome,
                            }
                        )
                        step += 1
                        continue
                html = row["html"] or ""
                # HTTP Link-header canonical precedence (metadata-phase
                # detector, GenericCanonicalLinkDetector.java:100-119);
                # a self header-canonical falls through to the HTML head
                from ..functions.links import canonical_from_header

                hdr_raw = canonical_from_header(
                    e.url, row.get("link_header")
                )
                hdr_norm = self._normalize(hdr_raw) if hdr_raw else None
                if hdr_norm is not None and hdr_norm != e.url:
                    canonical_raw = hdr_raw
                else:
                    canonical_raw = extract_canonical(e.url, html)
                canonical = (
                    self._normalize(canonical_raw)
                    if canonical_raw
                    else None
                )
                if canonical is not None and canonical != e.url:
                    e.outcome = "NONCANONICAL"
                    res.metrics["REJECTED_NONCANONICAL"] += 1
                    if canonical not in e.trail:
                        self._enqueue(
                            res,
                            queue,
                            canonical_raw,
                            e.depth,
                            sched,
                            e.trail + (e.url,),
                        )
                    res.fetch_log.append(
                        {
                            "step": step,
                            "url": e.url,
                            "host": e.host,
                            "depth": e.depth,
                            "scheduled_at_ms": sched,
                            "outcome": e.outcome,
                        }
                    )
                    step += 1
                    continue
                noindex, nofollow = extract_robots_meta(html)
                # X-Robots-Tag response header ORs with the meta tag
                # (StandardRobotsMetaProvider.java:37-92)
                from ..functions.links import parse_x_robots

                xni, xnf = parse_x_robots(row.get("x_robots"))
                noindex, nofollow = noindex or xni, nofollow or xnf
                if not nofollow and (
                    self.cfg.max_depth < 0 or e.depth < self.cfg.max_depth
                ):
                    for lurl, _pos in extract_links(e.url, html):
                        res.metrics["URLS_EXTRACTED"] += 1
                        if not self._in_scope(lurl, e.url):
                            res.metrics["URLS_OUT_OF_SCOPE"] += 1
                            continue
                        self._enqueue(res, queue, lurl, e.depth + 1, sched)
                if noindex:
                    e.outcome = "NOINDEX"
                    res.metrics["REJECTED_NOINDEX"] += 1
                else:
                    if meta_band and not self.cfg.head_before_get:
                        # GET mode: the metadata stages run after
                        # noindex/canonical rejection (stage order,
                        # WebDocPipelines.java) — links already out
                        if _meta_filtered():
                            e.outcome = "FILTERED"
                            e.checksum = base_ck
                            res.metrics["REJECTED_FILTER_IMPORT"] += 1
                            res.fetch_log.append(
                                {
                                    "step": step,
                                    "url": e.url,
                                    "host": e.host,
                                    "depth": e.depth,
                                    "scheduled_at_ms": sched,
                                    "outcome": e.outcome,
                                }
                            )
                            step += 1
                            continue
                        e.meta_ck = mck
                        if (
                            mck is not None
                            and base_meta is not None
                            and mck == base_meta
                        ):
                            e.outcome = "UNMODIFIED"
                            e.checksum = base_ck
                            res.metrics["REJECTED_UNMODIFIED"] += 1
                            res.fetch_log.append(
                                {
                                    "step": step,
                                    "url": e.url,
                                    "host": e.host,
                                    "depth": e.depth,
                                    "scheduled_at_ms": sched,
                                    "outcome": e.outcome,
                                }
                            )
                            step += 1
                            continue
                        if self.cfg.metadata_dedup and mck is not None:
                            if mck in seen_meta:
                                e.outcome = "DUPLICATE"
                                e.checksum = base_ck
                                res.metrics["REJECTED_DUPLICATE"] += 1
                                res.fetch_log.append(
                                    {
                                        "step": step,
                                        "url": e.url,
                                        "host": e.host,
                                        "depth": e.depth,
                                        "scheduled_at_ms": sched,
                                        "outcome": e.outcome,
                                    }
                                )
                                step += 1
                                continue
                            seen_meta.add(mck)
                    if self.cfg.document_filters:
                        from ..functions.filters import content_reject

                        # DocumentFiltersStage: after the metadata
                        # stages, before the document checksum
                        if content_reject(html, self.cfg.document_filters):
                            e.outcome = "FILTERED"
                            e.checksum = base_ck
                            res.metrics["REJECTED_FILTER_IMPORT"] += 1
                            res.fetch_log.append(
                                {
                                    "step": step,
                                    "url": e.url,
                                    "host": e.host,
                                    "depth": e.depth,
                                    "scheduled_at_ms": sched,
                                    "outcome": e.outcome,
                                }
                            )
                            step += 1
                            continue
                    ck = content_checksum(html)
                    # every row reaching the checksum stage caches its
                    # checksum for the next run's baseline (the
                    # reference stores docChecksum on the entry even
                    # when rejected UNMODIFIED/DUPLICATE —
                    # DocumentChecksumStage precedes DocumentDedupStage)
                    e.checksum = ck
                    if base_ck is not None and base_ck == ck:
                        # unchanged since last run: rejected before the
                        # dedup stage, checksum NOT registered
                        e.outcome = "UNMODIFIED"
                        res.metrics["REJECTED_UNMODIFIED"] += 1
                    elif ck in seen_checksums:
                        e.outcome = "DUPLICATE"
                        res.metrics["REJECTED_DUPLICATE"] += 1
                    else:
                        seen_checksums[ck] = e.seq
                        e.outcome = (
                            "MODIFIED" if base_ck is not None else "NEW"
                        )
                        res.metrics["DOCUMENT_COMMITTED_UPSERT"] += 1
                        res.committed.append(
                            {
                                "image_id": e.url,
                                "checksum": ck,
                                "seq": e.seq,
                                "depth": e.depth,
                            }
                        )
                        if self.cfg.post_import_links:
                            # PostImportLinksStage.java:42-90: committer
                            # phase — only docs that reach the committer
                            # queue their post-import links, at depth+1,
                            # minus the regular extracted links, sorted
                            # (deterministic stand-in for the HashSet)
                            from ..functions.links import (
                                extract_post_links,
                            )

                            extracted = (
                                extract_links(e.url, html)
                                if not nofollow
                                and (
                                    self.cfg.max_depth < 0
                                    or e.depth < self.cfg.max_depth
                                )
                                else []
                            )
                            for purl in extract_post_links(
                                e.url, html, extracted,
                                normalizer=self._normalize,
                            ):
                                if not self._in_scope(purl, e.url):
                                    continue
                                res.metrics["URLS_POST_IMPORTED"] += 1
                                self._enqueue(
                                    res, queue, purl, e.depth + 1, sched
                                )

            res.fetch_log.append(
                {
                    "step": step,
                    "url": e.url,
                    "host": e.host,
                    "depth": e.depth,
                    "scheduled_at_ms": sched,
                    "outcome": e.outcome,
                }
            )
            step += 1
        return res
