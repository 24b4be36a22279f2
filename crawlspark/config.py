"""Crawl configuration shared by the Spark engine and the oracle
simulator.

Field defaults follow the reference's CrawlerConfig /
BaseDelayResolverConfig (crawler/core/.../CrawlerConfig.java;
crawler/web/.../delay/impl/BaseDelayResolverConfig.java:64 — default
politeness delay 3 s, SITE scope).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    user_agent: str = "crawlspark"
    # maxDepth semantics: links are not extracted from docs at
    # depth == max_depth (LinkExtractorStage.java:59-66); candidates
    # deeper than max_depth are rejected TOO_DEEP
    # (DepthValidationStage.java:29-47). -1 = unlimited.
    max_depth: int = -1
    # stop once this many docs are committed (checked at superstep
    # boundaries in the engine; CrawlerConfig maxDocuments analog).
    max_docs: int | None = None
    # politeness: robots crawl-delay > default (AbstractDelayResolver
    # precedence :100-115); per-site serialization (SiteDelay.java:44-58).
    default_delay_ms: int = 3000
    # GenericDelayResolver circular time-of-day schedules: tuples of
    # (from_hour, to_hour, delay_ms), first match wins, wrap-around
    # when from > to (GenericDelayResolver.java:84-151). Evaluated on
    # the virtual clock; precedence robots > schedule > pattern >
    # default (AbstractDelayResolver.java:84-115).
    delay_schedules: tuple[tuple[int, int, int], ...] = ()
    # ReferenceDelayResolver per-URL-pattern delays: (regex, delay_ms),
    # first match wins.
    delay_patterns: tuple[tuple[str, int], ...] = ()
    # reference filters (GenericReferenceFilter / FilterGroupResolver
    # semantics: any exclude match rejects; if includes exist, at
    # least one must match).
    include_patterns: tuple[str, ...] = ()
    exclude_patterns: tuple[str, ...] = ()
    # ExtensionReferenceFilter analog: reject URLs whose path extension
    # (chars after the last '.' of the last segment) is in this set.
    blocked_extensions: tuple[str, ...] = ()
    # SegmentCountUrlFilter analog: reject URLs with more than this
    # many non-empty path segments (-1 = unlimited).
    max_path_segments: int = -1
    # UrlScopeResolver analog (GenericUrlScopeResolver.java:79-152):
    # candidates are checked against the *referring* URL; out-of-scope
    # links never enter the queue pipeline. Seeds are always in scope.
    stay_on_domain: bool = False
    include_subdomains: bool = False
    stay_on_protocol: bool = False
    # MultiFetcher retry policy (CrawlerConfig.java:362-369; reference
    # default 0): transient fetch failures retried inside the fetch
    # slot before an outcome is assigned.
    fetch_retries: int = 0
    # redirect trail cap (WebImporterPipelineUtil.java:103-116 —
    # one re-queue allowed, third occurrence rejected).
    max_redirect_trail: int = 2
    honor_robots: bool = True
    # incremental crawl: orphan strategy PROCESS (default,
    # CrawlerConfig.java:281) / DELETE / IGNORE; spoiled (previously
    # committed, now 404) docs are deleted, bad-status docs get grace
    # (GenericSpoiledReferenceStrategizer default mapping; GRACE_ONCE
    # counting across >2 runs is TODO).
    orphan_strategy: str = "PROCESS"
    spoiled_delete: bool = True
    # RecrawlableResolver analog (GenericRecrawlableResolver minimum
    # frequency; RecrawlableResolverStage.java:38-93): a URL crawled
    # less than this long ago (virtual-clock ms vs the previous run's
    # fetch time) is skipped PREMATURE — no fetch, no politeness slot,
    # cached data kept. None = always due.
    min_recrawl_ms: int | None = None
    # virtual wall-clock at which this run starts (each run's internal
    # politeness clock starts at 0; a recrawl that begins an hour after
    # the previous run sets 3_600_000). Only the PREMATURE due-check
    # uses it: due iff prev_sched + min_recrawl <= virtual_now + avail.
    virtual_now_ms: int = 0
    # robots physical strategy: True (default) collects+broadcasts the
    # per-host rule lists once and matches in a zero-shuffle pandas UDF;
    # False keeps rules distributed and filters via the robots_rules
    # dim-table join (the path for rule sets too big to broadcast).
    robots_broadcast: bool = True
    # SitemapResolutionStage analog: on a host's first QUEUED
    # candidate, parse its sitemap once and enqueue the listed URLs
    # (depth 0) ahead of the trigger. Requires a sitemaps source on
    # the engine/oracle.
    use_sitemaps: bool = False
    # engine-side knobs (no semantic effect):
    shuffle_partitions: int | None = None
    bloom_prefilter_min_ledger: int = 100_000
    bloom_bits: int = 1 << 22
    image_w: int = 32
    image_h: int = 32


DEFAULT_CONFIG = CrawlConfig()
