"""Sitemap XML parsing + location, vectorized.

From-scratch reimplementation of the reference's sitemap stack
(crawler/web/.../sitemap/impl/):

* ``GenericSitemapLocator``: candidate paths ``/sitemap.xml``,
  ``/sitemap_index.xml`` plus robots.txt ``Sitemap:`` directives
  (GenericSitemapLocator.java:55-71, DEFAULT_PATHS :35-36);
* ``SitemapParser``: stream-parse ``<urlset>/<url>`` — loc, lastmod,
  changefreq, priority (priority defaults to 0 on parse error,
  SitemapParser.java:118); non-lenient mode requires loc to share the
  sitemap's directory prefix (:103);
* ``<sitemapindex>`` recursion is bounded by the resolver
  (GenericSitemapResolver.java:84-165 follows child sitemaps; depth
  capped here at parse level by returning child locs for the caller's
  bounded loop).

Uses regex streaming (not a DOM) so one pandas UDF handles arbitrary
batch sizes; malformed entries are skipped, not fatal.
"""

from __future__ import annotations

import logging
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

log = logging.getLogger("crawlspark.sitemaps")

DEFAULT_PATHS = ("/sitemap.xml", "/sitemap_index.xml")

# sitemaps.org protocol cap: 50,000 <url> entries per file (and
# 50,000 <sitemap> children per index). Enforced loudly — beyond the
# cap the file is malformed, and unbounded files would blow the
# per-host collect_list the resolver builds.
MAX_SITEMAP_ENTRIES = 50_000

_URL_BLOCK_RE = re.compile(r"<url\b[^>]*>(.*?)</url>", re.I | re.S)
_SITEMAP_BLOCK_RE = re.compile(r"<sitemap\b[^>]*>(.*?)</sitemap>", re.I | re.S)
_FIELD_RES = {
    "loc": re.compile(r"<loc>\s*(.*?)\s*</loc>", re.I | re.S),
    "lastmod": re.compile(r"<lastmod>\s*(.*?)\s*</lastmod>", re.I | re.S),
    "changefreq": re.compile(
        r"<changefreq>\s*(.*?)\s*</changefreq>", re.I | re.S
    ),
    "priority": re.compile(r"<priority>\s*(.*?)\s*</priority>", re.I | re.S),
}
CHANGEFREQS = (
    "always",
    "hourly",
    "daily",
    "weekly",
    "monthly",
    "yearly",
    "never",
)

# changefreq -> minimum re-crawl period in ms for the recrawlable
# resolver (GenericRecrawlableResolver.java:244-263). Fixed spans for
# the uniform units (an hour/day/week is constant in UTC — the session
# timezone everywhere); monthly/yearly use CALENDAR arithmetic like
# the reference's plusMonths/plusYears (CHANGEFREQ_CALENDAR_MONTHS,
# day-of-month clamped — identical semantics in Spark timestampadd,
# DuckDB + INTERVAL, and the simulator's add_months_clamped).
CHANGEFREQ_PERIOD_MS = {
    "hourly": 3_600_000,
    "daily": 86_400_000,
    "weekly": 7 * 86_400_000,
}

CHANGEFREQ_CALENDAR_MONTHS = {"monthly": 1, "yearly": 12}


def add_months_clamped(ms: int, n: int) -> int:
    """Epoch-ms + n calendar months (UTC), day-of-month clamped to the
    target month's last day — java.time plusMonths semantics, matching
    Spark's timestampadd(MONTH) and DuckDB's + INTERVAL n MONTH."""
    import calendar
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
    y = dt.year + (dt.month - 1 + n) // 12
    m = (dt.month - 1 + n) % 12 + 1
    d = min(dt.day, calendar.monthrange(y, m)[1])
    return int(dt.replace(year=y, month=m, day=d).timestamp() * 1000)


def sitemap_locations(host_root: str, robots_sitemaps: list[str] | None) -> list[str]:
    """Candidate sitemap URLs for a host: robots directives first
    (they are explicit), then the default paths."""
    out: list[str] = []
    for u in robots_sitemaps or []:
        if u not in out:
            out.append(u)
    for p in DEFAULT_PATHS:
        u = host_root.rstrip("/") + p
        if u not in out:
            out.append(u)
    return out


def _dir_prefix(url: str) -> str:
    return url.rsplit("/", 1)[0] + "/"


def parse_sitemap(
    sitemap_url: str, xml: str | None, lenient: bool = False
) -> tuple[list[dict], list[str]]:
    """-> (url records, child sitemap locs).

    Record: {url, lastmod, changefreq, priority}. Non-lenient: a loc
    outside the sitemap's directory is skipped (SitemapParser.java:103).
    """
    if not xml:
        return [], []
    children = []
    for block in _SITEMAP_BLOCK_RE.finditer(xml):
        if len(children) >= MAX_SITEMAP_ENTRIES:
            log.warning(
                "%s: <sitemapindex> exceeds the %d-entry protocol cap; "
                "further children dropped",
                sitemap_url,
                MAX_SITEMAP_ENTRIES,
            )
            break
        m = _FIELD_RES["loc"].search(block.group(1))
        if m and m.group(1):
            children.append(m.group(1))
    prefix = _dir_prefix(sitemap_url)
    records = []
    for block in _URL_BLOCK_RE.finditer(xml):
        if len(records) >= MAX_SITEMAP_ENTRIES:
            log.warning(
                "%s: sitemap exceeds the %d-entry protocol cap; "
                "further <url> entries dropped",
                sitemap_url,
                MAX_SITEMAP_ENTRIES,
            )
            break
        body = block.group(1)
        m = _FIELD_RES["loc"].search(body)
        if not m or not m.group(1):
            continue
        loc = m.group(1)
        if not lenient and not loc.startswith(prefix):
            # allow same-host (the common real-world layout); reject
            # cross-host in non-lenient mode
            from urllib.parse import urlsplit

            if urlsplit(loc).netloc != urlsplit(sitemap_url).netloc:
                continue
        lm = _FIELD_RES["lastmod"].search(body)
        cf = _FIELD_RES["changefreq"].search(body)
        pr = _FIELD_RES["priority"].search(body)
        try:
            priority = float(pr.group(1)) if pr else 0.0
        except ValueError:
            priority = 0.0  # default 0 on parse error (:118)
        cf_val = cf.group(1).lower() if cf else None
        if cf_val not in CHANGEFREQS:
            cf_val = None
        records.append(
            {
                "url": loc,
                "lastmod": lm.group(1) if lm else None,
                "changefreq": cf_val,
                "priority": priority,
            }
        )
    return records, children


SITEMAP_RECORDS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("lastmod", T.StringType()),
            T.StructField("changefreq", T.StringType()),
            T.StructField("priority", T.DoubleType()),
        ]
    )
)


@F.pandas_udf(SITEMAP_RECORDS_TYPE)
def parse_sitemap_udf(sitemap_url: pd.Series, xml: pd.Series) -> pd.Series:
    return pd.Series(
        [parse_sitemap(u, x)[0] for u, x in zip(sitemap_url, xml)],
        dtype=object,
    )


def resolve_sitemap_tree(
    root_url: str,
    xml_by_url: dict[str, str],
    max_depth: int = 3,
    lenient: bool = False,
) -> list[dict]:
    """DFS the ``<sitemapindex>`` tree from ``root_url``
    (GenericSitemapResolver.java:84-165: parse the current sitemap —
    its url records enqueue during the parse, in document order — then
    recurse into child sitemaps in document order; each location is
    resolved at most once via the resolvedIndices set). Depth-capped:
    real indices nest one level, the cap only guards pathological
    self-referencing trees. Returns the flattened records."""
    seen: set[str] = set()
    out: list[dict] = []

    def go(url: str, depth: int) -> None:
        if url in seen or depth > max_depth:
            return
        seen.add(url)
        recs, children = parse_sitemap(url, xml_by_url.get(url), lenient)
        out.extend(recs)
        for child in children:
            go(child, depth + 1)

    go(root_url, 0)
    return out


@F.pandas_udf(SITEMAP_RECORDS_TYPE)
def resolve_sitemap_tree_udf(
    host: pd.Series,
    paths: pd.Series,
    xmls: pd.Series,
    rep_url: pd.Series,
) -> pd.Series:
    """Per-host tree resolution over the host's full sitemap set
    (paths/xmls: the collected dim rows — child 'fetches' are local
    lookups, matching the fixture-supplied sitemap model).

    ``rep_url``: a representative URL of the host (the trigger) whose
    scheme+netloc anchor the sitemap URLs — so non-default ports stay
    inside the non-lenient directory scope (a bare ``http://{host}``
    base would scope out every ``host:port`` loc). Null falls back to
    ``http://{host}``."""
    from urllib.parse import urlsplit

    out = []
    for h, ps, xs, ru in zip(host, paths, xmls, rep_url):
        if ru:
            sp = urlsplit(str(ru))
            base = f"{sp.scheme}://{sp.netloc}"
        else:
            base = f"http://{h}"
        lookup = {f"{base}{p}": x for p, x in zip(list(ps), list(xs))}
        out.append(resolve_sitemap_tree(f"{base}/sitemap.xml", lookup))
    return pd.Series(out, dtype=object)
