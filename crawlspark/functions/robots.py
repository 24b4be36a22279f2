"""robots.txt parsing + rule matching, vectorized.

From-scratch Python reimplementation of the semantics of the
reference's ``StandardRobotsTxtProvider``
(crawler/web/.../robot/impl/StandardRobotsTxtProvider.java):

* user-agent group selection with precision EXACT > PARTIAL > WILD
  (:165-178, :210-228) — the single best-matching group wins;
* ``Allow``/``Disallow`` values are path prefixes with ``*`` wildcards
  and an optional ``$`` end anchor (:280-315);
* ``Crawl-delay`` seconds (:180-181) and ``Sitemap:`` directives
  (:162-164) are captured per host;
* an empty-Disallow line means "allow everything" for that group;
* match resolution (RobotsTxtFiltersStage.java:75-106): the longest
  matching Disallow rejects the URL unless a *strictly longer* Allow
  also matches (:94).

The parsed output is a flat rule table — one row per (host, rule) —
so matching in Spark is a host-equi-join plus a vectorized
longest-match reduction, no per-row Python on the JVM path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    """Parsed robots.txt for one host, for one user agent."""

    # (path_pattern, allow) in file order; pattern is the raw value.
    rules: list[tuple[str, bool]] = field(default_factory=list)
    crawl_delay: float | None = None
    sitemaps: list[str] = field(default_factory=list)


_AGENT_WILD = 0
_AGENT_PARTIAL = 1
_AGENT_EXACT = 2


def parse_robots_txt(body: str | None, user_agent: str = "crawlspark") -> RobotsRules:
    """Parse a robots.txt body for the given user agent.

    Group selection: scan User-agent groups; EXACT name match beats
    PARTIAL (agent contains the token or vice versa) beats ``*``
    (StandardRobotsTxtProvider.java:210-228). Only the winning group's
    rules apply. Sitemap directives are global.
    """
    out = RobotsRules()
    if not body:
        return out
    ua = user_agent.lower()

    best_precision = -1
    cur_precision = -1  # precision of the group currently being read
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agent_run = False  # consecutive User-agent lines form one group

    def close_group() -> None:
        nonlocal best_precision
        if cur_precision > best_precision:
            best_precision = cur_precision
            out.rules = list(cur_rules)
            out.crawl_delay = cur_delay

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            if value:
                out.sitemaps.append(value)
            continue
        if key == "user-agent":
            token = value.lower()
            if token == "*":
                precision = _AGENT_WILD
            elif token == ua:
                precision = _AGENT_EXACT
            elif token in ua or ua in token:
                precision = _AGENT_PARTIAL
            else:
                precision = -1
            if in_agent_run:
                cur_precision = max(cur_precision, precision)
            else:
                close_group()
                cur_precision = precision
                cur_rules = []
                cur_delay = None
                in_agent_run = True
            continue
        in_agent_run = False
        if cur_precision < 0:
            continue
        if key == "disallow":
            # Empty Disallow == allow all (record nothing).
            if value:
                cur_rules.append((value, False))
        elif key == "allow":
            if value:
                cur_rules.append((value, True))
        elif key == "crawl-delay":
            try:
                cur_delay = float(value)
            except ValueError:
                pass
    close_group()
    return out


def _compile_pattern(pattern: str) -> re.Pattern[str]:
    """robots path pattern -> anchored regex: ``*`` -> ``.*``, ``$`` anchor.

    Mirrors StandardRobotsTxtProvider.java:280-315 (escape regex chars,
    translate * and trailing $).
    """
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


class RobotsMatcher:
    """Compiled matcher for one host's rules (longest-match semantics)."""

    def __init__(self, rules: RobotsRules):
        self._compiled = [
            (_compile_pattern(p), allow, len(p)) for p, allow in rules.rules
        ]
        self.crawl_delay = rules.crawl_delay

    def allowed(self, path: str) -> bool:
        """Disallow match rejects unless a strictly longer Allow matches
        (RobotsTxtFiltersStage.java:88-103)."""
        if not path:
            path = "/"
        best_dis = -1
        best_allow = -1
        for rx, allow, plen in self._compiled:
            if rx.match(path):
                if allow:
                    best_allow = max(best_allow, plen)
                else:
                    best_dis = max(best_dis, plen)
        if best_dis < 0:
            return True
        return best_allow > best_dis


def robots_rules_rows(
    host: str, body: str | None, user_agent: str = "crawlspark"
) -> list[dict]:
    """Flatten one host's robots.txt into rule-table rows.

    Output schema matches the ``robots_rules`` dim table:
    (host, pattern, allow, pattern_len, crawl_delay_ms, sitemaps).
    A host with zero rules still emits one allow-all sentinel row so the
    politeness join can pick up its crawl delay.
    """
    parsed = parse_robots_txt(body, user_agent)
    delay_ms = (
        int(parsed.crawl_delay * 1000) if parsed.crawl_delay is not None else None
    )
    rows = [
        {
            "host": host,
            "pattern": p,
            "allow": allow,
            "pattern_len": len(p),
            "crawl_delay_ms": delay_ms,
            "sitemaps": parsed.sitemaps,
        }
        for p, allow in parsed.rules
    ]
    if not rows:
        rows.append(
            {
                "host": host,
                "pattern": None,
                "allow": True,
                "pattern_len": 0,
                "crawl_delay_ms": delay_ms,
                "sitemaps": parsed.sitemaps,
            }
        )
    return rows
