"""robots.txt as dataflow: rules dim table + candidate filtering.

The reference caches parsed robots per site in a CacheMap
(StandardRobotsTxtProvider.java:88-139); we parse every host's body
once, distributed, into a flat ``robots_rules`` dim table

    (host, pattern, pattern_re, allow, pattern_len, crawl_delay_ms)

and filter candidates with a host equi-join + JVM-side
``regexp_like`` + a longest-match aggregation implementing
RobotsTxtFiltersStage.java:88-103 (Disallow rejects unless a
*strictly longer* Allow matches). No Python in the match path.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.robots import parse_robots_txt

RULES_SCHEMA = (
    "host string, pattern string, pattern_re string, allow boolean, "
    "pattern_len int, crawl_delay_ms long"
)


def pattern_to_regex(pattern: str) -> str:
    """robots path pattern -> anchored regex (``*`` -> ``.*``, ``$``).

    Emits only escapes valid in both Python and Java regex, so the
    same string drives the oracle matcher and ``regexp_like``.
    """
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(p) for p in pattern.split("*"))
    return "^" + body + ("$" if anchored else "")


def build_robots_rules(robots_df: DataFrame, user_agent: str) -> DataFrame:
    """(host, body) -> flat rules table; hosts with no rules emit one
    allow-all sentinel so crawl-delay still joins."""

    def parse(batches):
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                parsed = parse_robots_txt(body, user_agent)
                delay = (
                    int(parsed.crawl_delay * 1000)
                    if parsed.crawl_delay is not None
                    else None
                )
                if parsed.rules:
                    for p, allow in parsed.rules:
                        rows.append(
                            (host, p, pattern_to_regex(p), allow, len(p), delay)
                        )
                else:
                    rows.append((host, None, None, True, 0, delay))
            yield pd.DataFrame(
                rows,
                columns=[
                    "host",
                    "pattern",
                    "pattern_re",
                    "allow",
                    "pattern_len",
                    "crawl_delay_ms",
                ],
            )

    return robots_df.mapInPandas(parse, schema=RULES_SCHEMA)


def host_delays(rules_df: DataFrame) -> DataFrame:
    """Per-host politeness delay dim (null => default applies)."""
    return rules_df.groupBy("host").agg(
        F.max("crawl_delay_ms").alias("crawl_delay_ms")
    )


def match_target_col(url_col):
    """path(+?query) a rule matches against — JVM-side parse_url."""
    path = F.parse_url(url_col, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)
    query = F.parse_url(url_col, F.lit("QUERY"))
    return F.when(
        query.isNull() | (query == ""), path
    ).otherwise(F.concat(path, F.lit("?"), query))


def robots_verdict(cand_urls: DataFrame, rules_df: DataFrame) -> DataFrame:
    """(url, host) -> (url, robots_ok boolean) via longest-match."""
    c = cand_urls.withColumn("__mt", match_target_col(F.col("url")))
    j = c.join(rules_df, "host", "left")
    matched = F.col("pattern_re").isNotNull() & F.regexp_like(
        F.col("__mt"), F.col("pattern_re")
    )
    agg = j.groupBy("url").agg(
        F.max(F.when(matched & ~F.col("allow"), F.col("pattern_len"))).alias(
            "__dis"
        ),
        F.max(F.when(matched & F.col("allow"), F.col("pattern_len"))).alias(
            "__alw"
        ),
    )
    return agg.select(
        "url",
        (
            F.col("__dis").isNull()
            | (F.coalesce(F.col("__alw"), F.lit(-1)) > F.col("__dis"))
        ).alias("robots_ok"),
    )
