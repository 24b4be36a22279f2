"""Unit tests for robots parsing/matching (reference analog:
crawler/web/src/test/.../robot/impl/StandardRobotsTxtProviderTest.java)."""

from crawlspark.functions.robots import (
    RobotsMatcher,
    parse_robots_txt,
    robots_rules_rows,
)

BODY = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 2
Sitemap: http://a.b/sitemap.xml

User-agent: othercrawler
Disallow: /
"""


def test_group_selection_wildcard():
    r = parse_robots_txt(BODY, "crawlspark")
    assert ("/private/", False) in r.rules
    assert ("/private/ok/", True) in r.rules
    assert r.crawl_delay == 2
    assert r.sitemaps == ["http://a.b/sitemap.xml"]


def test_group_selection_exact_beats_wild():
    body = """
User-agent: *
Disallow: /a/
User-agent: mybot
Disallow: /b/
Crawl-delay: 5
"""
    r = parse_robots_txt(body, "mybot")
    assert r.rules == [("/b/", False)]
    assert r.crawl_delay == 5
    # other agents get the wildcard group
    r2 = parse_robots_txt(body, "zbot")
    assert r2.rules == [("/a/", False)]


def test_partial_match_precedence():
    body = """
User-agent: *
Disallow: /w/
User-agent: my
Disallow: /p/
"""
    # "my" is a partial match for agent "mybot" -> beats wildcard
    r = parse_robots_txt(body, "mybot")
    assert r.rules == [("/p/", False)]


def test_consecutive_agent_lines_share_group():
    body = """
User-agent: a
User-agent: b
Disallow: /x/
"""
    assert parse_robots_txt(body, "b").rules == [("/x/", False)]
    assert parse_robots_txt(body, "a").rules == [("/x/", False)]
    assert parse_robots_txt(body, "c").rules == []


def test_longest_match_allow_beats_disallow_only_strictly_longer():
    # RobotsTxtFiltersStage.java:94 — Allow wins iff strictly longer.
    r = parse_robots_txt(
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok/", "x"
    )
    m = RobotsMatcher(r)
    assert m.allowed("/public/page")
    assert not m.allowed("/private/secret")
    assert m.allowed("/private/ok/page")
    # equal length allow does NOT override
    r2 = parse_robots_txt("User-agent: *\nDisallow: /aa/\nAllow: /bb/", "x")
    m2 = RobotsMatcher(r2)
    assert not m2.allowed("/aa/x")


def test_wildcard_and_anchor_patterns():
    r = parse_robots_txt(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*", "x"
    )
    m = RobotsMatcher(r)
    assert not m.allowed("/docs/file.pdf")
    assert m.allowed("/docs/file.pdf?x=1")  # $ anchor
    assert not m.allowed("/tmp/a")
    assert not m.allowed("/tmpfoo")
    assert m.allowed("/other")


def test_empty_disallow_allows_all():
    r = parse_robots_txt("User-agent: *\nDisallow:", "x")
    assert RobotsMatcher(r).allowed("/anything")


def test_rules_rows_sentinel():
    rows = robots_rules_rows("h", None)
    assert len(rows) == 1 and rows[0]["allow"] and rows[0]["pattern"] is None
    rows2 = robots_rules_rows("h", BODY)
    assert {r["pattern"] for r in rows2} == {"/private/", "/private/ok/"}
    assert all(r["crawl_delay_ms"] == 2000 for r in rows2)
