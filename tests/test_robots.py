"""robots.txt parser/matcher tests (q203's machinery) — the RFC 9309
corners that silently flip crawl decisions: longest-match precedence,
allow-on-tie, empty Disallow, wildcard and end-anchor semantics,
group selection vs rule fallthrough, and messy wild files."""

from __future__ import annotations

from bigdataflink_spark.operators.robots import (
    parse_robots,
    robots_decision,
    select_group,
)


def _decide(text, agent, path):
    groups, _ = parse_robots(text)
    return robots_decision(groups, agent, path)


def test_longest_match_and_allow_tie():
    txt = """
User-agent: *
Disallow: /p/
Allow: /p/open
Disallow: /x
Allow: /x
"""
    assert _decide(txt, "bot", "/p/secret")[0] is False
    assert _decide(txt, "bot", "/p/open/file")[0] is True   # longer allow
    assert _decide(txt, "bot", "/x/equal")[:2] == (True, "/x")  # tie -> allow
    assert _decide(txt, "bot", "/elsewhere")[:2] == (True, "")


def test_wildcard_and_end_anchor():
    txt = "User-agent: *\nDisallow: /*.json$\nDisallow: /tmp*/"
    assert _decide(txt, "b", "/a/b/c.json")[0] is False
    assert _decide(txt, "b", "/a/c.json.bak")[0] is True  # anchored
    assert _decide(txt, "b", "/tmp123/f")[0] is False
    assert _decide(txt, "b", "/tmp")[0] is True           # needs the /


def test_group_selection_stops_fallthrough():
    txt = """
User-agent: *
Disallow: /

User-agent: GoodBot
Disallow: /private/
"""
    # GoodBot's own group allows everything outside /private/ even
    # though '*' disallows all — no fallthrough
    assert _decide(txt, "goodbot", "/anything")[0] is True
    assert _decide(txt, "GOODBOT", "/private/x")[0] is False
    assert _decide(txt, "other", "/anything")[0] is False
    groups, _ = parse_robots(txt)
    assert select_group(groups, "nobody-matches-star-exists") is groups[0]


def test_empty_disallow_and_no_groups():
    assert _decide("User-agent: *\nDisallow:", "b", "/x")[0] is True
    assert _decide("# only comments\n", "b", "/x")[:2] == (True, "")


def test_wild_file_tolerance():
    txt = (
        "Rule-before-any-group: ignored\r\n"
        "Disallow: /ignored-too\r\n"
        "USER-AGENT: CrawlerOne\r\n"
        "user-agent: crawlertwo\r\n"
        "  DisAllow:   /a   # trailing comment\r\n"
        "Crawl-Delay: not-a-number\r\n"
        "Crawl-Delay: 7\r\n"
        "Sitemap: https://x/sm1.xml\r\n"
        "Sitemap: https://x/sm2.xml\r\n"
    )
    groups, sitemaps = parse_robots(txt)
    assert len(groups) == 1 and sitemaps == [
        "https://x/sm1.xml", "https://x/sm2.xml"
    ]
    # both agent aliases hit the same group; delay keeps the last
    # parseable value
    for agent in ("crawlerone", "CrawlerTwo"):
        allowed, pattern, delay = robots_decision(groups, agent, "/a/b")
        assert (allowed, pattern, delay) == (False, "/a", 7)
    # consecutive User-agent lines AFTER rules start a NEW group
    txt2 = "User-agent: a\nDisallow: /x\nUser-agent: b\nAllow: /x\n"
    g2, _ = parse_robots(txt2)
    assert len(g2) == 2
    assert robots_decision(g2, "b", "/x")[0] is True


def test_multiple_matching_groups_merge():
    # RFC 9309 §2.2.1: ALL groups matching the agent merge — rules
    # from a second 'User-agent: foo' group must not be ignored
    txt = """
User-agent: FooBot
Disallow: /a/

User-agent: Other
Disallow: /

User-agent: FooBot
Crawl-delay: 9
Disallow: /b/
"""
    assert _decide(txt, "foobot", "/a/x")[0] is False
    assert _decide(txt, "foobot", "/b/x")[0] is False  # second group's rule
    assert _decide(txt, "foobot", "/c")[0] is True
    assert _decide(txt, "foobot", "/b/x")[2] == 9  # delay from either group

    # multiple '*' groups merge too, and the MAX (most conservative
    # for a polite crawler) crawl-delay wins (ADVICE r7)
    txt2 = """
User-agent: *
Crawl-delay: 5
Disallow: /one

User-agent: *
Crawl-delay: 3
Disallow: /two
"""
    assert _decide(txt2, "anybot", "/one")[0] is False
    assert _decide(txt2, "anybot", "/two")[0] is False
    assert _decide(txt2, "anybot", "/three")[2] == 5
