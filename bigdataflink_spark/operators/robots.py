"""robots.txt parsing + per-URL access decisions (RFC 9309).

The crawl-politeness component of the web-ingest family: a pipeline
that ingests WARC shards (q196/q201) and extracts text (q199) also
has to answer "was this URL allowed?" — retroactively for audit, and
online for recrawl planning. That decision runs per (robots, url)
pair over billions of rows, so the matcher compiles each rule once
per robots file and the Spark stage (q203) amortizes it per site
cohort.

Implemented from the public spec (RFC 9309):
- groups = runs of ``User-agent:`` lines followed by rules; rules
  before any group are ignored; field names case-insensitive;
  ``#`` comments stripped; CR tolerated;
- agent selection: exact (case-insensitive) product-token match
  preferred, else the ``*`` group, else no group → allowed;
- rule patterns: literal path prefixes with ``*`` (any chars) and a
  trailing ``$`` (end anchor);
- precedence among matching rules: LONGEST pattern (octet length)
  wins; on a tie, allow beats disallow; an empty ``Disallow:`` is
  "allow everything" and never blocks;
- ``Crawl-delay`` recorded per group (common extension), ``Sitemap``
  collected file-wide.
"""

from __future__ import annotations

import re


def _pattern_to_regex(pattern: str) -> "re.Pattern":
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


class RobotsGroup:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self) -> None:
        self.agents: list[str] = []
        # (allow, pattern, compiled) — empty Disallow is dropped at
        # parse time (it permits everything and must never win a
        # longest-match comparison)
        self.rules: list[tuple[bool, str, "re.Pattern"]] = []
        self.crawl_delay: "int | None" = None


def parse_robots(text: str) -> tuple[list[RobotsGroup], list[str]]:
    """Parse a robots.txt body into (groups, sitemaps)."""
    groups: list[RobotsGroup] = []
    sitemaps: list[str] = []
    cur: "RobotsGroup | None" = None
    collecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not collecting_agents:
                cur = RobotsGroup()
                groups.append(cur)
                collecting_agents = True
            cur.agents.append(value.lower())
            continue
        collecting_agents = False
        if field == "sitemap":
            sitemaps.append(value)
            continue
        if cur is None:
            continue  # rules before any User-agent line are ignored
        if field in ("allow", "disallow"):
            if value == "":
                continue  # empty rule: matches nothing (RFC 9309 §2.2.2)
            cur.rules.append(
                (field == "allow", value, _pattern_to_regex(value))
            )
        elif field == "crawl-delay":
            try:
                cur.crawl_delay = int(value)
            except ValueError:
                pass
    return groups, sitemaps


def _merge(matched: list[RobotsGroup]) -> "RobotsGroup | None":
    if not matched:
        return None
    if len(matched) == 1:
        return matched[0]
    merged = RobotsGroup()
    for g in matched:
        merged.agents.extend(g.agents)
        merged.rules.extend(g.rules)
        if g.crawl_delay is not None and (
            merged.crawl_delay is None or g.crawl_delay > merged.crawl_delay
        ):
            merged.crawl_delay = g.crawl_delay
    return merged


def select_group(
    groups: list[RobotsGroup], agent: str
) -> "RobotsGroup | None":
    """Exact (case-insensitive) agent-token match beats the ``*``
    group; no match → None (everything allowed).

    RFC 9309 §2.2.1: a crawler obeys the UNION of the rules of every
    group whose agent list matches, so multiple ``User-agent: foo``
    (or multiple ``*``) groups merge — rules concatenated, and the
    MAXIMUM crawl-delay kept (the conservative choice for a polite
    crawler; the minimum would be the most permissive — ADVICE r7) —
    rather than first-group-wins (ADVICE r6)."""
    agent = agent.lower()
    exact = _merge([g for g in groups if agent in g.agents])
    if exact is not None:
        return exact
    return _merge([g for g in groups if "*" in g.agents])


def robots_decision(
    groups: list[RobotsGroup], agent: str, path: str
) -> tuple[bool, str, "int | None"]:
    """(allowed, winning_pattern, crawl_delay) for one URL path.
    Longest matching pattern wins; allow wins ties; no matching rule
    (or no matching group) → allowed with an empty pattern."""
    g = select_group(groups, agent)
    if g is None:
        return True, "", None
    best: "tuple[int, bool, str] | None" = None
    for allow, pattern, rx in g.rules:
        if rx.match(path):
            key = (len(pattern), allow)
            if best is None or key > (best[0], best[1]):
                best = (len(pattern), allow, pattern)
    if best is None:
        return True, "", g.crawl_delay
    return best[1], best[2], g.crawl_delay
