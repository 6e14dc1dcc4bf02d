"""URL parsing + normalization as pure Column expressions.

Crawl pipelines filter, group, and dedupe BY DOMAIN (per-site quotas,
blocklists, registrable-domain dedup), so these run per-row over
billions of URLs — which is why everything here is a JVM expression
(regexp_extract / regexp_replace / lower / split), never a UDF: the
battery stays inside whole-stage codegen and costs what a projection
costs. Patterns stick to the conservative regex subset Spark (Java)
and DuckDB (RE2) evaluate identically — no lookaround, no
backreferences — because cross-engine agreement IS this module's
contract (q202 pins it value-for-value).

Normalization policy (the common crawl-pipeline one):
- scheme lowercased;
- host lowercased, port and trailing dot stripped, one leading
  ``www.`` stripped;
- port defaults by scheme (https 443, http 80) when absent;
- registrable domain by a last-two-labels heuristic with an embedded
  multi-part-TLD set (co.uk, com.au, …) — a deliberate, documented
  approximation of the Public Suffix List, which is a moving dataset
  this repo will not vendor.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AUTHORITY = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
# multi-part TLDs the registrable-domain heuristic recognizes
_MULTI_TLD = r"\.(co|com|org|net|ac|gov)\.(uk|au|jp|in|br|nz)$"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, _AUTHORITY, 1)


def url_host(url: Column) -> Column:
    """Normalized host: lowercased, userinfo/port stripped, trailing
    dot stripped, one leading ``www.`` stripped."""
    host = F.lower(
        F.regexp_replace(
            F.regexp_replace(_authority(url), r"^[^@]*@", ""),
            r":[0-9]+$", "",
        )
    )
    host = F.regexp_replace(host, r"\.$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_port(url: Column) -> Column:
    """Explicit port, else the scheme default (443/80), else -1."""
    explicit = F.regexp_extract(_authority(url), r":([0-9]+)$", 1)
    return (
        F.when(explicit != "", explicit.cast("int"))
        .when(url_scheme(url) == "https", F.lit(443))
        .when(url_scheme(url) == "http", F.lit(80))
        .otherwise(F.lit(-1))
    )


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def url_query(url: Column) -> Column:
    # anchored so a '?' that first appears inside the FRAGMENT can't
    # masquerade as a query (RFC 3986: the query ends at '#'): consume
    # the query-less prefix, require the '?' before any '#' (ADVICE r6)
    return F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)


def url_fragment(url: Column) -> Column:
    return F.regexp_extract(url, r"#(.*)$", 1)


def url_query_param(url: Column, name: str) -> Column:
    """First value of a named query parameter (name taken literally;
    callers pass identifiers, not patterns)."""
    import re as _re

    return F.regexp_extract(
        url_query(url), r"(?:^|&)" + _re.escape(name) + r"=([^&]*)", 1
    )


def registrable_domain(url: Column) -> Column:
    """Last-two-labels heuristic with the embedded multi-part-TLD
    set: ``a.b.site.co.uk`` → ``site.co.uk``; ``a.site.org`` →
    ``site.org``. Approximation of the PSL, documented as such."""
    host = url_host(url)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    is_multi = host.rlike(_MULTI_TLD)
    return F.when(is_multi & (three != ""), three).otherwise(two)


def percent_decode_basic(col: Column) -> Column:
    """Decode the unreserved percent-escapes that matter for path
    comparison (%20 %2D %2E %5F %7E → space - . _ ~). Full RFC 3986
    decoding of arbitrary escapes needs byte-level work that belongs
    in an ingest stage, not a per-row normalizer; this subset is the
    idempotent, comparison-safe part."""
    out = col
    for esc, ch in (("%20", " "), ("%2D", "-"), ("%2E", "."),
                    ("%5F", "_"), ("%7E", "~")):
        out = F.replace(out, F.lit(esc), F.lit(ch))
        out = F.replace(out, F.lit(esc.lower()), F.lit(ch))
    return out
