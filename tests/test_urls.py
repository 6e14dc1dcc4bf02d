"""URL normalization battery unit tests (q202's machinery) — the
corner cases the generative fixture doesn't reach: userinfo,
uppercase escapes, multiple www labels, missing components, unknown
schemes, param-name prefix collisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataflink_spark.functions import urls as U


def _one(spark, url: str, col) -> object:
    return (
        spark.range(1)
        .select(col(F.lit(url)).alias("v"))
        .collect()[0][0]
    )


@pytest.mark.parametrize(
    "url,host",
    [
        ("https://User:Pw@WWW.Ex.COM.:8443/p", "ex.com"),
        ("http://www.www.site.org/x", "www.site.org"),  # ONE www stripped
        ("ftp://Plain.Host", "plain.host"),
        ("https://no-port.example.com?q=1", "no-port.example.com"),
    ],
)
def test_host_normalization(spark, url, host):
    assert _one(spark, url, U.url_host) == host


def test_ports_and_scheme_defaults(spark):
    assert _one(spark, "https://h/x", U.url_port) == 443
    assert _one(spark, "http://h", U.url_port) == 80
    assert _one(spark, "http://h:8080/", U.url_port) == 8080
    assert _one(spark, "gopher://h/", U.url_port) == -1
    assert _one(spark, "HTTPS://h", U.url_scheme) == "https"


def test_registrable_domain_heuristic(spark):
    cases = {
        "https://a.b.site.co.uk/": "site.co.uk",
        "https://deep.sub.example.com/": "example.com",
        "https://example.org": "example.org",
        "https://uni.ac.uk": "uni.ac.uk",
        "https://localhost/": "",  # single label: no registrable domain
    }
    for url, want in cases.items():
        assert _one(spark, url, U.registrable_domain) == want, url


def test_path_query_fragment_and_params(spark):
    u = "https://h/a%20b/c%2Dd?ref=7&reff=8&x=a%20b#frag?x"
    assert _one(
        spark, u, lambda c: U.percent_decode_basic(U.url_path(c))
    ) == "/a b/c-d"
    assert _one(spark, u, U.url_query) == "ref=7&reff=8&x=a%20b"
    # 'ref' must not match the 'reff' key by prefix
    assert _one(spark, u, lambda c: U.url_query_param(c, "ref")) == "7"
    assert _one(spark, u, lambda c: U.url_query_param(c, "reff")) == "8"
    assert _one(spark, u, U.url_fragment) == "frag?x"
    assert _one(spark, "https://h/p", U.url_query) == ""
    assert _one(spark, "https://h/p", U.url_fragment) == ""
    # lowercase escapes decode too
    assert _one(
        spark, "https://h/a%2db%7e", lambda c: U.percent_decode_basic(U.url_path(c))
    ) == "/a-b~"


def test_fragment_question_mark_is_not_a_query(spark):
    # RFC 3986: the query ends at '#'; a '?' first appearing inside
    # the fragment must not leak back out as a query (ADVICE r6)
    u = "http://h/p#a?b=1"
    assert _one(spark, u, U.url_query) == ""
    assert _one(spark, u, lambda c: U.url_query_param(c, "b")) == ""
    assert _one(spark, u, U.url_fragment) == "a?b=1"
