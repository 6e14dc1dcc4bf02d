"""HTML extractor unit + property tests (q199's machinery).

The hazards pinned here are the ones that silently corrupt training
text at scale: script/style bodies leaking into text, a '>' inside a
quoted attribute closing the tag early, entities left encoded (or
decoded when they shouldn't be), block boundaries lost (two
paragraphs fused into one line), and href-less anchors counted as
links.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.html import (
    decode_entities,
    html_extract,
)


def test_structure_title_links_scripts():
    h = (
        "<!DOCTYPE html><html><head><title>T &amp; t</title>"
        "<style>p { x > y }</style></head><body>"
        "<h1>Head</h1><p>one two</p><p>three</p>"
        '<p><a name="decoy">plain</a> <A HREF="x" title="a > b">lnk</A></p>'
        '<script>var s = "</p> fake paragraph";</script>'
        "</body></html>"
    )
    r = html_extract(h)
    assert r["title"] == "T & t"
    assert r["text"] == "Head\none two\nthree\nplain lnk"
    assert r["n_links"] == 1          # decoy has no href
    assert r["n_scripts"] == 1        # style is excluded but not counted


def test_inline_vs_block_and_whitespace_collapse():
    h = "<div>a <b>b</b>\n\t c</div><div>d<br>e</div><span>f</span> g"
    assert html_extract(h)["text"] == "a b c\nd\ne\nf g"


def test_entities():
    assert decode_entities("&amp;&lt;&gt;&quot;&apos;&nbsp;") == "&<>\"' "
    assert decode_entities("&#65;&#x42;&#x2764;") == "AB❤"
    # malformed references pass through untouched
    assert decode_entities("&bogus; &amp &#xZZ; &#99999999999;") \
        == "&bogus; &amp &#xZZ; &#99999999999;"
    assert html_extract("<p>1 &lt; 2 &amp;&amp; 3 &gt; 2</p>")["text"] \
        == "1 < 2 && 3 > 2"


def test_wild_markup():
    # stray '<' is literal text and later tags still parse
    assert html_extract("<p>1 < 2 ok</p><p>B</p>")["text"] == "1 < 2 ok\nB"
    # comments may contain tags; unterminated comment eats the tail
    assert html_extract("<p>a<!-- <p>no</p> --><p>b</p>")["text"] == "a\nb"
    assert html_extract("<p>a<!-- open")["text"] == "a"
    # closing tag with junk attrs; bogus '</3>' skipped as comment
    assert html_extract("<p>A</p junk><p>B</3></p>")["text"] == "A\nB"
    # rawtext close tag with attributes still terminates the element
    assert html_extract('<script>x</script foo="bar">tail')["text"] == "tail"
    # unterminated tag at EOF
    assert html_extract("<p>keep<div attr='")["text"] == "keep"
    # case-insensitive raw-text and block handling
    assert html_extract("<STYLE>p>q</STYLE><P>z</P>")["text"] == "z"


def test_title_outside_body_and_nested_blocks():
    r = html_extract(
        "<title>Only &#84;itle</title><ul><li>a</li><li>b</li></ul>"
    )
    assert r["title"] == "Only Title"
    assert r["text"] == "a\nb"


_TOKEN = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)


@settings(max_examples=60, deadline=None)
@given(
    paras=st.lists(
        st.lists(_TOKEN, min_size=1, max_size=12), min_size=1, max_size=6
    ),
    wrap=st.sampled_from(["plain", "inline", "noise"]),
)
def test_property_paragraph_extraction(paras, wrap):
    """Whatever inline markup, comments, or raw-text noise surrounds
    them, block-wrapped token runs come back as exactly one line per
    paragraph with single-space joins."""
    parts = []
    for toks in paras:
        body = " ".join(toks)
        if wrap == "inline":
            mid = len(toks) // 2
            body = (
                " ".join(toks[:mid])
                + " <b><i>" + " ".join(toks[mid:]) + "</i></b>"
                if mid else "<em>" + body + "</em>"
            )
        elif wrap == "noise":
            body = "<!-- x --><script>junk()</script>" + body
        parts.append(f"<p> {body}\t</p>")
    r = html_extract("".join(parts))
    expected = "\n".join(" ".join(toks) for toks in paras)
    assert r["text"] == expected
