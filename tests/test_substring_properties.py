"""Property-based parity for exact substring dedup: the distributed
window-count + interval-merge pipeline must agree with a direct
single-node reference implementation of the CONTRACT (a token
position is duplicated iff some length-L window covering it occurs
>= 2 times in the corpus; report maximal merged intervals per doc)
on arbitrary hypothesis-generated corpora — including heavy repeats,
whole-doc clones, and sub-L fragments the hand-picked tests miss.

One batch of docs per example (a handful of Spark jobs per test run,
not one per corpus).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdataflink_spark.operators.text import substring_span_stats

L = 4  # small L so tiny corpora exercise every branch


def ref_span_stats(texts: list[str], min_len: int = L):
    """Direct reference: count every L-window occurrence corpus-wide,
    mark duplicated starts, merge [p, p+L-1] intervals per doc."""
    docs = [
        [t for t in s.split(" ") if t != ""] for s in texts
    ]
    grams = Counter()
    for toks in docs:
        for p in range(len(toks) - min_len + 1):
            grams[" ".join(toks[p : p + min_len])] += 1
    out = {}
    for i, toks in enumerate(docs):
        if len(toks) < min_len:
            continue
        starts = [
            p
            for p in range(len(toks) - min_len + 1)
            if grams[" ".join(toks[p : p + min_len])] >= 2
        ]
        if not starts:
            continue
        spans = []
        cur_start = starts[0]
        prev = starts[0]
        for p in starts[1:]:
            if p > prev + min_len:  # gap: coverage no longer contiguous
                spans.append((cur_start, prev + min_len - 1))
                cur_start = p
            prev = p
        spans.append((cur_start, prev + min_len - 1))
        lens = [b - a + 1 for a, b in spans]
        out[i] = (
            len(spans),
            sum(lens),
            max(lens),
            len(toks),
            round(sum(lens) / len(toks), 6),
        )
    return out


# Small token alphabet so repeats actually happen; docs of 0-14 tokens.
_TOKEN = st.sampled_from(["a", "b", "c", "ab", "x1"])
_DOC = st.lists(_TOKEN, min_size=0, max_size=14).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_substring_span_stats_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_spans, r.dup_tokens, r.max_span, r.n_tokens, r.dup_ratio)
        for r in substring_span_stats(docs, min_len=L).collect()
    }
    assert got == ref_span_stats(texts)
