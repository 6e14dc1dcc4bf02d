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


def ref_excise(texts: list[str], min_len: int = L) -> dict[int, str]:
    """Direct excision reference: drop every token position covered
    by a duplicated window (drop-all-repeats), re-join with spaces."""
    docs = [[t for t in s.split(" ") if t != ""] for s in texts]
    grams = Counter()
    for toks in docs:
        for p in range(len(toks) - min_len + 1):
            grams[" ".join(toks[p : p + min_len])] += 1
    out = {}
    for i, toks in enumerate(docs):
        covered = set()
        for p in range(len(toks) - min_len + 1):
            if grams[" ".join(toks[p : p + min_len])] >= 2:
                covered.update(range(p, p + min_len))
        out[i] = " ".join(
            t for q, t in enumerate(toks) if q not in covered
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_substring_excise_matches_reference(spark, texts):
    from bigdataflink_spark.operators.text import substring_excise

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r for r in substring_excise(docs, min_len=L).collect()
    }
    want = ref_excise(texts)
    assert set(rows) == set(want)  # every doc present, even untouched
    for i, rep in want.items():
        r = rows[i]
        assert r.repaired == rep
        assert r.kept_tokens == len([t for t in rep.split(" ") if t])
        assert r.removed_tokens == r.n_tokens - r.kept_tokens


def test_substring_excise_corpus_invariant(spark):
    """Re-running the span detector on the excised documents corpus
    finds NOTHING — the repaired-corpus deliverable is actually
    clean. (Empirical on this corpus, as in Lee et al.: joining
    survivors across a cut can in principle mint a new window, so the
    invariant is asserted on the real testdata, not universally.)"""
    import os

    from pyspark.sql import functions as F

    from bigdataflink_spark.operators.text import (
        substring_excise,
        substring_span_stats,
    )
    from bigdataflink_spark.sources.tables import load_table

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = load_table(spark, "documents", sf)
    rep = substring_excise(docs, min_len=10).select(
        "doc_id", F.col("repaired").alias("text")
    )
    assert substring_span_stats(rep, min_len=10).count() == 0


def ref_excise_keep_first(
    texts: list[str], min_len: int = L
) -> dict[int, str]:
    """Keep-first reference: each duplicated window's globally-first
    occurrence (min (doc_id, pos)) survives its election; a position
    is cut iff covered by a NON-elected duplicated window."""
    docs = [[t for t in s.split(" ") if t != ""] for s in texts]
    first: dict[str, tuple[int, int]] = {}
    grams: Counter = Counter()
    for i, toks in enumerate(docs):
        for p in range(len(toks) - min_len + 1):
            g = " ".join(toks[p : p + min_len])
            grams[g] += 1
            if g not in first:
                first[g] = (i, p)
    out = {}
    for i, toks in enumerate(docs):
        covered = set()
        for p in range(len(toks) - min_len + 1):
            g = " ".join(toks[p : p + min_len])
            if grams[g] >= 2 and first[g] != (i, p):
                covered.update(range(p, p + min_len))
        out[i] = " ".join(
            t for q, t in enumerate(toks) if q not in covered
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_substring_excise_keep_first_matches_reference(spark, texts):
    from bigdataflink_spark.operators.text import (
        substring_excise_keep_first,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in substring_excise_keep_first(docs, min_len=L).collect()
    }
    want = ref_excise_keep_first(texts)
    assert set(rows) == set(want)
    for i, rep in want.items():
        r = rows[i]
        assert r.repaired == rep
        assert r.kept_tokens == len([t for t in rep.split(" ") if t])
        assert r.removed_tokens == r.n_tokens - r.kept_tokens
