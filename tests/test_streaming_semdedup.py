"""Online SemDeDup: the stream ≡ batch equivalence contract (slicing
the id-ordered corpus into micro-batches never changes any verdict),
the dropped-vector-still-drops rule that distinguishes SemDeDup from
greedy near-dup, and the explicit-width banded state tier."""

from __future__ import annotations

import pyspark.sql.functions as F

from bigdataflink_spark.operators.similarity import semantic_dedup
from bigdataflink_spark.sources.tables import load_table
from bigdataflink_spark.streaming.semdedup import accept_batch, run_semdedup_stream

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.4  # q185's threshold — the corpus has real semantic dups


def _batch_verdicts(spark, corpus):
    return {
        r.id: (r.cell, r.dropped)
        for r in semantic_dedup(corpus, threshold=THRESHOLD).collect()
    }


def test_accept_batch_slices_match_batch_semdedup(spark, tmp_path):
    corpus = load_table(spark, "embeddings", SF)
    expected = _batch_verdicts(spark, corpus)
    assert any(d for _, d in expected.values())  # must exercise drops

    state = f"{tmp_path}/state"
    got = {}
    for lo, hi in ((0, 170), (170, 340), (340, 10_000)):
        chunk = corpus.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        verdict = accept_batch(spark, chunk, state, threshold=THRESHOLD)
        got.update({r.id: (r.cell, r.dropped) for r in verdict.collect()})
    assert got == expected


def test_dropped_vector_still_drops_later_arrivals(spark, tmp_path):
    """The SemDeDup rule (q185's EXISTS oracle): the dropper need not
    be a survivor. b is dropped by a; c matches ONLY b — and is still
    dropped, because state keeps every seen vector. (Greedy near-dup
    would keep c: its leader b was rejected.)"""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.5, 0.5, 0.0, 0.0], 0),  # cos(1,2)=.707 → dropped by 1
        (3, [0.0, 1.0, 0.0, 0.0], 0),  # cos(2,3)=.707, cos(1,3)=0
    ]
    schema = "vec_id long, embedding array<double>, label int"
    corpus = spark.createDataFrame(rows, schema)
    batch_v = {
        r.id: r.dropped
        for r in semantic_dedup(corpus, threshold=0.6).collect()
    }
    assert batch_v == {1: False, 2: True, 3: True}

    state = f"{tmp_path}/state"
    got = {}
    for row in rows:  # one vector per micro-batch
        verdict = accept_batch(
            spark, spark.createDataFrame([row], schema), state, threshold=0.6
        )
        got.update({r.id: r.dropped for r in verdict.collect()})
    assert got == batch_v


def test_run_semdedup_stream_matches_batch(spark, tmp_path):
    corpus = load_table(spark, "embeddings", SF)
    expected = _batch_verdicts(spark, corpus)

    src = f"{tmp_path}/src"
    for i, (lo, hi) in enumerate(((0, 200), (200, 400), (400, 10_000))):
        corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.parquet(f"{src}/slice={i}")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_semdedup_stream(
        spark,
        stream,
        f"{tmp_path}/state",
        f"{tmp_path}/ckpt",
        f"{tmp_path}/out",
        threshold=THRESHOLD,
    )
    got = {
        r.id: (r.cell, r.dropped)
        for r in spark.read.parquet(f"{tmp_path}/out").collect()
    }
    assert got == expected


def test_banded_tier_catches_cross_batch_duplicates(spark, tmp_path):
    """Explicit rows_per_band engages the sign-LSH state index;
    identical vectors agree on every sign bit, so exact duplicates
    are guaranteed candidates across batches, and non-candidates
    never reach the cosine stage."""
    schema = "vec_id long, embedding array<double>, label int"
    v = [0.3, -0.2, 0.9, -0.4, 0.1, -0.6, 0.2, 0.8]
    w = [-x for x in v]  # opposite signs: never a candidate of v
    state = f"{tmp_path}/state"
    first = accept_batch(
        spark,
        spark.createDataFrame([(1, v, 0), (2, w, 0)], schema),
        state,
        threshold=0.9,
        rows_per_band=2,
    )
    assert {r.id: r.dropped for r in first.collect()} == {1: False, 2: False}
    second = accept_batch(
        spark,
        spark.createDataFrame([(3, v, 0), (4, [abs(x) for x in v], 0)], schema),
        state,
        threshold=0.9,
        rows_per_band=2,
    )
    got = {r.id: r.dropped for r in second.collect()}
    assert got[3] is True  # exact duplicate of state vector 1
    # |v| shares v's all-positive band, so it IS a candidate — but
    # cos(v, |v|) ≈ 0.66 < 0.9: candidates below threshold survive
    assert got[4] is False


def test_corrupted_state_fails_loudly(spark, tmp_path):
    """Existing-but-unreadable state must raise, never silently act
    as "first batch" — that would re-admit semantic duplicates
    (round-9 verdict #2). Only a missing path means first batch."""
    import pathlib

    import pytest

    corpus = load_table(spark, "embeddings", SF)
    state = f"{tmp_path}/state"
    chunk = corpus.filter(F.col("vec_id") < 50)
    accept_batch(spark, chunk, state, threshold=THRESHOLD)
    for p in (pathlib.Path(state) / "vecs").glob("*.parquet"):
        p.write_bytes(b"junk")
    with pytest.raises(Exception):
        accept_batch(spark, chunk, state, threshold=THRESHOLD)
