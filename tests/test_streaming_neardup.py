"""Online near-dup dedup: greedy chain semantics, and the stream ≡
batch equivalence contract (slicing the corpus into micro-batches
never changes the accepted set)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdataflink_spark.operators import dedup
from bigdataflink_spark.sources.tables import load_table
from bigdataflink_spark.streaming.neardup import accept_batch, run_neardup_stream

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.6  # low enough that the synthetic corpus has real dups


def test_greedy_leader_chain_keeps_ends(spark):
    # chain 1~2, 2~3 (1 !~ 3): greedy keeps {1, 3}; cluster dedup
    # would keep only {1}
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (9, "lonely")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = {
        r.doc_id
        for r in dedup.greedy_leader_filter(docs, pairs).filter("keep").collect()
    }
    assert kept == {1, 3, 9}


def _batch_greedy(spark, docs):
    pairs = dedup.minhash_dedup_pairs(docs, threshold=THRESHOLD)
    return {
        r.doc_id
        for r in dedup.greedy_leader_filter(docs, pairs).filter("keep").collect()
    }


@pytest.mark.slow
def test_accept_batch_sequence_matches_batch_greedy(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    expected = _batch_greedy(spark, docs)
    assert len(expected) < docs.count()  # the corpus must exercise dedup

    # slice the corpus into 3 arrival-ordered chunks and feed them
    # through the online path
    state = f"{tmp_path}/state"
    got = set()
    for lo, hi in ((0, 170), (170, 340), (340, 10_000)):
        chunk = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        accepted = accept_batch(spark, chunk, state)
        got |= {r.doc_id for r in accepted.select("doc_id").collect()}
    assert got == expected


@pytest.mark.slow
def test_run_neardup_stream_matches_batch_greedy(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    expected = _batch_greedy(spark, docs)

    # arrival-ordered file source: one parquet file per id range
    src = f"{tmp_path}/src"
    for i, (lo, hi) in enumerate(((0, 200), (200, 400), (400, 10_000))):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(f"{src}/slice={i}")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_neardup_stream(
        spark,
        stream,
        f"{tmp_path}/state",
        f"{tmp_path}/ckpt",
        f"{tmp_path}/out",
        threshold=THRESHOLD,
    )
    got = {r.doc_id for r in spark.read.parquet(f"{tmp_path}/out").collect()}
    assert got == expected


def test_corrupted_state_fails_loudly(spark, tmp_path):
    """Existing-but-unreadable state must raise, never silently act
    as "first batch" — that would re-admit every duplicate (round-9
    verdict #2). Only a missing path means first batch."""
    import pathlib

    import pytest

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    state = f"{tmp_path}/state"
    chunk = docs.filter(F.col("doc_id") < 50)
    accept_batch(spark, chunk, state)
    for p in (pathlib.Path(state) / "bands").glob("*.parquet"):
        p.write_bytes(b"junk")
    with pytest.raises(Exception):
        accept_batch(spark, chunk, state)
