"""Streaming Bloom seen-set (streaming/bloomdedup.py): stream over
slices must equal per-slice batch membership against the union of
earlier slices — and state stays bounded by m forever."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bigdataflink_spark.operators.sketches import (
    bloom_membership,
    bloom_positions,
)
from bigdataflink_spark.streaming.bloomdedup import accept_batch


def _slices(spark, n=900, k=3):
    # keys overlap across slices: key = id % 400 with slice = id // 300
    df = spark.range(n).select(
        (F.col("id") % 400).alias("key"), (F.col("id") / 300).cast("int").alias("s")
    )
    return [df.filter(F.col("s") == i).select("key") for i in range(k)]


def test_stream_equals_batch_per_slice(spark):
    slices = _slices(spark)
    state = tempfile.mkdtemp(prefix="bloomdedup_") + "/state"
    streamed = [
        {
            r.probe_key: r.seen_before
            for r in accept_batch(spark, b, state, key_col="key").collect()
        }
        for b in slices
    ]
    # batch twin: slice i probes the filter of slices < i
    for i, b in enumerate(slices):
        if i == 0:
            assert set(streamed[0].values()) == {False}
            continue
        earlier = slices[0]
        for e in slices[1:i]:
            earlier = earlier.union(e)
        direct = {
            r.probe_key: r.member
            for r in bloom_membership(
                b, "key", bloom_positions(earlier, "key")
            ).collect()
        }
        assert streamed[i] == direct, f"slice {i} diverged"
    # slice 1 (ids 300-599) re-carries keys 0..199 from slice 0 —
    # genuinely seen, no false negatives
    assert all(streamed[1][str(k)] for k in range(200))


def test_state_bounded_and_replay_idempotent(spark):
    import pyspark.sql.functions as F2

    state = tempfile.mkdtemp(prefix="bloomdedup_b_") + "/state"
    b1 = spark.range(500).select(F.col("id").alias("key"))
    b2 = spark.range(250, 750).select(F.col("id").alias("key"))
    accept_batch(spark, b1, state, key_col="key")
    v2 = accept_batch(spark, b2, state, key_col="key")
    pos = spark.read.parquet(state + "/positions")
    n_pos = pos.count()
    assert n_pos <= 16_384
    assert n_pos == pos.select("pos").distinct().count()  # no dup rows
    # replaying batch 2 appends nothing (idempotent set-union state)
    v2_again = accept_batch(spark, b2, state, key_col="key")
    assert spark.read.parquet(state + "/positions").count() == n_pos
    # and on replay every batch-2 key is (now) seen
    assert all(r.seen_before for r in v2_again.collect())
    # first pass: the 250 overlapping keys were seen, none missed
    seen = {r.probe_key: r.seen_before for r in v2.collect()}
    assert all(seen[str(k)] for k in range(250, 500))

def test_corrupted_state_fails_loudly(spark, tmp_path):
    """A state dir that EXISTS but cannot be read must raise, never
    silently reset to an empty filter — a silent reset would emit
    seen_before=false for genuinely-seen keys, breaking the "no
    false negatives ever" contract (round-9 verdict #2). Only a
    MISSING path means "first batch"."""
    import pytest

    state = f"{tmp_path}/state"
    b1 = spark.range(100).select(F.col("id").alias("key"))
    accept_batch(spark, b1, state, key_col="key")

    # corrupt the state: replace the parquet part files with junk
    import pathlib

    pos = pathlib.Path(state) / "positions"
    for p in pos.glob("*.parquet"):
        p.write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        accept_batch(spark, b1, state, key_col="key")
