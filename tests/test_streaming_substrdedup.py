"""Online substring dedup: the stream/batch contracts of
streaming/substrdedup.py.

* one-batch stream ≡ the batch operator row-for-row ("seen earlier or
  twice here" degenerates to "count >= 2");
* the STATE (distinct gram-hash set) converges to the batch
  operator's gram universe under ANY slicing — at-arrival verdicts
  legitimately depend on slicing (a first sight is never
  retro-flagged), state does not;
* replaying a batch is idempotent: state unchanged, verdicts equal.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataflink_spark.operators.text import (
    substring_span_stats,
    substring_windows,
)
from bigdataflink_spark.streaming.substrdedup import accept_batch


def _docs(spark, sf="/root/testdata/sf0.001"):
    from bigdataflink_spark.sources.tables import load_table

    return load_table(spark, "documents", sf)


def test_one_batch_stream_equals_batch_operator(spark, tmp_path):
    docs = _docs(spark)
    out = accept_batch(spark, docs, str(tmp_path / "s1"))
    batch = substring_span_stats(docs, min_len=10)
    g = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert g == b and len(g) > 0


@pytest.mark.parametrize("mod", [2, 3, 5])
def test_state_converges_under_any_slicing(spark, tmp_path, mod):
    docs = _docs(spark)
    state = str(tmp_path / f"s_{mod}")
    for s in range(mod):
        accept_batch(spark, docs.filter(F.col("doc_id") % mod == s), state)
    got = {
        r.gh for r in spark.read.parquet(f"{state}/grams").collect()
    }
    from bigdataflink_spark.operators.hashing import md5_int

    want = {
        r.gh
        for r in substring_windows(docs)
        .select(
            md5_int(
                F.concat(F.lit("ssd-v1"), F.col("gram")), bits=60
            ).alias("gh")
        )
        .distinct()
        .collect()
    }
    assert got == want


def test_replayed_batch_state_is_idempotent(spark, tmp_path):
    """STATE idempotence is the replay contract (the module claims
    exactly this): re-running a batch appends nothing. Verdicts are
    AT-ARRIVAL — a replayed batch's own grams are in state by then,
    so its docs flag fully duplicated; that is the documented
    at-least-once caveat, not a bug, and the test pins it."""
    docs = _docs(spark)
    state = str(tmp_path / "s_replay")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    accept_batch(spark, b0, state)
    first = accept_batch(spark, b1, state)
    first_docs = {r.doc_id for r in first.collect()}
    n_state = spark.read.parquet(f"{state}/grams").count()
    replay = accept_batch(spark, b1, state).collect()
    # state unchanged — the anti-join append is the idempotent part
    assert spark.read.parquet(f"{state}/grams").count() == n_state
    # replayed docs flag AT LEAST what the first pass flagged (grams
    # only ever enter state), and every >=L-token doc now flags fully
    assert first_docs <= {r.doc_id for r in replay}
    assert all(r.dup_tokens == r.n_tokens for r in replay)


def test_compaction_bounds_state_files_verdicts_unchanged(spark, tmp_path):
    """N batches with maintenance ON keep the gram dir's file count
    bounded while producing byte-identical verdicts and state CONTENT
    to an unmaintained run — compaction changes layout only. Ordering
    mirrors run_substr_stream: each batch's verdicts are materialized
    BEFORE compaction may delete the files its plan pinned."""
    import os

    from bigdataflink_spark.streaming.substrdedup import (
        maintain_gram_state,
    )

    docs = _docs(spark)
    mod = 8
    plain = str(tmp_path / "plain")
    comp = str(tmp_path / "comp")
    got_plain, got_comp = [], []
    for s in range(mod):
        batch = docs.filter(F.col("doc_id") % mod == s)
        got_plain += [
            tuple(r) for r in accept_batch(spark, batch, plain).collect()
        ]
        got_comp += [
            tuple(r) for r in accept_batch(spark, batch, comp).collect()
        ]
        ran = maintain_gram_state(
            spark, comp, max_files=4, target_rows_per_file=100_000
        )
        if ran is not None:
            before, after = ran
            assert after < before

    def _files(d):
        return [
            f
            for f in os.listdir(f"{d}/grams")
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        ]

    # plain accretes one file-set per batch; maintained stays bounded
    # by threshold + at most one post-compaction append's file-set
    assert len(_files(plain)) >= mod
    assert len(_files(comp)) < len(_files(plain))
    assert len(_files(comp)) <= 4 + spark.sparkContext.defaultParallelism
    # verdicts identical batch-for-batch
    assert sorted(got_plain) == sorted(got_comp)
    # state CONTENT identical (distinct gh sets)
    a = {r.gh for r in spark.read.parquet(f"{plain}/grams").collect()}
    b = {r.gh for r in spark.read.parquet(f"{comp}/grams").collect()}
    assert a == b
