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


def test_one_batch_excise_equals_batch_operator(spark, tmp_path):
    """Stream-over-one-batch ≡ the batch excision row-for-row (within
    one batch, "seen earlier or twice here" degenerates to
    "count >= 2" — the q230 parity applied to the repaired text)."""
    from bigdataflink_spark.operators.text import substring_excise
    from bigdataflink_spark.streaming.substrdedup import (
        accept_batch_excise,
    )

    docs = _docs(spark)
    got = sorted(
        tuple(r)
        for r in accept_batch_excise(
            spark, docs, str(tmp_path / "s1")
        ).collect()
    )
    want = sorted(
        tuple(r) for r in substring_excise(docs, min_len=10).collect()
    )
    assert got == want and len(got) > 0


def test_excise_at_arrival_cuts_repeat_keeps_first(spark, tmp_path):
    """The at-arrival contract on repaired text: a batch-2 doc that
    repeats a batch-1 run gets it CUT; the batch-1 first sight was
    already emitted intact and a stream cannot edit the past."""
    from pyspark.sql import functions as F  # noqa: F811

    from bigdataflink_spark.streaming.substrdedup import (
        accept_batch_excise,
    )

    run = " ".join(f"r{i}" for i in range(10))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, f"{uniq('a', 4)} {run}")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(2, f"{run} {uniq('b', 4)}")], "doc_id long, text string"
    )
    out1 = {r.doc_id: r for r in accept_batch_excise(spark, b1, state).collect()}
    out2 = {r.doc_id: r for r in accept_batch_excise(spark, b2, state).collect()}
    # batch 1: run unseen, nothing within-batch duplicated -> intact
    assert out1[1].removed_tokens == 0
    assert out1[1].repaired == f"{uniq('a', 4)} {run}"
    # batch 2: the run is prefix-duplicated -> cut; padding survives
    assert out2[2].removed_tokens == 10
    assert out2[2].repaired == uniq("b", 4)
