"""Streaming PQ-index ingest contracts (streaming/pqindex.py):

* one-batch stream ≡ batch pq_adc_shortlist over the same vectors
  (shared operator, shared codebook rule);
* the codebook FREEZES at bootstrap — later batches never change it;
* replaying a batch is FULLY idempotent: state unchanged, output rows
  identical (scoring runs over the post-append snapshot).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, sf="/root/testdata/sf0.001"):
    from bigdataflink_spark.sources.tables import load_table

    return load_table(spark, "embeddings", sf)


def test_one_batch_ingest_equals_batch_adc(spark, tmp_path):
    from bigdataflink_spark.operators.similarity import (
        pq_adc_shortlist,
        pq_encode,
    )
    from bigdataflink_spark.streaming.pqindex import (
        accept_batch,
        pq_codebook_lowest,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 10)
    got = accept_batch(spark, emb, qs, str(tmp_path / "s1"), k=5)
    cb = pq_codebook_lowest(emb)
    want = pq_adc_shortlist(pq_encode(emb, cb), cb, qs, k=5)
    g = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.adc, 9))
        for r in got.collect()
    )
    w = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.adc, 9))
        for r in want.collect()
    )
    assert g == w and len(g) == 50
    assert {r.n_indexed for r in got.collect()} == {emb.count()}


def test_codebook_frozen_and_replay_idempotent(spark, tmp_path):
    import os

    from bigdataflink_spark.streaming.pqindex import accept_batch

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 10)
    state = str(tmp_path / "state")
    outs = []
    for s in range(3):
        outs.append(
            sorted(
                tuple(r)
                for r in accept_batch(
                    spark, emb.filter(F.col("vec_id") % 3 == s), qs, state
                ).collect()
            )
        )
    cb_files = sorted(
        f for f in os.listdir(f"{state}/codebook") if f.startswith("part-")
    )
    n_codes = spark.read.parquet(f"{state}/codes").count()
    # replay the LAST batch: identical rows, nothing appended,
    # codebook untouched
    replay = sorted(
        tuple(r)
        for r in accept_batch(
            spark, emb.filter(F.col("vec_id") % 3 == 2), qs, state
        ).collect()
    )
    assert replay == outs[2]
    assert spark.read.parquet(f"{state}/codes").count() == n_codes
    assert (
        sorted(
            f for f in os.listdir(f"{state}/codebook") if f.startswith("part-")
        )
        == cb_files
    )
    # the store only grows: every batch's n_indexed is strictly larger
    sizes = [rows[0][-1] for rows in outs]
    assert sizes[0] < sizes[1] < sizes[2] == n_codes
