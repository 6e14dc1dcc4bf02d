"""Streaming PQ index ingest — the similarity family's streaming twin
(round 12): embeddings arrive in micro-batches, are PQ-encoded with a
codebook FROZEN from the first batch, and accrete into a code store;
after every batch a standing query set retrieves its top-k by ADC over
everything indexed so far. This is the deployment shape of a
continuously-fed vector index: the store holds ``nsub`` bytes per
vector (the PQ point — the 100 TB corpus fits in code form), the
codebook never moves after bootstrap (re-encoding history on every
codebook change would be a full-corpus rewrite), and retrieval quality
over the prefix is exactly batch PQ quality (pq_adc_shortlist over the
same codes — parity-tested).

State layout (both via the round-10/11 state rules — loud reads,
call-time file-list pinning):

* ``<state>/codebook`` — written ONCE by the bootstrap batch
  (ncent·nsub rows); replayed bootstraps reuse it, so replay is
  idempotent by construction;
* ``<state>/codes`` — (id, codes array<int>) appended per batch,
  anti-joined on id so replays append nothing. 8 bytes/vector at the
  defaults; grows linearly in VECTORS, not dimensions — the honest,
  bounded-per-row cost of an exact-membership index (the gram store of
  substrdedup.py is the same shape for text).

Scoring is at-arrival over the store AFTER the batch's append, so a
replayed batch scores against identical state and emits identical
rows — stronger than the substring twin's at-arrival caveat.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdataflink_spark.operators.similarity import (
    _pq_subvectors,
    pq_adc_shortlist,
    pq_encode,
)
from bigdataflink_spark.streaming.statestore import read_state


def pq_codebook_lowest(
    corpus: DataFrame,
    nsub: int = 8,
    dsub: int = 8,
    ncent: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codebook from the ``ncent`` LOWEST ids PRESENT in ``corpus``,
    re-indexed densely 0..ncent-1 by id rank — the bootstrap-batch
    variant of pq_codebook (whose ``id < ncent`` rule assumes a dense
    id space; a micro-batch slice has holes). Deterministic, so the
    SQL oracle rebuilds it with one ORDER BY/LIMIT + row_number."""
    lowest = corpus.orderBy(id_col).limit(ncent)
    w = Window.orderBy(id_col)
    cents = lowest.withColumn(
        "_cent", (F.row_number().over(w) - 1).cast("int")
    )
    return _pq_subvectors(cents, "_cent", vec_col, nsub, dsub, "cent").select(
        F.col("cent").cast("int").alias("cent"),
        "sub",
        F.col("sv").alias("cv"),
    )


def accept_batch(
    spark: SparkSession,
    batch_vecs: DataFrame,
    queries: DataFrame,
    state_dir: str,
    k: int = 3,
    nsub: int = 8,
    dsub: int = 8,
    ncent: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One ingest step: freeze the codebook if this is the bootstrap
    batch, PQ-encode the batch, fold the codes into the store
    (anti-joined — idempotent), then retrieve the standing
    ``queries``' top-``k`` by ADC over EVERYTHING indexed so far.
    Returns (query_id, neighbor_id, adc, rank, n_indexed)."""
    cb_dir = os.path.join(state_dir, "codebook")
    codes_dir = os.path.join(state_dir, "codes")
    cb = read_state(spark, cb_dir)
    if cb is None:
        pq_codebook_lowest(
            batch_vecs, nsub, dsub, ncent, id_col, vec_col
        ).write.parquet(cb_dir)
        cb = read_state(spark, cb_dir)
    codes_new = pq_encode(batch_vecs, cb, nsub, dsub, id_col, vec_col)
    prior = read_state(spark, codes_dir)
    if prior is not None:
        codes_new = codes_new.join(prior.select("id"), "id", "left_anti")
    codes_new.write.mode("append").parquet(codes_dir)
    store = read_state(spark, codes_dir)  # post-append snapshot
    out = pq_adc_shortlist(
        store, cb, queries, k=k, nsub=nsub, dsub=dsub,
        id_col=id_col, vec_col=vec_col,
    )
    n_indexed = store.agg(F.count("*").cast("long").alias("n_indexed"))
    return out.crossJoin(F.broadcast(n_indexed)).select(
        "query_id", "neighbor_id", "adc", "rank", "n_indexed"
    )
