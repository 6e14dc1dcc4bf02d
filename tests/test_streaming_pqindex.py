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


def test_routed_equals_full_scan_when_probing_all_cells(spark, tmp_path):
    """nprobe = ncells routes every query to EVERY cell, so the
    IVF-routed index must reproduce accept_batch's full-store ADC
    top-k exactly (same frozen codebook rule, same fold, same tie
    order) — the routing machinery changes WHAT is read, never the
    scores. n_scanned then equals n_indexed."""
    from bigdataflink_spark.streaming.pqindex import (
        accept_batch,
        accept_batch_routed,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 10)
    full = accept_batch(spark, emb, qs, str(tmp_path / "flat"), k=4)
    routed = accept_batch_routed(
        spark, emb, qs, str(tmp_path / "routed"), k=4, nprobe=4, ncells=4
    )
    f = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.adc, 9))
        for r in full.collect()
    )
    g = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.adc, 9))
        for r in routed.collect()
    )
    assert f == g and len(f) == 40
    n = emb.count()
    assert {r.n_scanned for r in routed.collect()} == {n}


def test_routed_ingest_cell_keyed_sublinear_and_idempotent(spark, tmp_path):
    """The scale contract: codes land cell-keyed (label=<cell>/
    directories), every retrieved neighbor comes from the query's
    routed cells, n_scanned equals the independent routed-cell census
    (strictly below the store for at least one query — the
    sublinearity pin), and replaying a batch changes neither state
    nor output."""
    import os

    from bigdataflink_spark.streaming.pqindex import (
        accept_batch_routed,
        assign_cells,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 10)
    state = str(tmp_path / "state")
    outs = []
    for s in range(3):
        outs.append(
            sorted(
                tuple(r)
                for r in accept_batch_routed(
                    spark,
                    emb.filter(F.col("vec_id") % 3 == s),
                    qs,
                    state,
                    k=3,
                    nprobe=2,
                    ncells=8,
                ).collect()
            )
        )
    # cell-keyed layout: the codes dir holds label=<cell> partitions
    parts = sorted(
        d for d in os.listdir(f"{state}/codes") if d.startswith("label=")
    )
    assert len(parts) >= 2
    # independent census: assign every vector with the FROZEN
    # centroids; per query, n_scanned must equal the routed-cell mass
    cents = spark.read.parquet(f"{state}/centroids")
    cellof = {
        r.vec_id: r.cell
        for r in assign_cells(emb, cents).select("vec_id", "cell").collect()
    }
    csz: dict[int, int] = {}
    for c in cellof.values():
        csz[c] = csz.get(c, 0) + 1
    routed_cells: dict[int, set[int]] = {}
    for r in (
        qs.select("vec_id", "embedding")
        .join(F.broadcast(cents))
        .withColumn(
            "_c",
            F.round(
                F.expr(
                    "aggregate(zip_with(embedding, centroid,"
                    " (a, b) -> CAST(a AS DOUBLE) * b), 0D,"
                    " (acc, v) -> acc + v)"
                )
                / (
                    F.sqrt(
                        F.expr(
                            "aggregate(zip_with(embedding, embedding,"
                            " (a, b) -> CAST(a AS DOUBLE) * b), 0D,"
                            " (acc, v) -> acc + v)"
                        )
                    )
                    * F.sqrt(
                        F.expr(
                            "aggregate(zip_with(centroid, centroid,"
                            " (a, b) -> a * b), 0D, (acc, v) -> acc + v)"
                        )
                    )
                ),
                6,
            ),
        )
        .collect()
    ):
        routed_cells.setdefault(r.vec_id, []).append((r._c, r.cell))
    routed_top = {
        q: {c for _, c in sorted(v, key=lambda t: (-t[0], t[1]))[:2]}
        for q, v in routed_cells.items()
    }
    total = emb.count()
    last = outs[2]
    seen_n = {}
    for row in last:
        qid, nid, adc, rank, n_scanned = row
        assert cellof[nid] in routed_top[qid]  # neighbor from routed cells
        seen_n[qid] = n_scanned
    for qid, n_scanned in seen_n.items():
        assert n_scanned == sum(csz.get(c, 0) for c in routed_top[qid])
    assert min(seen_n.values()) < total  # sublinear for someone
    # replay the LAST batch: identical rows, nothing appended
    n_codes = sum(
        spark.read.parquet(f"{state}/codes/{d}").count() for d in parts
    )
    replay = sorted(
        tuple(r)
        for r in accept_batch_routed(
            spark,
            emb.filter(F.col("vec_id") % 3 == 2),
            qs,
            state,
            k=3,
            nprobe=2,
            ncells=8,
        ).collect()
    )
    assert replay == outs[2]
    assert (
        sum(spark.read.parquet(f"{state}/codes/{d}").count() for d in parts)
        == n_codes
    )


def test_code_state_compaction_preserves_retrieval(spark, tmp_path):
    """maintain_code_state rewrites over-fragmented cell directories
    (per-cell compact_dir — id-sorted shards, crash-safe swap) without
    changing state content: file counts drop, per-cell rows are
    identical, and a replayed trigger produces byte-identical output
    against the compacted layout."""
    import os

    from bigdataflink_spark.streaming.pqindex import (
        accept_batch_routed,
        maintain_code_state,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 10)
    state = str(tmp_path / "state")
    last = None
    for s in range(3):
        last = sorted(
            tuple(r)
            for r in accept_batch_routed(
                spark,
                emb.filter(F.col("vec_id") % 3 == s),
                qs,
                state,
                k=3,
                nprobe=2,
                ncells=4,
            ).collect()
        )
    codes = f"{state}/codes"
    parts = sorted(d for d in os.listdir(codes) if d.startswith("label="))

    def census():
        return {
            d: sorted(
                tuple(r)
                for r in spark.read.parquet(f"{codes}/{d}").collect()
            )
            for d in parts
        }

    def filecount(d):
        return sum(
            1 for f in os.listdir(f"{codes}/{d}") if f.startswith("part-")
        )

    before_rows = census()
    before_files = {d: filecount(d) for d in parts}
    done = maintain_code_state(spark, state, max_files=1)
    assert done  # at least one cell exceeded 1 file after 3 triggers
    for cell, (fb, fa) in done.items():
        assert fa <= fb and filecount(f"label={cell}") == fa
    assert census() == before_rows  # content identical, layout only
    # replay of the last trigger against the compacted layout:
    # identical rows, nothing re-appended
    replay = sorted(
        tuple(r)
        for r in accept_batch_routed(
            spark,
            emb.filter(F.col("vec_id") % 3 == 2),
            qs,
            state,
            k=3,
            nprobe=2,
            ncells=4,
        ).collect()
    )
    assert replay == last
    assert census() == before_rows
    # below-threshold call is a no-op
    assert maintain_code_state(spark, state, max_files=10_000) == {}


def test_routed_run_stream_file_source(spark, tmp_path):
    """End-to-end foreachBatch drain of the ROUTED index through a
    real Structured Streaming file source (one slice file per
    trigger, arrival order pinned via mtimes): every trigger's output
    rows equal the manual accept_batch_routed loop over the same
    slices, with per-cell compaction running live between triggers
    (compact_after_files=1 — content-preserving by the r13
    maintenance contract)."""
    import os

    from bigdataflink_spark.streaming.pqindex import (
        accept_batch_routed,
        run_pq_index_stream,
    )

    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") < 10)
    src = f"{tmp_path}/src"
    for i in range(3):
        d = f"{src}/slice={i}"
        emb.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(d)
        t = 1_700_000_000 + i * 10  # pin arrival order (oldest first)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (t, t))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    run_pq_index_stream(
        spark,
        stream,
        qs,
        f"{tmp_path}/state",
        f"{tmp_path}/ckpt",
        f"{tmp_path}/out",
        k=3,
        nprobe=2,
        ncells=4,
        compact_after_files=1,
    )
    out = spark.read.parquet(f"{tmp_path}/out")
    got = {
        b: sorted(
            (r.query_id, r.neighbor_id, round(r.adc, 9), r.rank, r.n_scanned)
            for r in out.filter(F.col("batch_id") == b).collect()
        )
        for b in range(3)
    }
    want = {}
    manual = str(tmp_path / "manual")
    for s in range(3):
        want[s] = sorted(
            (r.query_id, r.neighbor_id, round(r.adc, 9), r.rank, r.n_scanned)
            for r in accept_batch_routed(
                spark,
                emb.filter(F.col("vec_id") % 3 == s),
                qs,
                manual,
                k=3,
                nprobe=2,
                ncells=4,
            ).collect()
        )
    assert got == want
