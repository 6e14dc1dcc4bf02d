"""Streaming KMV + CMS twins (streaming/kmvdist.py, cmsfreq.py,
round 10): stream-over-slices must equal the batch sketch over the
union of slices seen so far, state stays bounded, and replays are
idempotent — the q215 parity pattern applied to the remaining two
sketches (r9 verdict "What's missing #2")."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataflink_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    kmv_estimate_expr,
    kmv_sketch,
)
from bigdataflink_spark.streaming import cmsfreq, kmvdist


def _key_slices(spark, n=6_000, k=3):
    df = spark.range(n).select(
        (F.col("id") % 2_345).alias("key"),
        (F.col("id") / (n // k)).cast("int").alias("s"),
    )
    return [df.filter(F.col("s") == i).select("key") for i in range(k)]


def test_kmv_stream_equals_batch_prefix(spark, tmp_path):
    slices = _key_slices(spark)
    state = f"{tmp_path}/state"
    prefix = None
    for i, b in enumerate(slices):
        got = kmvdist.accept_batch(spark, b, state, key_col="key", k=128)
        row = got.collect()[0]
        prefix = b if prefix is None else prefix.unionByName(b)
        direct = (
            kmv_sketch(prefix, "key", k=128)
            .select(kmv_estimate_expr(128).alias("e"))
            .collect()[0]
            .e
        )
        assert row.estimate == direct, f"slice {i}: {row.estimate} != {direct}"
    # state = hashes that ever entered the bottom-k: tiny (k + a few
    # displacements), and far below the distinct-key count
    n_state = spark.read.parquet(f"{state}/hashes").count()
    assert 128 <= n_state <= 128 * 8


def test_kmv_replay_idempotent_and_exact_below_k(spark, tmp_path):
    state = f"{tmp_path}/state"
    b = spark.range(100).select(F.col("id").alias("key"))
    r1 = kmvdist.accept_batch(spark, b, state, key_col="key", k=256).collect()[0]
    assert r1.estimate == 100  # unfilled sketch counts exactly
    n_state = spark.read.parquet(f"{state}/hashes").count()
    r2 = kmvdist.accept_batch(spark, b, state, key_col="key", k=256).collect()[0]
    assert r2.estimate == 100
    assert spark.read.parquet(f"{state}/hashes").count() == n_state


def test_kmv_corrupted_state_fails_loudly(spark, tmp_path):
    import pathlib

    import pytest

    state = f"{tmp_path}/state"
    b = spark.range(500).select(F.col("id").alias("key"))
    kmvdist.accept_batch(spark, b, state, key_col="key")
    for p in (pathlib.Path(state) / "hashes").glob("*.parquet"):
        p.write_bytes(b"junk")
    with pytest.raises(Exception):
        kmvdist.accept_batch(spark, b, state, key_col="key")


def _tok_slices(spark, n=9_000, k=3):
    df = spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 700).cast("string")).alias("key"),
        (F.col("id") / (n // k)).cast("int").alias("s"),
    )
    return [df.filter(F.col("s") == i).select("key") for i in range(k)]


def _counters_equal(a, b):
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_cms_stream_equals_batch_prefix(spark, tmp_path):
    slices = _tok_slices(spark)
    state = f"{tmp_path}/state"
    prefix = None
    for i, b in enumerate(slices):
        got = cmsfreq.accept_batch(
            spark, b, state, batch_id=i, key_col="key", d=4, w=1_024
        )
        prefix = b if prefix is None else prefix.unionByName(b)
        direct = cms_build(prefix, "key", d=4, w=1_024)
        assert _counters_equal(got, direct), f"slice {i} counters diverged"
        assert got.count() <= 4 * 1_024
    # estimates from the streamed state match batch estimates exactly
    probes = spark.createDataFrame([("t0",), ("t699",)], "key string")
    latest = spark.read.parquet(
        f"{state}/gen-{2:09d}"
    )
    se = {
        r.probe_key: r.est
        for r in cms_estimate(probes, "key", latest, d=4, w=1_024).collect()
    }
    be = {
        r.probe_key: r.est
        for r in cms_estimate(
            probes, "key", cms_build(prefix, "key", d=4, w=1_024), d=4, w=1_024
        ).collect()
    }
    assert se == be


def test_cms_replay_idempotent_and_crash_invisible(spark, tmp_path):
    import pathlib

    slices = _tok_slices(spark, n=3_000, k=2)
    state = f"{tmp_path}/state"
    g0 = cmsfreq.accept_batch(spark, slices[0], state, 0, "key", d=4, w=512)
    g1 = cmsfreq.accept_batch(spark, slices[1], state, 1, "key", d=4, w=512)
    # replaying batch 1 reads gen-0 again and rewrites gen-1 equal
    g1b = cmsfreq.accept_batch(spark, slices[1], state, 1, "key", d=4, w=512)
    assert _counters_equal(g1, g1b)
    assert cmsfreq.complete_generations(spark, state) == [0, 1]
    # a crash mid-write (no _SUCCESS) is invisible to readers
    fake = pathlib.Path(state) / "gen-000000002"
    fake.mkdir()
    (fake / "part-00000.parquet").write_bytes(b"partial")
    assert cmsfreq.complete_generations(spark, state) == [0, 1]
    # and batch 2's replay overwrites the partial dir cleanly
    g2 = cmsfreq.accept_batch(spark, slices[1], state, 2, "key", d=4, w=512)
    assert cmsfreq.complete_generations(spark, state) == [0, 1, 2]
    # vacuum keeps only the newest generation; state stays readable
    dropped = cmsfreq.vacuum_generations(spark, state, keep=1)
    assert dropped == [0, 1]
    assert cmsfreq.complete_generations(spark, state) == [2]
    assert _counters_equal(spark.read.parquet(f"{state}/gen-000000002"), g2)


def test_cms_run_stream_file_source(spark, tmp_path):
    """End-to-end foreachBatch drain: per-batch probe estimates from
    the file-source stream match batch estimates over the prefix."""
    slices = _tok_slices(spark, n=3_000, k=3)
    src = f"{tmp_path}/src"
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{src}/slice={i}")
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    cmsfreq.run_cms_stream(
        spark,
        stream,
        f"{tmp_path}/state",
        f"{tmp_path}/ckpt",
        f"{tmp_path}/out",
        probes=["t1", "t500"],
        key_col="key",
        d=4,
        w=512,
    )
    out = spark.read.parquet(f"{tmp_path}/out")
    assert out.count() == 6  # 2 probes x 3 batches
    # the final batch's estimates equal the batch sketch on the union
    # (file arrival order is not pinned, but the SUM of all slices is)
    whole = slices[0].unionByName(slices[1]).unionByName(slices[2])
    probes = spark.createDataFrame([("t1",), ("t500",)], "key string")
    be = {
        r.probe_key: r.est
        for r in cms_estimate(
            probes, "key", cms_build(whole, "key", d=4, w=512), d=4, w=512
        ).collect()
    }
    last = out.orderBy(F.col("batch_id").desc()).limit(2)
    se = {r.probe_key: r.est for r in last.collect()}
    assert se == be


def test_kmv_run_stream_file_source(spark, tmp_path):
    slices = _key_slices(spark, n=3_000, k=3)
    src = f"{tmp_path}/src"
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{src}/slice={i}")
    stream = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    kmvdist.run_kmv_stream(
        spark,
        stream,
        f"{tmp_path}/state",
        f"{tmp_path}/ckpt",
        f"{tmp_path}/out",
        key_col="key",
        k=128,
    )
    out = spark.read.parquet(f"{tmp_path}/out")
    assert out.count() == 3
    # the final estimate covers all slices regardless of file order
    whole = slices[0].unionByName(slices[1]).unionByName(slices[2])
    direct = (
        kmv_sketch(whole, "key", k=128)
        .select(kmv_estimate_expr(128).alias("e"))
        .collect()[0]
        .e
    )
    final = (
        out.orderBy(F.col("batch_id").desc()).limit(1).collect()[0].estimate
    )
    assert final == direct
