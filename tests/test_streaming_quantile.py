"""Streaming quantile sketch twin (streaming/quantsketch.py, round
10 — the last sketch-family member without a streaming side):
stream-over-slices must equal the batch hash-threshold sample over
the prefix ROW-FOR-ROW, replays are idempotent, crash-partial
generations invisible, and the SEMANTIC cutoff rule admits
later-batch levels while the prefix is small (the merge subtlety a
max-observed-level clamp would get wrong)."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from bigdataflink_spark.operators.sketches import (
    quantile_disc_expr,
    quantile_sketch,
)
from bigdataflink_spark.streaming import cmsfreq, quantsketch


def _kv_slices(spark, n=6_000, k=3):
    df = spark.range(n).select(
        F.col("id").alias("key"),
        (F.col("id") % 777).cast("double").alias("v"),
        (F.col("id") / (n // k)).cast("int").alias("s"),
    )
    return [
        df.filter(F.col("s") == i).select("key", "v") for i in range(k)
    ]


def _hs(df):
    return sorted(r.h for r in df.select("h").collect())


def test_quant_stream_equals_batch_prefix(spark, tmp_path):
    slices = _kv_slices(spark)
    state = f"{tmp_path}/state"
    prefix = None
    for i, b in enumerate(slices):
        got = quantsketch.accept_batch(
            spark, b, state, i, "key", "v", cap=512
        )
        prefix = b if prefix is None else prefix.unionByName(b)
        want = quantile_sketch(prefix, "key", "v", cap=512)
        assert _hs(got) == _hs(want), f"slice {i}"
        gq = got.agg(
            quantile_disc_expr((1, 2)).alias("p50"),
            quantile_disc_expr((9, 10)).alias("p90"),
        ).collect()[0]
        wq = want.agg(
            quantile_disc_expr((1, 2)).alias("p50"),
            quantile_disc_expr((9, 10)).alias("p90"),
        ).collect()[0]
        assert (gq.p50, gq.p90) == (wq.p50, wq.p90)
        assert got.count() <= 512


def test_quant_late_levels_admitted_while_small(spark, tmp_path):
    # first batch tiny (semantic m* = 48 even though max observed
    # level is low); a later batch brings rows at levels never seen
    # before — ALL must be retained while the total fits the cap. A
    # max-observed-level clamp would silently drop them.
    state = f"{tmp_path}/state"
    b0 = spark.range(5).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("v")
    )
    g0 = quantsketch.accept_batch(spark, b0, state, 0, cap=1_024)
    assert g0.count() == 5
    assert g0.select(F.max("m")).first()[0] == quantsketch.FULL_LEVEL
    b1 = spark.range(5, 500).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("v")
    )
    g1 = quantsketch.accept_batch(spark, b1, state, 1, cap=1_024)
    assert g1.count() == 500  # nothing dropped: 500 <= cap
    full = spark.range(500).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("v")
    )
    assert _hs(g1) == _hs(quantile_sketch(full, "key", "v", cap=1_024))


def test_quant_cutoff_monotone_under_saturation(spark, tmp_path):
    state = f"{tmp_path}/state"
    ms = []
    for i in range(3):
        b = spark.range(i * 40_000, (i + 1) * 40_000).select(
            F.col("id").alias("key"), F.col("id").cast("double").alias("v")
        )
        g = quantsketch.accept_batch(spark, b, state, i, cap=256)
        ms.append(g.select(F.max("m")).first()[0])
        assert g.count() <= 256
    assert ms[0] >= ms[1] >= ms[2]
    assert ms[-1] < quantsketch.FULL_LEVEL  # genuinely saturated


def test_quant_replay_crash_vacuum(spark, tmp_path):
    slices = _kv_slices(spark, n=3_000, k=2)
    state = f"{tmp_path}/state"
    quantsketch.accept_batch(spark, slices[0], state, 0, cap=512)
    g1 = quantsketch.accept_batch(spark, slices[1], state, 1, cap=512)
    g1b = quantsketch.accept_batch(spark, slices[1], state, 1, cap=512)
    assert _hs(g1) == _hs(g1b)  # replay rewrites gen-1 identically
    assert cmsfreq.complete_generations(spark, state) == [0, 1]
    fake = pathlib.Path(state) / "gen-000000002"
    fake.mkdir()
    (fake / "part-00000.parquet").write_bytes(b"partial")
    assert cmsfreq.complete_generations(spark, state) == [0, 1]
    g2 = quantsketch.accept_batch(spark, slices[1], state, 2, cap=512)
    assert cmsfreq.complete_generations(spark, state) == [0, 1, 2]
    dropped = quantsketch.vacuum_generations(spark, state, keep=1)
    assert dropped == [0, 1]
    assert _hs(spark.read.parquet(f"{state}/gen-000000002")) == _hs(g2)


def test_quant_corrupted_state_fails_loudly(spark, tmp_path):
    state = f"{tmp_path}/state"
    b = spark.range(100).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("v")
    )
    quantsketch.accept_batch(spark, b, state, 0, cap=512)
    gen = pathlib.Path(state) / "gen-000000000"
    for p in gen.glob("*.parquet"):
        p.write_bytes(b"garbage")  # _SUCCESS still present
    with pytest.raises(Exception):
        quantsketch.accept_batch(spark, b, state, 1, cap=512).count()


def test_quant_run_stream_file_source(spark, tmp_path):
    slices = _kv_slices(spark, n=3_000, k=3)
    src = f"{tmp_path}/src"
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{src}/slice={i}")
    stream = (
        spark.readStream.schema("key long, v double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    quantsketch.run_quantile_stream(
        spark,
        stream,
        f"{tmp_path}/state",
        f"{tmp_path}/ckpt",
        f"{tmp_path}/out",
        key_col="key",
        value_col="v",
        cap=512,
    )
    out = spark.read.parquet(f"{tmp_path}/out")
    assert out.count() == 3  # one summary per batch
    # the final batch's summary equals the batch sketch on the union
    # (file arrival order is not pinned, but the union is)
    whole = slices[0].unionByName(slices[1]).unionByName(slices[2])
    want = quantile_sketch(whole, "key", "v", cap=512).agg(
        F.count("*").cast("long").alias("n"),
        quantile_disc_expr((1, 2)).alias("p50"),
        quantile_disc_expr((9, 10)).alias("p90"),
    ).collect()[0]
    last = out.orderBy(F.col("batch_id").desc()).limit(1).collect()[0]
    assert (last.sample_n, last.p50_est, last.p90_est) == (
        want.n, want.p50, want.p90,
    )


def test_quantsketch_refuses_clamp_losing_generation(spark, tmp_path):
    """ADVICE r10: with a cap smaller than the count at the lowest
    present hash level, the published sample would be EMPTY while its
    semantic cutoff m* is real — and m* rides on sample rows, so the
    clamp would be silently lost. accept_batch must refuse loudly.
    Keys 534/1496 share md5 level 39 (precomputed), so cap=1
    overflows at the lowest present level."""
    import pytest

    from bigdataflink_spark.streaming.quantsketch import accept_batch

    batch = spark.createDataFrame(
        [(534, 1.0), (1496, 2.0)], "key long, v double"
    )
    with pytest.raises(ValueError, match="lose its clamp"):
        accept_batch(
            spark, batch, str(tmp_path / "state"), batch_id=0, cap=1
        )

    # one key at that level is fine: sample of 1 row publishes
    ok = accept_batch(
        spark,
        spark.createDataFrame([(534, 1.0)], "key long, v double"),
        str(tmp_path / "state2"),
        batch_id=0,
        cap=1,
    )
    assert ok.count() == 1
