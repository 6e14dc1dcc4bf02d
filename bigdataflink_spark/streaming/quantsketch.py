"""Streaming quantile sketch — the streaming twin of
``operators.sketches.quantile_sketch`` (round 10; with bloomdedup,
kmvdist and cmsfreq this gives EVERY member of the sketch family a
streaming side).

State per batch is the retained hash-threshold sample of the WHOLE
prefix — a pure function of the slices seen so far, like the batch
sketch — published as cmsfreq-style GENERATIONS (gen-<b> parquet,
``_SUCCESS`` = visibility, a replayed batch rewrites its generation
identically, ``vacuum_generations`` bounds live state at keep·cap
rows).

The merge step needs one care the batch semilattice doesn't: the
stored sample only contains prefix rows at levels ≤ the SEMANTIC
threshold m* (the largest level in 0..48 whose cumulative prefix
count ≤ cap — NOT the max observed level: when the prefix is small,
m* = 48 and a later batch may legitimately contribute rows at levels
never seen before). Merging therefore (a) clamps the union census at
the stored m* — above it the union undercounts the prefix, because
discarded rows are gone, but cum(m*+1) > cap is an invariant
whenever m* < 48, so no level above the clamp is ever feasible — and
(b) stores the NEW m* with the sample. With that, gen-b ==
quantile_sketch(prefix ≤ b) row-for-row, which is what the parity
test and q222's per-prefix SQL oracle pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataflink_spark.operators.sketches import (
    KMV_BITS,
    quantile_hashes,
)
from bigdataflink_spark.streaming.cmsfreq import (
    _gen_path,
    complete_generations,
    vacuum_generations,  # noqa: F401  (re-exported: same semantics)
)

FULL_LEVEL = KMV_BITS  # m* of an empty prefix: everything is kept


def accept_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    batch_id: int,
    key_col: str = "key",
    value_col: str = "v",
    cap: int = 1_024,
    salt: str = "qsk-v1",
) -> DataFrame:
    """One streaming step: fold the batch's (h, v, lvl) rows into the
    newest generation with index < ``batch_id``, re-threshold at the
    clamped semantic cutoff, and publish ``gen-<batch_id>`` (rows
    carry the new m* in column ``m``). Returns the published sample.
    A read error on an EXISTING generation propagates loudly — only
    a missing/incomplete generation means "first batch" (the round-10
    state-read discipline)."""
    from pyspark.sql import Window

    rows = quantile_hashes(batch, key_col, value_col, salt)
    rows = rows.localCheckpoint(eager=True)
    prior = [g for g in complete_generations(spark, state_dir) if g < batch_id]
    if prior:
        prev = spark.read.parquet(_gen_path(state_dir, prior[-1]))
        m_prev = prev.agg(
            F.coalesce(F.max("m"), F.lit(FULL_LEVEL)).alias("m_prev")
        )
        pre = prev.select("h", "v", "lvl").unionByName(rows)
    else:
        m_prev = spark.range(1).select(F.lit(FULL_LEVEL).alias("m_prev"))
        pre = rows
    pre = pre.crossJoin(F.broadcast(m_prev)).filter(
        F.col("lvl") <= F.col("m_prev")
    )
    census = pre.groupBy("lvl", "m_prev").agg(F.count("*").alias("c"))
    cum = census.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("lvl").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # semantic cutoff: one below the lowest overflowing level, else
    # the clamp itself (no overflow => every level <= m_prev feasible)
    cutoff = cum.agg(
        F.coalesce(
            F.min(F.when(F.col("cum") > cap, F.col("lvl"))) - 1,
            F.max("m_prev"),
            F.lit(FULL_LEVEL),  # empty census: empty prefix
        ).alias("m")
    )
    merged = (
        pre.crossJoin(F.broadcast(cutoff))
        .filter(F.col("lvl") <= F.col("m"))
        .select("h", "v", "lvl", "m")
    )
    merged = merged.localCheckpoint(eager=True)
    if merged.isEmpty():
        # ADVICE r10: m* rides ON the sample rows, so an empty
        # published sample would lose the clamp — the next batch's
        # max('m') coalesces back to FULL_LEVEL and silently breaks
        # gen-b == batch-sketch-of-prefix. Empty + m* = FULL_LEVEL is
        # a genuinely empty prefix (no information to lose); empty
        # with a REAL clamp means cap is far too small for the data's
        # level distribution (the count at the lowest present level
        # alone exceeded cap) — refuse loudly rather than publish a
        # generation that corrupts every later one.
        m_val = int(cutoff.collect()[0]["m"])
        if m_val < FULL_LEVEL:
            raise ValueError(
                f"quantile stream state would lose its clamp: the "
                f"batch-{batch_id} census overflows cap at the lowest "
                f"present level (semantic cutoff m*={m_val}, sample "
                f"empty). Raise cap above the per-level row count; a "
                f"generation published like this cannot be merged "
                f"correctly."
            )
    merged.write.mode("overwrite").parquet(_gen_path(state_dir, batch_id))
    return merged


def run_quantile_stream(
    spark: SparkSession,
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    key_col: str = "key",
    value_col: str = "v",
    cap: int = 1_024,
    salt: str = "qsk-v1",
) -> None:
    """Drain ``stream`` (availableNow) through the online sketch; per
    batch, the running summary (batch_id, sample_n, lvl_cut, p50_est,
    p90_est) lands in ``out_dir`` as parquet rows."""
    from bigdataflink_spark.operators.sketches import quantile_disc_expr

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sample = accept_batch(
            spark, batch_df, state_dir, batch_id, key_col, value_col,
            cap, salt,
        )
        summ = sample.agg(
            F.count("*").cast("long").alias("sample_n"),
            F.max("lvl").cast("int").alias("lvl_cut"),
            quantile_disc_expr((1, 2)).alias("p50_est"),
            quantile_disc_expr((9, 10)).alias("p90_est"),
        )
        summ.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
