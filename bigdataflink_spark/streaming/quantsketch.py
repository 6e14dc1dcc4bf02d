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
    state-read discipline).

    Round 14 (guide §2.4/§5, VERDICT r13 "Next round" #5): the census
    → cutoff → clamp chain runs as ONE aggregation job whose ≤ 49-row
    result (one row per hash bit-length, plus the stored clamp) is
    collected and folded on the driver — the sanctioned bounded
    collect class (the BPE argmax idiom): its size is fixed by the
    48-bit hash width, never by the data. That replaces the previous
    per-trigger job stack — eager batch checkpoint, two broadcast
    subquery jobs (clamp + cutoff), eager merged checkpoint, isEmpty
    — with: census job, publish write (which materializes the lazy
    sample checkpoint), and the caller's action. Per-trigger eager
    jobs ~6 → 3; the published rows are byte-identical (the driver
    fold reproduces the same coalesce/cumsum rule, pinned by the
    parity test and q222's per-prefix oracle)."""
    rows = quantile_hashes(batch, key_col, value_col, salt)
    # lazy: the census job below is the first consumer and
    # materializes it; the merged projection then reuses the
    # checkpoint instead of re-hashing the batch.
    rows = rows.localCheckpoint(eager=False)
    prior = [g for g in complete_generations(spark, state_dir) if g < batch_id]
    if prior:
        prev = spark.read.parquet(_gen_path(state_dir, prior[-1]))
        # prev rows all carry the stored clamp m*; batch rows are
        # unclamped (FULL_LEVEL). min() over the union recovers
        # m_prev exactly as the old max('m')-broadcast did (an empty
        # prev generation contributes nothing and the batch's
        # FULL_LEVEL wins — the old coalesce(max, FULL_LEVEL) rule).
        pre = prev.select(
            "h", "v", "lvl", F.col("m").alias("_m")
        ).unionByName(
            rows.select(
                "h", "v", "lvl", F.lit(FULL_LEVEL).cast("int").alias("_m")
            )
        )
    else:
        pre = rows.select(
            "h", "v", "lvl", F.lit(FULL_LEVEL).cast("int").alias("_m")
        )
    census = (
        pre.groupBy("lvl")
        .agg(F.count("*").alias("c"), F.min("_m").alias("mn"))
        .collect()
    )
    m_prev = min((int(r.mn) for r in census), default=FULL_LEVEL)
    # semantic cutoff: one below the lowest overflowing level of the
    # clamped cumulative census, else the clamp itself (no overflow
    # => every level <= m_prev feasible); FULL_LEVEL on an empty
    # clamped census (empty prefix).
    counts = sorted(
        (int(r.lvl), int(r.c)) for r in census if int(r.lvl) <= m_prev
    )
    m_val = m_prev if counts else FULL_LEVEL
    cum = 0
    for lvl, c in counts:
        cum += c
        if cum > cap:
            m_val = lvl - 1
            break
    sample_n = sum(c for lvl, c in counts if lvl <= m_val)
    if sample_n == 0 and m_val < FULL_LEVEL:
        # ADVICE r10: m* rides ON the sample rows, so an empty
        # published sample would lose the clamp — the next batch's
        # min('_m') falls back to FULL_LEVEL and silently breaks
        # gen-b == batch-sketch-of-prefix. Empty + m* = FULL_LEVEL is
        # a genuinely empty prefix (no information to lose); empty
        # with a REAL clamp means cap is far too small for the data's
        # level distribution (the count at the lowest present level
        # alone exceeded cap) — refuse loudly rather than publish a
        # generation that corrupts every later one.
        raise ValueError(
            f"quantile stream state would lose its clamp: the "
            f"batch-{batch_id} census overflows cap at the lowest "
            f"present level (semantic cutoff m*={m_val}, sample "
            f"empty). Raise cap above the per-level row count; a "
            f"generation published like this cannot be merged "
            f"correctly."
        )
    # the retained sample never exceeds the stored clamp: batch rows
    # above m_prev are discarded exactly as the old pre-filter did
    # (m_val <= m_prev whenever the clamped census is nonempty; the
    # min() guards the empty-census corner, where merged is empty
    # either way).
    merged = pre.filter(F.col("lvl") <= min(m_val, m_prev)).select(
        "h", "v", "lvl", F.lit(int(m_val)).cast("int").alias("m")
    )
    # lazy: the publish write below materializes it (inside this
    # trigger, before any vacuum could touch the prev generation its
    # plan reads); the caller's summary agg then reuses the
    # checkpoint.
    merged = merged.localCheckpoint(eager=False)
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
