"""Continuous (hypertable-style) rollup: an incrementally-maintained
time-bucket aggregate over a stream.

TimescaleDB calls this a continuous aggregate; here it is a
``foreachBatch`` that writes each micro-batch's PARTIAL aggregate to
``parts/batch_id=N`` — overwriting its own directory, so a replayed
batch is idempotent by construction (the additive-merge pitfall of
double-counting on retry can't happen). The queryable rollup is the
final-merge aggregation over the parts, exactly Spark's own
partial/final hash-agg split lifted to persistent storage:

    stream micro-batch ──groupBy(bucket)──► parts/batch_id=N
    read_rollup()      ──groupBy(bucket)──► final totals

At 100 TB the parts stay small (one row per bucket×type per batch)
and compaction is a periodic rewrite of old parts into one — the
rollup never rescans raw events.

Partial sums accumulate in DECIMAL and are only rounded by the final
reader, so the incremental result is bit-identical to a one-shot
batch aggregation over the same events (verified in tests against
operators/windows.tumbling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rollup_batch(
    batch: DataFrame,
    batch_id: int,
    parts_dir: str,
    duration: str = "10 minutes",
) -> None:
    """foreachBatch body: write this batch's partial bucket aggregate."""
    part = (
        batch.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_dec"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value_dec",
        )
    )
    part.write.mode("overwrite").parquet(f"{parts_dir}/batch_id={batch_id}")


def read_rollup(spark: SparkSession, parts_dir: str) -> DataFrame:
    """Final-merge view over all parts: same schema as
    operators/windows.tumbling (win_start_us, event_type, n,
    sum_value)."""
    parts = spark.read.option("basePath", parts_dir).parquet(f"{parts_dir}/batch_id=*")
    return (
        parts.groupBy("win_start_us", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_value_dec").cast("double"), 2).alias("sum_value"),
        )
    )


def compact_rollup(spark: SparkSession, parts_dir: str) -> None:
    """Fold all parts into a single pre-aggregated part.

    Run while the stream is stopped (between availableNow runs /
    during maintenance): replaces N per-batch partials with one
    merged partial under ``batch_id=-1``, keeping DECIMAL partial
    sums so the final reader's result is unchanged. Keeps the parts
    listing O(1) instead of O(batches) on long-running rollups.
    """
    import shutil

    parts = spark.read.option("basePath", parts_dir).parquet(f"{parts_dir}/batch_id=*")
    merged = parts.groupBy("win_start_us", "event_type").agg(
        F.sum("n").alias("n"),
        F.sum("sum_value_dec").alias("sum_value_dec"),
    )
    tmp = f"{parts_dir}.compact_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(parts_dir)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(
        f"{parts_dir}/batch_id=-1"
    )
    shutil.rmtree(tmp)


def run_continuous_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    parts_dir: str,
    checkpoint_dir: str,
    duration: str = "10 minutes",
) -> DataFrame:
    """Drive the stream to completion (availableNow) and return the
    merged rollup."""
    q = (
        events_stream.writeStream.foreachBatch(
            lambda b, bid: rollup_batch(b, bid, parts_dir, duration)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_rollup(spark, parts_dir)
