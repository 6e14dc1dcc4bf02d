"""In-flight pipeline observability via Spark's ``observe`` API —
the engine-native replacement for the reference's per-record status
print (`flink/stream_to_star.py:296-320`): instead of a second pass
(or a console firehose), metrics ACCUMULATE inside the job itself
and surface on the driver when each action/micro-batch completes.

Batch: ``Observation`` — metrics are available after the first
action on the observed DataFrame. Streaming: ``DataFrame.observe``
— metrics ride every micro-batch's ``StreamingQueryProgress``
(``observedMetrics``), which is what an ops dashboard tails.

Zero extra scans, zero shuffles: observed aggregates are computed
by the same tasks that run the query (AccumulatorV2 under the
hood), so the cost at 100 TB is a few per-task counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(key_col: str, value_col: str) -> list:
    """The standard metric set: row count, NULL-key count (the RI
    early-warning), and an exact decimal value sum (drift check)."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(key_col).isNull(), 1).otherwise(0)).alias(
            "n_null_keys"
        ),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    ]


def observe_batch(
    df: DataFrame, key_col: str, value_col: str
) -> tuple[DataFrame, Observation]:
    """Attach quality metrics to a batch DataFrame. After the first
    action on the returned frame, ``observation.get`` holds the
    metrics — no second scan."""
    obs = Observation("quality")
    return df.observe(obs, *quality_metrics(key_col, value_col)), obs


def observe_stream(
    df: DataFrame, name: str, key_col: str, value_col: str
) -> DataFrame:
    """Attach quality metrics to a streaming DataFrame under ``name``;
    read them per micro-batch from
    ``query.recentProgress[i]["observedMetrics"][name]``."""
    return df.observe(name, *quality_metrics(key_col, value_col))
