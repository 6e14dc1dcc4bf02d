"""Event-time window operators over the ``events`` table
(SURVEY.md §2.9 T2 [extension]).

The reference has no windows (WatermarkStrategy.no_watermarks(),
stream_to_star.py:315); these are the Structured-Streaming-native
extensions. Each helper works on BOTH batch and streaming DataFrames —
``F.window``/``F.session_window`` are engine-level, so the same code
path is tested batch-side against the DuckDB oracle and reused by
streaming/pipeline.py with a watermark.

Window starts are emitted as epoch microseconds (BIGINT) so oracle
comparison is timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _money_sum(col: str):
    """Deterministic 2dp sum: exact decimal accumulate, double out."""
    return F.round(F.sum(F.col(col).cast("decimal(18,2)")).cast("double"), 2)


def tumbling(events: DataFrame, duration: str = "10 minutes") -> DataFrame:
    """Fixed windows: (win_start_us, event_type, n, sum_value)."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), _money_sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding(
    events: DataFrame, duration: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count("*").alias("n"), _money_sum("value").alias("sum_value"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"), "n", "sum_value")
    )


def session(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user: a session extends while successive
    events arrive within `gap`. Output: user_id, session_start_us,
    n, sum_value."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), _money_sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n",
            "sum_value",
        )
    )
