"""In-engine streaming dedup (SURVEY.md §2.9 T3, engine-state
variant).

The reference makes at-least-once delivery effectively-once by
pushing every record through an idempotent Postgres upsert
(flink/stream_to_star.py:116-121 + unique indexes) — state lives
outside the engine. Structured Streaming can hold that state itself:
``dropDuplicatesWithinWatermark`` keeps one row per key and expires
key state once the watermark passes, so redelivered Kafka messages /
replayed files collapse without any external store, and state size
stays bounded by the watermark horizon (critical at 100 TB — an
unbounded ``dropDuplicates`` would grow state forever).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    event_time_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """First-write-wins keyed dedup over a streaming DataFrame with
    watermark-bounded state."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
