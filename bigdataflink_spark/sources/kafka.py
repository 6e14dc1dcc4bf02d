"""Kafka source/sink builders (SURVEY.md §2.1 S2/S3).

No broker (or kafka connector jar) ships in this container, so these
are thin, untestable-here builders kept separate from the file-based
paths the tests exercise. Payloads and options mirror the reference:

* source: topic ``sales``, earliest offsets, value-only string
  (stream_to_star.py:305-315)
* sink: UTF-8 JSON of the whole row (csv_to_kafka.py:17-22)
* producer throttle (SLEEP_MS) ≈ maxOffsetsPerTrigger on the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_json_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "sales",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of (value string, offset long) from Kafka."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    df = reader.load()
    # offset is the Kafka-native arrival_seq (total order per partition;
    # the reference uses 1 partition for a global order)
    return df.select(
        F.col("value").cast("string").alias("value"),
        F.col("offset").cast("long").alias("arrival_seq"),
    )


def kafka_json_sink(df: DataFrame, bootstrap_servers: str, topic: str = "sales"):
    """Batch write: every row serialized as one JSON message."""
    return (
        df.select(F.to_json(F.struct("*")).alias("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
