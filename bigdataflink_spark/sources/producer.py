"""Producer stage (SURVEY.md §2.1 S2 / EP1): CSV rows → JSON messages.

The reference's ``producer/csv_to_kafka.py`` reads the CSV glob in
sorted order and sends each row as a UTF-8 JSON object to the
``sales`` topic. Our file-based analog writes the same JSON records
to a landing directory (one JSONL file per source CSV, named by
arrival rank so a file-streaming consumer picks them up in send
order). When a Kafka broker exists, sources/kafka.py provides the
direct topic sink with the identical payload.

Each record carries its ``arrival_seq`` (already computed by
read_sales_csv from the producer's sorted-glob order) — the
conflict-resolution ordering travels WITH the message, exactly like a
Kafka offset would, so downstream last-write-wins is deterministic no
matter how files map to micro-batches.
"""

from __future__ import annotations


from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bigdataflink_spark.sources.csv_sales import read_sales_csv, SALES_CSV_GLOB


def produce_jsonl(
    spark: SparkSession,
    out_dir: str,
    csv_glob: str = SALES_CSV_GLOB,
) -> int:
    """CSV glob → JSONL landing dir; returns record count.

    One output file per input file (repartition by file rank) keeps
    per-file arrival granularity for maxFilesPerTrigger-style replay.
    """
    raw = read_sales_csv(spark, csv_glob)
    n = raw.count()
    stride_rank = (F.col("arrival_seq") / F.lit(1 << 32)).cast("long")
    (
        raw.withColumn("_rank", stride_rank)
        .repartitionByRange(10, "_rank")
        .sortWithinPartitions("arrival_seq")
        .drop("_rank")
        .select(F.to_json(F.struct("*")).alias("value"))
        .write.mode("overwrite")
        .text(out_dir)
    )
    return n
