"""Bucketed-table co-location (the 100 TB join strategy).

The reference leans on Postgres B-tree indexes for its per-row
upserts (postgres/00_ddl_dw.sql:68-70); the Spark-scale equivalent
for repeated big⋈big joins is bucketing: both sides hash-partitioned
into the same number of buckets on the join key AT WRITE TIME, so
every later join on that key plans as a zero-Exchange sort-merge join
— the shuffle is paid once at ingest, then amortized over every query.

Bucketed tables must go through ``saveAsTable`` (the bucket metadata
lives in the catalog, not the parquet files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
) -> None:
    """Persist ``df`` bucketed+sorted by ``key`` into the catalog."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket specs Catalyst plans a sort-merge join with
    NO Exchange on either side (verified in tests); disable broadcast
    when probing the plan shape, otherwise small test tables take the
    broadcast path before bucketing can matter.
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
