"""Shared-testdata parquet loaders (TESTDATA.md).

One parquet per table under ``/root/testdata/sf{0.001,0.01,0.1}/``.
Loading stays lazy — Catalyst prunes columns and pushes filters into
the parquet scan, so ``load_table`` is free until an action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts arrives in whatever physical type the generator
        # used that round: TIMESTAMP(NANOS) (Spark rejects -> read
        # nanos as long, truncate to micros, exactly DuckDB's
        # conversion) or TIMESTAMP(MICROS) without isAdjustedToUTC
        # (Spark reads TIMESTAMP_NTZ, which unix_micros/window math
        # rejects). Normalize both to TIMESTAMP by pinning the wall
        # clock to UTC — to_utc_timestamp(ntz, 'UTC') is session-tz
        # independent and matches DuckDB's naive epoch_us exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtype = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
