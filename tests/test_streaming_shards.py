"""Streaming WARC shard-tail tests (q201's machinery).

The property that makes the stream a stream: a checkpointed rerun
after NEW shards arrive processes only the new ones — the already-
ingested rows are not re-read, not duplicated, and not rewritten.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bigdataflink_spark.sources.tables import load_table
from bigdataflink_spark.streaming.shards import (
    read_ingested,
    stream_warc_ingest,
    write_warc_shards,
)

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_restart_processes_only_new_shards(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")

    first = docs.filter(F.col("doc_id") < 100)
    rest = docs.filter(F.col("doc_id") >= 100)

    # wave 1: only the first shard-worth of docs exists
    assert write_warc_shards(first, in_dir, docs_per_shard=100) == 1
    stream_warc_ingest(spark, in_dir, out_dir, ckpt)
    got1 = read_ingested(spark, out_dir)
    n1 = got1.count()
    assert n1 == first.count()
    files_after_1 = set(glob.glob(os.path.join(out_dir, "*.parquet")))
    assert files_after_1

    # wave 2: the remaining shards arrive; SAME checkpoint
    write_warc_shards(rest, in_dir, docs_per_shard=100)
    stream_warc_ingest(spark, in_dir, out_dir, ckpt)
    got2 = read_ingested(spark, out_dir)
    assert got2.count() == docs.count()
    # no duplicates: every doc exactly once
    assert got2.select("doc_id").distinct().count() == docs.count()
    # wave-1 output files were not rewritten (incremental append)
    assert files_after_1.issubset(
        set(glob.glob(os.path.join(out_dir, "*.parquet")))
    )

    # rerun with NOTHING new: a no-op, still no duplicates
    stream_warc_ingest(spark, in_dir, out_dir, ckpt)
    assert read_ingested(spark, out_dir).count() == docs.count()

    # the streamed facts match the documents table exactly
    joined = got2.join(
        docs.select("doc_id", F.length("text").alias("n")), "doc_id"
    )
    assert joined.filter(F.col("payload_len") != F.col("n")).count() == 0


def test_in_band_shard_identity_survives_rename(spark, tmp_path):
    """Shard id comes from the warcinfo record, not the file name."""
    in_dir = str(tmp_path / "in")
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    write_warc_shards(docs.filter(F.col("doc_id") < 50), in_dir)
    (src,) = glob.glob(os.path.join(in_dir, "*.warc.gz"))
    os.rename(src, os.path.join(in_dir, "renamed-weirdly.warc.gz"))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_warc_ingest(spark, in_dir, out_dir, ckpt)
    rows = read_ingested(spark, out_dir)
    assert rows.count() == 50
    assert rows.select("shard").distinct().collect()[0][0] == 0
