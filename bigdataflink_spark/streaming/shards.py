"""Streaming archive-shard ingest: tail a directory of ``.warc.gz``
shards with Structured Streaming and parse them through the SAME
machinery the batch path uses (``sources/warc.py``).

This is how a 100 TB crawl actually lands: shards appear in object
storage over time, and the ingest job is a file-source stream —
checkpointed, so a restart processes only NEW shards (test-pinned),
with parsing fanned out as an Arrow map over ``binaryFile`` rows.
The reference has no archive path at all (Kafka JSON only,
``/root/reference/flink/stream_to_star.py``); this module pairs with
``sources/warc.py`` the way ``streaming/pipeline.py`` pairs with
``sources/csv_sales.py``.

Shard identity travels IN-BAND: the builder stamps ``warc-shard: N``
into each shard's leading ``warcinfo`` record, and the parser reads
it back from there rather than trusting file names — renamed or
re-uploaded shards keep their identity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id long, shard int, rec_index long, payload_len long, "
    "payload_md5 string, http_status int, n_http_headers long"
)


def write_warc_shards(
    docs: DataFrame, in_dir: str, docs_per_shard: int = 1024
) -> int:
    """Pack (doc_id, text) rows into ``.warc.gz`` shard FILES under
    ``in_dir`` (executor-side writes — one keyed shuffle, no driver
    collect of payloads). Returns the shard count. The record
    profile matches q196's: status 404 on the doc_id%10==7 tenth, an
    extra parity header on even ids. A shard file is WRITE-ONCE: a
    later wave must carry new shard ids (new doc_id ranges), exactly
    like real crawl uploads."""
    import pandas as pd

    from bigdataflink_spark.sources.warc import warc_build_shard

    os.makedirs(in_dir, exist_ok=True)

    def _build(key, pdf):
        shard = int(key[0])
        recs = []
        for doc_id, text in sorted(
            zip(pdf["doc_id"], pdf["text"]), key=lambda t: int(t[0])
        ):
            doc_id = int(doc_id)
            status = 404 if doc_id % 10 == 7 else 200
            extra = [("X-Doc-Parity", "even")] if doc_id % 2 == 0 else []
            uri = f"https://corpus.example/doc/{doc_id}"
            recs.append((uri, status, extra, str(text).encode("utf-8")))
        blob = warc_build_shard(recs, shard)
        path = os.path.join(in_dir, f"shard-{shard:05d}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, path)  # file sources must never see partials
        return pd.DataFrame({"shard": [shard], "n_bytes": [len(blob)]})

    manifest = (
        docs.select("doc_id", "text")
        .withColumn(
            "shard",
            F.expr(f"CAST(doc_id DIV {int(docs_per_shard)} AS INT)"),
        )
        .groupBy("shard")
        .applyInPandas(_build, schema="shard int, n_bytes long")
    )
    return manifest.count()


def _parse_shard_batches(it):
    """mapInPandas body: each ``binaryFile`` row is one shard; walk
    its records with the batch parser, reading the shard id from the
    warcinfo record (in-band identity, not the file name)."""
    import hashlib

    import pandas as pd

    from bigdataflink_spark.sources.warc import (
        iter_warc_records,
        parse_http_response,
    )

    cols = ("doc_id", "shard", "rec_index", "payload_len",
            "payload_md5", "http_status", "n_http_headers")
    for pdf in it:
        rows = {k: [] for k in cols}
        for blob in pdf["content"]:
            shard = None
            idx = 0
            for _off, _len, rec in iter_warc_records(bytes(blob)):
                if rec["type"] == "warcinfo":
                    for line in rec["body"].decode().splitlines():
                        k, _, v = line.partition(":")
                        if k.strip() == "warc-shard":
                            shard = int(v.strip())
                    continue
                if rec["type"] != "response":
                    continue
                idx += 1
                status, headers, payload = parse_http_response(
                    rec["body"]
                )
                uri = rec["headers"]["warc-target-uri"]
                rows["doc_id"].append(int(uri.rsplit("/", 1)[1]))
                rows["shard"].append(shard)
                rows["rec_index"].append(idx)
                rows["payload_len"].append(len(payload))
                rows["payload_md5"].append(
                    hashlib.md5(payload).hexdigest()
                )
                rows["http_status"].append(status)
                rows["n_http_headers"].append(len(headers))
        yield pd.DataFrame(rows)


def stream_warc_ingest(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: "int | None" = None,
) -> None:
    """Run one availableNow pass of the shard tail: new ``.warc.gz``
    files under ``in_dir`` are parsed and appended to the parquet
    table at ``out_dir``. Checkpointed — a rerun after more shards
    arrive processes ONLY the new ones."""
    reader = (
        spark.readStream.format("binaryFile")
        # binaryFile's fixed schema, stated explicitly: streaming file
        # sources refuse to infer
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc.gz")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.load(in_dir)
        .select("content")
        .mapInPandas(_parse_shard_batches, schema=_OUT_SCHEMA)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()


def read_ingested(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(_OUT_SCHEMA).parquet(out_dir).select(
        "doc_id", "shard", "rec_index", "payload_len",
        "payload_md5", "http_status", "n_http_headers",
    )
