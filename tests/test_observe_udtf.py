"""Engine-surface coverage: the observe() metrics API (batch +
streaming) and Python UDTFs, each pinned against an independent
computation of the same answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataflink_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_observe_batch_metrics_no_second_scan(spark):
    from bigdataflink_spark.streaming.observe import observe_batch

    ev = load_table(spark, "events", SF)
    observed, obs = observe_batch(ev, "user_id", "value")
    n = observed.count()  # the one action; metrics piggyback on it

    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias("nk"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
    ).collect()[0]
    got = obs.get
    assert got["n_rows"] == n == direct["n"]
    assert got["n_null_keys"] == direct["nk"]
    assert got["value_sum"] == direct["s"]


def test_observe_stream_metrics_in_progress(spark, tmp_path):
    from bigdataflink_spark.streaming.observe import observe_stream

    ev = load_table(spark, "events", SF).select("user_id", "value")
    src = str(tmp_path / "obs_src")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    observed = observe_stream(stream, "quality", "user_id", "value")
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    metrics = [
        p["observedMetrics"]["quality"]
        for p in q.recentProgress
        if "quality" in p.get("observedMetrics", {})
    ]
    assert metrics, "no observed metrics surfaced in progress"
    assert sum(m["n_rows"] for m in metrics) == ev.count()
    assert all(m["n_null_keys"] == 0 for m in metrics)


def test_chunk_udtf_matches_expression_chunker(spark):
    """The imperative UDTF chunker must equal q125's pure
    column-expression chunker row for row (including fingerprints)."""
    from bigdataflink_spark.functions.tablefuncs import ChunkDocUDTF
    from bigdataflink_spark.plans.queries import q125_doc_chunking

    spark.udtf.register("chunk_doc", ChunkDocUDTF)
    load_table(spark, "documents", SF).createOrReplaceTempView("docs_udtf")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            """
            SELECT d.doc_id,
                   CAST(c.chunk_idx AS BIGINT) AS chunk_idx,
                   c.chunk_len,
                   CAST(conv(substring(md5(c.chunk_text), 1, 15), 16, 10)
                        AS BIGINT) AS chunk_sig
            FROM docs_udtf d, LATERAL chunk_doc(d.text) c
            """
        ).collect()
    )
    want = sorted(tuple(r) for r in q125_doc_chunking(spark, SF).collect())
    assert len(want) > 0
    assert got == want


def test_trimmed_mean_udaf(spark):
    """Grouped-agg pandas UDAF equals a driver-side numpy computation
    of the same trimmed mean per group."""
    import numpy as np

    from bigdataflink_spark.functions.tablefuncs import make_trimmed_mean_udaf

    ev = load_table(spark, "events", SF)
    tm = make_trimmed_mean_udaf(0.1)
    got = {
        r["event_type"]: r["tmean"]
        for r in ev.groupBy("event_type")
        .agg(tm("value").alias("tmean"))
        .collect()
    }

    rows = ev.select("event_type", "value").collect()
    byg = {}
    for r in rows:
        byg.setdefault(r["event_type"], []).append(r["value"])
    for g, vals in byg.items():
        arr = np.sort(np.array(vals, dtype="float64"))
        k = int(len(arr) * 0.1)
        kept = arr[k : len(arr) - k] if len(arr) > 2 * k else arr
        assert abs(got[g] - float(kept.mean())) < 1e-9, g
