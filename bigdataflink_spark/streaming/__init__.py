from bigdataflink_spark.streaming.pipeline import (
    read_sales_stream,
    run_stream_to_star,
    upsert_star_batch,
)

__all__ = ["read_sales_stream", "run_stream_to_star", "upsert_star_batch"]
