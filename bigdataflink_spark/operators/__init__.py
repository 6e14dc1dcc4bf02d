from bigdataflink_spark.operators import dedup, similarity, text, windows, multimodal

__all__ = ["dedup", "similarity", "text", "windows", "multimodal"]
