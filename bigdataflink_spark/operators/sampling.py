"""Deterministic sampling / split assignment for training-data
pipelines (extension suite).

``hash_split`` is the reproducible train/val/test assignment every
LLM data pipeline needs: split(doc) is a pure function of
(salt, doc id) — no RNG state, no ordering dependence, no
repartition sensitivity — so a document keeps its split across
corpus snapshots, re-runs, and cluster sizes, and train/test
contamination can't creep in when the corpus grows. Implemented as a
single md5-derived bucket per row (JVM-side, scan-stage expression:
zero shuffles, scales embarrassingly); the md5 formula is shared with
the DuckDB oracle (operators/hashing.md5_int) so assignments are
verifiable bit-for-bit (q73).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataflink_spark.operators.hashing import md5_int

RESOLUTION = 1_000_000


def split_bucket(id_col: str | Column, salt: str = "split-v1") -> Column:
    """Stable bucket in [0, RESOLUTION) from (salt, id)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_int(F.concat(F.lit(salt), col.cast("string"))) % F.lit(RESOLUTION)


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of
    ``fractions``' keys (insertion order defines the bucket ranges;
    fractions must sum to 1 within float tolerance).

    Example: ``hash_split(docs, "doc_id",
    {"train": 0.9, "val": 0.05, "test": 0.05})``.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = split_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        bound = int(round(acc * RESOLUTION))
        clause = bucket < F.lit(bound)
        expr = F.when(clause, F.lit(name)) if expr is None else expr.when(clause, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)
