"""Watermarked stream-stream interval join (SURVEY.md §2.9
[extension] — the reference has no two-stream correlation at all; this
is the Spark-native capability a real event pipeline needs, e.g.
attribute each purchase to the click that preceded it within a window).

Both sides carry watermarks, so Spark bounds the join state: a buffered
left row can be evicted once the right watermark passes
``left_ts + upper`` — without the time bound the state would grow
unboundedly, which is exactly the 100 TB failure mode. The join
condition must therefore include BOTH the equality key and the time
range; this helper refuses to build one without them.

Columns must be disjoint across the two sides (rename before calling)
— keeps the range condition unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal keys where
    ``left_ts <= right_ts <= left_ts + upper``.

    ``watermark`` bounds both sides' state (and defines how much
    disorder the streams tolerate before rows are dropped as late).
    Works identically on batch DataFrames (watermark is a no-op
    there) — the parity test exploits that.

    ``how='leftOuter'`` additionally emits each unmatched left row
    (right side NULL) — but only once the RIGHT watermark passes
    ``left_ts + upper``, i.e. once no future right row could still
    match. A finite stream therefore withholds outer results near its
    end until something advances the watermark; batch emits them
    immediately. Spark requires the time bound in the condition for
    exactly this reason: it is what makes outer-state eviction sound.
    """
    allowed = ("inner", "leftOuter")
    if how not in allowed:
        raise ValueError(f"interval_join supports {allowed}, not {how!r}")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {sorted(overlap)}")
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)
