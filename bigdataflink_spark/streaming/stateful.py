"""Custom stateful streaming operator (SURVEY.md §2.9 T3 [extension]).

The reference keeps all streaming state external (Postgres unique
indexes). The Spark-native alternative for state the engine should
own is ``applyInPandasWithState``: per-key mutable state in the state
store, Arrow-batched updates, watermark-driven timeout/eviction.

``running_user_totals`` is the engine-internal analog of the
reference's per-key upsert counters: for every user it maintains
(n_events, total_value, last_ts) across micro-batches and emits the
updated row each time the key appears in a batch. Swap the update
function to build arbitrary keyed accumulators (sessionization,
dedup-with-TTL, feature windows) — the plumbing is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("last_ts_us", LongType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("last_ts_us", LongType(), True),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        ts_us = pdf["ts"].astype("int64") // 1000
        mx = int(ts_us.max())
        last_us = mx if last_us is None else max(last_us, mx)
    state.update((n, float(total), last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [float(total)],
            "last_ts_us": [last_us],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running totals (update mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
