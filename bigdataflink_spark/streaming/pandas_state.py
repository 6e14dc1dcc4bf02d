"""Custom stateful streaming operators on ``applyInPandasWithState``
(SURVEY.md §2.9 T3 / §2.10) — the Arrow-batched arbitrary-state API
that runs on the plain Python worker.

This is the RUNNABLE twin of streaming/tws_dedup.py: the newer
``transformWithStateInPandas`` API needs the protobuf state-server
protocol + RocksDB provider (absent in this container, so that test
skips), while ``applyInPandasWithState`` speaks the classic Arrow
worker protocol and runs live here — the dedup semantics and tests
below execute for real.

Semantics mirror the reference's idempotent-upsert effect
(flink/stream_to_star.py:116-121 makes at-least-once delivery
effectively exactly-once): FIRST-seen row per key wins, repeats are
dropped while the key's marker lives. With a TTL, the marker expires
``ttl_minutes`` after the key was FIRST seen (processing time) — a
fixed redelivery horizon; the timeout is armed once at first sight
and deliberately NOT re-armed on repeats (re-arming would let steady
duplicate traffic keep a key alive forever — the ADVICE.md tws TTL
bug, avoided here by construction).

State per key is one marker tuple — O(live keys), Arrow-batched,
partitioned by the grouping key, so the operator scales with key
cardinality across executors like any keyed shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_dedup(
    stream: DataFrame,
    key_col: str,
    seq_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit each key's FIRST row (min ``seq_col`` — deterministic
    within and across micro-batches); drop repeats while the key's
    marker lives. All non-key columns pass through unchanged.

    ``ttl_minutes=None`` keeps markers forever (exact exactly-once
    for a bounded key space); with a TTL the marker expires a fixed
    horizon after FIRST sight and a later redelivery would re-emit —
    the documented at-least-once window.
    """
    fields = stream.schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    names = [f.name for f in fields]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # marker expired: forget the key; a future redelivery
            # re-emits (at-least-once horizon, by design)
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            # seen before (this or an earlier batch): all repeats drop
            return
        state.update((1,))
        if ttl_minutes is not None:
            # armed ONCE at first sight — never re-armed on repeats
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        first = batch.sort_values(seq_col, kind="mergesort").head(1)
        yield first[names]

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup, out_schema, "marker long", "update", timeout
    )
