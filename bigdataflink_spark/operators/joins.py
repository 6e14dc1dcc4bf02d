"""Join operators Spark lacks as builtins (extension suite): as-of
join, scalable range join, and explicit skew-salted join.

The reference has no joins beyond star-schema FK equi-joins
(SURVEY.md §2.3 / flink/stream_to_star.py:284-295); these are the
"custom operator" extensions a large-scale pipeline needs, each
expressed as a composition of DataFrame ops — no RDDs, no driver
loops — so Catalyst/AQE still own the physical plan.

Scale design notes:

* as-of join    — the naive formulation (theta-join on ``l.ts >= r.ts``
                  then argmax) is a BroadcastNestedLoopJoin: O(n·m) and
                  it can't shuffle-partition on an inequality. The
                  union+window formulation below is ONE shuffle on the
                  equi-keys + a per-key sort, i.e. exactly the cost of
                  a sort-merge join, and AQE can still split skewed
                  keys. ``last(ignorenulls)`` over rows-unbounded-
                  preceding carries the latest right-side payload
                  forward to each left row.
* range join    — interval bucketing: each interval [lo, hi) explodes
                  into the fixed-width buckets it covers, probe rows
                  compute their bucket, and the join becomes an
                  EQUI-join on bucket + residual predicate. Turns a
                  nested-loop band join into a shuffle hash join; the
                  blowup factor is interval_width / bucket_width,
                  chosen per workload.
* salted join   — pre-AQE skew control, kept explicit so the physical
                  shape is testable: the build side replicates
                  ``salt`` times, the probe side picks a deterministic
                  salt from a hash of its whole row tuple, so one hot
                  key spreads over ``salt`` reducers. Result is
                  row-identical to the plain join (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TS = "__asof_ts"
_TAG = "__asof_tag"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks up ``payload``
    from the right row with the greatest ``right_ts <= left_ts`` for
    the same ``keys`` (ties on ts must be pre-reduced on the right).

    Semantics match DuckDB ``ASOF LEFT JOIN ... ON l.k = r.k AND
    l.ts >= r.ts``. Left columns pass through; payload columns are
    appended (null when no prior right row exists).
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left side: {sorted(clash)}")

    # Right rows sort before left rows at equal ts (tag 0 < 1), which
    # is exactly the >= (inclusive) as-of semantics.
    r = right.select(
        *keys, F.col(right_ts).alias(_TS), F.lit(0).alias(_TAG), *payload
    )
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for p in payload:
        merged = merged.withColumn(p, F.last(p, ignorenulls=True).over(w))
    return merged.filter(F.col(_TAG) == 1).drop(_TAG, _TS)


def bucketed_range_join(
    probe: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 50.0,
) -> DataFrame:
    """Inner join ``probe`` rows to the interval containing
    ``value_col`` (``lo <= v < hi``), as an equi-join on fixed-width
    buckets + residual filter instead of a nested-loop band join.

    Each interval is exploded to every bucket index it overlaps
    (``sequence(floor(lo/w), floor((hi-eps)/w))``), so an interval
    spanning k buckets costs k build rows — bounded and known up
    front, unlike the O(probe × intervals) nested loop.
    """
    bucket = F.floor(F.col(value_col) / F.lit(bucket_width))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / F.lit(bucket_width)
                ).cast("long"),
            )
        ),
    )
    joined = probe.withColumn("__bucket", bucket.cast("long")).join(
        F.broadcast(iv), on="__bucket", how="inner"
    )
    return joined.filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("__bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the shuffle spread over ``salt``
    sub-partitions per key: ``right`` (build side) replicates each row
    ``salt`` times, ``left`` (probe side) derives a deterministic salt
    from a hash of its full row. Row-for-row identical to
    ``left.join(right, key, how)`` for the supported ``how`` values.

    Right/full outer (and right_semi/anti) are rejected: the build
    side is replicated ``salt`` times, so every unmatched right row
    would be emitted once per replica instead of once.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated build side would duplicate unmatched right rows"
        )
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_l.join(salted_r, on=[key, "__salt"], how=how).drop("__salt")
