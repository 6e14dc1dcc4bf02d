"""Time-series conditioning operators: dense-grid gap fill with
forward fill, and exact-moment z-score anomaly flagging.

The reference has no time-series surface (SURVEY.md §2.5/§2.9 — the
Flink job is windowless); these extend the `events` table coverage
the same way windows (q15-q17) did, with shapes a 100 TB telemetry
or training-data pipeline needs:

* Gap fill — regularize an irregular event stream onto a fixed
  per-key grid so downstream window/rollup consumers see a dense
  series. Scale shape: one keyed aggregation to the grid
  granularity, one tiny per-key bounds aggregate whose
  ``sequence()`` explode is linear in the OUTPUT grid, one keyed
  left join back, one ordered window for the forward fill — every
  exchange is on the series key, nothing quadratic, no driver
  loops. The grid granularity is the knob that caps output size
  (hour ⇒ span/3600 rows per key regardless of event volume).
* Z-score anomalies — per-group moment stats from EXACT decimal
  sums (sum, sum of squares) so the mean/variance a 1000-executor
  scan produces is bit-deterministic (double-sum order can't leak
  in); the z computation itself is the standard double formula.
  One grouped pass + one broadcast-sized stats join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    granularity: str = "hour",
) -> DataFrame:
    """Dense per-key time grid at ``granularity`` with a
    forward-filled value column.

    Returns one row per (key, grid slot) between the key's first and
    last observed slot: ``n_events`` (0 on gaps), ``v_sum`` (the
    slot's decimal-exact 2dp sum, NULL on gaps) and ``v_ffill``
    (last non-null ``v_sum`` at or before the slot).
    """
    slot = F.date_trunc(granularity, F.col(ts_col)).alias("slot")
    per_slot = events.groupBy(F.col(key_col), slot).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
        ).alias("v_sum"),
    )
    bounds = per_slot.groupBy(key_col).agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    # explode_outer: same InferFiltersFromGenerate guard as
    # dedup.shingles — keeps the generate from being re-inlined as a
    # pre-filter (bounds rows never have NULL sequences anyway).
    grid = bounds.select(
        key_col,
        F.explode_outer(
            F.sequence("lo", "hi", F.expr(f"interval 1 {granularity}"))
        ).alias("slot"),
    )
    joined = grid.join(per_slot, [key_col, "slot"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col(key_col),
        F.unix_micros("slot").alias("slot_us"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        "v_sum",
        F.last("v_sum", ignorenulls=True).over(w).alias("v_ffill"),
    )


def _exact_moments(value_col: str) -> list[Column]:
    """sum / sum-of-squares in DECIMAL — exact, so every engine and
    every partition order produces the same bits."""
    v = F.col(value_col).cast("decimal(18,4)")
    return [
        F.count("*").alias("n"),
        F.sum(v).alias("_s1"),
        F.sum((v * v).cast("decimal(38,8)")).alias("_s2"),
    ]


def zscore_flags(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 2.0,
) -> DataFrame:
    """Per-group anomaly audit: rows whose |z| exceeds ``threshold``
    against the group's own mean/stddev (sample variance from exact
    decimal moments — see module docstring).

    Emits one row per group: n, anomalies, mean/stddev (4dp).
    """
    stats = df.groupBy(group_col).agg(*_exact_moments(value_col))
    stats = stats.select(
        group_col,
        "n",
        (F.col("_s1").cast("double") / F.col("n")).alias("_mean"),
        F.sqrt(
            (
                F.col("_s2").cast("double")
                - F.col("_s1").cast("double")
                * F.col("_s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("_std"),
    )
    z = (F.col(value_col).cast("double") - F.col("_mean")) / F.col("_std")
    flagged = df.join(F.broadcast(stats), group_col).select(
        group_col, "n", "_mean", "_std", z.alias("_z")
    )
    return (
        flagged.groupBy(group_col, "n", "_mean", "_std")
        .agg(
            F.sum(
                F.when(F.abs(F.col("_z")) > threshold, 1).otherwise(0)
            ).alias("anomalies")
        )
        .select(
            group_col,
            "n",
            "anomalies",
            F.round("_mean", 4).alias("mean_value"),
            F.round("_std", 4).alias("stddev_value"),
        )
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average of a stepwise signal per key: each
    observation holds until the next one, so its weight is the
    interval length — the correct mean for irregularly-sampled
    telemetry (the plain AVG over-weights bursts).

    Determinism: weights are exact integer microseconds and values
    are clamped to DECIMAL(18,6) (the q104 convention), so the
    weighted sum accumulates exactly in decimal and the single IEEE
    division happens at the end — bit-stable under any partition
    order and engine. The last observation per key has no successor
    interval and is excluded (n_intervals counts the rest; keys with
    a single event drop out).

    One keyed shuffle for the lead() window, one for the agg — both
    on ``key_col``, so the operator scales with keys, not history.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    dur = F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    stepped = events.select(
        F.col(key_col),
        F.col(value_col).cast("decimal(18,6)").alias("_v"),
        dur.alias("_dur_us"),
    ).filter(F.col("_dur_us").isNotNull())
    return stepped.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("_dur_us").cast("long").alias("total_dur_us"),
        F.round(
            F.sum(F.col("_v") * F.col("_dur_us").cast("decimal(18,0)"))
            .cast("double")
            / F.sum("_dur_us").cast("double"),
            6,
        ).alias("twa_value"),
    )
