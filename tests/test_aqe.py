"""AQE runtime re-planning evidence (SURVEY.md §4 'Partitioning /
shuffle' row): the scale path for skewed keys is salting (q42) for
deterministic layouts plus AQE skew-join splitting for everything
else. These tests pin the latter actually engaging — a hot key whose
shuffle partition dwarfs the median gets split at runtime, and
oversized shuffle partition counts coalesce downward — so the
session defaults in session.py are demonstrably live, not wishful.

The asserted markers (`skew=true`, `AQEShuffleRead coalesced`) are
the final-adaptive-plan strings; the plan must be read AFTER running
the DataFrame's own QueryExecution (a .count() runs a different
plan on top and leaves this one isFinalPlan=false).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_TUNED = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
}


def _final_plan(df) -> str:
    df._jdf.queryExecution().toRdd().count()
    return df._jdf.queryExecution().executedPlan().toString()


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_key(spark):
    """80% of the left side lands on ONE key; with broadcast disabled
    the SMJ's hot partition must be split by AQE (skew=true) while
    the result stays exactly the plain-join result."""
    saved = _with_confs(spark, _TUNED)
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 10 < 8, 0).otherwise(F.col("id") % 100).alias("key"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "key")
        plan = _final_plan(j)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        # correctness unchanged by the runtime re-plan
        assert j.count() == 400_000
    finally:
        _restore(spark, saved)


def test_aqe_coalesces_small_shuffle(spark):
    """A tiny aggregate shuffled over 32 partitions coalesces to far
    fewer at runtime — oversizing shuffle.partitions is safe, which
    is why the 100 TB config can size for the biggest stage only."""
    df = (
        spark.range(0, 10_000)
        .groupBy((F.col("id") % 7).alias("k"))
        .agg(F.count("*").alias("n"))
    )
    plan = _final_plan(df)
    assert "AQEShuffleRead coalesced" in plan, plan
    assert df.count() == 7
