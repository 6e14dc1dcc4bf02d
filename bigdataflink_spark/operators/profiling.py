"""Column profiling — the data-quality census a pipeline runs before
trusting a new 100 TB drop (extension suite).

``profile`` computes per-column row/null/distinct counts plus numeric
min/max in ONE aggregation pass over the table (a single job: Spark
plans the multi-distinct agg as one Expand + two-stage hash
aggregate, so the input is scanned once regardless of how many
columns are profiled). The single wide result row is then unpivoted
driver-side into one row per column — that step touches k rows, not
data.

Exact COUNT(DISTINCT) is chosen because the result is oracle-checked
bit-for-bit; at the 100 TB scale pass ``approximate=True`` to swap in
``approx_count_distinct`` (HLL, no Expand blowup, one pass) — the
operator shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile(df: DataFrame, cols: list[str], approximate: bool = False) -> DataFrame:
    """One row per profiled column:

    (col_name, n_rows, n_null, n_distinct, min_num, max_num)

    ``min_num``/``max_num`` are 4dp-rounded doubles for numeric
    columns and NULL otherwise — strings/dates deliberately get no
    formatted min/max because engines disagree on value rendering,
    which would poison the cross-engine hash for zero analytic value.
    """
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        if approximate:
            aggs.append(F.approx_count_distinct(c).alias(f"_nd_{c}"))
        else:
            aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
        if c in numeric:
            aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"_mn_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"_mx_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("long").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).cast("long").alias("n_null"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                (F.col(f"_mn_{c}") if c in numeric else F.lit(None)).cast("double").alias(
                    "min_num"
                ),
                (F.col(f"_mx_{c}") if c in numeric else F.lit(None)).cast("double").alias(
                    "max_num"
                ),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
