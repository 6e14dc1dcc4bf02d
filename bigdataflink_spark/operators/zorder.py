"""Z-order (Morton-curve) multi-dimensional clustering.

A sort on one column gives perfect parquet min/max pruning on that
column and none on any other. Interleaving the bits of several
normalized columns into one Morton key and range-sharding on IT gives
every participating column file-level locality — range predicates on
ANY of the z-columns skip most files. This is the lakehouse
`OPTIMIZE ZORDER BY` layout op, built from public DataFrame
primitives: one min/max aggregate (broadcast back as a 1-row scalar),
a scan-stage bit-interleave expression, and a range-sharded write.

Scale shape: the stats pass is a single scalar aggregate; the key is
pure JVM expression work; the write reuses write_sharded's
repartitionByRange sampling. Nothing here is driver-side except the
1-row stats broadcast. Min/max affine scaling is skew-sensitive (a
single outlier compresses everyone else's buckets); for heavy-tailed
columns pre-clip with q105's winsorize cutoffs or bucket by rank.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled(col: str, lo: Column, hi: Column, bits: int) -> Column:
    """Affine-scale a numeric column to [0, 2^bits - 1] as a long."""
    top = (1 << bits) - 1
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (F.col(col).cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * (top + 1)).cast("long"), F.lit(top))


def morton_key(scaled_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits of each pre-scaled long column into
    one Z-value (static expression tree of shift/mask/or — stays in
    whole-stage codegen)."""
    n = len(scaled_cols)
    terms: list[Column] = []
    for i in range(bits):
        for j, c in enumerate(scaled_cols):
            # bit i of column j lands at position i*n + j
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zorder_key(
    df: DataFrame, cols: list[str], key_name: str = "_z", bits: int | None = None
) -> DataFrame:
    """Append the Morton key over ``cols`` (numeric), normalizing each
    by its global min/max (one scalar aggregate, broadcast back)."""
    if bits is None:
        bits = min(16, 62 // len(cols))
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        _scaled(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    return joined.withColumn(key_name, morton_key(scaled, bits)).drop(
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    target_rows_per_file: int,
    fmt: str = "parquet",
) -> None:
    """Range-shard on the Morton key over ``cols`` and write size-
    capped files: parquet footers then carry tight min/max on EVERY
    z-column, so range scans on any of them prune at file level. The
    key itself is dropped before the save (projection after the sort
    keeps the order)."""
    keyed = with_zorder_key(df, cols)
    n = keyed.count()
    shards = max(1, -(-n // target_rows_per_file))
    (
        keyed.repartitionByRange(shards, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(fmt)
        .option("maxRecordsPerFile", str(target_rows_per_file))
        .mode("overwrite")
        .save(path)
    )
