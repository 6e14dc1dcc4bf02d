"""Declarative data-quality expectations — the audit layer a pipeline
runs before publishing a table (the Great-Expectations shape,
engine-native): declare rules as data, get back one row per rule
with exact violation counts and a pass verdict.

Design for 100 TB:

* All single-column rules (not_null / range / regex / values_in)
  compile into ONE aggregate pass over the table — a single scan,
  map-side partial counts, no shuffle beyond the final 1-row agg.
* ``unique`` needs a keyed count (one shuffle on the key).
* ``fk`` needs a left-anti join against the reference (one shuffle,
  or a broadcast when the ref side is dim-sized — AQE decides).
* The result is rule-per-row, so downstream can gate on
  ``filter(~passed).count() == 0`` or route violations to a
  dead-letter audit table.

Rules are plain dicts so suites can live in config, not code::

    rules = [
        {"rule": "o_custkey_not_null", "type": "not_null", "col": "o_custkey"},
        {"rule": "price_range", "type": "range", "col": "o_totalprice",
         "lo": 0, "hi": 1e6},
        {"rule": "status_domain", "type": "values_in", "col": "o_orderstatus",
         "values": ["F", "O", "P"]},
        {"rule": "pk_unique", "type": "unique", "cols": ["o_orderkey"]},
        {"rule": "cust_fk", "type": "fk", "col": "o_custkey"},  # + ref=
    ]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict) -> F.Column:
    t = rule["type"]
    c = F.col(rule["col"])
    if t == "not_null":
        return c.isNull()
    if t == "range":
        # NULLs are not range violations (not_null is its own rule)
        return c.isNotNull() & ~c.between(F.lit(rule["lo"]), F.lit(rule["hi"]))
    if t == "values_in":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if t == "regex":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown scalar expectation type: {t}")


def check_expectations(
    df: DataFrame, rules: list[dict], refs: dict[str, DataFrame] | None = None
) -> DataFrame:
    """One row per rule: (rule, n_checked, n_violations, passed).

    Scalar rules share a single aggregate pass; ``unique`` and ``fk``
    rules each add one keyed job whose 1-row result unions in.
    """
    refs = refs or {}
    scalar = [r for r in rules if r["type"] in {"not_null", "range", "values_in", "regex"}]
    keyed = [r for r in rules if r["type"] in {"unique", "fk"}]

    parts: list[DataFrame] = []
    if scalar:
        aggs = []
        for r in scalar:
            aggs.append(
                F.sum(F.when(_violation_expr(r), 1).otherwise(0))
                .cast("long")
                .alias(f"v_{r['rule']}")
            )
        one = df.agg(F.count(F.lit(1)).cast("long").alias("_n"), *aggs)
        stacked = ", ".join(
            f"'{r['rule']}', v_{r['rule']}" for r in scalar
        )
        parts.append(
            one.selectExpr(
                "_n", f"stack({len(scalar)}, {stacked}) AS (rule, n_violations)"
            ).select(
                "rule",
                F.col("_n").alias("n_checked"),
                "n_violations",
                (F.col("n_violations") == 0).alias("passed"),
            )
        )
    for r in keyed:
        if r["type"] == "unique":
            cols = r["cols"]
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .agg(
                    F.coalesce(F.sum(F.col("_c") - 1), F.lit(0))
                    .cast("long")
                    .alias("n_violations")
                )
            )
            n = df.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
            parts.append(
                n.crossJoin(dup).select(
                    F.lit(r["rule"]).alias("rule"),
                    "n_checked",
                    "n_violations",
                    (F.col("n_violations") == 0).alias("passed"),
                )
            )
        else:  # fk
            ref = refs[r["rule"]]
            ref_col = r.get("ref_col", r["col"])
            orphans = (
                df.select(F.col(r["col"]).alias("_k"))
                .filter(F.col("_k").isNotNull())
                .join(
                    ref.select(F.col(ref_col).alias("_k")).distinct(),
                    "_k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            )
            n = df.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
            parts.append(
                n.crossJoin(orphans).select(
                    F.lit(r["rule"]).alias("rule"),
                    "n_checked",
                    "n_violations",
                    (F.col("n_violations") == 0).alias("passed"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
