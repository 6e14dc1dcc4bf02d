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
    if not rules:
        raise ValueError("check_expectations: empty rules list")
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


def check_snapshot_drift(
    spark,
    table: str,
    rules: list[dict],
    base_version: int,
    cur_version: int | None = None,
) -> DataFrame:
    """Cross-snapshot (aggregate-level) expectations — the release
    gate a real pipeline runs before publishing: compare the CURRENT
    snapshot of a versioned table (sources/snapshots.py) against a
    PINNED baseline version on corpus-level metrics, one row per rule:
    (rule, base_value, cur_value, drift_ppm, passed).

    Rule types (tolerances in exact parts-per-million — all
    comparisons are integer/DECIMAL(38,0) cross-products with ONE
    integral division for the reported ppm, so verdicts are
    bit-identical across engines and partitionings):

    * ``row_count_drift`` (max_rel_drift_ppm): |n_cur − n_base|
      relative to n_base. base/cur_value are the row counts.
    * ``null_rate_drift`` (col, max_drift_ppm): absolute difference
      of the column's null RATE. base/cur_value are the rates in ppm.
    * ``distinct_count_drift`` (col, max_rel_drift_ppm): relative
      drift of the column's exact distinct count.
    * ``tvd_drift`` (col, max_tvd_ppm, plus DECLARED buckets — either
      ``edges`` [e1..ek] for a numeric histogram (k+1 range buckets)
      or ``values`` [v1..vn] for a categorical domain (one bucket per
      declared value + an 'other' bucket); NULLs are always their own
      bucket): total variation distance between the two snapshots'
      bucket distributions, TVD = ½ Σ_b |cnt_b^cur/n_cur −
      cnt_b^base/n_base|, reported in exact ppm — the numerator is
      Σ_b |cnt_b^cur·n_base − cnt_b^base·n_cur| in DECIMAL(38,0)
      cross-products against the 2·n_base·n_cur denominator, ONE
      integral division at the end. Declared (bounded) buckets are
      what keep this inside the shared single-scan aggregate — each
      bucket is one conditional SUM, never a groupBy on an unbounded
      domain. base_value/cur_value report the snapshot row counts the
      rates are taken over.

    Cost: ONE aggregate scan per snapshot (all rules share it — the
    same single-pass design as ``check_expectations``), then 1-row
    arithmetic. A base snapshot with zero rows (or zero distinct)
    passes only if the current side is also zero; drift_ppm is NULL
    for that degenerate denominator.
    """
    from bigdataflink_spark.sources import snapshots as sn

    if not rules:
        raise ValueError("check_snapshot_drift: empty rules list")
    base = sn.read_snapshot(spark, table, base_version)
    cur = sn.read_snapshot(spark, table, cur_version)

    def tvd_buckets(rule: dict) -> list[str]:
        """The rule's declared buckets as SQL boolean exprs (shared
        verbatim by the Spark aggregate and any SQL oracle). NULL is
        always its own bucket; conditions that evaluate to NULL count
        as false (CASE WHEN semantics on both engines)."""
        c = rule["col"]
        if "edges" in rule:
            edges = list(rule["edges"])
            if edges != sorted(edges) or len(set(edges)) != len(edges):
                raise ValueError(f"tvd_drift {rule['rule']}: edges must be strictly increasing")
            conds = [f"{c} IS NOT NULL AND {c} < {edges[0]}"]
            conds += [
                f"{c} >= {lo} AND {c} < {hi}"
                for lo, hi in zip(edges, edges[1:])
            ]
            conds.append(f"{c} >= {edges[-1]}")
        elif "values" in rule:
            quoted = [
                "'" + str(v).replace("'", "''") + "'" for v in rule["values"]
            ]
            conds = [f"{c} = {q}" for q in quoted]
            conds.append(
                f"{c} IS NOT NULL AND {c} NOT IN ({', '.join(quoted)})"
            )
        else:
            raise ValueError(
                f"tvd_drift {rule['rule']}: declare buckets via 'edges' or 'values'"
            )
        conds.append(f"{c} IS NULL")
        return conds

    def metrics(df: DataFrame, tag: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias(f"n_{tag}")]
        for r in rules:
            if r["type"] == "null_rate_drift":
                # coalesce: F.sum over an EMPTY snapshot is NULL, which
                # would poison the degenerate-denominator verdicts
                aggs.append(
                    F.coalesce(
                        F.sum(F.when(F.col(r["col"]).isNull(), 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias(f"nul_{r['rule']}_{tag}")
                )
            elif r["type"] == "distinct_count_drift":
                aggs.append(
                    F.count_distinct(F.col(r["col"]))
                    .cast("long")
                    .alias(f"dst_{r['rule']}_{tag}")
                )
            elif r["type"] == "tvd_drift":
                for i, cond in enumerate(tvd_buckets(r)):
                    aggs.append(
                        F.coalesce(
                            F.sum(F.when(F.expr(cond), 1).otherwise(0)),
                            F.lit(0),
                        )
                        .cast("long")
                        .alias(f"tvd_{r['rule']}_{i}_{tag}")
                    )
            elif r["type"] != "row_count_drift":
                raise ValueError(f"unknown drift expectation type: {r['type']}")
        return df.agg(*aggs)

    # materialize the 1-row metrics product ONCE: every rule leg below
    # references it, and a plain union would re-execute the aggregate
    # scans per leg (the round-6 plan audit showed v=0/v=1 scanned
    # once per rule) — the eager checkpoint makes "one aggregate scan
    # per snapshot" physically true, not just logically
    one = metrics(base, "b").crossJoin(metrics(cur, "c")).localCheckpoint(
        eager=True
    )

    def rel_drift(rule: dict, b_col: str, c_col: str) -> DataFrame:
        tol = int(rule["max_rel_drift_ppm"])
        num = (
            f"CAST(abs(CAST({c_col} AS DECIMAL(38,0)) - {b_col}) * 1000000 "
            "AS DECIMAL(38,0))"
        )
        return one.selectExpr(
            f"'{rule['rule']}' AS rule",
            f"{b_col} AS base_value",
            f"{c_col} AS cur_value",
            f"CASE WHEN {b_col} > 0 THEN CAST({num} DIV {b_col} AS BIGINT) END AS drift_ppm",
            f"CASE WHEN {b_col} > 0 THEN {num} <= CAST({tol} AS DECIMAL(38,0)) * {b_col} "
            f"ELSE {c_col} = 0 END AS passed",
        )

    parts: list[DataFrame] = []
    for r in rules:
        if r["type"] == "row_count_drift":
            parts.append(rel_drift(r, "n_b", "n_c"))
        elif r["type"] == "distinct_count_drift":
            parts.append(rel_drift(r, f"dst_{r['rule']}_b", f"dst_{r['rule']}_c"))
        elif r["type"] == "tvd_drift":
            tol = int(r["max_tvd_ppm"])
            n_bk = len(tvd_buckets(r))
            num = (
                "CAST(("
                + " + ".join(
                    f"abs(CAST(tvd_{r['rule']}_{i}_c AS DECIMAL(38,0)) * n_b - "
                    f"CAST(tvd_{r['rule']}_{i}_b AS DECIMAL(38,0)) * n_c)"
                    for i in range(n_bk)
                )
                + ") * 1000000 AS DECIMAL(38,0))"
            )
            den = "(CAST(2 AS DECIMAL(38,0)) * n_b * n_c)"
            parts.append(
                one.selectExpr(
                    f"'{r['rule']}' AS rule",
                    "n_b AS base_value",
                    "n_c AS cur_value",
                    f"CASE WHEN n_b > 0 AND n_c > 0 THEN CAST({num} DIV {den} AS BIGINT) END AS drift_ppm",
                    f"CASE WHEN n_b > 0 AND n_c > 0 THEN {num} <= CAST({tol} AS DECIMAL(38,0)) * {den} "
                    "ELSE n_b = 0 AND n_c = 0 END AS passed",
                )
            )
        else:  # null_rate_drift: |nul_c/n_c − nul_b/n_b| as exact ppm
            tol = int(r["max_drift_ppm"])
            nb, nc = f"nul_{r['rule']}_b", f"nul_{r['rule']}_c"
            num = (
                f"CAST(abs(CAST({nc} AS DECIMAL(38,0)) * n_b - "
                f"CAST({nb} AS DECIMAL(38,0)) * n_c) * 1000000 AS DECIMAL(38,0))"
            )
            den = "CAST(n_b AS DECIMAL(38,0)) * n_c"
            parts.append(
                one.selectExpr(
                    f"'{r['rule']}' AS rule",
                    f"CASE WHEN n_b > 0 THEN CAST(CAST({nb} AS DECIMAL(38,0)) * 1000000 DIV n_b AS BIGINT) END AS base_value",
                    f"CASE WHEN n_c > 0 THEN CAST(CAST({nc} AS DECIMAL(38,0)) * 1000000 DIV n_c AS BIGINT) END AS cur_value",
                    f"CASE WHEN n_b > 0 AND n_c > 0 THEN CAST({num} DIV ({den}) AS BIGINT) END AS drift_ppm",
                    f"CASE WHEN n_b > 0 AND n_c > 0 THEN {num} <= CAST({tol} AS DECIMAL(38,0)) * ({den}) "
                    f"ELSE {nb} = 0 AND {nc} = 0 END AS passed",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
