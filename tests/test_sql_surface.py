"""SQL-surface parity: the engine is usable through spark.sql as well
as the DataFrame API. For every oracle statement that is pure ANSI
(no DuckDB-only functions), run it through Spark SQL on registered
temp views and require the same result as the DataFrame query.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from bigdataflink_spark.sources.tables import TABLES, load_table
from tests.conftest import SF_DIR

# Oracle statements that parse and run identically on Spark SQL
# (ANSI subset — no epoch_us/time_bucket/list_* etc.).
ANSI_QUERIES = [
    "q02_revenue_by_region",
    "q03_top_customers",
    "q04_priority_semi_join",
    "q05_customers_without_orders",
    "q06_ri_check",
    "q07_distinct_counts",
    "q09_union_slices",
    "q10_window_rank",
    "q35_cube",
    "q37_setops",
    "q42_salted_join",
    "q43_above_nation_avg",
    "q128_map_battery",
    "q137_event_transitions",
    "q139_quantile_transform",
    "q146_chisq_contingency",
]
# Excluded for dialect (not capability) reasons: q18_rollup — Spark
# won't resolve an output alias inside GROUPING() the way DuckDB does;
# q40_pivot — DuckDB double-quoted identifiers vs Spark backticks.
# Both capabilities run through the DataFrame API in those queries.


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    for t in TABLES:
        load_table(spark, t, SF_DIR).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def _rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ANSI_QUERIES)
def test_sql_equals_dataframe(name, spark):
    sql = entrymod.oracle_sql()[name]
    via_sql = spark.sql(sql)
    via_df = entrymod.queries()[name](spark, SF_DIR)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    a = _rows(via_sql.columns, [tuple(r) for r in via_sql.collect()])
    b = _rows(via_df.columns, [tuple(r) for r in via_df.collect()])
    assert a == b, f"{name}: Spark-SQL result differs from DataFrame result"
