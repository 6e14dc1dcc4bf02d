"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdataflink_spark/`` (plans/queries.py is
the query suite, plans/oracles.py the DuckDB twins).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: revenue by region/year — 5-way star join over
    /root/testdata/sf0.001 (see plans/queries.py::q02_revenue_by_region)."""
    from bigdataflink_spark.plans.queries import q02_revenue_by_region

    return q02_revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bigdataflink_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every query. Engine-specific
    sketch values (q19/q102/q113) are oracled via their bounded-error
    contracts: the oracle pins exact counts plus the contract booleans
    the Spark side must evaluate to TRUE."""
    from bigdataflink_spark.plans.oracles import ORACLES

    return dict(ORACLES)
