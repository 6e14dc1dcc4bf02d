from __future__ import annotations

import os

import duckdb
import pytest

from bigdataflink_spark import get_spark

# Override to sweep the oracle gate at another scale factor, e.g.
#   SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/test_queries_oracle.py
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def pytest_collection_modifyitems(config, items):
    """Deselect @pytest.mark.slow tests unless SPARK_GRAFT_SLOW_TESTS
    is set (round 14, VERDICT r13 "Next round" #2): seven stream/batch
    parity + TTL tests take 60–145 s EACH (~12 of the suite's ~37
    minutes) and made the full run overrun the driver's capture
    budget, leaving the pytest gate unprovable. The default run now
    fits the budget; the slow seven still gate every round via
    ``SPARK_GRAFT_SLOW_TESTS=1 pytest tests/`` (run and recorded in
    OPTIMIZATION_r<N>.md), and the semantics they protect are also
    pinned by the per-query oracle sweeps."""
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS"):
        return
    slow = [it for it in items if it.get_closest_marker("slow")]
    if slow:
        config.hook.pytest_deselected(items=slow)
        items[:] = [it for it in items if not it.get_closest_marker("slow")]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle harness."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
