#!/usr/bin/env python
"""Measure end-to-end star-ETL throughput on the reference's own
workload (10 CSVs × 1000 rows × 50 cols → 7 star tables) and print
one JSON line: {"msgs": 10000, "wall_s": ..., "msg_per_s": ...}.

This is the apples-to-apples number against the reference pipeline,
whose per-row design (7 psycopg2 round-trips per message,
flink/stream_to_star.py:287-295) caps it at order 10²–10³ msg/s.
Run: python tools/ref_throughput.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bigdataflink_spark import get_spark  # noqa: E402
from bigdataflink_spark.plans import build_star  # noqa: E402
from bigdataflink_spark.sources import read_sales_csv  # noqa: E402


def main() -> None:
    spark = get_spark("ref-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + codegen, not counted
    read_sales_csv(spark).limit(1).count()

    t0 = time.perf_counter()
    star = build_star(read_sales_csv(spark))
    counts = {name: df.count() for name, df in star.items()}
    wall = time.perf_counter() - t0

    msgs = 10000
    print(
        json.dumps(
            {
                "msgs": msgs,
                "wall_s": round(wall, 3),
                "msg_per_s": round(msgs / wall, 1),
                "tables": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
