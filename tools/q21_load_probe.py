#!/usr/bin/env python
"""q21 driver-window outlier probe (round 13, VERDICT r12 "Next
round" #6): in the r12 driver bench, q21_minhash_lsh was the one
r1-set query whose NORMALIZED value stayed high (3.12) after the
per-query mini-calib — every other spike normalized away. Hypothesis:
the mini-calib (one barrier-free, embarrassingly-parallel JVM
aggregation) underestimates how much a CONTENDED host hurts a
shuffle-heavy multi-stage plan, because stage barriers compound
stragglers: a ×2 per-core slowdown costs a 1-stage scan ×2 but a
6-stage shuffle plan ×2 per stage PLUS the straggler tail at each
barrier.

Method: measure q21 plus two controls — q01 (scan+agg, barrier-light)
and q24 (brute-force ANN, one wide Arrow stage) — at sf0.1, each with
its own mini-calib, first on an idle host, then with ``HOGS`` spinning
CPU processes. Report raw and normalized values per condition; the
outlier is PINNED as calib-insensitivity if q21's normalized value
inflates under load while the controls' hold (or inflate much less).

Run on an OTHERWISE IDLE box: python tools/q21_load_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdataflink_spark import get_spark  # noqa: E402
from bigdataflink_spark.plans.queries import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.1"
NAMES = ["q01_pricing_summary", "q24_embedding_topk", "q21_minhash_lsh"]
HOGS = 24


def measure(spark, reps=3):
    out = {}
    for name in NAMES:
        spark._jvm.System.gc()
        c = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(25_000_000).selectExpr("sum(id * 3 % 7)").collect()
            c = min(c, time.perf_counter() - t0)
        c *= 8.0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, SF).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "raw_s": round(best, 3),
            "calib_s": round(c, 3),
            "norm": round(best / c, 3),
        }
    return out


def main() -> None:
    spark = get_spark("q21-load-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in NAMES:  # warm plans/codegen once
        QUERIES[name](spark, SF).count()
    idle = measure(spark)
    hogs = [
        subprocess.Popen(
            [sys.executable, "-c", "while True:\n    pass"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(HOGS)
    ]
    try:
        time.sleep(2)
        loaded = measure(spark)
    finally:
        for h in hogs:
            h.kill()
    report = {"tier": "q21-load", "hogs": HOGS, "idle": idle, "loaded": loaded}
    for name in NAMES:
        report.setdefault("norm_inflation", {})[name] = round(
            loaded[name]["norm"] / idle[name]["norm"], 2
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
