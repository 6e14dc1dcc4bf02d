#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage:
    python tools/plan_dump.py before q237_curated_corpus q233_bpe_encode_pack
    python tools/plan_dump.py after q237_curated_corpus

Runs at $SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE is what is
recorded; SF only changes AQE sizing, and explain() here is the
pre-execution plan). Queries that materialize state during
construction (the streaming twins) still explain fine — the dumped
plan is the final trigger's composed frame.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, ".")

from contextlib import redirect_stdout

from bigdataflink_spark import get_spark  # noqa: E402
from bigdataflink_spark.plans.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_TAG", "r14"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {SF_DIR}\n")
            fh.write(buf.getvalue())
        txt = buf.getvalue()
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} bytes, Exchange x{n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
