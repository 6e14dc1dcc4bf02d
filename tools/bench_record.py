#!/usr/bin/env python
"""Emit the round's BENCH_LOCAL record in ONE stable shape (VERDICT
r9 "What's wrong #4": r8's and r9's artifacts had different shapes,
forcing cross-round tooling to special-case each).

The canonical record is a SINGLE JSON object:

    {"metric": "headline_suite_wall", "value": <total sec>,
     "unit": "sec", "sf": <float>, "calib_sec": <float>,
     "r1_set_subtotal": <float>, "n_queries": <int>,
     "queries": {"q01_...": sec, ...}}

which is exactly bench.py's BENCH_DETAIL.json. This wrapper runs the
bench and prints that object, so

    python tools/bench_record.py > BENCH_LOCAL_r{N}.json

always produces a record parseable with ``json.load`` and the same
five lines of comparison code every round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        check=True,
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=sys.stderr,
    )
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        record = json.load(fh)
    print(json.dumps(record, sort_keys=True))


if __name__ == "__main__":
    main()
