#!/usr/bin/env python
"""Scale probe: does the suite scale linearly when the data grows 10×?

Builds a synthetic sf1 under /tmp/spark_graft_sf1 by replicating the
sf0.1 fact-side tables 10× with key shifts (lineitem/orders shift
order keys in sync; events/documents/embeddings shift their ids) while
dimensions stay fixed — growing facts against stable dims, which also
makes FK keys 10× hotter (a mild skew stress). Then times the bench
headline suite at sf0.1 and sf1 and prints per-query scaling factors.

A query whose time grows ≲ data growth is scan/shuffle-bound and will
survive a 100× scale-up by adding executors; anything super-linear is
flagged. Results → SCALE.md (hand-curated from this output).

Run: python tools/scale_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bigdataflink_spark import get_spark  # noqa: E402
from bigdataflink_spark.plans.queries import QUERIES  # noqa: E402
from bigdataflink_spark.sources.tables import TABLES, load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"
COPIES = 10

# (table, [key columns to shift]) — shifts stay in sync across tables
# sharing a key domain (l_orderkey ↔ o_orderkey).
SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
KEEP = [t for t in TABLES if t not in SHIFTS]

PROBE = [
    "q01_pricing_summary",
    "q02_revenue_by_region",
    "q03_top_customers",
    "q06_ri_check",
    "q10_window_rank",
    "q14_lww_dedup",
    "q15_tumbling_window",
    "q20_dedup_exact",
    "q21_minhash_lsh",
    "q22_simhash",
    "q30_text_stats",
    "q38_asof_join",
    "q39_range_join",
    "q44_corpus_pipeline",
    "q46_tfidf_topk",
    "q52_forecast_revenue",
    "q55_returned_items",
    "q56_nation_volume",
    "q57_window_battery",
    "q62_large_orders",
    "q66_embedding_topk_pandas",
]


def build_sf1(spark) -> None:
    os.makedirs(DST, exist_ok=True)
    for t in KEEP:
        load_table(spark, t, SRC).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    for t, keys in SHIFTS.items():
        base = load_table(spark, t, SRC)
        span = base.agg(F.max(keys[0])).collect()[0][0] + 1
        parts = []
        for i in range(COPIES):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * span))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")


def time_suite(spark, sf_dir: str) -> dict[str, float]:
    QUERIES["q02_revenue_by_region"](spark, sf_dir).count()  # warm
    out = {}
    for name in PROBE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out

def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        print("building synthetic sf1 ...", file=sys.stderr)
        build_sf1(spark)
    small = time_suite(spark, SRC)
    big = time_suite(spark, DST)
    report = {
        q: {
            "sf0.1_s": small[q],
            "sf1_s": big[q],
            "x": round(big[q] / small[q], 2) if small[q] else None,
        }
        for q in PROBE
    }
    print(json.dumps({"copies": COPIES, "queries": report}, indent=2))


if __name__ == "__main__":
    main()
