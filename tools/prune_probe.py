#!/usr/bin/env python
"""Range-prune probe for the streaming gram-state verdict join
(round 13, VERDICT r12 "Next round" #5).

Question: compaction writes the gram seen-set as gh-RANGE-SHARDED,
sorted parquet files (streaming/substrdedup.py::maintain_gram_state →
compact_dir → write_sharded) — can a trigger's verdict join exploit
the per-file min/max footers to read only overlapping shards?

Method (all measured, nothing assumed):

1. build a compacted state of DISTINCT 60-bit md5 gram hashes from
   the sf0.1 documents (cloned ×10 with salted hashing to get a
   deployment-shaped file count), sharded/sorted on gh;
2. read every file's parquet footer (pyarrow) and compute, for
   (a) a UNIFORM batch (the real workload: a micro-batch of crawl
   docs, gram hashes uniform over the full 2^60 domain) and
   (b) a RANGE-LOCAL batch (the same batch's hashes squeezed into
   1/64th of the domain — what pruning needs to engage),
   how many shard files an IDEAL per-file [min,max] pruner would
   still have to read;
3. wall-clock the verdict join three ways at the same state: plain
   shuffle_hash (production), with the batch's [min,max] range
   predicate pushed into the state scan, and with Spark's runtime
   Bloom-filter join injection enabled — the row-level (not
   file-level) pruning Spark can actually do today.

The honest expectation, recorded either way in SCALE.md: a uniform
batch's range spans the whole domain, so footer pruning reads 100%
of shards no matter how the state is laid out — cryptographic
hashing destroys the key locality range pruning needs BY DESIGN.
The bounded-bytes alternative is a Bloom prefilter on the scan
(row-level), not file skipping.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bigdataflink_spark import get_spark  # noqa: E402
from bigdataflink_spark.operators.hashing import md5_int  # noqa: E402
from bigdataflink_spark.operators.text import substring_windows  # noqa: E402
from bigdataflink_spark.sources.formats import write_sharded  # noqa: E402
from bigdataflink_spark.sources.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
STATE = "/tmp/spark_graft_prune_probe/grams"
DOMAIN = 1 << 60


def build_state(spark) -> None:
    docs = load_table(spark, "documents", SF)
    parts = []
    for i in range(10):  # ×10 distinct grams via per-clone salt
        parts.append(
            substring_windows(docs, "doc_id", "text", 10).select(
                md5_int(
                    F.concat(F.lit(f"probe-{i}-"), F.col("gram")), bits=60
                ).alias("gh")
            )
        )
    st = parts[0]
    for p in parts[1:]:
        st = st.unionByName(p)
    write_sharded(
        st.distinct(), STATE, ["gh"], target_rows_per_file=100_000
    )


def footer_spans(path: str):
    import pyarrow.parquet as pq

    spans = []
    for f in sorted(os.listdir(path)):
        if not f.startswith("part-"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((f, lo, hi))
    return spans


def main() -> None:
    spark = get_spark("prune-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(STATE):
        print("building sharded gram state ...", file=sys.stderr)
        build_state(spark)
    spans = footer_spans(STATE)
    n_files = len(spans)
    state = spark.read.parquet(STATE)
    n_state = state.count()

    # the trigger's batch: grams of 1% of docs (uniform hashes — the
    # real crawl workload)
    docs = load_table(spark, "documents", SF)
    batch = (
        substring_windows(
            docs.filter(F.col("doc_id") % 100 == 0), "doc_id", "text", 10
        )
        .select(
            md5_int(F.concat(F.lit("probe-0-"), F.col("gram")), bits=60).alias(
                "gh"
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()
    lo, hi = batch.agg(F.min("gh"), F.max("gh")).collect()[0]

    # ideal per-file pruning: a file must be read iff its [min,max]
    # overlaps the batch's [min,max] (what footer pruning could skip)
    overlap_uniform = sum(1 for _, flo, fhi in spans if fhi >= lo and flo <= hi)
    # the same batch squeezed into 1/64th of the domain (range-local
    # keys — what pruning NEEDS): how many files overlap then?
    cut = DOMAIN // 64
    blocal = batch.filter(F.col("gh") < cut)
    n_local = blocal.count()
    llo, lhi = blocal.agg(F.min("gh"), F.max("gh")).collect()[0]
    overlap_local = (
        sum(1 for _, flo, fhi in spans if fhi >= llo and flo <= lhi)
        if n_local
        else 0
    )

    def timed(df):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    state.count()  # warm the page cache so run order can't bias legs

    # production verdict join (seen = batch grams already in state)
    j_plain = timed(batch.join(state.hint("shuffle_hash"), "gh"))
    # with the batch's [min,max] pushed into the state scan — on a
    # uniform batch this is a no-op filter covering the whole domain
    j_range = timed(
        batch.join(
            state.filter((F.col("gh") >= lo) & (F.col("gh") <= hi)).hint(
                "shuffle_hash"
            ),
            "gh",
        )
    )
    # range-local batch + pushed range: pruning CAN engage here
    j_local = (
        timed(
            blocal.join(
                state.filter(
                    (F.col("gh") >= llo) & (F.col("gh") <= lhi)
                ).hint("shuffle_hash"),
                "gh",
            )
        )
        if n_local
        else None
    )
    # Spark's runtime Bloom-filter join injection (row-level
    # pruning). The feature is default-ON in Spark 4 but its
    # applicationSideScanSizeThreshold is 10 GB — at probe scale it
    # never engages unless the threshold is dropped, so measure with
    # it forced eligible and restore the defaults after.
    app_thresh = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    old_thresh = spark.conf.get(app_thresh)
    spark.conf.set(app_thresh, "0")
    j_bloom = timed(batch.join(state.hint("shuffle_hash"), "gh"))
    spark.conf.set(app_thresh, old_thresh)

    print(
        json.dumps(
            {
                "tier": "prune",
                "state_rows": n_state,
                "state_files": n_files,
                "batch_grams": n_batch,
                "batch_span_frac": round((hi - lo) / DOMAIN, 6),
                "files_needed_uniform_batch": overlap_uniform,
                "files_needed_rangelocal_batch": overlap_local,
                "rangelocal_batch_grams": n_local,
                "join_plain_s": j_plain,
                "join_range_pushed_s": j_range,
                "join_rangelocal_s": j_local,
                "join_runtime_bloom_s": j_bloom,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
