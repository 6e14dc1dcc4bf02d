"""KMV distinct sketch + Bloom seen-set (operators/sketches.py,
round 9): the two mergeable set sketches whose md5 determinism gives
them FULL value oracles — unlike HLL, whose merges are only
bounds-checkable (the q102 lesson)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataflink_spark.operators.sketches import (
    KMV_DOMAIN,
    bloom_membership,
    bloom_positions,
    kmv_estimate_expr,
    kmv_merge,
    kmv_sketch,
)


def test_kmv_estimate_within_bound_and_deterministic(spark):
    df = spark.range(10_000).select((F.col("id") % 3777).alias("key"))
    sk = kmv_sketch(df, "key", k=256)
    row = sk.select(
        kmv_estimate_expr(256).alias("est"), F.size("ks").alias("n")
    ).collect()[0]
    assert row.n == 256
    # 5-sigma KMV bound: |est - n| <= 5 n / sqrt(k)
    assert (row.est - 3777) ** 2 * 256 <= 25 * 3777 * 3777
    # rerun = identical summary (pure function of the key set)
    again = kmv_sketch(df, "key", k=256).collect()[0].ks
    assert again == sk.collect()[0].ks


def test_kmv_partitioning_invariant(spark):
    df = spark.range(5_000).select((F.col("id") % 997).alias("key"))
    a = kmv_sketch(df, "key", k=128).collect()[0].ks
    b = kmv_sketch(df.repartition(13), "key", k=128).collect()[0].ks
    c = kmv_sketch(df.coalesce(1), "key", k=128).collect()[0].ks
    assert a == b == c


def test_kmv_merge_equals_direct(spark):
    df = spark.range(10_000).select((F.col("id") % 3777).alias("key"))
    direct = kmv_sketch(df, "key", k=256).collect()[0].ks
    slices = [
        kmv_sketch(df.filter(F.col("id") % 4 == i), "key", k=256)
        for i in range(4)
    ]
    merged = kmv_merge(256, *slices).collect()[0].ks
    assert merged == direct


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("key"))
    sk = kmv_sketch(df, "key", k=256)
    row = sk.select(
        kmv_estimate_expr(256).alias("est"), F.size("ks").alias("n")
    ).collect()[0]
    assert row.n == 100 and row.est == 100  # exact when unfilled
    assert all(0 <= v < KMV_DOMAIN for v in sk.collect()[0].ks)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    seen = spark.range(1_000).select((F.col("id") * 7).alias("key"))
    fpos = bloom_positions(seen, "key")
    n_bits = fpos.count()
    assert n_bits <= 16_384
    probes = spark.range(1_500).select((F.col("id") * 7).alias("key"))
    res = {
        r.probe_key: r.member
        for r in bloom_membership(probes, "key", fpos).collect()
    }
    # every inserted key is a member — NO false negatives, ever
    assert all(res[str(i * 7)] for i in range(1_000))
    # deterministic false positives among the 500 absent keys,
    # bounded by 3x the (bits/m)^k expectation
    fp = sum(1 for i in range(1_000, 1_500) if res[str(i * 7)])
    assert fp <= max(3, 3 * 500 * (n_bits / 16_384) ** 4)


def test_bloom_merge_by_union(spark):
    a = spark.range(300).select(F.col("id").alias("key"))
    b = spark.range(300, 600).select(F.col("id").alias("key"))
    both = spark.range(600).select(F.col("id").alias("key"))
    merged = (
        bloom_positions(a, "key")
        .union(bloom_positions(b, "key"))
        .distinct()
    )
    direct = bloom_positions(both, "key")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_overestimate_only_and_additive_merge(spark):
    from bigdataflink_spark.operators.sketches import cms_build, cms_estimate

    df = spark.range(20_000).select(
        F.concat(F.lit("t"), (F.col("id") % 700).cast("string")).alias("k")
    )
    counters = cms_build(df, "k", d=4, w=1_024)
    assert counters.count() <= 4 * 1_024
    probes = spark.createDataFrame(
        [(f"t{i}",) for i in range(0, 700, 37)] + [("absent-x",)], "k string"
    )
    true = {f"t{i}": len(range(i, 20_000, 700)) for i in range(700)}
    true["absent-x"] = 0
    est = {
        r.probe_key: r.est
        for r in cms_estimate(probes, "k", counters, d=4, w=1_024).collect()
    }
    n = 20_000
    for k, e in est.items():
        assert e >= true[k], (k, e, true[k])  # hard guarantee
        assert (e - true[k]) * 1_024 <= 8 * n

    # additive merge: counters of two halves sum to the whole
    h1 = cms_build(df.filter(F.col("id") < 10_000), "k", d=4, w=1_024)
    h2 = cms_build(df.filter(F.col("id") >= 10_000), "k", d=4, w=1_024)
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(counters).count() == 0
    assert counters.exceptAll(merged).count() == 0


def test_kmv_vectorized_identity_vs_semantic_bottom_k(spark):
    """Round-10 (r9 verdict #1): the numpy bottom-k must equal the
    semantic definition — the k smallest DISTINCT hash values — on a
    corpus big enough to overflow k, across multiple Arrow batches
    per partition (the batched threshold/merge path) and multiple
    partitions (the TakeOrdered combine)."""
    from bigdataflink_spark.operators.sketches import kmv_hashes

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        df = (
            spark.range(30_000)
            .select((F.col("id") % 9_111).alias("key"))
            .repartition(7)
        )
        got = kmv_sketch(df, "key", k=256).collect()[0].ks
        exact = [
            r.h
            for r in kmv_hashes(df, "key")
            .distinct()
            .orderBy("h")
            .limit(256)
            .collect()
        ]
        assert got == exact
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_quantile_sketch_bounded_invariant_mergeable(spark):
    """Round-10 quantile sketch: ≤ cap rows, partitioning-invariant,
    merge-by-union == direct, and the retained set is exactly the
    rows under the largest power-of-two threshold with count ≤ cap."""
    from bigdataflink_spark.operators.sketches import (
        quantile_hashes,
        quantile_rethreshold,
        quantile_sketch,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 1_000).alias("val")
    )
    sk = quantile_sketch(df, "k", "val", cap=512)
    rows = sorted((r.h, r.v) for r in sk.collect())
    assert 0 < len(rows) <= 512
    # partitioning-invariant
    rows2 = sorted(
        (r.h, r.v)
        for r in quantile_sketch(df.repartition(11), "k", "val", cap=512).collect()
    )
    assert rows == rows2
    # semantic check: exactly the rows with bit_length(h) <= m*, m*
    # the largest level with cumulative count <= cap
    hv = [(r.h, r.v) for r in quantile_hashes(df, "k", "val").collect()]
    from collections import Counter

    census = Counter(h.bit_length() for h, _ in hv)
    cum, m_star = 0, None
    for lvl in sorted(census):
        cum += census[lvl]
        if cum <= 512:
            m_star = lvl
    expect = sorted((h, v) for h, v in hv if h.bit_length() <= m_star)
    assert rows == expect
    # merge (union + rethreshold) == direct
    hashed = quantile_hashes(df, "k", "val")
    parts = [
        quantile_rethreshold(hashed.filter(F.col("h") % 3 == i), 512)
        for i in range(3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = sorted(
        (r.h, r.v) for r in quantile_rethreshold(u, 512).collect()
    )
    assert merged == rows


def test_quantile_estimate_rank_error(spark):
    """The sample's discrete quantiles stay within 2.5·n/√s rank
    error of the exact quantiles (the q217 contract)."""
    from bigdataflink_spark.operators.sketches import (
        quantile_disc_expr,
        quantile_sketch,
    )

    n = 50_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919) % 100_000).alias("val"),
    )
    sk = quantile_sketch(df, "k", "val", cap=2_048)
    s = sk.count()
    for num, den in ((1, 2), (9, 10), (1, 100)):
        est = sk.agg(quantile_disc_expr((num, den)).alias("e")).collect()[0].e
        rank = df.filter(F.col("val") <= est).count()
        assert (rank * den - num * n) ** 2 * s <= 25 * den * den * n * n, (
            num, den, est, rank, s,
        )


# -- theta set operations (round 10) -----------------------------------------


def test_theta_exact_when_unsaturated(spark):
    # |A|=80, |B|=60, overlap 40 — both sketches unfilled at k=256,
    # so theta = the full domain and every estimate is EXACT
    from bigdataflink_spark.operators.sketches import theta_set_ops

    A = spark.range(0, 80).select(F.col("id").alias("key"))
    B = spark.range(40, 100).select(F.col("id").alias("key"))
    row = theta_set_ops(
        kmv_sketch(A, "key", k=256), kmv_sketch(B, "key", k=256), 256
    ).collect()[0]
    assert row.theta == KMV_DOMAIN
    assert (row.est_inter, row.est_a_only, row.est_b_only) == (40, 40, 20)
    assert row.est_union == 100


def test_theta_disjoint_sets(spark):
    from bigdataflink_spark.operators.sketches import theta_set_ops

    A = spark.range(0, 5_000).select(F.col("id").alias("key"))
    B = spark.range(10_000, 15_000).select(F.col("id").alias("key"))
    row = theta_set_ops(
        kmv_sketch(A, "key", k=256), kmv_sketch(B, "key", k=256), 256
    ).collect()[0]
    assert row.n_inter == 0 and row.est_inter == 0
    # union estimate still within the 5-sigma KMV band
    assert (row.est_union - 10_000) ** 2 * 256 <= 25 * 10_000 * 10_000


def test_theta_saturated_overlap_accuracy(spark):
    # |A|=6000 (0..6000), |B|=6000 (3000..9000), I=3000, U=9000
    from bigdataflink_spark.operators.sketches import theta_set_ops

    A = spark.range(0, 6_000).select(F.col("id").alias("key"))
    B = spark.range(3_000, 9_000).select(F.col("id").alias("key"))
    row = theta_set_ops(
        kmv_sketch(A, "key", k=256), kmv_sketch(B, "key", k=256), 256
    ).collect()[0]
    assert row.theta < KMV_DOMAIN  # genuinely estimating
    for est, true in (
        (row.est_inter, 3_000),
        (row.est_a_only, 3_000),
        (row.est_b_only, 3_000),
        (row.est_union, 9_000),
    ):
        assert (est - true) ** 2 * 256 <= 25 * 9_000 * 9_000, (est, true)
    # identity: the three parts sum to the union estimate modulo the
    # independent DIV roundings (each floors once)
    assert (
        0
        <= row.est_union - (row.est_inter + row.est_a_only + row.est_b_only)
        <= 3
    )


def test_theta_subset_relation(spark):
    # B a subset of A: est_b_only must be identically zero — below
    # theta every B-hash is also an A-hash by construction
    from bigdataflink_spark.operators.sketches import theta_set_ops

    A = spark.range(0, 8_000).select(F.col("id").alias("key"))
    B = spark.range(0, 2_000).select(F.col("id").alias("key"))
    row = theta_set_ops(
        kmv_sketch(A, "key", k=256), kmv_sketch(B, "key", k=256), 256
    ).collect()[0]
    assert row.n_b_only == 0 and row.est_b_only == 0


def test_theta_symmetry_and_union_consistency(spark):
    # symmetry: swapping A and B swaps the difference counts and
    # leaves theta / intersection / union identical; the theta union
    # estimate agrees with the kmv_merge estimate whenever the merged
    # sketch's theta equals min(theta_a, theta_b) (always true here:
    # the union's kth smallest <= either side's kth smallest <= ...
    # checked explicitly rather than assumed)
    from bigdataflink_spark.operators.sketches import theta_set_ops

    A = spark.range(0, 7_000).select(F.col("id").alias("key"))
    B = spark.range(4_000, 12_000).select(F.col("id").alias("key"))
    sa, sb = kmv_sketch(A, "key", k=256), kmv_sketch(B, "key", k=256)
    ab = theta_set_ops(sa, sb, 256).collect()[0]
    ba = theta_set_ops(sb, sa, 256).collect()[0]
    assert ab.theta == ba.theta
    assert (ab.n_inter, ab.est_inter) == (ba.n_inter, ba.est_inter)
    assert (ab.n_a_only, ab.n_b_only) == (ba.n_b_only, ba.n_a_only)
    assert ab.est_union == ba.est_union
    merged = kmv_merge(256, sa, sb)
    m = merged.select(
        kmv_estimate_expr(256).alias("est"),
        F.element_at("ks", 256).alias("kth"),
    ).collect()[0]
    if m.kth is not None and m.kth == ab.theta:
        # same theta => identical sub-theta sample => same estimate
        # up to the DIV roundings of the split parts (<= 3 floors)
        assert 0 <= m.est - ab.est_union <= 3 or 0 <= ab.est_union - m.est <= 3


def test_quantile_stream_parity_random_slicings(spark, tmp_path):
    # the streaming twin must equal the batch sketch of the prefix for
    # ANY batch slicing — three different deterministic slicings of
    # the same corpus, including a pathological tiny-first-batch one
    from bigdataflink_spark.operators.sketches import quantile_sketch
    from bigdataflink_spark.streaming import quantsketch

    df = spark.range(8_000).select(
        F.col("id").alias("key"), (F.col("id") % 613).cast("double").alias("v")
    )
    slicings = {
        "mod4": [F.col("key") % 4 == i for i in range(4)],
        "skew": [F.col("key") < 10, (F.col("key") >= 10) & (F.col("key") < 4000),
                 F.col("key") >= 4000],
        "hash": [F.md5(F.col("key").cast("string")).substr(1, 1) < "8",
                 F.md5(F.col("key").cast("string")).substr(1, 1) >= "8"],
    }
    for name, preds in slicings.items():
        state = f"{tmp_path}/{name}/state"
        prefix = None
        for b, pred in enumerate(preds):
            batch = df.filter(pred)
            got = quantsketch.accept_batch(spark, batch, state, b, cap=512)
            prefix = batch if prefix is None else prefix.unionByName(batch)
            want = quantile_sketch(prefix, "key", "v", cap=512)
            gh = sorted(r.h for r in got.select("h").collect())
            wh = sorted(r.h for r in want.select("h").collect())
            assert gh == wh, (name, b)


def test_bloom_membership_bits_identical_verdicts(spark):
    """The bitset membership path must produce verdicts IDENTICAL to
    the join path on every probe — same md5 position formula, only
    the plan differs (zero verdict-leg shuffles)."""
    from bigdataflink_spark.operators.sketches import (
        bloom_membership,
        bloom_membership_bits,
        bloom_positions,
    )

    keys = spark.createDataFrame(
        [(f"k{i}",) for i in range(300)], "key string"
    )
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(250, 600)]
        + [("zz-absent",), (None,)],  # NULL probe: both paths => false
        "key string",
    )
    state = bloom_positions(keys, "key", m=512, k=4)  # small m -> real FPs
    a = {
        r.probe_key: r.member
        for r in bloom_membership(probes, "key", state, m=512, k=4).collect()
    }
    b = {
        r.probe_key: r.member
        for r in bloom_membership_bits(
            probes, "key", state, m=512, k=4
        ).collect()
    }
    assert a == b
    # no false negatives on either path
    assert all(a[f"k{i}"] for i in range(250, 300))
    # a NULL key was never inserted: verdict is False (not NULL) on
    # BOTH paths — the bitset path coalesces its NULL-propagating
    # AND-chain to match the join path's count-based false (ADVICE
    # r11: verdict parity for NULL probes)
    assert a[None] is False and b[None] is False
