"""Scale-hardening contracts for the MinHash LSH family (VERDICT r6
#3/#4): exact-fingerprint collapse before banding, the per-bucket
representative cap + census audit, and convergence-or-raise in the
iterative resolvers."""

from __future__ import annotations

import pytest

from bigdataflink_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def _mixed_corpus(spark):
    """Clone groups + near-dups + distinct + too-short docs: every
    branch of the collapsed pipeline."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        # clone group A (identical token streams, ids interleaved)
        (1, base), (5, base), (9, base),
        # clone group B, near-dup of A
        (2, near), (7, near),
        # distinct doc
        (3, "completely different words about ships and harbors at dawn"),
        # too short for 3-gram shingles — must never appear in pairs
        (4, "two words"),
        (8, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_collapsed_pipeline_matches_direct(spark):
    docs = _mixed_corpus(spark)
    direct = dedup.minhash_dedup_pairs(
        docs, threshold=0.5, collapse_exact=False, max_bucket=None
    )
    collapsed = dedup.minhash_dedup_pairs(docs, threshold=0.5)
    assert _pairs_set(collapsed) == _pairs_set(direct)
    # sanity: the fixture actually exercises both intra (clones) and
    # cross (A~B near-dup) expansion
    got = _pairs_set(collapsed)
    assert (1, 5, 1.0) in got and (5, 9, 1.0) in got  # intra A
    assert (2, 7, 1.0) in got  # intra B
    assert any(a in (1, 5, 9) and b in (2, 7) or a in (2, 7) and b in (1, 5, 9)
               for a, b, _ in got)  # cross A×B


def test_collapsed_pipeline_matches_direct_on_fixture(spark):
    from bigdataflink_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    direct = dedup.minhash_dedup_pairs(
        docs, threshold=0.8, collapse_exact=False, max_bucket=None
    )
    collapsed = dedup.minhash_dedup_pairs(docs, threshold=0.8)
    assert _pairs_set(collapsed) == _pairs_set(direct)


def test_mega_cluster_candidates_stay_linear(spark):
    # k clones of one document: the rep pipeline must see ONE doc —
    # zero LSH candidate pairs, zero verify work — while the expanded
    # output still owes all k(k-1)/2 jaccard-1.0 pairs.
    k = 60
    text = "the same boilerplate sentence repeated across the corpus shard"
    docs = spark.createDataFrame(
        [(i, text) for i in range(k)], "doc_id long, text string"
    )
    members = docs.selectExpr("doc_id", "text")
    groups = dedup.minhash_signatures(
        docs.limit(0).unionByName(docs).dropDuplicates(["text"])
    )
    # collapsed signature table = one row; its LSH join yields nothing
    assert groups.count() == 1
    assert dedup.lsh_candidate_pairs(groups).count() == 0
    out = dedup.minhash_dedup_pairs(members, threshold=0.8)
    rows = out.collect()
    assert len(rows) == k * (k - 1) // 2
    assert all(r.jaccard == 1.0 for r in rows)


def test_max_bucket_caps_join_and_census_reports_overflow(spark):
    # 8 DISTINCT docs engineered into one band bucket is impossible to
    # fabricate from text alone, so drive lsh_candidate_pairs with a
    # synthetic signature table: all 8 share every band signature.
    rows = [tuple([i] + [7] * 16) for i in range(8)]
    schema = "doc_id long, " + ", ".join(f"mh{p} long" for p in range(16))
    sigs = spark.createDataFrame(rows, schema)
    full = dedup.lsh_candidate_pairs(sigs, max_bucket=None)
    assert full.count() == 8 * 7 // 2
    capped = dedup.lsh_candidate_pairs(sigs, max_bucket=3)
    # only ids {0,1,2} survive per bucket → 3 pairs
    assert _pairs_set(capped.selectExpr("id_a", "id_b", "0.0 as jaccard")) == {
        (0, 1, 0.0), (0, 2, 0.0), (1, 2, 0.0)
    }
    census = {r.band: r for r in dedup.lsh_bucket_census(sigs, max_bucket=3).collect()}
    assert set(census) == {0, 1, 2, 3}
    for band in census.values():
        assert band.max_bucket_size == 8
        assert band.n_overflow_buckets == 1
        assert band.n_docs_beyond_cap == 5
    # uncapped census reads clean
    clean = dedup.lsh_bucket_census(sigs, max_bucket=None).collect()
    assert all(r.n_overflow_buckets == 0 and r.n_docs_beyond_cap == 0 for r in clean)


def test_greedy_leader_long_chain_converges(spark):
    # chain 0~1~2~...~30 needs ~30 rounds — past the old silent 25 cap;
    # greedy keeps the even ids
    n = 31
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    kept = {
        r.doc_id
        for r in dedup.greedy_leader_filter(docs, pairs).filter("keep").collect()
    }
    assert kept == {i for i in range(n) if i % 2 == 0}


def test_greedy_leader_raises_past_cap(spark):
    n = 12
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not reach a fixed point"):
        dedup.greedy_leader_filter(docs, pairs, max_iters=3)


def test_dedup_clusters_raises_past_cap(spark):
    n = 12
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(pairs, docs, max_iters=2)
