"""Graph / link-analysis operators.

``pagerank_integer`` is the iterative-fixpoint family member next to
``dedup.dedup_clusters`` (min-label propagation): a driver-side loop
over pure DataFrame ops, each iteration one keyed join + one keyed
aggregation over the EDGE list — the standard distributed PageRank
shape (shuffle ∝ |E| per iteration, no adjacency materialization, no
driver-side graph).

All arithmetic is integer micro-units (score·1e6 as BIGINT, DIV for
floors) so ranks are bit-identical across engines and partitionings —
the cross-engine determinism rule (plans/queries.py header) applied
to an iterative algorithm: the oracle can unroll the same iterations
in SQL and match exactly, which a float PageRank never would.

Semantics (documented simplifications, standard for the
integer-exact variant):

* damping: new = (1-d)/N + d·Σ contrib, computed as
  ``((1000000 - d_micro)·1000000 DIV N DIV 1000000) + (d_micro·Σ) DIV
  1000000`` — floors at each step, so total mass shrinks by the floor
  residue each round (bounded by N + |E| micro-units).
* dangling nodes (no out-edges) leak their mass — the usual
  simplification; redistributing it would add one extra tiny agg.
* weighted edges: a node's score splits ∝ edge weight,
  ``contrib = (score·w) DIV w_out_total``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_micro: int = 850_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank_micro) after ``iterations`` rounds from a uniform
    start, all in BIGINT micro-units. Nodes = every distinct src or
    dst. Each round: one broadcast-or-shuffle join of scores onto
    edges + one dst-keyed sum — linear in |E| per round."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError(
            "pagerank_integer: empty edge list (no nodes to rank)"
        )
    out_tot = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    e_norm = e.join(out_tot, "src").persist()
    try:
        base = (MICRO - damping_micro) * MICRO // n_nodes // MICRO
        scores = nodes.select(
            "node", F.lit(MICRO // n_nodes).cast("long").alias("rank_micro")
        )
        for _ in range(iterations):
            contribs = (
                e_norm.join(
                    scores.withColumnRenamed("node", "src"), "src"
                )
                .select(
                    F.col("dst").alias("node"),
                    F.expr("(rank_micro * w) DIV w_out").alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("c_sum"))
            )
            # Cut lineage each round (same pattern as dedup_clusters /
            # greedy_leader_filter): without this the plan re-derives
            # every prior round's join+agg on any action, the classic
            # iterative-Spark failure at convergence-level iteration
            # counts. Truncation is plan-side only — values unchanged.
            scores = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (
                        F.lit(base).cast("long")
                        + F.expr(
                            f"({damping_micro}L * coalesce(c_sum, 0L)) DIV {MICRO}L"
                        )
                    ).alias("rank_micro"),
                )
                .localCheckpoint(eager=True)
            )
        return scores
    finally:
        e_norm.unpersist()
