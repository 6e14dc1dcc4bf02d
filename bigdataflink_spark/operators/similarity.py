"""Similarity search over an embedding column (array<float>).

Variants:

* ``cosine_topk_bruteforce`` — exact top-k; the correctness baseline.
  One broadcast of the (small) query set against the corpus: the
  corpus never shuffles, scoring is a JVM-side fold over the array.
* ``ivf_topk`` — the scale path: coarse-quantize the corpus into
  cells (here: per-`label` centroids, i.e. a pre-computed IVF list),
  route each query to its nearest centroid, and score only that cell.
  At 1000 executors this turns an all-pairs scan into
  O(n_cells + cell_size·k) per query; cells are the partition key, so
  scoring is shuffle-free after one repartition.
* ``cosine_neardup_pairs`` — embedding near-duplicate detection
  (threshold, id_a < id_b).

Efficiency: norms are computed ONCE per vector on each join side
(never per pair); the per-pair work is a single dot-product fold.

Determinism: dot products are left-to-right folds over the array in
both Spark (``aggregate``) and the DuckDB oracle
(``list_sum(list_transform(...))``), on doubles cast from identical
floats — bit-identical, then rounded for output. Ranking ties broken
by neighbor id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """One-shot cosine (norms recomputed — prefer the precomputed-norm
    join pattern below for anything bigger than a routing table)."""
    return dot(a, b) / (norm(a) * norm(b))


def _sided(df: DataFrame, id_col: str, vec_col: str, side: str) -> DataFrame:
    """Project (id, vec, norm) with side-prefixed names; norm computed
    once per vector, before any join multiplies the row out."""
    return df.select(
        F.col(id_col).alias(f"{side}_id"),
        F.col(vec_col).alias(f"{side}_vec"),
        norm(F.col(vec_col)).alias(f"{side}_norm"),
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Output: query_id, neighbor_id, cos (rounded 6dp), rank 1..k.
    Queries are broadcast (small by construction); self-matches
    excluded.
    """
    q = _sided(queries, id_col, vec_col, "q")
    c = _sided(corpus, id_col, vec_col, "c")
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
        .select(
            F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id"), "cos"
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def label_centroids(
    corpus: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Per-cell centroid vectors: (label, centroid array<double>).

    posexplode → avg per (cell, position) → re-assemble ordered array.
    Components rounded so downstream scoring is oracle-reproducible.
    At extreme scale, replace with a treeAggregate-style partial
    vector sum per partition; semantics identical.
    """
    exploded = corpus.select(
        F.col(label_col), F.posexplode(vec_col).alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    per_pos = exploded.groupBy(label_col, "pos").agg(F.round(F.avg("v"), round_dp).alias("c"))
    return (
        per_pos.groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pairs"))
        .select(label_col, F.transform("pairs", lambda p: p["c"]).alias("centroid"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style ANN: route each query to its ``nprobe`` nearest cell
    centroids, then exact top-k within those cells only.

    ``nprobe`` is the standard recall/cost dial: 1 scans a single
    cell; n_cells degenerates to exact brute force (asserted in
    tests — the ANN result converges to the exact one as probes
    grow). Output: query_id, probe_label, neighbor_id, cos, rank.
    """
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # route: nearest centroid per query (centroid table is tiny -> broadcast)
    routed = (
        q.join(F.broadcast(cents))
        .withColumn("ccos", F.round(cosine(F.col("q_vec"), F.col("centroid")), 6))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc(label_col))
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "q_vec", norm(F.col("q_vec")).alias("q_norm"),
                F.col(label_col).alias("probe_label"))
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
        F.col(label_col).alias("probe_label"),
    )
    scored = (
        c.join(F.broadcast(routed), "probe_label")
        .filter(F.col("c_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
        .select("query_id", "probe_label", F.col("c_id").alias("neighbor_id"), "cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "probe_label", "neighbor_id", "cos", "rank")
    )


BRUTEFORCE_MAX_ROWS = 10_000


def guard_bruteforce(corpus: DataFrame, what: str, scale_path: str) -> None:
    """Mechanical stop for the O(n²) oracle tools (VERDICT r2 #3): an
    all-pairs self-join above ~10⁴ rows is a scale-killer whether or
    not the docstring says so. Raises with a pointer to the bucketed
    path. One count() — trivial next to the join it prevents."""
    n = corpus.count()
    if n > BRUTEFORCE_MAX_ROWS:
        raise ValueError(
            f"{what} is an all-pairs O(n²) oracle tool, refused at "
            f"n={n} rows (limit {BRUTEFORCE_MAX_ROWS}); use the "
            f"bucketed scale path {scale_path} instead, or pass a "
            f"sampled/limited corpus explicitly."
        )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (id_a < id_b).

    All-pairs here (corpus joined to itself) — an ORACLE TOOL:
    guard_bruteforce refuses corpora above ~10⁴ rows; the scale path
    is sign_lsh_neardup_pairs (same output schema, bucketed).
    """
    guard_bruteforce(
        corpus, "cosine_neardup_pairs", "sign_lsh_neardup_pairs"
    )
    a = _sided(corpus, id_col, vec_col, "a")
    b = _sided(corpus, id_col, vec_col, "b")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm")), 6
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"), "cos")
    )


def auto_rows_per_band(n: int, dim: int, bands: int) -> int:
    """Scale-safe band width for sign-LSH: ⌈log2 n⌉ keeps the bucket
    count per band (2^rows_per_band) ≥ n, so expected candidates stay
    ∝ bands·n rather than ∝ n² (the r2 probe's super-linear finding
    for any FIXED width). Clamped to [4, dim // bands] — the axis-
    hyperplane scheme can't draw more bits than the vector has dims;
    past that cap, switch to seeded random projections."""
    want = max(4, (max(n, 2) - 1).bit_length())  # ceil(log2 n)
    return max(1, min(want, dim // max(bands, 1)))


def sign_lsh_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    bands: int = 4,
    rows_per_band: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via random-hyperplane-style LSH, with the
    coordinate axes as the (deterministic) hyperplanes: bit k = sign
    of component k. Vectors sharing ANY band of sign bits become
    candidates; exact cosine runs only on candidates.

    Tuning: P(bit agrees) = 1 - angle/pi, so a band of r bits matches
    with p^r — more rows_per_band = fewer candidates, lower recall;
    more bands = the reverse.

    SCALING LAW (measured, tools/scale_probe.py 100× tier): expected
    candidates ≈ bands · n²/2^rows_per_band — the bucket count per
    band is CONSTANT (2^rows_per_band), so with rows_per_band fixed
    the candidate set grows quadratically in corpus size. Hence
    ``rows_per_band=None`` (the default) DERIVES it from the corpus:
    ⌈log2 n⌉ clamped to [4, dim // bands], which keeps the bucket
    count ≥ n (candidates ∝ n, probe-verified ~linear wall-clock at
    ×100 data) — at 200k 64-dim vectors it lands on 4×16, the config
    the r2 probe validated, while a fixed 4×4 previously hung for
    10+ minutes (VERDICT r2 #1). Callers needing bit-pinned recall
    (the q49 oracle fixture) pass it explicitly. The derivation costs
    one count() + one first() on the corpus — O(metadata) next to the
    join it configures. Axis hyperplanes (not random ones) keep the
    oracle bit-reproducible; at production scale substitute seeded
    random projections (needed anyway once rows_per_band must exceed
    the dimension count) — the operator shape is identical.
    """
    dim = (
        corpus.select(F.size(F.col(vec_col)).alias("d")).first() or {"d": 0}
    )["d"] or 0
    if dim <= 0:
        # empty corpus (or zero-length vectors): no pairs, by
        # definition — short-circuit BEFORE the band-geometry checks,
        # which would otherwise reject any rows_per_band against dim=0
        return corpus.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos double"
        )
    if rows_per_band is None:
        n = corpus.count()
        rows_per_band = auto_rows_per_band(n, dim, bands)
    if rows_per_band > dim:
        raise ValueError(
            f"sign-LSH cannot draw {rows_per_band} bits per band from "
            f"{dim}-dim vectors — use fewer/narrower bands or exact pairing"
        )
    # nbits must never exceed the vector dimension: a band slicing past
    # the end would yield bsig '' for EVERY vector, collapsing that
    # band into one global bucket and degrading candidate generation to
    # the quadratic all-pairs this scheme exists to avoid. Bands that
    # don't fit are dropped (recall falls with the band count — the
    # caller asked for more bits than the vectors carry).
    bands = min(bands, dim // rows_per_band)
    nbits = bands * rows_per_band
    bits = F.transform(
        F.slice(F.col(vec_col), 1, nbits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    sided = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
        bits.alias("_bits"),
    )
    banded = sided.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "", F.slice("_bits", b * rows_per_band + 1, rows_per_band)
                        ).alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bsig")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    a = sided.select(
        F.col("id").alias("id_a"), F.col("vec").alias("a_vec"), F.col("nrm").alias("a_norm")
    )
    b = sided.select(
        F.col("id").alias("id_b"), F.col("vec").alias("b_vec"), F.col("nrm").alias("b_norm")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "cos",
            F.round(
                dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm")), 6
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy twin of ``cosine_topk_bruteforce``: the vectorized
    Pandas-UDF scale path. The (small) query set is collected once and
    closed over; each Arrow batch of the corpus scores against ALL
    queries with numpy — per batch, one O(batch × dims × n_queries)
    array pass instead of a per-pair expression tree. The corpus never
    shuffles until the final per-query top-k window.

    Bit-parity with the JVM fold (and thus the q24 DuckDB oracle) is
    preserved by accumulating the dot product and squared norms
    LEFT-TO-RIGHT over dimensions (vectorized across rows) — IEEE adds
    in the same order as ``F.aggregate``'s fold — and by leaving the
    6dp rounding and ranking to the same Spark expressions the
    brute-force variant uses.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    qids = [int(r[0]) for r in q_rows]
    qmat = np.asarray([r[1] for r in q_rows], dtype=np.float64)

    def _seq_sq_norm(mat: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(mat.shape[0])
        for d in range(mat.shape[1]):
            acc = acc + mat[:, d] * mat[:, d]
        return np.sqrt(acc)

    q_norm = _seq_sq_norm(qmat)

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            dots = np.zeros((cmat.shape[0], qmat.shape[0]))
            cn = np.zeros(cmat.shape[0])
            for d in range(cmat.shape[1]):
                col = cmat[:, d]
                cn = cn + col * col
                dots = dots + col[:, None] * qmat[None, :, d]
            cos = dots / (q_norm[None, :] * np.sqrt(cn)[:, None])
            nids = pdf[id_col].to_numpy()
            for j, qid in enumerate(qids):
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": nids, "cos": cos[:, j]}
                )

    scored = corpus.mapInPandas(
        _score, schema="query_id long, neighbor_id long, cos double"
    )
    scored = scored.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cos", F.round("cos", 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def knn_label_vote(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-vote classification: for each query vector, the
    modal label among its k nearest corpus neighbors by cosine.

    Output: (query_id, label, pred_label, votes) — ``label`` is the
    query's own label (so the result doubles as a leave-one-out
    accuracy audit), ``votes`` the winner's neighbor count. Ties break
    deterministically: most votes, then best (max) top cosine within
    the label, then smallest label.

    Shape: the top-k join is ``cosine_topk_bruteforce`` (query side
    broadcast, corpus never shuffles); the vote adds one narrow
    groupBy on (query, label) over k rows per query plus a window —
    negligible next to the scoring pass. For web-scale corpora swap
    the scorer for ``ivf_topk`` (same output contract), the vote
    logic is scorer-agnostic.
    """
    topk = cosine_topk_bruteforce(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("_nlabel")
    )
    votes = (
        topk.join(labels, "neighbor_id")
        .groupBy("query_id", "_nlabel")
        .agg(F.count("*").alias("votes"), F.max("cos").alias("_best"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.desc("_best"), F.asc("_nlabel")
    )
    winner = (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("_nlabel").alias("pred_label"), "votes")
    )
    own = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("label")
    )
    return winner.join(F.broadcast(own), "query_id").select(
        "query_id", "label", "pred_label", "votes"
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    bands: int = 4,
    exact_cell_limit: int = 20_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: a vector is DROPPED iff
    some smaller-id vector in the SAME cell has cosine >= threshold
    with it (first-arrival representative wins — deterministic, no
    RNG). Output: (id, cell, dropped).

    The cell assignment (here: the corpus's cluster/label column —
    produce one with ``ivf`` centroids or any clustering upstream)
    bounds the pairing: the join keys on the cell, so the quadratic
    term is cell size, never the corpus — the published SemDeDup
    design (cluster with k-means, then prune within clusters).

    CELLS THAT OUTGROW THEIR CLUSTERING are the constant-bucket-space
    trap (a FIXED cell count makes within-cell pairs ∝ n²/cells — the
    same law the 100× probes caught in fixed-width sign-LSH and
    q-gram blocking). So when the largest cell exceeds
    ``exact_cell_limit``, candidate generation auto-switches to
    sign-LSH WITHIN the cell: band signatures at
    ``auto_rows_per_band`` width derived from the max cell size,
    candidates keyed on (cell, band, bsig), exact cosine on
    candidates only. Below the limit (every test fixture) pairing is
    exhaustive and the drop verdicts match the EXISTS oracle exactly;
    above it recall follows the sign-LSH law (near-identical vectors
    agree on all sign bits, so true semantic duplicates at high
    thresholds are retained with probability ≈ bands·p^r) — the same
    exact-below/derived-above tiering as q49's fixture pin.
    """
    left = corpus.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_norm"),
        F.col(cell_col).alias("_cell"),
    )
    right = corpus.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_norm"),
        F.col(cell_col).alias("_cell"),
    )
    stats = (
        corpus.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n").alias("mx"))
        .first()
    )
    max_cell = int(stats["mx"] or 0)
    dim = (
        corpus.select(F.size(F.col(vec_col)).alias("d")).first() or {"d": 0}
    )["d"] or 0
    # Guard nbits <= dim for the LSH tier: with dim < bands the
    # auto_rows_per_band clamp lands on rpb=1 and bands*rpb would
    # slice past the vector end — every vector in a cell would share
    # bsig '' for the overhanging bands, collapsing them into one
    # global bucket and degrading candidate generation to exactly the
    # quadratic within-cell pairing the LSH path exists to avoid. Too
    # few dims to band over means sign-LSH has no signal at all, so
    # such corpora stay on the exact path regardless of cell size.
    if max_cell <= exact_cell_limit or dim < bands:
        cand = (
            left.select("a_id", "_cell")
            .join(right.select("b_id", "_cell"), "_cell")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )
    else:
        rpb = auto_rows_per_band(max_cell, dim, bands)
        bands = min(bands, dim // rpb)  # drop bands that can't fit
        nbits = bands * rpb
        bits = F.transform(
            F.slice(F.col(vec_col), 1, nbits),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        )
        banded = corpus.select(
            F.col(id_col).alias("id"),
            F.col(cell_col).alias("_cell"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.concat_ws(
                                "", F.slice(bits, b * rpb + 1, rpb)
                            ).alias("bsig"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("id", "_cell", "bb.band", "bb.bsig")
        cand = (
            banded.alias("x")
            .join(
                banded.alias("y"),
                (F.col("x._cell") == F.col("y._cell"))
                & (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bsig") == F.col("y.bsig"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
            .distinct()
        )
    dropped_ids = (
        cand.join(left.drop("_cell"), "a_id")
        .join(right.drop("_cell"), "b_id")
        .withColumn(
            "cos",
            F.round(
                dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_norm") * F.col("b_norm")),
                6,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("b_id").alias("_did"))
        .distinct()
    )
    return (
        corpus.select(
            F.col(id_col).alias("id"), F.col(cell_col).alias("cell")
        )
        .join(dropped_ids, F.col("id") == F.col("_did"), "left")
        .select(
            "id", "cell", F.col("_did").isNotNull().alias("dropped")
        )
    )


# -- int8 embedding quantization (round 10) ---------------------------------


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max |component|
    (as double), q_i = clamp(floor(x_i·127/scale), -127, 127). The
    100 TB embedding-store shape — 4× smaller vectors whose scoring
    needs only integer multiply-adds (SIMD-friendly on any engine),
    the standard first rung of ANN compression below full precision
    and above product quantization.

    Every step is deterministic IEEE double arithmetic + floor, so a
    DuckDB twin reproduces each quantized COMPONENT bit-for-bit — no
    round-half mode ambiguity (the reason this uses floor, not
    round). All-zero vectors quantize to all zeros (guarded divide).
    Returns (id, *extra_cols, qvec array<int>, scale double) —
    ``extra_cols`` ride the scan projection so a caller that needs a
    sibling column (q228's cell label) doesn't pay a corpus
    self-join to re-attach it. ``extra_cols`` must be disjoint from
    the operator's own output/internal names — a passthrough column
    named ``id``/``x``/``scale``/``qvec`` would silently shadow or
    duplicate them (ADVICE r13)."""
    _reserved = {"id", "x", "scale", "qvec"}
    bad = _reserved.intersection(extra_cols)
    if bad:
        raise ValueError(
            f"quantize_int8 extra_cols collide with reserved "
            f"output/internal column names: {sorted(bad)}"
        )
    d = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))").alias("x"),
    ).withColumn(
        "scale", F.array_max(F.expr("transform(x, v -> abs(v))"))
    )
    qv = (
        "CASE WHEN scale = 0.0 THEN transform(x, v -> 0)"
        " ELSE transform(x, v -> CAST(GREATEST(-127.0,"
        " LEAST(127.0, floor(v * 127.0 / scale))) AS INT)) END"
    )
    return d.select("id", *extra_cols, F.expr(qv).alias("qvec"), "scale")


def int8_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two int8-quantized vectors."""
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")
    )
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


def int8_topk(
    corpus_q: DataFrame, queries_q: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k by QUANTIZED COSINE: qdot/√(qdot_cc) with the query's
    own norm constant per group — the int8 mirror of cosine ranking
    (per-vector scales cancel out of cosine, so normalizing by the
    quantized self-norms recovers it up to quantization noise; raw
    integer dot would instead rank by max-abs normalization and lose
    recall). The cross products and both self-norms are exact int64;
    the only float op is one correctly-rounded IEEE divide+sqrt, so
    the ranking is engine-independent and the retrieval carries a
    FULL value oracle. Queries broadcast; self-matches excluded.
    Input frames are quantize_int8 outputs; self-norms are computed
    once per side, not per pair."""
    q = queries_q.select(
        F.col("id").alias("query_id"), F.col("qvec").alias("q_qv")
    )
    c = corpus_q.select(
        F.col("id").alias("neighbor_id"), F.col("qvec").alias("c_qv")
    ).withColumn("c_nn", int8_dot(F.col("c_qv"), F.col("c_qv")))
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).filter(
        # ADVICE r10: an all-zero corpus vector has c_nn = 0, so
        # qscore = 0/sqrt(0) = NaN — and Spark sorts NaN LARGEST,
        # ranking zero vectors top-1 for every query. Zero vectors
        # carry no direction; exclude them (oracle mirrors).
        F.col("c_nn") > 0
    ).select(
        "query_id",
        "neighbor_id",
        int8_dot(F.col("q_qv"), F.col("c_qv")).alias("qdot"),
        "c_nn",
    ).withColumn(
        "qscore",
        F.col("qdot").cast("double")
        / F.sqrt(F.col("c_nn").cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qscore"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qdot", "c_nn", "rank")
    )


# -- product quantization (round 10) -----------------------------------------


def _pq_subvectors(
    df: DataFrame, id_col: str, vec_col: str, nsub: int, dsub: int,
    out_id: str,
) -> DataFrame:
    """Explode vectors into (id, sub, sv) sub-vector rows (double)."""
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))").alias(
                "x"
            ),
        )
        .select(
            out_id,
            F.explode(
                F.expr(
                    f"transform(sequence(0, {nsub - 1}), s -> "
                    f"struct(s AS sub, slice(x, s*{dsub}+1, {dsub}) AS sv))"
                )
            ).alias("p"),
        )
        .select(out_id, "p.sub", F.col("p.sv").alias("sv"))
    )


def pq_codebook(
    corpus: DataFrame,
    nsub: int = 8,
    dsub: int = 8,
    ncent: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sampled PQ codebook: the sub-vectors of the ``ncent`` lowest
    ids serve as centroids (deterministic, training-free — the
    k-means-trained variant changes only this frame). Returns
    (sub, cent, cv) with cent = 0..ncent-1; ncent·nsub rows, always
    broadcastable."""
    cents = corpus.filter(F.col(id_col) < ncent)
    return _pq_subvectors(cents, id_col, vec_col, nsub, dsub, "cent").select(
        F.col("cent").cast("int").alias("cent"), "sub",
        F.col("sv").alias("cv"),
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    nsub: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: "str | None" = None,
    cb_arr=None,
) -> DataFrame:
    """Encode vectors to ``nsub`` byte-sized codes: per subspace,
    argmin squared L2 to the codebook (ties broken by centroid id —
    struct ordering is lexicographic, so ``array_min`` over
    (d2, cent) structs IS the deterministic argmin). Returns
    (id, codes array<int>): 8 bytes per 64-dim vector at the
    defaults, a 32× compression — the rung below int8's 4× for a
    100 TB embedding store.

    Scale shape: ONE Arrow map stage over the corpus scan — the
    codebook is a bounded driver-side collect (ncent·nsub·dsub
    doubles) broadcast into numpy, where each batch computes all
    n × ncent distances per subspace with dimension-ordered
    accumulation (8 vectorized adds — the same left-to-right fold
    the SQL oracle runs, so every d2 is bit-identical) and argmin's
    first-minimum gives the lowest-centroid tiebreak. ZERO shuffles.
    (Two earlier cuts: a per-(id, sub)-windowed argmin shuffled
    n·nsub·ncent rows — ×10 wall at the ×100 probe; an
    array-expression projection avoided the shuffle but paid ~4k
    INTERPRETED HOF ops per row — ~50 s per 900k rows. This shape
    encodes the same 900k rows in ~2 s.)

    ``cb_arr``: optional pre-collected dense (nsub, ncent, dsub)
    numpy codebook — a FROZEN-codebook caller (streaming/pqindex.py)
    collects and density-checks it once at bootstrap instead of
    paying the collect job every trigger. ``codebook`` is ignored
    when given."""
    import numpy as np
    import pandas as pd

    if cb_arr is not None:
        spark = corpus.sparkSession
        return _pq_encode_stage(
            spark, corpus, cb_arr, nsub, dsub, id_col, vec_col, label_col
        )
    cb_rows = codebook.collect()  # bounded: ncent x nsub x dsub
    # ADVICE r10: a sparse/empty codebook (corpus without ids
    # 0..ncent-1) would otherwise crash opaquely on max() or leave
    # zero-filled centroid rows that silently skew every assignment
    if not cb_rows:
        raise ValueError(
            "pq_encode: empty codebook — the corpus has no vectors "
            "with ids below ncent (pq_codebook samples centroids by "
            "lowest id); pass a corpus containing them or a trained "
            "codebook frame."
        )
    ncent = max(r.cent for r in cb_rows) + 1
    seen = {(r.sub, r.cent) for r in cb_rows}
    missing = [
        (s, c)
        for s in range(nsub)
        for c in range(ncent)
        if (s, c) not in seen
    ]
    if missing:
        raise ValueError(
            f"pq_encode: codebook is sparse — missing (sub, cent) "
            f"entries {missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"of the dense 0..{nsub - 1} x 0..{ncent - 1} grid; "
            f"zero-filling them would skew every assignment."
        )
    cb = np.zeros((nsub, ncent, dsub), dtype=np.float64)
    for r in cb_rows:
        cb[r.sub, r.cent, :] = r.cv
    spark = corpus.sparkSession
    return _pq_encode_stage(
        spark, corpus, cb, nsub, dsub, id_col, vec_col, label_col
    )


def _pq_encode_stage(
    spark,
    corpus: DataFrame,
    cb,
    nsub: int,
    dsub: int,
    id_col: str,
    vec_col: str,
    label_col: "str | None",
) -> DataFrame:
    """The Arrow encode stage of pq_encode over an already-dense
    (nsub, ncent, dsub) numpy codebook (see pq_encode)."""
    import numpy as np
    import pandas as pd

    bc = spark.sparkContext.broadcast(cb)
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if label_col is not None:
        # pass the cell label through the encode stage (IVF-PQ: at
        # deployment the code store is partitioned by cell, so codes
        # carry their cell without a corpus-sized join-back)
        cols.append(F.col(label_col).cast("int").alias("label"))
    src = corpus.select(*cols)

    def _encode(it):
        cb_ = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            n = x.shape[0]
            codes = np.empty((n, nsub), dtype=np.int32)
            for s in range(nsub):
                xs = x[:, s * dsub : (s + 1) * dsub]  # (n, dsub)
                cents = cb_[s]  # (ncent, dsub)
                d = xs[:, 0:1] - cents[None, :, 0]
                d2 = d * d
                for i in range(1, dsub):  # dimension-ordered fold
                    d = xs[:, i : i + 1] - cents[None, :, i]
                    d2 += d * d
                codes[:, s] = np.argmin(d2, axis=1)  # first min = low cent
            out = {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            if label_col is not None:
                out["label"] = pdf["label"].to_numpy()
            yield pd.DataFrame(out)

    schema = "id long, codes array<int>"
    if label_col is not None:
        schema += ", label int"
    return src.mapInPandas(_encode, schema=schema)


def _pq_lut(
    codebook: DataFrame,
    queries: DataFrame,
    nsub: int,
    dsub: int,
    id_col: str,
    vec_col: str,
    caller: str,
) -> "tuple[list, object]":
    """Shared ADC lookup-table build: per query × subspace × centroid
    the sub-dot-product, computed with the dimension-ordered
    zip_with/aggregate fold (bit-identical to the SQL oracle's), then
    collected (bounded — |queries|·nsub·ncent doubles, the sanctioned
    ANN collect) into a dense numpy (|Q|, nsub, ncent) array.
    Density-checked like pq_encode's codebook. Returns
    (sorted query ids, lut)."""
    import numpy as np

    qs = _pq_subvectors(queries, id_col, vec_col, nsub, dsub, "query_id")
    pd_ = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    lut_rows = qs.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "cent", pd_.alias("pdot")
    ).collect()  # bounded: |queries| x nsub x ncent
    if not lut_rows:
        raise ValueError(
            f"{caller}: empty LUT — no queries, or the "
            "codebook is empty (see pq_encode's density check)."
        )
    qids = sorted({r.query_id for r in lut_rows})
    qpos = {q: i for i, q in enumerate(qids)}
    ncent = max(r.cent for r in lut_rows) + 1
    if len(lut_rows) != len(qids) * nsub * ncent:
        raise ValueError(
            f"{caller}: sparse LUT ({len(lut_rows)} rows, "
            f"expected {len(qids)}x{nsub}x{ncent}) — a sparse "
            f"codebook would zero-fill sub-dots and skew every adc."
        )
    lut = np.zeros((len(qids), nsub, ncent), dtype=np.float64)
    for r in lut_rows:
        lut[qpos[r.query_id], r.sub, r.cent] = r.pdot
    return qids, lut


def pq_adc_shortlist(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    k: int = 50,
    nsub: int = 8,
    dsub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lut: "tuple[list, object] | None" = None,
) -> DataFrame:
    """Asymmetric-distance shortlist: per query, a lookup table of
    sub-dot-products against every centroid (nsub·ncent doubles),
    then each candidate scores as the FIXED-ORDER sum
    Σ_s lut[s][codes[s]] — left-to-right over s, never a float
    groupBy-sum (whose accumulation order is not deterministic), so
    both engines produce the identical double and the shortlist
    carries a full value oracle. Returns (query_id, neighbor_id,
    adc, rank) with rank ≤ k by (adc desc, neighbor_id);
    self-matches excluded.

    Scale shape: the LUT is collected (bounded — |queries|·nsub·ncent
    doubles; queries are small by construction, the sanctioned ANN
    collect) and broadcast into ONE Arrow stage over the code scan:
    numpy gathers score a whole batch per query at once (the scores
    accumulate sub-by-sub, preserving the fold order bit-for-bit)
    and each batch keeps only its local top-k, so the global window
    merges ≤ k·P·|Q| rows. The scan never touches raw corpus
    vectors — that is the PQ point at 100 TB. (The first cut dragged
    the per-query LUT column through every candidate row and folded
    it with interpreted per-element expressions: ×10.6 wall at the
    ×100 probe; this shape probes ~×2.)

    ``lut``: optional pre-built (qids, lut-ndarray) pair — a
    frozen-codebook/standing-query caller (streaming/pqindex.py)
    builds it once at bootstrap instead of paying the LUT
    join+collect job every trigger."""
    import numpy as np
    import pandas as pd

    if lut is None:
        qids, lut_arr = _pq_lut(
            codebook, queries, nsub, dsub, id_col, vec_col,
            "pq_adc_shortlist",
        )
    else:
        qids, lut_arr = lut
    spark = codes.sparkSession
    bc = spark.sparkContext.broadcast((qids, lut_arr))

    def _score(it):
        qids_, lut_ = bc.value
        for pdf in it:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            cm = np.vstack(pdf["codes"].to_numpy())
            outs = {"query_id": [], "neighbor_id": [], "adc": []}
            for qi, qid in enumerate(qids_):
                # fixed-order accumulation: sub 0, then += sub 1.. —
                # bit-identical to the SQL fold both engines run
                s = lut_[qi, 0, cm[:, 0]].copy()
                for sub in range(1, nsub):
                    s += lut_[qi, sub, cm[:, sub]]
                mask = ids != qid
                mids, ms = ids[mask], s[mask]
                order = np.lexsort((mids, -ms))[:k]
                outs["query_id"].extend([qid] * len(order))
                outs["neighbor_id"].extend(mids[order].tolist())
                outs["adc"].extend(ms[order].tolist())
            yield pd.DataFrame(outs)

    local = codes.mapInPandas(
        _score, schema="query_id long, neighbor_id long, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


# -- composed ANN stack (round 11) --------------------------------------------


def ivf_int8_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """The composed ANN stack (VERDICT r10 "Next round" #5): IVF
    cells in FRONT of int8 scoring in front of exact rerank — the
    production retrieval shape where no stage scans the full corpus:

      1. route each query to its ``nprobe`` nearest cell centroids
         (centroid table tiny → broadcast; exact cosine, 6dp);
      2. int8-quantized scoring ONLY inside routed cells (the
         sublinear step: candidates ∝ nprobe/ncells of the corpus,
         not the corpus — q223's exact-quantized scan made linear);
         per query keep the ``shortlist`` best by qdot/√self_norm
         (exact int64 dots; zero vectors excluded — NaN guard);
      3. exact float rerank of the shortlist ONLY (≤ shortlist raw
         vectors per query ever touched), final top-k by (cos desc,
         neighbor_id).

    Determinism: every stage is either exact integer arithmetic or a
    single correctly-rounded IEEE op (the q223 discipline), so the
    full pipeline carries a FULL value oracle. ``n_candidates``
    reports how many cell rows stage 2 actually scored per query —
    the pruning pin the scale probe reads.

    Returns (query_id, neighbor_id, qdot, cos, rank, n_candidates).
    """
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    routed = (
        q.join(F.broadcast(cents))
        .withColumn(
            "ccos", F.round(cosine(F.col("q_vec"), F.col("centroid")), 6)
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("ccos"), F.asc(label_col)
                )
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select("query_id", F.col(label_col).alias("probe_label"))
    )
    qz_q = quantize_int8(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("qvec").alias("q_qv")
    )
    probe = routed.join(qz_q, "query_id")
    # the cell label rides the quantize projection (round 13) — the
    # old join-back of quantize_int8's output against the corpus on
    # id was a full corpus self-join (2 exchanges) to recover a
    # column the scan already had
    cells = quantize_int8(corpus, id_col, vec_col, (label_col,)).select(
        "id", F.col(label_col).alias("probe_label"), "qvec", "scale"
    ).withColumn("c_nn", int8_dot(F.col("qvec"), F.col("qvec")))
    cand = (
        cells.join(F.broadcast(probe), "probe_label")
        .filter((F.col("id") != F.col("query_id")) & (F.col("c_nn") > 0))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            int8_dot(F.col("q_qv"), F.col("qvec")).alias("qdot"),
            "c_nn",
        )
        .withColumn(
            "qscore",
            F.col("qdot").cast("double") / F.sqrt(F.col("c_nn").cast("double")),
        )
    )
    wq = Window.partitionBy("query_id")
    short = (
        cand.withColumn("n_candidates", F.count("*").over(wq))
        .withColumn(
            "srank",
            F.row_number().over(
                wq.orderBy(F.desc("qscore"), F.asc("neighbor_id"))
            ),
        )
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id", "qdot", "n_candidates")
    )
    c_raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    rerank = (
        short.join(q, "query_id")
        .join(c_raw, "neighbor_id")
        .withColumn(
            "cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "qdot", "cos", "rank",
            F.col("n_candidates").cast("long").alias("n_candidates"),
        )
    )


def ivf_pq_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    shortlist: int = 32,
    nsub: int = 8,
    dsub: int = 8,
    ncent: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-PQ (round 12, VERDICT r11 "Next round" #6): the q228
    routing idiom over q224's PQ codes — the FAISS-IVFPQ shape, the
    memory-bounded variant at 100 TB where int8 still stores full
    dimensions but PQ stores ``nsub`` bytes per vector (32× smaller
    at the defaults):

      1. route each query to its ``nprobe`` nearest cell centroids
         (tiny centroid table broadcast; exact cosine, 6dp — exactly
         ivf_int8_rerank's stage 1);
      2. ADC scoring ONLY inside routed cells: codes carry their
         cell label through the encode stage (no corpus join-back),
         the per-query LUT broadcasts into ONE Arrow stage whose
         routing sets are a bounded driver dict (|queries|·nprobe
         labels), each batch scores only rows whose cell is routed
         for that query (fixed sub-order accumulation — the oracle's
         fold), and keeps its local top-``shortlist``;
      3. exact float rerank of the global shortlist only (≤
         ``shortlist`` raw vectors per query), top-k by (cos desc,
         neighbor_id).

    ``n_candidates`` per query = Σ routed cell sizes − (1 if the
    query's own vector sits in a routed cell) — computed from the
    ncells-row cell census, never from a second scan of the codes.
    Determinism: the ADC doubles follow one fixed accumulation
    order, everything else is exact or a single rounded IEEE op, so
    the composition carries a FULL value oracle.

    Returns (query_id, neighbor_id, adc, cos, rank, n_candidates).
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # -- stage 1: routing (q228's) --
    cents = label_centroids(corpus, label_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    routed = (
        q.join(F.broadcast(cents))
        .withColumn(
            "ccos", F.round(cosine(F.col("q_vec"), F.col("centroid")), 6)
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("ccos"), F.asc(label_col)
                )
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select("query_id", F.col(label_col).cast("int").alias("probe_label"))
    )
    routed_rows = routed.collect()  # bounded: |queries| x nprobe
    rsets: dict[int, set[int]] = {}
    for r in routed_rows:
        rsets.setdefault(r.query_id, set()).add(r.probe_label)

    # -- stage 2: PQ codes (cell label carried through the encode) --
    codebook = pq_codebook(corpus, nsub, dsub, ncent, id_col, vec_col)
    codes = pq_encode(
        corpus, codebook, nsub, dsub, id_col, vec_col, label_col=label_col
    )
    qids, lut = _pq_lut(
        codebook, queries, nsub, dsub, id_col, vec_col, "ivf_pq_rerank"
    )
    bc = spark.sparkContext.broadcast((qids, lut, rsets))

    def _score(it):
        qids_, lut_, rsets_ = bc.value
        for pdf in it:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            cm = np.vstack(pdf["codes"].to_numpy())
            labels = pdf["label"].to_numpy()
            outs = {"query_id": [], "neighbor_id": [], "adc": []}
            for qi, qid in enumerate(qids_):
                cells_ = rsets_.get(qid)
                if not cells_:
                    continue
                mask = np.isin(labels, list(cells_)) & (ids != qid)
                if not mask.any():
                    continue
                mc = cm[mask]
                # fixed-order accumulation: sub 0, then += sub 1..
                s = lut_[qi, 0, mc[:, 0]].copy()
                for sub in range(1, nsub):
                    s += lut_[qi, sub, mc[:, sub]]
                mids = ids[mask]
                order = np.lexsort((mids, -s))[:shortlist]
                outs["query_id"].extend([qid] * len(order))
                outs["neighbor_id"].extend(mids[order].tolist())
                outs["adc"].extend(s[order].tolist())
            yield pd.DataFrame(outs)

    local = codes.mapInPandas(
        _score, schema="query_id long, neighbor_id long, adc double"
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id")
    )
    short = (
        local.withColumn("srank", F.row_number().over(ws))
        .filter(F.col("srank") <= shortlist)
        .select("query_id", "neighbor_id", "adc")
    )

    # -- n_candidates from the ncells-row census --
    # Census the CORPUS labels, not the codes frame: cell size does
    # not depend on the encode, and `codes` is an uncached mapInPandas
    # stage — a second consumer would re-run the whole PQ encode (and
    # the codebook job behind it) over the full corpus (ADVICE r12).
    # This scan is column-pruned to the label alone.
    cell_sizes = corpus.groupBy(
        F.col(label_col).cast("int").alias("probe_label")
    ).agg(F.count("*").alias("_csz"))
    own = corpus.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).cast("int").alias("probe_label"),
    )
    n_cand = (
        routed.join(F.broadcast(cell_sizes), "probe_label")
        .join(own.withColumn("_own", F.lit(1)), ["query_id", "probe_label"], "left")
        .groupBy("query_id")
        .agg(
            (
                F.sum("_csz") - F.sum(F.coalesce("_own", F.lit(0)))
            ).cast("long").alias("n_candidates")
        )
    )

    # -- stage 3: exact rerank of the shortlist only --
    c_raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    rerank = (
        short.join(q, "query_id")
        .join(c_raw, "neighbor_id")
        .withColumn(
            "cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(n_cand), "query_id")
        .select("query_id", "neighbor_id", "adc", "cos", "rank", "n_candidates")
    )


def pq_codebook_kmeans(
    corpus: DataFrame,
    nsub: int = 8,
    dsub: int = 8,
    ncent: int = 64,
    iters: int = 2,
    train_ids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-TRAINED PQ codebook (round 13) — the upgrade q224's
    docstring reserved ("a k-means codebook changes only this
    frame"): start from the sampled codebook (the ``ncent`` lowest
    ids) and run ``iters`` Lloyd iterations over a bounded training
    sample (ids below ``train_ids`` — PQ trainers always fit on a
    sample; FAISS defaults to ~256 points per centroid), each
    iteration one assignment + one centroid update:

    * assignment: per (point, sub), argmin squared L2 against the
      current codebook — the zip_with/aggregate LEFT-TO-RIGHT fold
      (bit-identical to the SQL oracle's list fold), ties to the
      lowest centroid;
    * update: per (sub, cent, dim), ``ROUND(AVG(component), 6)`` —
      the 6dp rounding is the label_centroids determinism idiom:
      both engines compute nearly-identical doubles whose rounded
      value agrees, and the ROUNDED centroids feed the next
      iteration, so divergence cannot compound;
    * empty clusters keep their previous centroid (left-join
      coalesce), so the codebook stays dense and pq_encode's density
      check holds by construction.

    Scale shape: every iteration works on sample × ncent rows
    (bounded by ``train_ids``·nsub·ncent — driver-chosen, corpus-size
    independent), codebook broadcast, lineage truncated per iteration
    (localCheckpoint — the iterative-algorithm rule from q178).
    Returns (cent int, sub, cv) — drop-in for pq_codebook wherever
    codes are (re-)built; recall vs the sampled codebook is pinned by
    q242."""
    cb = pq_codebook(corpus, nsub, dsub, ncent, id_col, vec_col)
    sample = corpus.filter(F.col(id_col) < train_ids)
    ssubs = _pq_subvectors(
        sample, id_col, vec_col, nsub, dsub, "id"
    ).localCheckpoint(eager=True)  # reused every iteration
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("id", "sub").orderBy(F.asc("_d2"), F.asc("cent"))
    for _ in range(int(iters)):
        assign = (
            ssubs.join(F.broadcast(cb), "sub")
            .withColumn("_d2", d2)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("sub", "cent", "sv")
        )
        upd = (
            assign.select("sub", "cent", F.posexplode("sv").alias("pos", "v"))
            .groupBy("sub", "cent", "pos")
            .agg(F.round(F.avg("v"), 6).alias("c"))
            .groupBy("sub", "cent")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("cv_new")
            )
        )
        cb = (
            cb.alias("p")
            .join(upd.alias("n"), ["sub", "cent"], "left")
            .select(
                F.col("cent"),
                F.col("sub"),
                F.coalesce(F.col("n.cv_new"), F.col("p.cv")).alias("cv"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
    return cb.select(F.col("cent").cast("int").alias("cent"), "sub", "cv")
