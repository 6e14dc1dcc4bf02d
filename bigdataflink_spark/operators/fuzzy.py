"""Fuzzy string matching / entity resolution.

Matches dirty strings back to a clean reference set without an
all-pairs comparison, then exact Levenshtein verification on the
candidates only, then deterministic resolution (best distance,
smallest id).

Blocking is a PREFIX FILTER (the AllPairs/PPJoin family): one edit
changes at most ``q`` of a string's distinct character q-grams, so two
strings within ``max_dist`` edits share all but <= q·max_dist grams —
under any canonical global gram ordering they must then share a gram
among their first q·max_dist + 1, PROVIDED at least one of the pair
has more than q·max_dist distinct grams (the prefix lemma needs the
implied intersection bound max(|G_s|,|G_t|) − q·max_dist to be >= 1).
Ranking that order by ascending document frequency makes the kept
prefix the RAREST grams, so the candidate join never keys on Zipf-hot
grams.

Strings BELOW that guarantee threshold — fewer than q·max_dist + 1
distinct grams: shorter than ~q·(max_dist+1) chars, or degenerately
repetitive ("aaaa…") — can share ZERO grams with a true match, so
they are routed through a separate length-window fallback block
(|len difference| <= max_dist is necessary for edit distance
<= max_dist). A pair with at least one above-threshold member is
always caught by the gram prefix block (the short side keeps ALL its
grams, since it has fewer than the prefix length); a pair with both
members below it is caught by the fallback. Recall for
dist <= max_dist is therefore exact for EVERY length mix — the
guarantee the round-3 version claimed but only delivered above the
threshold. The fallback population is all-pairs within a length
bucket: honest, because no character-gram scheme can block below the
threshold — and it stays tiny on real corpora (only degenerate/short
strings land there; ``auto_q`` additionally shrinks q on short-string
corpora, which shrinks the fallback population).

Same bucket-join discipline as the MinHash pipeline
(operators/dedup.py): the shuffle keys on the gram, candidate pairs —
not the corpus — are quadratic, and the expensive metric runs only on
candidates. ``q`` must grow with the corpus so the gram space
out-cards it (|alphabet|^q >> n_strings): with q FIXED the per-gram
bucket holds ~n·prefix/|A|^q strings and candidates grow ∝ n²/|A|^q —
the same constant-bucket-count quadratic law as a fixed sign-LSH band
width (the r3 100× probe measured exactly this: q=4 over 600k hex
strings stalled on a ~4·10⁸-pair candidate join, while the auto
q=6 run stays linear). Hence ``q=None`` (the default) DERIVES
q = ⌈log_|A|(64·n)⌉ from the clean set's observed alphabet and corpus
size, clamped into [2, max(min_string_len, 2)] — one tiny agg over
the clean side the pipeline scans anyway. Because above-threshold
pairs are guaranteed by the prefix bound at ANY q and below-threshold
pairs by the fallback block, the derivation changes performance only,
never output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def char_qgrams(c: str | Column, q: int = 4) -> Column:
    """Distinct character q-grams of a string (empty for len < q)."""
    col = F.col(c) if isinstance(c, str) else c
    idx = F.sequence(F.lit(1), F.length(col) - (q - 1))
    grams = F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(q))))
    return F.when(F.length(col) >= q, grams).otherwise(
        F.array().cast("array<string>")
    )


def _prefix_grams(
    grams: DataFrame, id_col: str, df_tab: DataFrame, prefix_len: int
) -> DataFrame:
    """Keep each string's ``prefix_len`` globally-rarest grams
    (df asc, gram asc — the canonical order both engines reproduce).
    Grams absent from the reference df table count as df 0 (rarest)."""
    w = Window.partitionBy(id_col).orderBy(F.asc("_df"), F.asc("g"))
    return (
        grams.join(df_tab, "g", "left")
        .withColumn("_df", F.coalesce("_df", F.lit(0)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select(id_col, "g")
    )


def auto_q(n_clean: int, alphabet_size: int, min_len: int) -> int:
    """Scale-safe gram width: smallest q >= 4 with |A|^q >= 64·n (so
    the expected per-gram bucket stays O(prefix_len/64) strings),
    then clamped into [2, max(min_len, 2)] — a corpus of very short
    strings gets a narrower gram so fewer strings fall below the
    prefix-filter guarantee threshold and into the fallback block
    (recall no longer depends on this clamp; see ``qgram_match``)."""
    a = max(alphabet_size, 2)
    target = 64 * max(n_clean, 1)
    want = 4
    while a**want < target:
        want += 1
    return max(2, min(want, max(min_len, 2)))


def _fallback_candidates(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str,
    dirty_col: str,
    clean_id: str,
    clean_col: str,
    q: int,
    max_dist: int,
) -> DataFrame:
    """Candidate pairs for strings BELOW the prefix-filter guarantee
    threshold (<= q·max_dist distinct grams — short or degenerately
    repetitive): such a pair can share zero grams with a true match,
    so gram blocking is replaced by a length-window block. A clean
    string of length L lands in bucket L DIV (max_dist+1); a dirty
    string probes every bucket its match could occupy (|Δlen| <=
    max_dist spans <= 3 buckets). Within the degenerate population
    this is all-pairs-per-bucket — the honest floor (no gram scheme
    can block there), and a population that stays tiny on real data.
    Pairs with at least one above-threshold member never need this
    path: the gram block already guarantees them."""
    thresh = q * max_dist
    bw = max_dist + 1

    def degenerate(base, id_col, s_col):
        # distinct-gram count as a SCAN-STAGE expression (size of the
        # per-row gram array) — no shuffle, no join; the fallback
        # population filter costs one extra projection of the corpus
        return base.select(
            id_col,
            F.length(s_col).alias("_len"),
            F.size(char_qgrams(s_col, q)).alias("_ng"),
        ).filter(F.col("_ng") <= thresh).select(id_col, "_len")

    d_deg = degenerate(dirty, dirty_id, dirty_col)
    c_deg = degenerate(clean, clean_id, clean_col)
    d_keys = d_deg.select(
        dirty_id,
        "_len",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(-max_dist), F.lit(max_dist)),
                    lambda d: F.floor((F.col("_len") + d) / bw),
                )
            )
        ).alias("_b"),
    )
    c_keys = c_deg.select(
        clean_id, F.col("_len").alias("_clen"), F.floor(F.col("_len") / bw).alias("_b")
    )
    return (
        d_keys.join(c_keys, "_b")
        .filter(F.abs(F.col("_len") - F.col("_clen")) <= max_dist)
        .select(dirty_id, clean_id)
    )


def qgram_match(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str = "did",
    dirty_col: str = "dname",
    clean_id: str = "id",
    clean_col: str = "name",
    q: int | None = None,
    max_dist: int = 2,
) -> DataFrame:
    """Resolve each dirty string to its best clean match.

    Output: (dirty_id, clean_id, dist) — one row per dirty record that
    found a candidate within ``max_dist``; best = smallest Levenshtein
    distance, ties to the smallest clean id. ``q=None`` derives the
    gram width from the clean corpus (see ``auto_q``); output is
    q-independent: pairs where either side has more than q·max_dist
    distinct grams are guaranteed by the prefix filter, and pairs
    where BOTH sides fall below that threshold go through the
    length-window fallback block (module doc) — so recall for
    dist <= max_dist is exact at any q.
    """
    if q is None:
        stats = clean.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.length(clean_col)).alias("min_len"),
        ).first()
        if int(stats["n"]) == 0:
            # empty reference set: nothing can resolve — empty result
            # with the contract schema (was a TypeError on min_len)
            return (
                dirty.select(dirty_id)
                .limit(0)
                .crossJoin(clean.select(clean_id).limit(0))
                .withColumn("dist", F.lit(None).cast("int"))
            )
        # observed alphabet, distributed: map-side partials collapse to
        # <= |A| rows before the exchange — never a collected list
        alphabet = (
            clean.select(F.explode(F.split(clean_col, "")).alias("ch"))
            .filter(F.col("ch") != "")
            .agg(F.countDistinct("ch"))
            .first()[0]
        )
        q = auto_q(int(stats["n"]), int(alphabet), int(stats["min_len"]))
    prefix_len = q * max_dist + 1
    d_grams = dirty.select(
        F.col(dirty_id), F.explode(char_qgrams(dirty_col, q)).alias("g")
    )
    c_grams = clean.select(
        F.col(clean_id), F.explode(char_qgrams(clean_col, q)).alias("g")
    )
    df_tab = c_grams.groupBy("g").agg(F.count("*").alias("_df"))
    cand = (
        _prefix_grams(d_grams, dirty_id, df_tab, prefix_len)
        .join(_prefix_grams(c_grams, clean_id, df_tab, prefix_len), "g")
        .select(dirty_id, clean_id)
        .unionByName(
            _fallback_candidates(
                dirty, clean, dirty_id, dirty_col, clean_id, clean_col,
                q, max_dist,
            )
        )
        .distinct()
    )
    verified = (
        cand.join(dirty.select(dirty_id, dirty_col), dirty_id)
        .join(clean.select(clean_id, clean_col), clean_id)
        .withColumn("dist", F.levenshtein(F.col(dirty_col), F.col(clean_col)))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy(dirty_id).orderBy(F.asc("dist"), F.asc(clean_id))
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(dirty_id, clean_id, "dist")
    )
