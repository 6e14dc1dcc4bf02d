"""Fuzzy string matching / entity resolution.

Matches dirty strings back to a clean reference set without an
all-pairs comparison, then exact Levenshtein verification on the
candidates only, then deterministic resolution (best distance,
smallest id).

Blocking is a PREFIX FILTER (the AllPairs/PPJoin family): one edit
changes at most ``q`` of a string's character q-grams, so two strings
within ``max_dist`` edits share all but <= q·max_dist grams — under
any canonical global gram ordering they must then share a gram among
their first q·max_dist + 1. Ranking that order by ascending document
frequency makes the kept prefix the RAREST grams, so the candidate
join never keys on Zipf-hot grams. Recall for dist <= max_dist is
exact (guaranteed by the bound, not a heuristic).

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
size, clamped to [4, min_string_len] — one tiny agg over the clean
side the pipeline scans anyway. Because the prefix bound guarantees
EXACT recall for dist <= max_dist at ANY q (<= every string's
length), the derivation changes performance only, never output.
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
    """Scale-safe gram width: smallest q with |A|^q >= 64·n (so the
    expected per-gram bucket stays O(prefix_len/64) strings), clamped
    to [4, min_len] — a gram longer than the shortest string would
    silently drop it from blocking and break the exact-recall bound."""
    a = max(alphabet_size, 2)
    target = 64 * max(n_clean, 1)
    want = 4
    while a**want < target:
        want += 1
    return max(2, min(want, max(min_len, 2)))


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
    q-independent by the exact-recall bound.
    """
    if q is None:
        stats = clean.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.length(clean_col)).alias("min_len"),
        ).first()
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
