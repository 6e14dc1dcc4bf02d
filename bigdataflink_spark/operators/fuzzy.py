"""Fuzzy string matching / entity resolution.

Matches dirty strings back to a clean reference set without an
all-pairs comparison: character-trigram blocking (two strings within
edit distance d of each other share all but ≤ 3·d trigrams, so
requiring ≥ 2 shared trigrams never loses a near match for realistic
name lengths), then exact Levenshtein verification on the candidates
only, then deterministic resolution (best distance, smallest id).

The same bucket-join discipline as the MinHash pipeline
(operators/dedup.py): the shuffle keys on the trigram, candidate
pairs — not the corpus — are quadratic, and the expensive metric runs
only on candidates. At 100 TB-scale reference sets, add a stop-gram
cap (drop trigrams whose document frequency exceeds a threshold)
exactly like stopword removal — the blocking keys follow a Zipf
distribution and the hottest grams contribute candidates without
discrimination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def char_trigrams(c: str | Column) -> Column:
    """Distinct character 3-grams of a string (empty for len < 3)."""
    col = F.col(c) if isinstance(c, str) else c
    idx = F.sequence(F.lit(1), F.length(col) - 2)
    grams = F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(3))))
    return F.when(F.length(col) >= 3, grams).otherwise(
        F.array().cast("array<string>")
    )


def qgram_match(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_id: str = "did",
    dirty_col: str = "dname",
    clean_id: str = "id",
    clean_col: str = "name",
    min_shared: int = 2,
    max_dist: int = 2,
) -> DataFrame:
    """Resolve each dirty string to its best clean match.

    Output: (dirty_id, clean_id, dist) — one row per dirty record that
    found a candidate within ``max_dist``; best = smallest Levenshtein
    distance, ties to the smallest clean id.
    """
    d_grams = dirty.select(
        F.col(dirty_id), F.explode(char_trigrams(dirty_col)).alias("g")
    )
    c_grams = clean.select(
        F.col(clean_id), F.explode(char_trigrams(clean_col)).alias("g")
    )
    cand = (
        d_grams.join(c_grams, "g")
        .groupBy(dirty_id, clean_id)
        .agg(F.count("*").alias("_shared"))  # grams are distinct per side
        .filter(F.col("_shared") >= min_shared)
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
