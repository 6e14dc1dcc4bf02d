"""Text-analysis operators over the ``documents`` table (extension
suite — SURVEY.md §7 step 6; a training-data pipeline's text pass).

All pure Catalyst column expressions (JVM, codegen) — no Python in the
hot path. Tokenization is a plain single-space split with empty tokens
dropped, chosen because both Spark and DuckDB reproduce it exactly
(oracle parity); swap the leaf for a regex tokenizer when the corpus
needs it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Tiny deterministic stopword list shared with the oracle SQL.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(c: str | Column) -> Column:
    """Nonempty single-space tokens."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(col, " "), lambda t: t != F.lit(""))


def stopword_ratio(toks: Column) -> Column:
    """Fraction of tokens that are stopwords (double)."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks).cast("double")


def type_token_ratio(toks: Column) -> Column:
    """Distinct tokens / total tokens — crude lexical-diversity score."""
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")


def quality_score(toks: Column, n_chars: Column) -> Column:
    """Heuristic document-quality score in [0, 1].

    0.4 * length factor (saturates at 200 tokens)
    + 0.3 * lexical diversity
    + 0.3 * stopword plausibility (natural text has some stopwords).
    Deliberately simple arithmetic so the oracle reproduces it
    bit-for-bit in double precision.
    """
    n = F.size(toks).cast("double")
    length_factor = F.least(n / F.lit(200.0), F.lit(1.0))
    diversity = type_token_ratio(toks)
    stop_plausible = F.least(stopword_ratio(toks) * F.lit(10.0), F.lit(1.0))
    return length_factor * F.lit(0.4) + diversity * F.lit(0.3) + stop_plausible * F.lit(0.3)


def lang_id(toks: Column) -> Column:
    """n-gram-free heuristic language ID: English-stopword density.

    Real corpora: per-language character-n-gram profiles; this corpus
    is synthetic shared-vocabulary text, so the heuristic demonstrates
    the operator shape (score -> argmax label) deterministically.
    """
    r = stopword_ratio(toks)
    return (
        F.when(r >= F.lit(0.08), F.lit("en"))
        .when(r >= F.lit(0.04), F.lit("und"))
        .otherwise(F.lit("other"))
    )


# PII patterns, ordered (emails first: a phone-lookalike inside an
# address must already be gone). Plain RE2-compatible syntax so the
# same pattern strings run verbatim in Spark (Java regex) and the
# DuckDB oracle (RE2) — no lookarounds, no backrefs.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"),
)


def redact_pii(c: str | Column) -> Column:
    """Replace emails/phone numbers with <EMAIL>/<PHONE> tags — the
    scrubbing pass a training corpus runs before anything else.
    Pure regexp_replace chain (scan-stage, zero shuffles); counts of
    what was removed come from ``pii_counts`` so the redaction is
    auditable (q74 value-hash-checks the redacted bytes via md5)."""
    col = F.col(c) if isinstance(c, str) else c
    for tag, pat in PII_PATTERNS:
        col = F.regexp_replace(col, pat, f"<{tag}>")
    return col


def pii_counts(c: str | Column) -> list[Column]:
    """[n_emails, n_phones] match counts (pre-redaction)."""
    col = F.col(c) if isinstance(c, str) else c
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{tag.lower()}s")
        for tag, pat in PII_PATTERNS
    ]


def token_count_regex(c: str | Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs via regex."""
    col = F.col(c) if isinstance(c, str) else c
    low = F.lower(col)
    return (F.regexp_count(low, F.lit("[a-z]+")) + F.regexp_count(low, F.lit("[0-9]+"))).cast(
        "long"
    )


def fingerprint(c: str | Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    col = F.col(c) if isinstance(c, str) else c
    normalized = F.trim(F.regexp_replace(F.lower(col), " +", " "))
    return F.md5(normalized)


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + per-doc feature columns (the full text pass).

    Tokenizes ONCE in its own projection — the higher-order filter()
    lambdas in the feature expressions defeat codegen subexpression
    elimination, so an inlined tokens() would re-split the text per
    feature (~30% slower, measured).
    """
    toked = docs.select("*", tokens(text_col).alias("_tk"))
    t = F.col("_tk")
    return toked.select(
        "*",
        F.size(t).alias("n_tokens"),
        F.round(stopword_ratio(t), 6).alias("stop_ratio"),
        F.round(type_token_ratio(t), 6).alias("ttr"),
        F.round(quality_score(t, F.col("n_chars")), 6).alias("quality"),
        lang_id(t).alias("pred_lang"),
        token_count_regex(text_col).alias("regex_tokens"),
        fingerprint(text_col).alias("fp"),
    ).drop("_tk")
