"""Text analysis for corpus pipelines: token counting, quality
scoring, language guessing, fingerprinting. All pure Spark SQL
expressions (codegen'd; no Python in the hot path) and deliberately
SQL-portable so every one has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.datapipe.dedup import normalize_text


def token_count(col: Column) -> Column:
    """Whitespace token count (the fast proxy; BPE-ish subword count
    adds ~0.3 tokens/word for this corpus)."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(col), r"\s+"))
    ).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """Regex-segmented subword-ish count: words, digits runs,
    punctuation each count; rough GPT-style heuristic
    (len(word)/4 rounded up per word + punct)."""
    words = F.split(F.trim(col), r"\s+")
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("bigint")
    )
    return F.aggregate(per_word, F.lit(0).cast("bigint"), lambda a, v: a + v)


def quality_score(col: Column) -> dict[str, Column]:
    """Deterministic quality signals (integer/rounded — no float
    traps): char count, word count, mean word length, punctuation
    count, stopword hits."""
    trimmed = F.trim(col)
    words = F.split(trimmed, r"\s+")
    n_words = F.size(words).cast("bigint")
    n_chars = F.length(trimmed).cast("bigint")
    punct = (
        F.length(trimmed) - F.length(F.regexp_replace(trimmed, r"[.,!?;:]", ""))
    ).cast("bigint")
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin("the", "a", "of", "and", "to"))
    ).cast("bigint")
    mean_word_len = F.round(n_chars / F.greatest(n_words, F.lit(1)), 2)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct": punct,
        "stop_hits": stop_hits,
    }


def lang_guess(col: Column) -> Column:
    """Marker-token language heuristic (n-gram-lite): counts hits of
    tiny per-language marker sets; ties -> 'und'. Deterministic and
    portable — a real pipeline swaps in fastText/CLD3 behind the same
    column contract."""
    words = F.split(F.lower(F.trim(col)), r"\s+")

    def hits(markers: list[str]) -> Column:
        return F.size(F.filter(words, lambda w: w.isin(*markers))).cast("bigint")

    en = hits(["the", "a", "of", "and", "to", "is"])
    es = hits(["el", "la", "de", "y", "que"])
    de = hits(["der", "die", "das", "und", "ist"])
    return (
        F.when((en > es) & (en > de), "en")
        .when((es > en) & (es > de), "es")
        .when((de > en) & (de > es), "de")
        .otherwise("und")
    )


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(col))
