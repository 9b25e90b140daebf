"""Text analysis for training-data pipelines (graft-added surface).

Language-ID (stopword-marker heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (polynomial
rolling hash). All fully native column expressions — they run inside
whole-stage codegen with zero Python, and every one is SQL-expressible so
the DuckDB oracle can cross-check them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny marker sets per language — deterministic heuristic, not a model.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein", "nicht"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

# BPE-ish tokenizer regex: words, numbers, or single non-space symbols —
# the standard pre-tokenization split used by byte-pair tokenizers.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text_col: str = "text") -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality-signal columns: n_chars, n_words, mean_word_len,
    punct_ratio, stopword_ratio, upper_ratio, digit_ratio."""
    t = F.col(text_col)
    w = words(text_col)
    n_chars = F.length(t)
    n_words = F.size(w)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    stop_hits = F.size(
        F.filter(w, lambda x: x.isin(*EN_STOPWORDS))
    )
    nz = lambda d: F.when(d > 0, d).otherwise(F.lit(1))  # noqa: E731
    return df.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        F.round(n_chars / nz(n_words).cast("double"), 6).alias("q_mean_word_len"),
        F.round(n_punct / nz(n_chars).cast("double"), 6).alias("q_punct_ratio"),
        F.round(stop_hits / nz(n_words).cast("double"), 6).alias("q_stopword_ratio"),
        F.round(n_upper / nz(n_chars).cast("double"), 6).alias("q_upper_ratio"),
        F.round(n_digit / nz(n_chars).cast("double"), 6).alias("q_digit_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "lang_pred") -> DataFrame:
    """Stopword-marker language ID: count marker hits per language, pick the
    argmax (ties broken by language-code order; zero hits -> 'und')."""
    w = words(text_col)
    scores = [
        F.size(F.filter(w, lambda x: x.isin(*mk))).alias(f"_s_{lg}")
        for lg, mk in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_s_{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"_s_{lg}") == best, F.lit(lg))
    return scored.withColumn(out_col, pred).drop(*[f"_s_{lg}" for lg in langs])


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.size(F.split(F.trim(t), r"\s+")).alias("tok_ws"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).alias("tok_bpe"),
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fp") -> DataFrame:
    """Polynomial rolling hash over normalized words:
    fp = fold(words, h -> (h*31 + word_hash) mod P), with word_hash a
    portable per-word polynomial over character codes — reproducible in any
    engine (the DuckDB oracle computes the identical value). P is the
    largest prime below 2^53 so every intermediate (acc*131 + cp) stays
    inside int64 — Spark 4 runs ANSI mode and throws on long overflow."""
    p = F.lit(9007199254740881)
    wh = lambda wcol: F.aggregate(  # noqa: E731
        F.split(wcol, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 131 + F.ascii(ch)) % p,
    )
    fp = F.aggregate(
        words(text_col),
        F.lit(0).cast("long"),
        lambda acc, wd: (acc * 31 + wh(wd)) % p,
    )
    return df.withColumn(out_col, fp)
