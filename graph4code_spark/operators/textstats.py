"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure `pyspark.sql.functions` — whole-stage
codegen end to end, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# n-gram heuristic language ID: stopword hit-rates per language
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "how", "can", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf", "ich"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que", "je"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que", "no"],
}

#: BPE-ish token regex: words, numbers, or single non-space symbols —
#: the standard pre-tokenization shape for byte-pair encoders
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def whitespace_token_count(text: Column) -> Column:
    w = F.split(F.trim(text), r"\s+")
    return F.when(F.trim(text) == "", 0).otherwise(F.size(w))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
    w = _words(text)
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return hits / F.greatest(F.size(w), F.lit(1))


def detect_language(text: Column) -> Column:
    """argmax of per-language stopword hit-rate; 'und' when nothing hits."""
    scores = F.array(
        *[
            F.struct(stopword_ratio(text, lg).alias("score"), F.lit(lg).alias("lang"))
            for lg in _STOPWORDS
        ]
    )
    best = F.array_max(scores)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Per-doc quality features + a composite [0,1] score (length,
    punctuation ratio, stopword ratio, mean word length) — the standard
    web-corpus filters."""
    t = F.col(text_col)
    w = _words(t)
    n_chars = F.length(t)
    n_words = whitespace_token_count(t)
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    mean_wl = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    sw_ratio = stopword_ratio(t, "en")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(sw_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.cast("int").alias("q_words"),
        F.round(mean_wl, 4).alias("q_mean_word_len"),
        F.round(sw_ratio, 4).alias("q_stopword_ratio"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        score.alias("q_score"),
    )


def repetition_features(df: DataFrame, text_col: str, max_words: int = 200) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction and
    top-bigram fraction, computed over the first ``max_words`` words so
    per-doc work is bounded (O(max_words²) worst case for the bigram
    mode count) regardless of document length — at corpus scale a
    runaway 10 MB document must not dominate its task.  Pure column
    expressions, whole-stage codegen."""
    t = F.col(text_col)
    w = F.slice(_words(t), 1, max_words)
    n = F.size(w)
    dup_word = F.when(
        n > 0, 1 - F.size(F.array_distinct(w)) / n.cast("double")
    ).otherwise(F.lit(0.0))
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = F.size(grams)
    top_bigram = F.when(
        ng > 0,
        F.array_max(
            F.transform(
                F.array_distinct(grams),
                lambda x: F.size(F.filter(grams, lambda e: e == x)),
            )
        ).cast("double") / ng,
    ).otherwise(F.lit(0.0))
    return df.select(
        "*",
        F.round(dup_word, 6).alias("rep_dup_word_frac"),
        F.round(top_bigram, 6).alias("rep_top_bigram_frac"),
    )


def doc_fingerprint(text: Column, window: int = 5) -> Column:
    """Winnowing-style fingerprint: min over rolling word-5-gram hashes —
    stable under small edits, one 64-bit value per doc."""
    w = _words(text)
    n = F.size(w)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(1), n - (window - 1)),
            lambda i: F.xxhash64(F.array_join(F.slice(w, i, window), " ")),
        ),
    ).otherwise(F.array(F.xxhash64(F.array_join(w, " "))))
    return F.array_min(grams)
