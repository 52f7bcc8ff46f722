"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions over the ``documents`` table — regexp +
higher-order functions, no UDFs — so they run at scan speed and carry
exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfsa_spark.functions.hashing import portable_hash64
from hfsa_spark.operators.dedup import normalize_text

# Small multilingual stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "por", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "他", "这", "不"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties dropped."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: F.length(t) > 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-flavored proxy: word-piece count estimated as words +
    extra pieces for long words (every 4 chars past the first 4) +
    standalone punctuation/digit runs. Deterministic and SQL-expressible."""
    c = F.col(text) if isinstance(text, str) else text
    words = tokens(c)
    word_pieces = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + 1
        + F.floor((F.greatest(F.length(w), F.lit(4)) - 4) / F.lit(4)).cast("long"),
    )
    punct_runs = F.size(F.filter(F.split(c, r"[\sA-Za-z]+"), lambda t: F.length(t) > 0))
    return (word_pieces + punct_runs).cast("long")


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    non_alnum = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return non_alnum.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    stop = LANG_STOPWORDS[lang]
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: rewards reasonable length and
    mean word length, penalizes punctuation soup. Weights are fixed and
    documented so the oracle reproduces them exactly:

    score = 0.4 * min(n_tokens/100, 1)
          + 0.3 * (1 - punct_ratio)
          + 0.3 * clamp((avg_word_len - 2) / 8, 0, 1)
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n = F.size(toks).cast("double")
    avg_len = F.aggregate(
        toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t).cast("double")
    ) / F.greatest(n, F.lit(1.0))
    len_term = F.least(n / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - punct_ratio(c)
    wl_term = F.least(F.greatest((avg_len - 2.0) / 8.0, F.lit(0.0)), F.lit(1.0))
    return 0.4 * len_term + 0.3 * punct_term + 0.3 * wl_term


def lang_id_heuristic(text: Column | str) -> Column:
    """Stopword-profile argmax language guess: score each language by
    stopword hits, pick the max. Ties break toward the lexicographically
    greatest language code (struct max compares (hits, lang) field-wise —
    deterministic and reproducible in the SQL oracle). Returns 'und' when
    nothing matches."""
    toks = tokens(text)

    def hits(sw: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    scores = F.array(
        *[
            F.struct(hits(sw).alias("hits"), F.lit(lang).alias("lang"))
            for lang, sw in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_max(scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """64-bit-ish document fingerprint of the normalized text (rolling-hash
    style digest): portable, join-friendly, oracle-exact."""
    return portable_hash64(normalize_text(text))


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per document with the full feature set."""
    from hfsa_spark.plans import parallelize_compute

    df = parallelize_compute(df.select(id_col, text_col))
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_pieces"),
        F.length(text_col).alias("n_chars_actual"),
        punct_ratio(text_col).alias("punct_ratio"),
        stopword_ratio(text_col).alias("stopword_ratio_en"),
        quality_score(text_col).alias("quality"),
        lang_id_heuristic(text_col).alias("lang_guess"),
        fingerprint(text_col).alias("fingerprint"),
    )
