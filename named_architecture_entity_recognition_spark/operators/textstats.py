"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (codegen'd, DuckDB-oracle-exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "for",
    "on", "with", "as", "by", "it", "this", "that", "from", "at", "be",
)

# tiny per-language marker sets for the n-gram/stopword language-ID
# heuristic (public-knowledge common words)
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    """Whitespace tokens plus a BPE-ish subword estimate: words longer
    than 6 chars count ceil(len/6) subtokens."""
    t = tokens(col)
    return F.aggregate(
        t,
        F.lit(0),
        lambda acc, w: acc + F.greatest(F.ceil(F.length(w) / 6.0), F.lit(1)).cast("int"),
    )


def word_count(col) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col) -> Column:
    t = tokens(col)
    sw = F.size(F.filter(t, lambda w: w.isin(*_STOPWORDS)))
    return sw / F.greatest(F.size(t), F.lit(1))


def mean_word_length(col) -> Column:
    t = tokens(col)
    return F.aggregate(
        t, F.lit(0), lambda acc, w: acc + F.length(w)
    ) / F.greatest(F.size(t), F.lit(1))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", "")
    return (F.length(c) - F.length(stripped)) / F.greatest(F.length(c), F.lit(1))


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword band +
    word-length band (crude but deterministic and monotone-sane)."""
    wc = word_count(col)
    length_ok = ((wc >= 10) & (wc <= 10000)).cast("double")
    sw = stopword_ratio(col)
    sw_ok = ((sw >= 0.05) & (sw <= 0.6)).cast("double")
    mwl = mean_word_length(col)
    mwl_ok = ((mwl >= 2.0) & (mwl <= 12.0)).cast("double")
    return F.round((length_ok + sw_ok + mwl_ok) / 3.0, 6)


def lang_id(col) -> Column:
    """Marker-word vote language ID; 'und' when no marker hits."""
    t = tokens(col)
    scores = [
        (lang, F.size(F.filter(t, lambda w: w.isin(*markers))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def fingerprint(col) -> Column:
    """Canonical document fingerprint: md5 of whitespace-normalized
    lowercased text (exact-dedup key)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        "doc_id",
        word_count(c).alias("n_words"),
        token_count(c).alias("n_tokens"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(mean_word_length(c), 6).alias("mean_word_len"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
