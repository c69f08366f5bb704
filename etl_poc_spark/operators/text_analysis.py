"""Text-analysis operators for training-data pipelines (pure Column exprs).

- token_stats: token count, char counts, mean token length, stopword ratio
- language_score / predict_lang: deterministic n-gram/stopword heuristic
- quality_flags: length/punctuation/stopword based keep-drop signals
- fingerprint: normalized-text content fingerprint (md5 prefix)

All ratios are integer/integer single divisions (exact, engine-portable).
Everything is JVM-side — these run at full scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "in", "to", "is")


def tokens(col: Column) -> Column:
    from etl_poc_spark.functions.text import nonempty_tokens

    return nonempty_tokens(col)


def n_tokens(col: Column) -> Column:
    from etl_poc_spark.functions.text import word_count

    return word_count(col)


def chars_no_space(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"\s+", ""))


def mean_token_len(col: Column) -> Column:
    n = n_tokens(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(chars_no_space(col).cast("double") / n.cast("double"))


def stopword_count_expr(text_col: str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    arr = ", ".join("'" + w + "'" for w in stopwords)
    return F.expr(
        f"CASE WHEN trim({text_col}) = '' THEN 0 ELSE "
        f"size(filter(split(trim({text_col}), '\\\\s+'), w -> array_contains(array({arr}), lower(w)))) END"
    )


def fingerprint(col: Column, n_hex: int = 16) -> Column:
    """Content fingerprint: md5 of lowercased, whitespace-collapsed text,
    truncated to `n_hex` hex chars. Rolling-hash-equivalent for exact
    near-normalization dedup keys."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.substring(F.md5(normalized), 1, n_hex)


def predict_lang_expr(text_col: str) -> Column:
    """Deterministic stopword-marker language heuristic. The marker lists
    are tiny and fixed so the same CASE ladder is expressible in the oracle."""
    markers = {
        "en": ("the", "and", "of"),
        "de": ("der", "und", "die"),
        "fr": ("le", "et", "les"),
        "es": ("el", "y", "los"),
    }
    counts = {lang: stopword_count_expr(text_col, words) for lang, words in markers.items()}
    best = (
        F.when((counts["en"] >= counts["de"]) & (counts["en"] >= counts["fr"]) & (counts["en"] >= counts["es"]) & (counts["en"] > 0), F.lit("en"))
        .when((counts["de"] >= counts["fr"]) & (counts["de"] >= counts["es"]) & (counts["de"] > 0), F.lit("de"))
        .when((counts["fr"] >= counts["es"]) & (counts["fr"] > 0), F.lit("fr"))
        .when(counts["es"] > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return best
