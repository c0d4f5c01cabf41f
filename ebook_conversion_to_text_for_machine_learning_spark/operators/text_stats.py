"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Every operator here has an exact
DuckDB SQL twin in ``__spark_entry__.oracle_sql`` for the driver's
correctness gate, so hash functions / regexes are chosen to be portable:
md5 (identical hex in Spark and DuckDB) and RE2-compatible patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Whitespace tokenization pattern (portable between Java regex and RE2).
TOKEN_SPLIT = " +"

#: Small stopword list for quality scoring (subset present in any corpus).
STOPWORDS = ("the", "a", "of", "and", "in", "to")

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens with empties removed."""
    return F.filter(F.split(text, TOKEN_SPLIT), lambda t: t != "")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, BPE-ish count."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score: length, lexical diversity, stopword ratio.

    score = 0.4*min(1, n_tokens/50) + 0.3*(distinct/total) + 0.3*stopword_ratio,
    rounded to 4 decimals (double arithmetic, portable to the SQL oracle).
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))).cast("double") / n
    )
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(50.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * stop_ratio
    )

    def _round4(col):
        # floor(x*1e4 + 0.5)/1e4 instead of round(): identical double ops in
        # every engine, so the SQL oracle reproduces it bit-for-bit (round()
        # implementations differ at representation boundaries).
        return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)

    return df.select(
        "doc_id",
        _round4(distinct_ratio).alias("distinct_ratio"),
        _round4(stop_ratio).alias("stopword_ratio"),
        _round4(score).alias("quality_score"),
    )


#: Per-language marker words for the n-gram/stopword language heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "que", "de"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
}


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic.

    Picks the language with the most marker-token hits; ties and zero hits
    resolve to 'und' (deterministic; the real decision logic matters less
    than exact Spark/SQL agreement for the correctness gate).
    """
    toks = tokens_col(F.lower(F.col(text_col)))
    scores = [
        F.size(F.filter(toks, lambda t: t.isin(*markers))).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select("doc_id", F.col("lang").alias("actual_lang"), *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    predicted = F.lit("und")
    # Deterministic priority: first language (in fixed order) achieving max.
    for lang in reversed(list(LANG_MARKERS)):
        predicted = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(predicted)
    return scored.select(
        "doc_id",
        "actual_lang",
        predicted.alias("predicted_lang"),
        *[F.col(f"score_{lang}") for lang in LANG_MARKERS],
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized lowercase text."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), " +", " ")
    return df.select("doc_id", F.md5(normalized).alias("fingerprint"))
