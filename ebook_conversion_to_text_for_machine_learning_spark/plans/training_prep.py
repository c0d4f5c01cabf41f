"""Composed training-data preparation: extract → quality-filter → dedup.

The engine's purpose in one plan: raw interleaved documents go in, a
deduplicated, quality-filtered corpus of extracted text comes out. Each
stage is an existing verified operator; composing them declaratively lets
Catalyst fuse the projection chain into the scan and run the dedup as one
map-side-combined hash aggregate — at 10^12 documents the only shuffle in
the whole plan is the final aggregate on narrow (hash, id, score) rows,
never raw text bodies... except the text ride-along for the keeper, which
stays one column.

Stage semantics:
1. extraction — ``extract_spans`` (the reference-parity fold);
2. quality — ``text_stats.quality_scores`` over the EXTRACTED text (what
   a curation pipeline actually filters on), threshold on the rounded
   score so the DuckDB oracle agrees bit-for-bit;
3. dedup — exact, first-keeper-wins on ``md5(extracted_text)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
    extract_spans,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators.text_stats import (
    quality_scores,
    tokens_col,
)

DEFAULT_MIN_QUALITY = 0.5


def prepare_training_data(
    spans_df: DataFrame, *, min_quality: float = DEFAULT_MIN_QUALITY
) -> DataFrame:
    """Input: documents_spans contract rows. Output: one row per distinct
    surviving text — (text_hash, keeper_doc_id, n_copies, quality_score,
    extracted_text)."""
    extracted = extract_spans(spans_df).select(
        "doc_id",
        F.array_join(F.transform("spans", lambda s: s["text"]), "").alias(
            "extracted_text"
        ),
    )
    # Filter empty/token-less extractions BEFORE scoring: ANSI mode makes
    # the ratio divisions throw on zero tokens (and the SQL oracle's CTE
    # order does the same filtering first).
    non_empty = extracted.where(
        (F.length("extracted_text") > 0)
        & (F.size(tokens_col(F.col("extracted_text"))) > 0)
    )
    scored = non_empty.join(
        quality_scores(non_empty, text_col="extracted_text").select(
            "doc_id", "quality_score"
        ),
        "doc_id",
    )
    survivors = scored.where(F.col("quality_score") >= min_quality)
    return survivors.groupBy(F.md5("extracted_text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").cast("long").alias("n_copies"),
        F.min("quality_score").alias("quality_score"),
        F.min("extracted_text").alias("extracted_text"),
    )
