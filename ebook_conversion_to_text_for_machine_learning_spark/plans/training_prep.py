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


def prepare_training_sequences(
    spans_df: DataFrame,
    *,
    min_quality: float = DEFAULT_MIN_QUALITY,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """The complete curation chain: extract → quality-filter → exact dedup
    → PII scrub → chunk → split-assign.

    Output is the training-sequence table: one row per (keeper document ×
    chunk) with its split assignment — what actually feeds a tokenizer at
    10^12-document scale. Plan shape: everything after the dedup aggregate
    is narrow per-row work (regexp scrub, bounded chunk explode, md5
    bucket), so the whole chain keeps exactly ONE data shuffle (the dedup
    hash aggregate); the chunk explode multiplies rows only after dedup
    has already shrunk the corpus.
    """
    from ebook_conversion_to_text_for_machine_learning_spark.operators.curation import (
        chunk_documents,
        scrub_pii,
        split_col,
    )

    keepers = prepare_training_data(spans_df, min_quality=min_quality).select(
        F.col("keeper_doc_id").alias("doc_id"),
        F.col("extracted_text").alias("text"),
    )
    scrubbed = scrub_pii(keepers).select(
        "doc_id", F.col("scrubbed_text").alias("text")
    )
    chunks = chunk_documents(scrubbed, chunk_tokens=chunk_tokens, overlap=overlap)
    # Split is a pure function of doc_id (curation.split_col), so it rides
    # along as a projection — no join, keeping the dedup aggregate the only
    # shuffle in the whole chain.
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        "chunk_text",
        "n_chunk_tokens",
        split_col(F.col("doc_id")).alias("split"),
    )
