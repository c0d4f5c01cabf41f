"""OCR-transcript sidecar enrichment.

At 10^12 documents OCR runs as its own offline job whose results land in a
sidecar table ``(doc_id, media_ref, transcript)``; the extraction engine
then consults transcripts wherever the reference would have called its OCR
(north_star replacement). This operator splices sidecar transcripts into
the input spans' image entries before extraction:

- one aggregation turns the sidecar into a per-document
  ``map<media_ref, transcript>`` (small rows — refs and transcripts only);
- a LEFT join attaches it (docs without images never shuffle their spans if
  the sidecar side is broadcast; for lake-scale both sides bucket by
  doc_id);
- a per-row array ``transform`` rewrites ``img`` span text via map lookup —
  pure Catalyst expressions, no Python.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_transcripts(
    spans_df: DataFrame,
    transcripts_df: DataFrame,
    *,
    broadcast: bool = True,
) -> DataFrame:
    """Overwrite image-span text with sidecar transcripts where available.

    Non-image spans and images without a sidecar row are untouched (the
    reference's OCR-failure path leaves the empty transcript in place).
    """
    per_doc = transcripts_df.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("media_ref", "transcript"))
        ).alias("_transcripts")
    )
    if broadcast:
        per_doc = F.broadcast(per_doc)

    enriched_spans = F.transform(
        F.col("spans"),
        lambda s: F.when(
            (s["kind"] == "img") & F.col("_transcripts").isNotNull()
            & F.col("_transcripts")[s["media_ref"]].isNotNull(),
            F.struct(
                s["kind"].alias("kind"),
                F.col("_transcripts")[s["media_ref"]].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).otherwise(s),
    )
    return (
        spans_df.join(per_doc, "doc_id", "left")
        .withColumn("spans", enriched_spans)
        .drop("_transcripts")
    )


def run_ocr_with_retries(
    ocr_fn: Callable[[List[Any]], str],
    images: List[Any],
    *,
    max_retries: int = 3,
) -> str:
    """Reference ``run_ocr`` control flow (ocr.py:80-115) around an
    injected OCR callable.

    - empty image list → "" (ocr.py:93-95);
    - empty/None answer → "" (the reference's NoResponseError lands in its
      own except-return-"" path, ocr.py:110-115);
    - refusal answers retried; after ``max_retries`` extra attempts the
      reference raises into its except and returns "" (ocr.py:103-108);
    - any exception from the callable → "" — at 10^12 docs OCR failures
      must be data, never task failures;
    - successful answers pass through ``clean_ocr_response`` ("No text
      found" → "", ocr.py:70-77).
    """
    if not images:
        return ""
    from ebook_conversion_to_text_for_machine_learning_spark.core.media_prep import (
        GPT_REFUSALS,
        clean_ocr_response,
    )

    try:
        for _attempt in range(max_retries + 1):
            answer = ocr_fn(images)
            if not answer:
                return ""
            if any(refusal in answer for refusal in GPT_REFUSALS):
                continue
            return clean_ocr_response(answer)
        return ""
    except Exception:  # noqa: BLE001 — reference maps every OCR error to ""
        return ""


def apply_ocr(
    spans_df: DataFrame,
    ocr_fn: Callable[[List[Any]], str],
    *,
    image_loader: Optional[Callable[[str], Any]] = None,
    max_retries: int = 3,
) -> DataFrame:
    """Live-OCR enrichment: rewrite ``img`` span text via an injected OCR
    callable (the M5 completion; the sidecar path above stays the default
    at lake scale).

    ``ocr_fn`` receives a list of images and returns the recognized text —
    the reference's ``run_ocr`` contract, so an OpenAI-vision client, a
    local model, or a test mock drop in unchanged. ``image_loader`` maps a
    span's ``media_ref`` to the image payload handed to ``ocr_fn``
    (default: pass the ref itself). Runs as Arrow-batched ``mapInPandas``
    — one Python crossing per batch, refusal/retry handled per image by
    ``run_ocr_with_retries``; failures become empty transcripts (the
    reference's OCR-failure path), never task failures.
    """
    import pandas as pd

    loader = image_loader or (lambda ref: ref)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rewritten = []
            for spans in batch["spans"]:
                out = []
                for s in spans:
                    if s["kind"] == "img":
                        images = [loader(s["media_ref"])] if s["media_ref"] else []
                        s = dict(s)
                        s["text"] = run_ocr_with_retries(
                            ocr_fn, images, max_retries=max_retries
                        )
                    out.append(s)
                rewritten.append(out)
            batch = batch.copy()
            batch["spans"] = rewritten
            yield batch

    return spans_df.mapInPandas(batches, schema=spans_df.schema)
