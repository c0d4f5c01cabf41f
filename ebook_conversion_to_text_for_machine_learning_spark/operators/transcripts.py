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
