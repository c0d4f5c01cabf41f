"""Distributed extraction operator — Arrow-batched ``mapInPandas``.

The relational shell is declarative (Catalyst plans the scan, pruning, and
any repartitioning); the per-document sequential semantics run inside one
vectorized pandas UDF per partition. There is **no row-at-a-time Python
UDF** anywhere: data crosses the JVM↔Python boundary as Arrow record
batches only (BASELINE.json input_hint).

Skew policy (SURVEY.md §3.4): ``mapInPandas`` is a narrow transformation —
with well-sized input splits no shuffle is needed at all. For skewed inputs
(a few files full of giant PDFs), ``salted_repartition`` spreads documents
uniformly by hashing ``doc_id`` — a full shuffle, used only when requested,
because AQE cannot rebalance a skewed Python-map stage on its own. Within a
partition, Arrow batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so one batch of tail-sized
documents stays within executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ebook_conversion_to_text_for_machine_learning_spark.core.extract import (
    extract_document,
)

#: Input contract (BASELINE.json input_hint + metadata columns, SURVEY.md §1.3).
INPUT_SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("fmt", StringType(), False),
        StructField("title", StringType(), True),
        StructField("author", StringType(), True),
        StructField("spans", ArrayType(INPUT_SPAN_STRUCT), False),
    ]
)

OUTPUT_SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("order", IntegerType()),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("fmt", StringType(), False),
        StructField("spans", ArrayType(OUTPUT_SPAN_STRUCT), False),
        StructField("n_spans", IntegerType(), False),
        StructField("n_media", IntegerType(), False),
        StructField("status", StringType(), False),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One Arrow batch of documents in → one batch of extracted spans out."""
    for batch in batches:
        doc_ids = batch["doc_id"].to_numpy()
        fmts = batch["fmt"].to_numpy()
        titles = batch["title"].to_numpy(dtype=object)
        authors = batch["author"].to_numpy(dtype=object)
        spans_col = batch["spans"].to_numpy(dtype=object)

        out_spans = []
        out_counts = []
        out_media = []
        out_status = []
        for spans in spans_col:
            rows = [(s["kind"], s["text"] or "", s["media_ref"] or "") for s in spans]
            offsets = [s["offset"] for s in spans]
            if any(offsets[i] > offsets[i + 1] for i in range(len(offsets) - 1)):
                order = sorted(range(len(rows)), key=offsets.__getitem__)
                rows = [rows[i] for i in order]
            out_spans.append(rows)
            out_counts.append(0)
            out_media.append(0)
            out_status.append("")
        for i in range(len(out_spans)):
            title = titles[i] if isinstance(titles[i], str) else None
            author = authors[i] if isinstance(authors[i], str) else None
            result, status = extract_document(fmts[i], out_spans[i], title, author)
            out_spans[i] = [
                {"kind": k, "text": t, "media_ref": r, "order": o}
                for k, t, r, o in result
            ]
            out_counts[i] = len(result)
            out_media[i] = sum(1 for k, _, _, _ in result if k == "media_ref")
            out_status[i] = status
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "fmt": fmts,
                "spans": out_spans,
                "n_spans": out_counts,
                "n_media": out_media,
                "status": out_status,
            }
        )


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Uniformly spread documents by a 64-bit hash of ``doc_id``.

    Breaks source-file clustering/skew (all the giant PDFs in one input
    split) before the Python-map stage; a deliberate full shuffle.
    """
    return df.repartition(num_partitions, F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions)))


def extract_spans(
    df: DataFrame,
    *,
    repartition: int | None = None,
) -> DataFrame:
    """Run the per-format extraction over a documents_spans DataFrame.

    Narrow by default; pass ``repartition`` to salt-shuffle skewed inputs
    first. Column pruning happens in the select below, so the parquet scan
    reads only the five contract columns regardless of extra input columns.
    """
    projected = df.select("doc_id", "fmt", "title", "author", "spans")
    if repartition:
        projected = salted_repartition(projected, repartition)
    return projected.mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
