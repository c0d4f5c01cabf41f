"""Streaming deduplication: watermark-bounded exact dedup on content hash.

Engine extension (the reference is batch-only): the streaming sibling of
``operators.dedup.exact_dedup`` for a continuously-fed corpus. Each
document is keyed by ``md5(text)``; ``dropDuplicatesWithinWatermark``
keeps only the first arrival of each hash while the watermark bounds the
dedup state — the property that makes this viable on an unbounded
10^12-document stream, where an ever-growing exact-dedup hash table would
eventually exceed any executor. Duplicates farther apart than the
watermark are the batch job's responsibility (periodic ``exact_dedup``
compaction over the landed table); the stream guarantees no duplicate
within the late-data horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-wins dedup on content hash with bounded state."""
    hashed = stream.withColumn("text_hash", F.md5(F.col(text_col))).withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )
