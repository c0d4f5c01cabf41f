"""Watermarked windowed aggregation over a document/event stream.

Engine extension (the reference is batch-only): operational telemetry for a
continuously-fed extraction pipeline — per-window document counts by format
and status, tolerant of late arrivals up to the watermark. The pattern is
the standard Structured Streaming shape: event-time watermark → tumbling
window groupBy → append-mode sink; state is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Streaming tumbling-window counts with late-data tolerance."""
    # Watermarks require TIMESTAMP (session-TZ); parquet NTZ columns are
    # reinterpreted in the session TZ (pinned to UTC in session.py).
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def start_memory_sink(agg: DataFrame, name: str) -> StreamingQuery:
    """Test/demo sink: complete-mode in-memory table."""
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
