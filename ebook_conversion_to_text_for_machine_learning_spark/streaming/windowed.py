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
    value_col: str = "value",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Streaming tumbling-window counts with late-data tolerance.

    ``value_col`` names the summed measure (parameterized like the other
    columns — a stream without it would otherwise fail analysis)."""
    # Watermarks require TIMESTAMP (session-TZ); parquet NTZ columns are
    # reinterpreted in the session TZ (pinned to UTC in session.py).
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
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
    """Test/demo sink ONLY: complete-mode in-memory table. Complete mode
    retains every window's state and the full result table — the
    watermark does NOT evict state here, so never use this sink on an
    unbounded production stream; the bounded-state claim in the module
    docstring holds for an append-mode sink (e.g.
    ``writeStream.outputMode("append").format("parquet")``)."""
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
