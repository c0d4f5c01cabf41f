"""Streaming extraction: new span files in → extracted span files out.

The reference is strictly batch (SURVEY.md §2.7), so this is an engine
extension, not a ported semantic: the same ``extract_spans`` operator runs
inside ``foreachBatch`` with an idempotent per-batch-directory commit
(foreachBatch alone is at-least-once; overwriting ``batch_id=N`` makes a
replayed batch rewrite itself instead of duplicating rows), reusing the
batch pipeline's lineage/metrics wiring unchanged.

``foreachBatch`` (rather than a direct streaming ``mapInArrow`` lineage) is
deliberate: each micro-batch is a normal DataFrame, so broadcast joins,
AQE, and the pipeline's writer all behave identically to the batch path —
one code path to test for correctness, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
    INPUT_SCHEMA,
    extract_spans,
)


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 16,
    available_now: bool = False,
) -> StreamingQuery:
    """Start a file-source streaming extraction.

    ``available_now=True`` drains everything currently in ``input_dir`` and
    stops (used by tests and backfills); otherwise the query runs until
    stopped, picking up newly landed parquet files per micro-batch.
    """
    source = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _process(batch_df, batch_id: int) -> None:
        # Idempotent per-batch commit: foreachBatch is at-least-once (a
        # crash between the sink write and the checkpoint offset commit
        # replays the batch), so each batch OVERWRITES its own
        # batch_id=N partition dir — a replay rewrites the same files
        # instead of appending duplicates. Readers see batch_id as a
        # partition column via directory discovery.
        (
            extract_spans(batch_df)
            .select("doc_id", "fmt", "spans", "n_spans", "status")
            .write.mode("overwrite")
            .parquet(f"{output_dir}/batch_id={batch_id}")
        )

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
