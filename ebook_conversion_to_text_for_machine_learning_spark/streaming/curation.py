"""Streaming curation: span files in → incremental training sequences out.

Engine extension (the reference is batch-only). Each micro-batch runs the
SAME ``prepare_training_sequences`` chain as the batch CLI, with
``seen_hashes`` pointed at the already-landed output table — so a
document that arrived (or was duplicated) in any earlier micro-batch is
anti-joined away before it can re-emit sequences. This is the unbounded
complement to ``streaming.dedup.streaming_exact_dedup``: the watermark
variant bounds state but only guarantees no duplicates within the late
horizon; this variant is exact across the whole stream's history because
its "state" is the landed table itself. The per-batch anti-join reads
only the ``text_hash`` column (parquet column pruning keeps it narrow),
and at lake scale both sides bucket by ``text_hash``.

``foreachBatch`` keeps one code path for batch and streaming (see
``streaming.stream`` for the rationale).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
    INPUT_SCHEMA,
)
from ebook_conversion_to_text_for_machine_learning_spark.plans.training_prep import (
    DEFAULT_MIN_QUALITY,
    prepare_training_sequences,
)


def stream_curation(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    min_quality: float = DEFAULT_MIN_QUALITY,
    chunk_tokens: int = 128,
    overlap: int = 16,
    max_files_per_trigger: int = 16,
    available_now: bool = False,
) -> StreamingQuery:
    """Start a file-source streaming curation job.

    ``available_now=True`` drains the current backlog and stops (tests,
    backfills); otherwise the query keeps consuming newly landed span
    files. Output rows are the training-sequence table of
    ``prepare_training_sequences``; each distinct surviving text emits
    its chunks exactly once across the stream's lifetime.
    """
    source = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _process(batch_df, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        session = batch_df.sparkSession
        try:
            seen = session.read.parquet(output_dir).select("text_hash")
        except AnalysisException as ex:
            # Only the "nothing landed yet" states may proceed without a
            # seen set: a missing path, or an existing dir with no
            # committed data files (e.g. only _temporary/ from a killed
            # batch-0 write → UNABLE_TO_INFER_SCHEMA) — neither can hold
            # duplicates. Any OTHER read failure (transient store error,
            # corrupt footer) must fail the batch so the stream retries —
            # swallowing it would silently append duplicates.
            if (
                "PATH_NOT_FOUND" not in str(ex)
                and "UNABLE_TO_INFER_SCHEMA" not in str(ex)
            ):
                raise
            seen = None
        (
            prepare_training_sequences(
                batch_df,
                min_quality=min_quality,
                chunk_tokens=chunk_tokens,
                overlap=overlap,
                seen_hashes=seen,
            )
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = source.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
