"""The full extraction job: read → (resume filter) → extract → write +
lineage + metrics (SURVEY.md §3.4, BASELINE.json north_rule).

Checkpoint/resume is engine-level so the Parquet fallback and the Iceberg
snapshot path share one code path: every committed run appends per-partition
``lineage`` rows; a restart left-anti-joins the input against the lineage
table's completed ``doc_id``s (broadcast when small — Catalyst/AQE decides)
and only processes the remainder. On Iceberg the same append is a single
atomic snapshot commit per run.

Metrics come from one ``groupBy`` over the extraction output — partial
(map-side) aggregation is free from Catalyst, so the agg adds one small
shuffle over ~|formats|×|statuses| groups, never over documents.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
    extract_spans,
)


def _append(df: DataFrame, target: str, catalog: bool) -> None:
    """One write shape for both sinks: ``writeTo().append()`` is a single
    atomic Iceberg snapshot commit when a catalog is configured; the
    parquet dir append is the sandbox fallback."""
    if catalog:
        df.writeTo(target).append()
    else:
        df.write.mode("append").parquet(target)


def _read_lineage(spark: SparkSession, lineage_path: str, catalog: bool):
    try:
        if catalog:
            return spark.read.table(lineage_path)
        return spark.read.parquet(lineage_path)
    except Exception:  # first run: no lineage yet
        return None


def resume_filter(input_df: DataFrame, lineage_df: DataFrame | None) -> DataFrame:
    """Drop documents already committed by a previous run (left anti join)."""
    if lineage_df is None:
        return input_df
    done = lineage_df.where(F.col("status") == "committed").select("doc_id").distinct()
    return input_df.join(done, "doc_id", "left_anti")


def run_extraction_job(
    spark: SparkSession,
    input_df: DataFrame,
    output_path: str,
    *,
    lineage_path: str | None = None,
    metrics_path: str | None = None,
    repartition: int | None = None,
    catalog: bool = False,
) -> dict:
    """Execute the pipeline, returning the metrics summary.

    With ``catalog=False`` (sandbox default) ``output_path``/
    ``lineage_path``/``metrics_path`` are parquet dirs; with
    ``catalog=True`` they are catalog table names (e.g.
    ``lake.db.extracted``) and every append is an atomic
    ``writeTo(...).append()`` Iceberg snapshot commit — the resume
    left-anti join then reads committed doc_ids from the last snapshot, so
    a restart is exact, not best-effort. Tables are created once with the
    DDL in ``sources/tables.py``.
    """
    run_id = uuid.uuid4().hex
    started = time.time()

    lineage_df = None
    if lineage_path:
        lineage_df = _read_lineage(spark, lineage_path, catalog)

    todo = resume_filter(input_df, lineage_df)
    extracted = extract_spans(todo, repartition=repartition)
    extracted.persist()
    try:
        _append(extracted.select("doc_id", "fmt", "spans"), output_path, catalog)

        # Metrics counters (docs in/dropped, chapters, media, per format).
        # Collected BEFORE the lineage append: writing into lineage_path
        # invalidates any cached plan that reads it (the resume anti-join),
        # and a recompute after the append would see its own commit.
        metrics_rows = (
            extracted.groupBy("fmt", "status")
            .agg(
                F.count("*").alias("docs"),
                F.sum(F.when(F.col("n_spans") == 0, 1).otherwise(0)).alias("docs_empty"),
                F.sum("n_spans").alias("spans_out"),
                F.sum("n_media").alias("media_spans"),
            )
            .withColumn("run_id", F.lit(run_id))
        )
        if metrics_path:
            _append(metrics_rows, metrics_path, catalog)
        metrics = [row.asDict() for row in metrics_rows.collect()]

        # Per-partition lineage: partition id, doc/span counts, commit id.
        # Written LAST — committing lineage marks the run complete, so a
        # crash before this point simply reprocesses the run's documents.
        lineage = (
            extracted.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count("*").alias("doc_count"),
                F.sum("n_spans").alias("span_count"),
                # Fold CPU time per partition — the skew signal that matters
                # (doc_count alone hides a partition of giant PDFs).
                F.sum("elapsed_us").alias("cpu_us"),
            )
            .withColumn("status", F.lit("committed"))
            .withColumn("run_id", F.lit(run_id))
        )
        doc_lineage = extracted.select(
            "doc_id",
            F.lit("committed").alias("status"),
            F.lit(run_id).alias("run_id"),
        )
        if lineage_path:
            # Partition stats first: the doc_lineage append into lineage_path
            # is the commit point and also invalidates the cached plan.
            _append(lineage, lineage_path + "_partitions", catalog)
            _append(doc_lineage, lineage_path, catalog)
    finally:
        extracted.unpersist()

    return {
        "run_id": run_id,
        "elapsed_sec": time.time() - started,
        "metrics": metrics,
    }
