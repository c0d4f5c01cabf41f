"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the 10^12-document posture (BASELINE.json north_rule): AQE on
(runtime re-planning + skew-join splitting), explicit shuffle-partition
sizing, Arrow batches bounded so one batch of giant documents cannot blow a
Python worker's memory, and parquet scans capped at sane split sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: One Arrow batch ≈ this many documents. Median doc ≈ 40 spans ≈ 4-8 KB of
#: text → ~2-4 MB per batch; the giant-PDF tail (25 pages × 200 lines) is
#: bounded at ~512 × ~500 KB ≈ 256 MB worst-case, still executor-safe.
ARROW_BATCH_ROWS = 512


def build_session(
    app_name: str = "ebook-extraction-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
