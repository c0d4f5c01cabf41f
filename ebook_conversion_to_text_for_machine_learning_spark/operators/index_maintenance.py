"""Compaction for the persisted incremental indexes.

Engine extension (the reference is a single-process converter with no
persisted state): the minhash dedup index (``operators/dedup.py``), the
ANN index and the PQ code table (``operators/similarity.py``) all grow
one ``batch_id=<n>`` hive partition per ingest batch — O(batch) appends,
partition-pruned probes. What goes *up* must eventually merge back
*down*: after 10^4 streaming micro-batches (``streaming/dedup.py``
appends one index batch per trigger) the ``bands/``/``grams/`` tables
hold 10^4 × 256 directories and every probe's pruned read fans across
10^4 small files per prefix. These compactors squash the accumulated
batch partitions into the single ``batch_id=-1`` base partition —
the same ``COMPACTED_BATCH_ID`` convention as the streaming seen-hash
sidecar (``streaming/curation.py``) — preserving probe decisions
exactly.

Checkpoint awareness (the sidecar's contract, reused): pass the
stream's ``checkpoint_dir`` and only batches at or below the last
COMMITTED micro-batch are folded. A batch above the commit horizon may
be replayed (at-least-once), and ``dedup_against_index``'s
``exclude_batch_id=N`` replay guard only works while batch N's rows
still live in their own partition — folding an uncommitted batch into
the base would make a replay flag its docs as dups of their own
half-appended copies and drop them. ``index_batch_offset`` maps
micro-batch ids to index batch ids (``stream_near_dedup`` appends
micro-batch N as index batch N+1).

Crash protocol (single maintenance writer, same window contract as
``compact_seen_sidecar``): the merged base is STAGED to
``<index>/_compact/<table>`` first — a plain streaming write, never a
corpus-size driver materialization — together with a ``_FOLDED.json``
manifest of the batch ids it covers; only then are the folded source
dirs deleted and the staging dir renamed (an O(1) metadata op) to
``batch_id=-1``. A crash before the manifest lands leaves the index
untouched (stale staging is discarded and re-built); a crash after it
is completed by the next ``compact_*`` call from the manifest — it
deletes exactly the manifest's ids, never a batch appended after the
crash. Merges dedupe on each table's logical key, so re-running any
step converges. Between the first source delete and the rename, probes
of THIS index would miss folded rows — run compaction in the same
maintenance window the sidecar requires (between micro-batches /
against a cleanly-stopped stream) and re-run it after a crash before
the next probe.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.streaming.curation import (
    COMPACTED_BATCH_ID,
    last_committed_batch,
)

_MANIFEST = "_FOLDED.json"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _batch_ids(spark: SparkSession, table_dir: str) -> list[int]:
    """Batch ids present as ``batch_id=<n>`` partition dirs — a pure
    file-listing, never a table scan (partition values are directory
    names by construction)."""
    fs, p, _ = _fs(spark, table_dir)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(out)


def _delete_dir(spark: SparkSession, path: str) -> None:
    fs, p, _ = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def _read_small_file(spark: SparkSession, path: str) -> str | None:
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        out = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            out.append(b)
        return out.decode("utf-8")
    finally:
        stream.close()


def _write_small_file(spark: SparkSession, path: str, data: str) -> None:
    fs, p, _ = _fs(spark, path)
    stream = fs.create(p, True)
    try:
        stream.write(bytearray(data, "utf-8"))
    finally:
        stream.close()


def _compact_table(
    spark: SparkSession,
    table_dir: str,
    staging_dir: str,
    *,
    key_cols: list[str],
    sub_parts: list[str],
    committed_max: int | None,
) -> int:
    """Fold one table's batch partitions into ``batch_id=-1``.

    Returns the number of batch partitions folded (0 = nothing to do).
    """
    manifest_path = f"{staging_dir}/{_MANIFEST}"
    success_path = f"{staging_dir}/_SUCCESS"
    fs, _, _ = _fs(spark, staging_dir)
    staged = _read_small_file(spark, manifest_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    if staged is not None and fs.exists(jvm_path(success_path)):
        # Crash recovery: staging is complete — finish the fold using
        # the manifest's EXACT id list (ids appended after the crash are
        # untouched even if they are below the commit horizon now).
        folded = json.loads(staged)["folded"]
    else:
        _delete_dir(spark, staging_dir)  # stale partial staging, if any
        ids = _batch_ids(spark, table_dir)
        fold = [
            b
            for b in ids
            if b != COMPACTED_BATCH_ID
            and (committed_max is None or b <= committed_max)
        ]
        if not fold:
            return 0
        folded = fold + ([COMPACTED_BATCH_ID] if COMPACTED_BATCH_ID in ids else [])
        merged = (
            spark.read.parquet(table_dir)
            .where(F.col("batch_id").isin(folded))
            .drop("batch_id")
            .dropDuplicates(key_cols)
        )
        if sub_parts:
            # One file per partition dir, not one per (task × dir) —
            # the write_minhash_index small-files lesson.
            (
                merged.repartition(*[F.col(c) for c in sub_parts])
                .write.mode("overwrite")
                .partitionBy(*sub_parts)
                .parquet(staging_dir)
            )
        else:
            merged.coalesce(1).write.mode("overwrite").parquet(staging_dir)
        _write_small_file(
            spark, manifest_path, json.dumps({"folded": folded})
        )
    for b in folded:
        _delete_dir(spark, f"{table_dir}/batch_id={b}")
    # Atomic-ish publish: the staged base becomes the compacted
    # partition in one metadata rename (manifest/_SUCCESS ride along —
    # underscore-prefixed files are invisible to parquet readers).
    fs.rename(
        jvm_path(staging_dir),
        jvm_path(f"{table_dir}/batch_id={COMPACTED_BATCH_ID}"),
    )
    return len([b for b in folded if b != COMPACTED_BATCH_ID])


def _compact_index(
    spark: SparkSession,
    path: str,
    tables: list[tuple[str, list[str], list[str]]],
    *,
    checkpoint_dir: str | None,
    index_batch_offset: int,
) -> int:
    base = path.rstrip("/")
    committed_max = (
        last_committed_batch(spark, checkpoint_dir) + index_batch_offset
        if checkpoint_dir is not None
        else None
    )
    folded = 0
    for name, key_cols, sub_parts in tables:
        folded = max(
            folded,
            _compact_table(
                spark,
                f"{base}/{name}",
                f"{base}/_compact/{name}",
                key_cols=key_cols,
                sub_parts=sub_parts,
                committed_max=committed_max,
            ),
        )
    _delete_dir(spark, f"{base}/_compact")
    return folded


def compact_minhash_index(
    spark: SparkSession,
    path: str,
    *,
    checkpoint_dir: str | None = None,
    index_batch_offset: int = 1,
) -> int:
    """Fold a ``write_minhash_index`` index's accumulated batch
    partitions into the ``batch_id=-1`` base. Probe decisions
    (``dedup_against_index``) are preserved exactly — the union of rows
    is unchanged, dedup keys make the merge idempotent, and probe-side
    partition pruning on ``pfx`` is untouched (the sub-partitioning
    survives inside the compacted partition). Returns the number of
    batch partitions folded (max across the three tables)."""
    return _compact_index(
        spark,
        path,
        [
            ("bands", ["doc_id", "band_id", "bucket"], ["pfx"]),
            ("grams", ["doc_id", "gram_hash"], ["pfx"]),
            ("counts", ["doc_id"], []),
        ],
        checkpoint_dir=checkpoint_dir,
        index_batch_offset=index_batch_offset,
    )


def compact_ann_index(
    spark: SparkSession,
    path: str,
    *,
    checkpoint_dir: str | None = None,
    index_batch_offset: int = 1,
) -> int:
    """Fold a ``write_ann_index`` index's batch partitions into the
    base. ``codebook``/``meta`` are frozen at build time and untouched —
    compaction never re-derives centroids (cell ids would shift)."""
    return _compact_index(
        spark,
        path,
        [
            ("bands", ["item_id", "band_id", "bucket"], ["band_id", "pfx"]),
            ("cells", ["item_id"], ["cell_pfx"]),
        ],
        checkpoint_dir=checkpoint_dir,
        index_batch_offset=index_batch_offset,
    )


def compact_pq_index(
    spark: SparkSession,
    path: str,
    *,
    checkpoint_dir: str | None = None,
    index_batch_offset: int = 1,
) -> int:
    """Fold a ``write_pq_index`` code table's batch partitions into the
    base. ``codebooks/`` is frozen and untouched."""
    return _compact_index(
        spark,
        path,
        [("codes", ["vec_id"], [])],
        checkpoint_dir=checkpoint_dir,
        index_batch_offset=index_batch_offset,
    )
