"""Compaction of the persisted incremental indexes: decisions must be
identical before/after, layouts must collapse to one base partition
with one file per prefix dir, the streaming commit horizon must gate
what folds, and a crash mid-fold must be completable by re-run."""

import os

from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.operators import (
    index_maintenance as M,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators.dedup import (
    append_to_minhash_index,
    dedup_against_index,
    write_minhash_index,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


_BASE = [
    ("b%d" % i, "the quick brown fox jumps over the lazy dog %d and then rests" % i)
    for i in range(8)
]
_APP1 = [("a1", "an entirely different first appended document about spark engines")]
_APP2 = [("a2", "a second append batch with its own fresh content about parquet")]
# probe: near-dup of b0 (one word changed) + near-dup of a1 + novel
_PROBE = [
    ("p0", "the quick brown fox jumps over the lazy dog 0 and then sleeps"),
    ("p1", "an entirely different first appended document about spark planes"),
    ("p2", "completely novel probe text that matches nothing in the index"),
]


def _built_index(spark, tmp_path, name="idx"):
    path = str(tmp_path / name)
    write_minhash_index(_docs(spark, _BASE), path)
    append_to_minhash_index(_docs(spark, _APP1), path, batch_id=1)
    append_to_minhash_index(_docs(spark, _APP2), path, batch_id=2)
    return path


def _decisions(spark, path):
    return sorted(
        map(tuple, dedup_against_index(spark, _docs(spark, _PROBE), path).collect())
    )


def test_compact_minhash_preserves_decisions_and_collapses_layout(spark, tmp_path):
    path = _built_index(spark, tmp_path)
    before = _decisions(spark, path)
    assert before, "probe must produce dup rows for the test to mean anything"

    assert M.compact_minhash_index(spark, path) == 3  # batches 0, 1, 2
    after = _decisions(spark, path)
    assert after == before

    for table in ("bands", "grams", "counts"):
        dirs = os.listdir(f"{path}/{table}")
        assert [d for d in dirs if d.startswith("batch_id=")] == ["batch_id=-1"]
    # one part-file per pfx dir (the small-files contract), manifest rode along
    bands_base = f"{path}/bands/batch_id=-1"
    pfx_dirs = [d for d in os.listdir(bands_base) if d.startswith("pfx=")]
    assert pfx_dirs
    for d in pfx_dirs:
        parts = [f for f in os.listdir(f"{bands_base}/{d}") if f.endswith(".parquet")]
        assert len(parts) == 1, (d, parts)

    # idempotent: nothing left to fold, decisions unchanged
    assert M.compact_minhash_index(spark, path) == 0
    assert _decisions(spark, path) == before

    # the compacted index keeps working as an append target + probe base
    append_to_minhash_index(_docs(spark, [("a3", _PROBE[2][1])]), path, batch_id=3)
    out = dedup_against_index(spark, _docs(spark, _PROBE), path)
    assert {r.doc_id for r in out.collect()} >= {"p0", "p1", "p2"}
    # ...and re-compacting folds the new batch into the same base
    assert M.compact_minhash_index(spark, path) == 1


def test_compact_respects_stream_commit_horizon(spark, tmp_path):
    path = _built_index(spark, tmp_path)
    ckpt = tmp_path / "ckpt" / "commits"
    ckpt.mkdir(parents=True)
    # micro-batch 0 committed -> index batch 1 is foldable (offset 1);
    # index batch 2 (micro-batch 1) is above the horizon: a replay may
    # still need exclude_batch_id=2 to skip its own partitions.
    (ckpt / "0").write_text("{}")
    before = _decisions(spark, path)
    assert (
        M.compact_minhash_index(
            spark, path, checkpoint_dir=str(tmp_path / "ckpt")
        )
        == 2  # batches 0 and 1
    )
    for table in ("bands", "grams", "counts"):
        dirs = sorted(
            d for d in os.listdir(f"{path}/{table}") if d.startswith("batch_id=")
        )
        assert dirs == ["batch_id=-1", "batch_id=2"], (table, dirs)
    assert _decisions(spark, path) == before
    # the retained batch still excludes itself on replay
    replay = dedup_against_index(
        spark, _docs(spark, _APP2), path, exclude_batch_id=2
    )
    assert replay.where(F.col("doc_id") == "a2").count() == 0


def test_compact_crash_mid_fold_completes_on_rerun(spark, tmp_path, monkeypatch):
    path = _built_index(spark, tmp_path)
    before = _decisions(spark, path)

    real_delete = M._delete_dir
    calls = {"n": 0}

    def exploding_delete(spark_, p):
        calls["n"] += 1
        if calls["n"] == 2:  # die after the first source-partition delete
            raise RuntimeError("simulated crash mid-fold")
        real_delete(spark_, p)

    monkeypatch.setattr(M, "_delete_dir", exploding_delete)
    try:
        M.compact_minhash_index(spark, path)
    except RuntimeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("crash did not fire")
    monkeypatch.setattr(M, "_delete_dir", real_delete)

    # staging for the crashed table exists with its manifest; re-run
    # completes the fold from the manifest and the rest of the tables
    M.compact_minhash_index(spark, path)
    assert _decisions(spark, path) == before
    for table in ("bands", "grams", "counts"):
        dirs = [
            d for d in os.listdir(f"{path}/{table}") if d.startswith("batch_id=")
        ]
        assert dirs == ["batch_id=-1"], (table, dirs)
    assert not os.path.exists(f"{path}/_compact")


def test_compact_ann_index_identical_topk(spark, tmp_path):
    from ebook_conversion_to_text_for_machine_learning_spark.operators.similarity import (
        append_to_ann_index,
        ivf_ann_topk_indexed,
        lsh_ann_topk_indexed,
        read_ann_index,
        write_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 3 != 0)
    extra = emb.where(F.col("vec_id") % 3 == 0)
    dim = len(base.select("embedding").first()[0])
    path = str(tmp_path / "ann")
    write_ann_index(base, dim, path)
    append_to_ann_index(extra, path, batch_id=1)

    probes = emb.where(F.col("vec_id") < 5)
    idx = read_ann_index(spark, path)
    lsh_before = sorted(map(tuple, lsh_ann_topk_indexed(idx, probes, k=5).collect()))
    ivf_before = sorted(map(tuple, ivf_ann_topk_indexed(idx, probes, k=5).collect()))

    from ebook_conversion_to_text_for_machine_learning_spark.operators.index_maintenance import (
        compact_ann_index,
    )

    assert compact_ann_index(spark, path) == 2
    idx2 = read_ann_index(spark, path)
    assert sorted(map(tuple, lsh_ann_topk_indexed(idx2, probes, k=5).collect())) == lsh_before
    assert sorted(map(tuple, ivf_ann_topk_indexed(idx2, probes, k=5).collect())) == ivf_before
    for table in ("bands", "cells"):
        dirs = [
            d for d in os.listdir(f"{path}/{table}") if d.startswith("batch_id=")
        ]
        assert dirs == ["batch_id=-1"], (table, dirs)


def test_compact_pq_index_identical_topk(spark, tmp_path):
    from ebook_conversion_to_text_for_machine_learning_spark.operators.index_maintenance import (
        compact_pq_index,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.operators.similarity import (
        append_to_pq_index,
        pq_adc_topk,
        read_pq_index,
        write_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") % 3 != 0)
    extra = emb.where(F.col("vec_id") % 3 == 0)
    path = str(tmp_path / "pq")
    write_pq_index(base, path, m=2, target_codes=8)
    append_to_pq_index(extra, path, batch_id=1)

    probes = emb.where(F.col("vec_id") < 5)
    books, codes = read_pq_index(spark, path)
    before = sorted(
        map(tuple, pq_adc_topk(emb, probes, books, k=5, codes=codes).collect())
    )
    assert compact_pq_index(spark, path) == 2
    books2, codes2 = read_pq_index(spark, path)
    assert books2 == books
    assert (
        sorted(
            map(tuple, pq_adc_topk(emb, probes, books2, k=5, codes=codes2).collect())
        )
        == before
    )
    dirs = [d for d in os.listdir(f"{path}/codes") if d.startswith("batch_id=")]
    assert dirs == ["batch_id=-1"]


def test_dedup_against_index_legacy_layout_guard(spark, tmp_path):
    """A pre-partitioning index layout (flat tables, no batch_id/pfx)
    still probes correctly — pruning degrades to a full read — but
    replay exclusion demands the partitioned layout (advice r4)."""
    import pytest

    from ebook_conversion_to_text_for_machine_learning_spark.operators.dedup import (
        gram_hashes,
        minhash_bands,
        minhash_signatures,
    )

    corpus = _docs(spark, _BASE)
    path = str(tmp_path / "legacy")
    minhash_bands(minhash_signatures(corpus, "text")).write.parquet(f"{path}/bands")
    gram_hashes(corpus, "text").write.parquet(f"{path}/grams")
    gram_hashes(corpus, "text").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_grams")
    ).write.parquet(f"{path}/counts")

    out = dedup_against_index(spark, _docs(spark, _PROBE), path)
    assert {r.doc_id for r in out.collect()} == {"p0"}
    with pytest.raises(ValueError, match="partitioned layout"):
        dedup_against_index(
            spark, _docs(spark, _PROBE), path, exclude_batch_id=1
        ).collect()
