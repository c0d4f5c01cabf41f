"""End-to-end Spark tests: goldens through mapInPandas, pipeline, resume."""

import pytest

from tests import fixtures as fx
from tests.conftest import spans_df


def _collect_spans(df):
    out = {}
    for row in df.collect():
        out[row.doc_id] = [(s.kind, s.text, s.media_ref, s.order) for s in row.spans]
    return out


def test_golden_docs_through_spark(spark):
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )

    docs = [doc for doc, _ in fx.GOLDEN_DOCS]
    result = _collect_spans(extract_spans(spans_df(spark, docs)))
    for doc, expected in fx.GOLDEN_DOCS:
        assert result[doc["doc_id"]] == expected, doc["doc_id"]


def test_out_of_order_offsets_are_sorted(spark):
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )

    doc = dict(fx.TXT_001)
    doc["spans"] = list(reversed(doc["spans"]))
    result = _collect_spans(extract_spans(spans_df(spark, [doc])))
    assert result[doc["doc_id"]] == fx.TXT_001_EXPECTED


def test_salted_repartition_matches_narrow_plan(spark):
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )

    docs = fx.random_corpus(60, seed=7)
    df = spans_df(spark, docs)
    narrow = _collect_spans(extract_spans(df))
    salted = _collect_spans(extract_spans(df, repartition=8))
    assert narrow == salted
    assert len(narrow) == 60


def test_salted_repartition_balances_clustered_input(spark):
    """A pathologically clustered input (every doc in one partition) must
    spread ~uniformly after the salted repartition."""
    from pyspark.sql import functions as F

    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        salted_repartition,
    )

    docs = fx.random_corpus(400, seed=11)
    clustered = spans_df(spark, docs).coalesce(1)
    assert clustered.rdd.getNumPartitions() == 1
    sizes = (
        salted_repartition(clustered, 8)
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    assert len(counts) == 8  # no empty partitions (the pmod trap would leave ~1/e empty)
    assert max(counts) <= 2.5 * (400 / 8)


def test_pipeline_with_lineage_and_resume(spark, tmp_path):
    from ebook_conversion_to_text_for_machine_learning_spark.plans.pipeline import (
        run_extraction_job,
    )

    docs = fx.random_corpus(30, seed=3)
    df = spans_df(spark, docs)
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")
    metrics = str(tmp_path / "metrics")

    summary1 = run_extraction_job(
        spark, df, out, lineage_path=lineage, metrics_path=metrics
    )
    assert sum(m["docs"] for m in summary1["metrics"]) == 30
    assert spark.read.parquet(out).count() == 30

    # Second run over the same input: everything already committed → no-op.
    summary2 = run_extraction_job(
        spark, df, out, lineage_path=lineage, metrics_path=metrics
    )
    assert sum(m["docs"] for m in summary2["metrics"]) == 0
    assert spark.read.parquet(out).count() == 30

    # New documents appear → only they are processed.
    more = fx.random_corpus(40, seed=3)[30:]
    for i, d in enumerate(more):
        d["doc_id"] = f"late-{i:04d}"
    df3 = spans_df(spark, docs + more)
    summary3 = run_extraction_job(
        spark, df3, out, lineage_path=lineage, metrics_path=metrics
    )
    assert sum(m["docs"] for m in summary3["metrics"]) == 10
    assert spark.read.parquet(out).count() == 40

    # Per-partition lineage carries doc/span counts AND fold CPU time —
    # the skew signal the SURVEY risk register calls for.
    parts = spark.read.parquet(lineage + "_partitions")
    assert {"partition_id", "doc_count", "span_count", "cpu_us", "status", "run_id"} <= set(
        parts.columns
    )
    from pyspark.sql import functions as F

    row = parts.orderBy(F.desc("doc_count")).first()
    assert row.doc_count > 0 and row.cpu_us > 0


def test_documents_adapter_smoke(spark):
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.sources.tables import (
        documents_as_txt_spans,
    )

    df = documents_as_txt_spans(spark, "/root/testdata/sf0.001")
    out = extract_spans(df)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r.status == "ok" for r in rows)


def test_arrow_eval_plan_no_rowwise_python(spark):
    """The physical plan must use Arrow-batched python (MapInPandas), never
    row-wise BatchEvalPython, and keep the scan pruned to contract columns."""
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.sources.tables import (
        documents_as_txt_spans,
    )

    plan = extract_spans(
        documents_as_txt_spans(spark, "/root/testdata/sf0.001")
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    # Column pruning must reach the parquet scan: only the adapter's two
    # source columns are read, not the whole documents table.
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_null_span_fields_are_tolerated(spark):
    """Lake-scale reality: null text/media_ref/kind inside span structs must
    not poison a task — nulls coerce to '' at the Arrow boundary and unknown
    kinds are ignored, status stays ok."""
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        INPUT_SCHEMA,
        extract_spans,
    )

    docs = [
        ("n1", "txt", None, None, [
            {"kind": "line", "text": None, "media_ref": None, "offset": 0},
            {"kind": "line", "text": "Real.", "media_ref": "", "offset": 1},
        ]),
        ("n2", "epub", None, None, [
            {"kind": "section", "text": None, "media_ref": "", "offset": 0},
            {"kind": "p", "text": "Chapter 1", "media_ref": "", "offset": 1},
            {"kind": "p", "text": "Body.", "media_ref": None, "offset": 2},
        ]),
        ("n3", "pdf", None, None, [{"kind": None, "text": "x", "media_ref": "", "offset": 0}]),
    ]
    df = spark.createDataFrame(docs, schema=INPUT_SCHEMA)
    out = {r.doc_id: r for r in extract_spans(df).collect()}
    assert all(r.status == "ok" for r in out.values())
    assert [(s.kind, s.text) for s in out["n1"].spans] == [("text", "Real.")]
    assert [(s.kind, s.text) for s in out["n2"].spans] == [("text", "Body.")]
    assert out["n3"].spans == []


def test_read_spans_source_json_and_csv_roundtrip(spark, tmp_path):
    """The spans contract reads identically from parquet, JSON-lines, and
    CSV-with-JSON-spans — extraction output matches across all three."""
    import json as jsonlib

    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.sources.tables import (
        read_spans_source,
    )

    docs = [doc for doc, _ in fx.GOLDEN_DOCS]
    base = spans_df(spark, docs)
    pq = str(tmp_path / "pq")
    base.write.parquet(pq)

    js = tmp_path / "js"
    js.mkdir()
    with open(js / "part.json", "w") as f:
        for d in docs:
            f.write(jsonlib.dumps({
                "doc_id": d["doc_id"], "fmt": d["fmt"],
                "title": d["title"], "author": d["author"],
                "spans": [
                    {"kind": k, "text": t, "media_ref": r, "offset": o}
                    for k, t, r, o in d["spans"]
                ],
            }) + "\n")

    import csv as csvlib
    cs = tmp_path / "cs"
    cs.mkdir()
    with open(cs / "part.csv", "w", newline="") as f:
        w = csvlib.writer(f)
        w.writerow(["doc_id", "fmt", "title", "author", "spans"])
        for d in docs:
            w.writerow([
                d["doc_id"], d["fmt"], d["title"], d["author"],
                jsonlib.dumps([
                    {"kind": k, "text": t, "media_ref": r, "offset": o}
                    for k, t, r, o in d["spans"]
                ]),
            ])

    def extract_map(df):
        return {
            r.doc_id: [(s.kind, s.text, s.media_ref, s.order) for s in r.spans]
            for r in extract_spans(df).collect()
        }

    from_pq = extract_map(read_spans_source(spark, pq))
    from_js = extract_map(read_spans_source(spark, str(js), source_format="json"))
    from_cs = extract_map(read_spans_source(spark, str(cs), source_format="csv"))
    assert from_pq == from_js == from_cs
    assert len(from_pq) == len(docs)


def test_catalog_mode_routes_writes_through_writeto_append(spark, monkeypatch):
    """--catalog mode must issue writeTo(table).append() for every sink
    (output, metrics, partition lineage, doc lineage) — the Iceberg
    snapshot-commit path — with the parquet branch untouched."""
    from ebook_conversion_to_text_for_machine_learning_spark.plans.pipeline import (
        run_extraction_job,
    )

    appended = []

    class FakeWriter:
        def __init__(self, df, table):
            self.df, self.table = df, table

        def append(self):
            appended.append((self.table, self.df.count()))

    # Patch the RUNTIME DataFrame class (pyspark.sql.DataFrame is an ABC in
    # Spark 4; the classic subclass defines its own writeTo).
    runtime_cls = type(spark.range(1))
    monkeypatch.setattr(
        runtime_cls, "writeTo", lambda self, table: FakeWriter(self, table), raising=True
    )
    # No real catalog in the sandbox: resume reads against `lake.db.*`
    # raise a namespace config error (which the strict read deliberately
    # propagates in production). This test checks WRITE routing only.
    from ebook_conversion_to_text_for_machine_learning_spark.plans import pipeline

    monkeypatch.setattr(
        pipeline, "_read_table_or_none", lambda spark, path, catalog: None
    )

    docs = fx.random_corpus(10, seed=5)
    summary = run_extraction_job(
        spark,
        spans_df(spark, docs),
        "lake.db.extracted",
        lineage_path="lake.db.lineage",
        metrics_path="lake.db.metrics",
        catalog=True,
    )
    assert sum(m["docs"] for m in summary["metrics"]) == 10
    tables = [t for t, _ in appended]
    assert tables == [
        "lake.db.extracted",
        "lake.db.metrics",
        "lake.db.lineage_partitions",
        "lake.db.lineage",
    ]
    assert appended[0][1] == 10  # all docs written to the output table


def test_salted_repartition_levels_giant_document_skew(spark):
    """Stress golden for the SURVEY risk register: a cluster of giant
    documents co-located in one input partition must (a) be visible in the
    per-partition cpu_us lineage and (b) be leveled by salted_repartition.
    """
    from pyspark.sql import functions as SF

    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        INPUT_SCHEMA,
        extract_spans,
        salted_repartition,
    )

    def doc(doc_id, n_lines, width):
        return (
            doc_id,
            "txt",
            None,
            None,
            [
                {"kind": "line", "text": f"line {i} " + "w" * width, "media_ref": "", "offset": i}
                for i in range(n_lines)
            ],
        )

    giants = [doc(f"giant-{i}", 4000, 60) for i in range(8)]
    tiny = [doc(f"tiny-{i:04d}", 1, 5) for i in range(2000)]
    # Giants first + coalesce(4): all giants land in input partition 0 —
    # the "all the big PDFs came from one source split" shape.
    df = spark.createDataFrame(giants + tiny, schema=INPUT_SCHEMA).coalesce(4)

    def per_partition(extracted):
        rows = (
            extracted.groupBy(SF.spark_partition_id().alias("pid"))
            .agg(
                SF.sum("elapsed_us").alias("cpu_us"),
                SF.sum(SF.when(SF.col("doc_id").startswith("giant"), 1).otherwise(0)).alias("giants"),
            )
            .collect()
        )
        return {r.pid: (r.cpu_us, r.giants) for r in rows}

    before = per_partition(extract_spans(df))
    # Skew is observable: one partition holds every giant and the lineage
    # cpu_us signal flags it (≥ half the total fold time).
    giant_parts_before = [p for p, (_, g) in before.items() if g > 0]
    assert len(giant_parts_before) == 1
    skewed = giant_parts_before[0]
    total_before = sum(c for c, _ in before.values())
    assert before[skewed][0] >= 0.5 * total_before

    after = per_partition(extract_spans(df, repartition=8))
    # xxhash64(doc_id) is deterministic: the 8 giants spread across ≥3
    # partitions, and no partition keeps the whole cluster.
    giant_spread = [g for _, g in after.values() if g > 0]
    assert len(giant_spread) >= 3
    assert max(giant_spread) < 8
    # The hot partition's fold time drops materially once leveled.
    assert max(c for c, _ in after.values()) <= 0.6 * before[skewed][0]


def test_resume_consults_output_table_across_crash_window(spark, tmp_path):
    """A crash between the output append and the lineage commit leaves
    documents in output with no lineage row; the restart must consult the
    output table itself and NOT re-append them."""
    import shutil

    from ebook_conversion_to_text_for_machine_learning_spark.plans.pipeline import (
        run_extraction_job,
    )

    docs = fx.random_corpus(20, seed=9)
    df = spans_df(spark, docs)
    out = str(tmp_path / "out")
    lineage = str(tmp_path / "lineage")

    run_extraction_job(spark, df, out, lineage_path=lineage)
    assert spark.read.parquet(out).count() == 20

    # Simulate the crash window: output committed, doc lineage lost.
    shutil.rmtree(lineage)
    summary = run_extraction_job(spark, df, out, lineage_path=lineage)
    assert sum(m["docs"] for m in summary["metrics"]) == 0
    assert spark.read.parquet(out).count() == 20  # no duplicates
