"""Source readers / adapters.

Production target is an Iceberg catalog table
(``spark.read.table("catalog.db.documents_spans")`` with snapshot-based
checkpoint resume); this sandbox has no Iceberg runtime jars, so the same
code paths run on Parquet directories. The DDL we'd ship:

    CREATE TABLE catalog.db.documents_spans (
      doc_id string, fmt string, title string, author string,
      spans array<struct<kind:string,text:string,media_ref:string,offset:int>>)
    USING iceberg
    PARTITIONED BY (bucket(1024, doc_id))
    TBLPROPERTIES ('write.target-file-size-bytes'='134217728');

    -- submit with:
    -- spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.0 \
    --   --py-files engine.zip job.py --table catalog.db.documents_spans --out ...

``bucket(1024, doc_id)`` co-locates a document's row deterministically and
gives 1024-way scan parallelism at 10^12 rows without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def documents_as_txt_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table to the spans input contract.

    Each document's ``text`` becomes ``fmt='txt'`` line spans (split on
    newlines; the synthetic corpus is single-line, real corpora aren't).
    Pure built-in expressions — the split/transform stays JVM-side.
    """
    docs = read_table(spark, sf_dir, "documents")
    lines = F.split(F.col("text"), "\n")
    spans = F.transform(
        lines,
        lambda line, i: F.struct(
            F.lit("line").alias("kind"),
            line.alias("text"),
            F.lit("").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("txt").alias("fmt"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("author"),
        spans.alias("spans"),
    )


def read_spans_source(
    spark: SparkSession, path: str, *, source_format: str = "parquet"
) -> DataFrame:
    """Read a documents_spans table from parquet, JSON-lines, or CSV.

    Parquet/Iceberg is the production layout; JSON-lines covers raw
    crawl-style drops (spans as nested objects); CSV covers flat exports
    where ``spans`` arrives as a JSON string column and is parsed JVM-side
    with ``from_json`` — no Python in any path. All three return the exact
    INPUT_SCHEMA contract so the extraction operator is source-agnostic.
    """
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        INPUT_SCHEMA,
    )

    if source_format == "parquet":
        df = spark.read.parquet(path)
    elif source_format == "json":
        df = spark.read.schema(INPUT_SCHEMA).json(path)
    elif source_format == "csv":
        raw = spark.read.option("header", True).option("multiLine", True).option(
            "escape", '"'
        ).csv(path)
        span_type = INPUT_SCHEMA["spans"].dataType
        df = raw.select(
            "doc_id",
            "fmt",
            "title",
            "author",
            F.from_json(F.col("spans"), span_type).alias("spans"),
        )
    else:
        raise ValueError(f"Unsupported source format: {source_format}")
    return df.select("doc_id", "fmt", "title", "author", "spans")
