"""Distributed synthetic corpus generation for benchmarks.

``spark.range(n)`` → Arrow-batched ``mapInPandas`` → one deterministic
document per index (seeded per ``(seed, index)``) — generation itself
scales with the cluster instead of bottlenecking on the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
    INPUT_SCHEMA,
)
from ebook_conversion_to_text_for_machine_learning_spark.testing.fixtures import (
    make_doc,
)


def corpus_spans_df(
    spark: SparkSession, n_docs: int, *, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    base = spark.range(n_docs)
    if partitions:
        base = base.repartition(partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            docs = [make_doc(int(i), seed) for i in batch["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "fmt": [d["fmt"] for d in docs],
                    "title": [d["title"] for d in docs],
                    "author": [d["author"] for d in docs],
                    "spans": [
                        [
                            {"kind": k, "text": t, "media_ref": r, "offset": o}
                            for k, t, r, o in d["spans"]
                        ]
                        for d in docs
                    ],
                }
            )

    return base.mapInPandas(gen, schema=INPUT_SCHEMA)


def write_corpus(
    spark: SparkSession, path: str, n_docs: int, *, seed: int = 42, partitions: int = 64
) -> None:
    corpus_spans_df(spark, n_docs, seed=seed, partitions=partitions).write.mode(
        "overwrite"
    ).parquet(path)
