"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state path the engine uses when windowed
aggregation can't express the semantics: a per-key running extraction
monitor that maintains (docs_total, spans_total, batches_seen) across
micro-batches. State is per group, bounded by the key cardinality, and
survives restarts via the stream checkpoint.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("fmt", StringType(), False),
        StructField("docs_total", LongType(), False),
        StructField("spans_total", LongType(), False),
        StructField("batches_seen", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("docs", LongType()),
        StructField("spans", LongType()),
        StructField("batches", LongType()),
    ]
)


def _update_totals(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    docs, spans, seen = state.get if state.exists else (0, 0, 0)
    for batch in batches:
        docs += len(batch)
        spans += int(batch["n_spans"].sum())
    # One increment per MICRO-BATCH invocation: the iterator yields one
    # DataFrame per Arrow chunk (maxRecordsPerBatch), so incrementing
    # inside the loop over-counted large groups.
    seen += 1
    state.update((docs, spans, seen))
    yield pd.DataFrame(
        [{"fmt": key[0], "docs_total": docs, "spans_total": spans, "batches_seen": seen}]
    )


def running_extraction_totals(extracted_stream: DataFrame) -> DataFrame:
    """Per-format running totals over a stream of extraction results.

    Input: a *streaming* DataFrame with at least (fmt, n_spans) — e.g. the
    output of ``extract_spans`` applied inside the stream.
    """
    return extracted_stream.groupBy("fmt").applyInPandasWithState(
        _update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
