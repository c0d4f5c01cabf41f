"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes cross the JVM↔Python boundary exactly once
per batch. The actual codec step is STUBBED in this sandbox (no
Pillow/av/librosa): ``decode_stub=True`` (default) computes deterministic
byte-level features so the Spark plumbing — schema, batching, partitioning,
UDF signature — is real and testable; ``decode_stub=False`` raises
``NotImplementedError`` where the codec call would go.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("first_byte", IntegerType(), True),
        StructField("byte_sum_mod", LongType(), False),
        StructField("status", StringType(), False),
    ]
)


def attach_payloads(df: DataFrame, id_col: str, payload_text_col: str, media_type: str) -> DataFrame:
    """Demo adapter: wrap a text column as an opaque binary payload column.

    In production the payload comes from the lake (Iceberg binary column or
    object-store reference); here we UTF-8-encode existing data so the
    downstream binary plumbing is exercised with real bytes.
    """
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(payload_text_col), "UTF-8").alias("payload"),
    )


def _decode_real(payload: bytes, media_type: str):
    """Where the codec would run (Pillow / pyav / soundfile). Not available
    in this container — the call site is kept so the scale plumbing and the
    production diff stay obvious."""
    raise NotImplementedError(
        f"media decode for {media_type!r} requires codec libraries not "
        "present in this environment (Pillow/av); run with decode_stub=True"
    )


def extract_media_features(df: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The stub features are pure byte arithmetic (length, first byte, sum mod
    2^31) — deterministic, so the driver's SQL oracle can verify the whole
    mapInPandas path byte-for-byte.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            ids = batch["media_id"].tolist()
            types = batch["media_type"].tolist()
            payloads = batch["payload"].tolist()
            rows = []
            for mid, mtype, payload in zip(ids, types, payloads):
                data = bytes(payload) if payload is not None else b""
                if not decode_stub:
                    _decode_real(data, mtype)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": len(data),
                        "first_byte": data[0] if data else None,
                        "byte_sum_mod": sum(data) % (2**31),
                        "status": "stub_decoded",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    return df.select("media_id", "media_type", "payload").mapInPandas(
        batches, schema=MEDIA_FEATURE_SCHEMA
    )
