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


FRAME_SIZE = 16
FRAME_STRIDE = 64
MAX_FRAMES = 32


def sample_frames(
    df: DataFrame,
    *,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
    max_frames: int = MAX_FRAMES,
) -> DataFrame:
    """Strided frame sampling over binary payloads — fully JVM-side.

    The video/audio analogue of "take every Nth frame": one output row per
    sampled byte window (offset ``i*stride``, width ``frame_size``), capped
    at ``max_frames`` per payload. Everything is built-in expressions
    (``sequence`` → ``posexplode`` → binary ``substring``/``md5``) inside
    whole-stage codegen — no Python, no shuffle; the explode factor is
    bounded by ``max_frames`` so output size is predictable at any scale.
    A real decoder would replace the byte window with a codec frame-seek;
    the partitioning, capping, and per-frame schema stay identical.

    ``frame_md5`` fingerprints the frame via its hex encoding
    (``md5(hex(bytes))``) — byte-exact and portable to SQL oracles whose
    md5 only accepts strings, where a raw-bytes md5 would need BLOB
    support and a char-based slice would drift on multi-byte UTF-8.
    

    NULL/empty payloads yield NO frame rows (zero bytes have zero
    frames) — deliberate, unlike extract_media_features/resize, which
    emit a status row per media_id; join on media_id with a left side of
    the features table when a row-per-media view is needed.
    """
    n = F.octet_length("payload")
    n_frames = F.least(
        F.lit(max_frames), (F.floor((n - 1) / stride) + 1).cast("int")
    )
    idx = F.when(n > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    frame = F.expr(f"substring(payload, frame_idx * {stride} + 1, {frame_size})")
    return (
        df.select(
            "media_id",
            "media_type",
            "payload",
            F.explode(idx).alias("frame_idx"),
        )
        .select(
            "media_id",
            "media_type",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            (F.col("frame_idx").cast("long") * stride).alias("frame_offset"),
            F.octet_length(frame).cast("long").alias("frame_bytes"),
            F.md5(F.hex(frame)).alias("frame_md5"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("target_w", IntegerType(), False),
        StructField("target_h", IntegerType(), False),
        StructField("resized_bytes", LongType(), False),
        StructField("resized_md5", StringType(), False),
        StructField("status", StringType(), False),
    ]
)


def resize_media_stub(
    df: DataFrame, *, target_w: int = 64, target_h: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Resize plumbing: Arrow-batched, deterministic stub for the codec step.

    The stub "resize" keeps the first ``target_w * target_h`` payload bytes
    (or zero-pads) so output size, schema, and batch shape match what a
    Pillow-backed resize would produce; ``decode_stub=False`` raises at the
    exact call site where the codec belongs. ``resized_md5`` fingerprints
    the hex encoding of the bytes (same portability rule as
    ``sample_frames``: SQL oracles lack a BLOB md5).
    """
    import hashlib

    target = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            rows = []
            for mid, mtype, payload in zip(
                batch["media_id"], batch["media_type"], batch["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                if not decode_stub:
                    _decode_real(data, mtype)
                resized = data[:target].ljust(target, b"\x00")
                rows.append(
                    {
                        "media_id": mid,
                        "target_w": target_w,
                        "target_h": target_h,
                        "resized_bytes": len(resized),
                        "resized_md5": hashlib.md5(
                            resized.hex().upper().encode()
                        ).hexdigest(),
                        "status": "stub_resized",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", "media_type", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
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
