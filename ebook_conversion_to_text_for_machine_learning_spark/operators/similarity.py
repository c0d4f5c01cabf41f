"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_topk`` — exact brute force. The probe side is small and gets
  broadcast, so the plan is scan(corpus) × broadcast(probes) with no
  shuffle of the corpus; per-pair math is built-in ``zip_with``/``aggregate``
  (JVM-side, codegen), never Python.
- ``lsh_bucket_*`` — the scale path: sign-random-projection LSH with
  deterministic ±1 hyperplanes. Signatures are per-row expressions; the
  candidate join is keyed on short signature strings. At 10^12 rows the
  bucket join replaces the O(N·Q) brute force with O(candidates).

Hyperplanes use ±1 entries so dot products are exact float sums — both
Spark and the DuckDB oracle compute identical doubles from identical
float32 inputs (no RNG parity issues).
"""

from __future__ import annotations

import random
from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Number of sign-projection hyperplanes (bucket space = 2^N_PLANES).
N_PLANES = 8
_PLANE_SEED = 20240816


def hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = _PLANE_SEED) -> List[List[int]]:
    """Deterministic ±1 hyperplanes shared by Spark and the SQL oracle."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per probe (self-match excluded).

    Ranking key is ``(round(cosine, 4) DESC, id)`` — rounding first makes
    the ordering robust to last-ulp float differences across engines.
    """
    from pyspark.sql.window import Window

    c = corpus.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec"))
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec"))
    cosine = F.round(
        _dot(F.col("probe_vec"), F.col("item_vec"))
        / (_norm(F.col("probe_vec")) * _norm(F.col("item_vec"))),
        4,
    )
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("item_id"))
        .select("probe_id", "item_id", cosine.alias("cosine"))
    )
    window = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") <= k)
        .select("probe_id", "item_id", "cosine", "rank")
    )


def lsh_bucket_signatures(
    df: DataFrame,
    dim: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Sign-projection signature per vector: one bit per hyperplane."""
    planes = hyperplanes(dim, n_planes)
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(w)) for w in plane])
        bits.append(F.when(_dot(F.col(vec_col), lit_plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select(
        F.col(id_col).alias("vec_id"), F.concat(*bits).alias("bucket")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to bucket collisions."""
    from pyspark.sql.window import Window

    c_sig = lsh_bucket_signatures(corpus, dim, vec_col=vec_col, id_col=id_col)
    p_sig = lsh_bucket_signatures(probes, dim, vec_col=vec_col, id_col=id_col)
    c = corpus.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec")).join(
        c_sig.select(F.col("vec_id").alias("item_id"), "bucket"), "item_id"
    )
    p = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")).join(
        p_sig.select(F.col("vec_id").alias("probe_id"), F.col("bucket").alias("pbucket")),
        "probe_id",
    )
    cosine = F.round(
        _dot(F.col("probe_vec"), F.col("item_vec"))
        / (_norm(F.col("probe_vec")) * _norm(F.col("item_vec"))),
        4,
    )
    scored = (
        c.join(
            F.broadcast(p),
            (F.col("bucket") == F.col("pbucket")) & (F.col("probe_id") != F.col("item_id")),
        )
        .select("probe_id", "item_id", cosine.alias("cosine"))
    )
    window = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") <= k)
        .select("probe_id", "item_id", "cosine", "rank")
    )
