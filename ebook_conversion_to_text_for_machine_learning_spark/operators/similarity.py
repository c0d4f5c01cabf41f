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


#: IVF codebook sampling stride (centroid iff ``vec_id % IVF_STRIDE == 0``)
#: and default number of cells each probe searches.
IVF_STRIDE = 50
IVF_NPROBE = 2


def ivf_centroids(
    corpus: DataFrame,
    *,
    stride: int = IVF_STRIDE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Collect the IVF codebook to the driver.

    IVF's defining trade is a *small* centroid set (≤64k cells even for
    billion-vector indexes) against a huge corpus, so collecting the
    codebook and re-broadcasting it as literal expressions is the
    scale-correct shape: cell assignment then runs as a narrow per-row
    projection with zero shuffle. Centroid choice here is a deterministic
    data sample (every ``stride``-th id) so the DuckDB oracle can rebuild
    the identical codebook; swap in k-means output in production without
    touching the assignment/search plan.
    """
    rows = (
        corpus.where(F.col(id_col) % stride == 0)
        .select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    return sorted((int(r.cid), [float(x) for x in r.cvec]) for r in rows)


def _cell_ranking(vec: Column, centroids: list) -> Column:
    """array<struct<neg_cos,centroid_id>> sorted best-first (cos DESC, id ASC)."""
    import math

    entries = []
    vnorm = _norm(vec)
    for cid, cvec in centroids:
        lit_plane = F.array(*[F.lit(float(x)) for x in cvec])
        cnorm = math.sqrt(sum(x * x for x in cvec))
        cos = F.round(_dot(vec, lit_plane) / (vnorm * F.lit(cnorm)), 4)
        entries.append(
            F.struct((-cos).alias("neg_cos"), F.lit(cid).cast("long").alias("centroid_id"))
        )
    return F.sort_array(F.array(*entries))


def ivf_assign(
    corpus: DataFrame,
    centroids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid cell per vector — per-row expressions, no shuffle."""
    ranking = _cell_ranking(F.col(vec_col), centroids)
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(ranking, 1)["centroid_id"].alias("cell_id"),
    )


def ivf_assign_arrow(
    corpus: DataFrame,
    centroids: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Production-rate cell assignment: one numpy matmul per Arrow batch.

    ``ivf_assign`` (expression-based) is the oracle-parity twin — its
    sequential left-fold float sums are bit-identical to the SQL oracle but
    run as interpreted higher-order functions, which caps per-row rate.
    This path does the same (cosine DESC, centroid_id ASC) assignment as a
    dense (batch × dim) @ (dim × k) matmul — the right trade at 10^12 rows,
    where last-ulp summation-order differences are irrelevant. Centroids
    arrive sorted by id, so numpy argmax's first-match rule reproduces the
    min-id tie-break.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    ids = np.array([c[0] for c in centroids], dtype=np.int64)
    mat = np.array([c[1] for c in centroids], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            best = np.argmax((vecs / norms) @ mat.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": batch[id_col].astype("int64"), "cell_id": ids[best]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        batches, schema="vec_id long, cell_id long"
    )


def ivf_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    stride: int = IVF_STRIDE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: exact cosine over the probe's ``nprobe`` cells.

    Plan shape at scale: corpus→cell assignment is a narrow projection
    (codebook inlined as literals); the search joins the huge cell-tagged
    corpus against a broadcast of (probe × nprobe) rows keyed on cell_id,
    so the corpus is never shuffled and each item is scored at most once
    per probe (an item lives in exactly one cell).
    """
    from pyspark.sql.window import Window

    centroids = ivf_centroids(corpus, stride=stride, vec_col=vec_col, id_col=id_col)
    c = corpus.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("item_vec"),
        F.element_at(_cell_ranking(F.col(vec_col), centroids), 1)["centroid_id"].alias("cell_id"),
    )
    probe_cells = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
        F.explode(
            F.transform(
                F.slice(_cell_ranking(F.col(vec_col), centroids), 1, nprobe),
                lambda s: s["centroid_id"],
            )
        ).alias("probe_cell"),
    )
    cosine = F.round(
        _dot(F.col("probe_vec"), F.col("item_vec"))
        / (_norm(F.col("probe_vec")) * _norm(F.col("item_vec"))),
        4,
    )
    scored = c.join(
        F.broadcast(probe_cells),
        (F.col("cell_id") == F.col("probe_cell")) & (F.col("probe_id") != F.col("item_id")),
    ).select("probe_id", "item_id", cosine.alias("cosine"))
    window = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") <= k)
        .select("probe_id", "item_id", "cosine", "rank")
    )


def embedding_near_dup(
    df: DataFrame,
    dim: int,
    *,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    The candidate join keys on the sign-projection bucket (narrow string),
    never a cross product; exact cosine then verifies candidates only.
    This is the embedding-space sibling of MinHash-LSH text dedup: at
    10^12 rows the shuffle carries (id, bucket, vec) and each bucket is a
    tiny island of pairwise work.
    """
    sigs = lsh_bucket_signatures(df, dim, vec_col=vec_col, id_col=id_col)
    base = (
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .join(sigs.withColumnRenamed("vec_id", "vid"), "vid")
    )
    left, right = base.alias("l"), base.alias("r")
    cosine = F.round(
        _dot(F.col("l.vec"), F.col("r.vec")) / (_norm(F.col("l.vec")) * _norm(F.col("r.vec"))),
        4,
    )
    return (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vid") < F.col("r.vid")),
        )
        .select(
            F.col("l.vid").alias("vec_a"),
            F.col("r.vid").alias("vec_b"),
            cosine.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
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
