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

#: Banded LSH defaults for near-duplicate detection: ``N_BANDS`` independent
#: tables of ``BAND_PLANES`` planes each. A single 2^8 bucket space turns
#: into a cross product at corpus scale; 4 bands × 16 planes gives 2^16
#: buckets per table (recall comes from the 4 independent tries, exactly as
#: ``minhash_bands`` does for text), and both knobs grow with corpus size.
N_BANDS = 4
BAND_PLANES = 16


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


def _centroid_matrix(centroids: list):
    """(ids, unit-row matrix) for the numpy assignment kernel.

    The single source of truth for preparing a codebook: ids in ascending
    order (``ivf_centroids`` guarantees it — numpy first-match rules then
    reproduce the min-id tie-break) and rows L2-normalized with a
    zero-norm guard. Without the guard a degenerate centroid (zero seed
    vector, or a refined mean whose components all round to zero) turns
    into a NaN row, and ``np.argmax`` over NaN scores assigns EVERY
    vector to that cell — silently collapsing the codebook. Guarded, a
    zero-norm centroid scores cosine 0 to everything and only wins where
    nothing else is positive. (The SQL oracle twins have no such guard —
    they assume the non-degenerate codebooks the stride sampler produces
    from real embedding tables.)
    """
    import numpy as np

    ids = np.array([c[0] for c in centroids], dtype=np.int64)
    mat = np.array([c[1] for c in centroids], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return ids, mat / norms


def _unit_rows(values) -> "object":
    """Stack an Arrow batch's vector column into unit rows (zero-norm
    rows pass through as zeros — cosine 0 to everything, same rule as
    ``_centroid_matrix``)."""
    import numpy as np

    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in values])
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return vecs / norms


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


def knn_label_vote(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    topk: DataFrame | None = None,
) -> DataFrame:
    """kNN classification: majority label over the top-``k`` neighbors.

    The standard embedding-quality / weak-labeling primitive: each probe
    takes the modal label of its nearest neighbors (ties break on the
    smaller label — numeric order for numeric labels, lexicographic for
    strings — so the vote is deterministic and SQL-expressible).
    Neighbor search defaults to exact ``cosine_topk`` (broadcast probes,
    corpus never shuffled); pass ``topk`` to vote over any other
    (probe_id, item_id) producer — ``ivf_ann_topk``/``lsh_ann_topk``
    emit the same shape, which is the sublinear path at corpus scale.
    The vote itself is a partial-agg count on (probe, label) plus a
    per-probe window bounded by k rows.

    Returns (probe_id, pred_label, n_votes). ``pred_label`` keeps the
    label column's own type for non-integral labels (a string-labeled
    corpus votes on strings — the old unconditional long cast silently
    NULLed every prediction); integral labels widen to long as before.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType
    from pyspark.sql.window import Window

    if topk is None:
        topk = cosine_topk(corpus, probes, k=k, vec_col=vec_col, id_col=id_col)
    labels = corpus.select(
        F.col(id_col).alias("item_id"), F.col(label_col).alias("_label")
    )
    votes = (
        topk.join(labels, "item_id")
        .groupBy("probe_id", "_label")
        .agg(F.count("*").cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("n_votes"), F.asc("_label")
    )
    pred = F.col("_label")
    if isinstance(
        corpus.schema[label_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    ):
        pred = pred.cast("long")
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("probe_id", pred.alias("pred_label"), "n_votes")
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


def lsh_banded_signatures(
    df: DataFrame,
    dim: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = N_BANDS,
    band_planes: int = BAND_PLANES,
) -> DataFrame:
    """Multi-table LSH: one (vec_id, band_id, bucket) row per band.

    Band ``b`` reads planes ``[b*band_planes, (b+1)*band_planes)`` of a
    single shared hyperplane sequence, so the DuckDB oracle can rebuild the
    identical buckets. Per-row expressions only — the explode factor is
    ``n_bands``, constant in corpus size.
    """
    planes = hyperplanes(dim, n_bands * band_planes)
    bands = []
    for b in range(n_bands):
        bits = []
        for plane in planes[b * band_planes : (b + 1) * band_planes]:
            lit_plane = F.array(*[F.lit(float(w)) for w in plane])
            bits.append(
                F.when(_dot(F.col(vec_col), lit_plane) > 0, F.lit("1")).otherwise(F.lit("0"))
            )
        bands.append(F.struct(F.lit(b).alias("band_id"), F.concat(*bits).alias("bucket")))
    return df.select(
        F.col(id_col).alias("vec_id"), F.explode(F.array(*bands)).alias("band")
    ).select("vec_id", "band.band_id", "band.bucket")


def lsh_banded_signatures_arrow(
    df: DataFrame,
    dim: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = N_BANDS,
    band_planes: int = BAND_PLANES,
) -> DataFrame:
    """Production-rate banded signatures: one numpy matmul per Arrow batch.

    Same (vec_id, band_id, bucket) rows as ``lsh_banded_signatures`` — the
    expression twin keeps DuckDB-exact fold order for the oracle, this
    path computes all ``n_bands × band_planes`` plane dots as a dense
    (batch × dim) @ (dim × planes) product. Sign decisions agree with the
    sequential fold whenever |dot| exceeds float summation-order noise
    (~1e-13); a path-agreement test pins this on the test corpus, exactly
    like ``ivf_assign_arrow``.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    planes = np.array(
        hyperplanes(dim, n_bands * band_planes), dtype=np.float64
    )  # (P, dim)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            vecs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )
            bits = (vecs @ planes.T) > 0  # (n, P) booleans
            ids = batch[id_col].to_numpy()
            out_ids, out_bands, out_buckets = [], [], []
            for b in range(n_bands):
                chunk = bits[:, b * band_planes : (b + 1) * band_planes]
                buckets = [
                    "".join("1" if x else "0" for x in row) for row in chunk
                ]
                out_ids.extend(ids)
                out_bands.extend([b] * len(ids))
                out_buckets.extend(buckets)
            yield pd.DataFrame(
                {"vec_id": out_ids, "band_id": out_bands, "bucket": out_buckets}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        batches, schema=f"vec_id {id_type}, band_id int, bucket string"
    )


#: Default IVF codebook size (cells), CONSTANT in corpus size — the stride
#: that samples centroids is derived as ``max(1, N // IVF_TARGET_CELLS)``,
#: so the driver-collected codebook never grows past ~64k entries no matter
#: how large the corpus is. ``IVF_NPROBE`` is how many cells each probe
#: searches.
IVF_TARGET_CELLS = 65536
IVF_NPROBE = 2


def ivf_centroids(
    corpus: DataFrame,
    *,
    target_cells: int = IVF_TARGET_CELLS,
    stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Collect the IVF codebook to the driver — bounded, never O(N).

    IVF's defining trade is a *small* centroid set (≤64k cells even for
    billion-vector indexes) against a huge corpus, so collecting the
    codebook and re-broadcasting it is the scale-correct shape: cell
    assignment then runs per-row with zero shuffle. Centroid choice is a
    deterministic data sample — every ``stride``-th id, where ``stride``
    defaults to ``max(1, N // target_cells)`` so the codebook size stays
    constant as the corpus grows (the fix for the round-1 O(N) stride-only
    sampling). The DuckDB oracle rebuilds the identical codebook from the
    same count arithmetic; swap in k-means output in production without
    touching the assignment/search plan.

    Raises ``ValueError`` when the sample is empty (e.g. no id divisible by
    the stride) instead of letting ``_cell_ranking`` build a zero-entry
    ``sort_array`` that fails at analysis time with an opaque error.
    """
    if stride is None:
        stride = max(1, corpus.count() // target_cells)
        if stride < 4:
            import warnings

            warnings.warn(
                f"ivf_centroids: stride {stride} makes the codebook a "
                "quarter or more of the corpus, so cell assignment "
                "approaches O(N^2) brute force. Pass a smaller "
                "target_cells (e.g. ~sqrt(N)) when indexing small "
                "corpora; the 65536-cell default is a lake-scale setting.",
                stacklevel=2,
            )
    rows = (
        corpus.where(F.col(id_col) % stride == 0)
        .select(F.col(id_col).cast("long").alias("cid"), F.col(vec_col).alias("cvec"))
        .collect()
    )
    if not rows:
        raise ValueError(
            f"ivf_centroids: empty codebook (no {id_col} divisible by stride "
            f"{stride}); pass a smaller stride/target_cells or remap ids"
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
    keep_vec: bool = False,
) -> DataFrame:
    """Production-rate cell assignment: one numpy matmul per Arrow batch.

    ``ivf_assign`` (expression-based) is the oracle-parity twin — its
    sequential left-fold float sums are bit-identical to the SQL oracle but
    run as interpreted higher-order functions, which caps per-row rate.
    This path does the same (cosine DESC, centroid_id ASC) assignment as a
    dense (batch × dim) @ (dim × k) matmul — the right trade at 10^12 rows,
    where last-ulp summation-order differences are irrelevant. Cosines are
    ROUNDED to 4 decimals before argmax, exactly as the twin and the SQL
    oracle round: without it the parity-disagreement window per (vector,
    cell-pair) is the full rounding quantum (~5e-5), not the ~1e-13 float
    noise. Centroids arrive sorted by id, so numpy argmax's first-match
    rule over the rounded scores reproduces the min-id tie-break.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    ids, mat = _centroid_matrix(centroids)

    vec_type = dict(corpus.dtypes)[vec_col]
    schema = "vec_id long, cell_id long"
    if keep_vec:
        # Pass the vector through the Arrow batch so downstream scoring
        # (ivf_ann_topk) needs no corpus self-join to refetch it.
        schema += f", {vec_col} {vec_type}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            best = np.argmax(np.round(_unit_rows(batch[vec_col]) @ mat.T, 4), axis=1)
            out = {"vec_id": batch[id_col].astype("int64"), "cell_id": ids[best]}
            if keep_vec:
                out[vec_col] = batch[vec_col]
            yield pd.DataFrame(out)

    return corpus.select(id_col, vec_col).mapInPandas(batches, schema=schema)


def ivf_probe_cells_arrow(
    probes: DataFrame,
    centroids: list,
    *,
    nprobe: int = IVF_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``nprobe`` cells per probe — one numpy matmul per Arrow batch.

    The expression twin (``_cell_ranking``) inlines one struct per centroid
    with the full centroid vector as literals: at the production
    ``IVF_TARGET_CELLS = 65536`` that is millions of plan nodes and
    analysis dies before data flows (round-2 verdict finding). This path
    keeps the plan CONSTANT-SIZE in the codebook: cosines to all cells are
    a dense (batch × dim) @ (dim × cells) product, ranked by
    (round(cos, 4) DESC, centroid_id ASC) exactly as the twin ranks —
    ``np.argsort(kind="stable")`` over the rounded scores reproduces the
    min-id tie-break because ``ivf_centroids`` returns centroids sorted by
    id. Emits (probe_id, probe_vec, probe_cell), ``nprobe`` rows per probe.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    ids, mat = _centroid_matrix(centroids)
    n_take = min(nprobe, len(ids))

    vec_type = dict(probes.dtypes)[vec_col]
    id_type = dict(probes.dtypes)[id_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            cos = np.round(_unit_rows(batch[vec_col]) @ mat.T, 4)  # (n, cells)
            # Stable sort on -cos: ties fall back to column order == id order.
            top = np.argsort(-cos, axis=1, kind="stable")[:, :n_take]
            n = len(batch)
            yield pd.DataFrame(
                {
                    "probe_id": batch[id_col].to_numpy().repeat(n_take),
                    "probe_vec": [
                        v for v in batch[vec_col] for _ in range(n_take)
                    ],
                    "probe_cell": ids[top].ravel(),
                }
            )

    return probes.select(id_col, vec_col).mapInPandas(
        batches, schema=f"probe_id {id_type}, probe_vec {vec_type}, probe_cell long"
    )


def _probe_cell_assign(rows, centroids, nprobe: int):
    """(P, min(nprobe, cells)) cell-id matrix for pre-collected
    ``(id, vec)`` rows, aligned to the rows' order — the driver-side
    twin of ``ivf_probe_cells_arrow``'s per-batch math through the
    identical helpers (``_unit_rows`` @ ``_centroid_matrix``,
    round(·,4), stable argsort → min-id tie-break): bit-identical
    assignments."""
    import numpy as np

    ids, mat = _centroid_matrix(centroids)
    n_take = min(nprobe, len(ids))
    cos = np.round(_unit_rows([r[1] for r in rows]) @ mat.T, 4)
    top = np.argsort(-cos, axis=1, kind="stable")[:, :n_take]
    return ids[top]


def _probe_cells_local(spark, rows, centroids, *, nprobe: int, id_type: str):
    """Driver-side twin of ``ivf_probe_cells_arrow`` over pre-collected
    ``(id, vec)`` rows (``_probe_cell_assign`` math — bit-identical).
    Exists purely to delete a fixed per-pass Spark job when the caller
    has already collected the probe batch for the ADC LUT
    (``ivfpq_topk`` — the probe batch is driver-bounded by design
    there). Emits (probe_id, probe_cell), ``nprobe`` rows per probe."""
    schema = f"probe_id {id_type}, probe_cell long"
    if not rows:
        return spark.createDataFrame([], schema)
    cells = _probe_cell_assign(rows, centroids, nprobe)
    data = [
        (r[0], int(c)) for r, row_cells in zip(rows, cells) for c in row_cells
    ]
    return spark.createDataFrame(data, schema)


def ivf_kmeans_centroids(
    corpus: DataFrame,
    *,
    iters: int = 2,
    target_cells: int = IVF_TARGET_CELLS,
    stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Spherical Lloyd refinement of the stride-sampled codebook — the
    "swap in k-means in production" that ``ivf_centroids`` advertises,
    with the same bounded-codebook contract (same ``(cid, vec)`` list, so
    it drops into every assignment/search path unchanged).

    Each of the ``iters`` Lloyd iterations costs ONE pass over the corpus:
    a fused Arrow stage assigns each vector to its nearest cell (the same
    round-4 matmul ranking as ``ivf_assign_arrow``) and, in the same numpy
    batch, accumulates per-cell sums of the UNIT vectors — so what leaves
    each task is at most ``cells x dim`` tiny (cell, pos, partial_sum)
    rows per batch, never the vectors themselves. A partial-agg ``groupBy``
    reduces those to cell means (map-side combinable, skew-free: the key
    space is the codebook) and a bounded ``cells x dim`` collect rebuilds
    the list. No corpus shuffle, no N x dim explode, plan size constant in
    the codebook.

    Semantics pinned for oracle parity (the DuckDB twin unrolls the same
    iterations): centroids are means of L2-normalized members (spherical
    k-means — cosine ranking is scale-invariant, so no renormalization is
    needed), components are rounded to 6 decimals each iteration so both
    engines iterate from identical codebooks, and a cell that captures no
    members keeps its previous centroid (the standard empty-cell rule;
    also what makes the refined codebook keep exactly the initial cell
    ids, which downstream nprobe arithmetic relies on).

    Accepted parity window: the per-cell means sum float64 partial sums
    (``F.sum`` over per-batch accumulations), and double addition is
    order-dependent — a component mean landing within ~1 ulp of a
    6-decimal rounding boundary can round differently from the oracle's
    fold order and then amplify through later Lloyd iterations (same
    class of window as the Arrow-vs-expression sign agreement in
    ``lsh_banded_signatures_arrow``, NOT the exact-integer convention
    ``_pq_qdist`` uses). Unobserved on the driver corpora (path-
    agreement and oracle tests pin current behavior); if a production
    corpus ever trips it, quantize per-component contributions with the
    x10k floor-round pattern before summation at the cost of one extra
    rounding per member vector.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    cents = ivf_centroids(
        corpus, target_cells=target_cells, stride=stride,
        vec_col=vec_col, id_col=id_col,
    )
    dim = len(cents[0][1])
    src = corpus.select(vec_col)
    for _ in range(max(0, iters)):
        ids, mat = _centroid_matrix(cents)

        def batches(
            it: Iterator[pd.DataFrame], _ids=ids, _mat=mat
        ) -> Iterator[pd.DataFrame]:
            for batch in it:
                if not len(batch):
                    continue
                unit = _unit_rows(batch[vec_col])
                best = np.argmax(np.round(unit @ _mat.T, 4), axis=1)
                acc = np.zeros((_ids.size, unit.shape[1]))
                np.add.at(acc, best, unit)
                cnt = np.bincount(best, minlength=_ids.size)
                nz = np.flatnonzero(cnt)
                yield pd.DataFrame(
                    {
                        "cell_id": np.repeat(_ids[nz], dim),
                        "pos": np.tile(np.arange(dim, dtype=np.int32), nz.size),
                        "psum": acc[nz].ravel(),
                        "pcnt": np.repeat(cnt[nz], dim).astype("int64"),
                    }
                )

        means = (
            src.mapInPandas(
                batches, schema="cell_id long, pos int, psum double, pcnt long"
            )
            .groupBy("cell_id", "pos")
            .agg(F.round(F.sum("psum") / F.sum("pcnt"), 6).alias("mval"))
            .collect()
        )
        bycell: dict = {}
        for r in means:
            bycell.setdefault(int(r.cell_id), {})[int(r.pos)] = float(r.mval)
        cents = [
            (cid, [bycell[cid][p] for p in range(dim)] if cid in bycell else old)
            for cid, old in cents
        ]
    return cents


def ivf_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    target_cells: int = IVF_TARGET_CELLS,
    stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign_path: str = "arrow",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: exact cosine over the probe's ``nprobe`` cells.

    ``kmeans_iters > 0`` refines the stride-sampled codebook with that
    many spherical-Lloyd passes (``ivf_kmeans_centroids``) before any
    assignment — tighter cells, same plan shape downstream.

    Plan shape at scale: corpus→cell assignment AND probe→cell ranking are
    one numpy matmul per Arrow batch (``assign_path="arrow"``, the
    production default — the plan stays constant-size in the codebook, so
    the advertised 65536-cell setting actually runs; pass ``"expr"`` for
    the interpreted expression twin that is bit-identical to the SQL
    oracle's fold order and only viable for small codebooks). The search
    then joins the cell-tagged corpus against a broadcast of
    (probe × nprobe) rows keyed on cell_id, so the corpus is never
    shuffled and each item is scored at most once per probe (an item
    lives in exactly one cell).
    """
    # iters=0 runs no Lloyd pass and returns the stride codebook as-is
    centroids = ivf_kmeans_centroids(
        corpus, iters=kmeans_iters, target_cells=target_cells,
        stride=stride, vec_col=vec_col, id_col=id_col,
    )
    if assign_path == "arrow":
        c = ivf_assign_arrow(
            corpus, centroids, vec_col=vec_col, id_col=id_col, keep_vec=True
        ).select(
            F.col("vec_id").alias("item_id"),
            F.col(vec_col).alias("item_vec"),
            "cell_id",
        )
        probe_cells = ivf_probe_cells_arrow(
            probes, centroids, nprobe=nprobe, vec_col=vec_col, id_col=id_col
        )
    else:
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
    return _ivf_topk_from_cells(c, probe_cells, k)


def _ivf_topk_from_cells(
    cell_tagged: DataFrame, probe_cells: DataFrame, k: int
) -> DataFrame:
    """Shared IVF scoring tail: broadcast (probe × nprobe) cell rows
    against the cell-tagged corpus, exact cosine, per-probe rank.
    ``cell_tagged`` carries (item_id, item_vec, cell_id) — freshly
    assigned or read back from a persisted index."""
    from pyspark.sql.window import Window

    cosine = F.round(
        _dot(F.col("probe_vec"), F.col("item_vec"))
        / (_norm(F.col("probe_vec")) * _norm(F.col("item_vec"))),
        4,
    )
    scored = cell_tagged.join(
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
    n_bands: int = N_BANDS,
    band_planes: int = BAND_PLANES,
    signature_path: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, banded-LSH blocked.

    Two-phase, the embedding-space sibling of ``minhash_candidate_pairs`` →
    verify: candidates are ids that collide in at least one of ``n_bands``
    independent ``band_planes``-bit bucket tables (the join keys on
    (band_id, bucket) — narrow strings, never vectors, never a cross
    product), then exact cosine verifies candidates only. Bucket
    cardinality is 2^band_planes per table, so selectivity is tuned to
    corpus size by widening bands — the single-table 2^8 layout this
    replaces degenerated at scale.

    ``signature_path="arrow"`` (default) computes bucket bits with one
    numpy matmul per Arrow batch; ``"expr"`` is the interpreted
    higher-order-function twin with oracle-exact fold order.
    """
    sig_fn = (
        lsh_banded_signatures_arrow if signature_path == "arrow" else lsh_banded_signatures
    )
    bands = sig_fn(
        df, dim, vec_col=vec_col, id_col=id_col, n_bands=n_bands, band_planes=band_planes
    )
    left, right = bands.alias("l"), bands.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    cosine = F.round(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 4
    )
    return (
        candidates.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _lsh_topk_from_bands(
    c_bands: DataFrame,
    items: DataFrame,
    p_bands: DataFrame,
    probe_vecs: DataFrame,
    k: int,
) -> DataFrame:
    """Shared LSH scoring tail: band-collision candidates → exact cosine
    → per-probe rank. ``c_bands``/``items`` may be freshly computed or
    read back from a persisted index — the plan is identical."""
    from pyspark.sql.window import Window

    candidates = (
        c_bands.join(
            F.broadcast(p_bands),
            ["band_id", "bucket"],
        )
        .where(F.col("probe_id") != F.col("item_id"))
        .select("probe_id", "item_id")
        .distinct()
    )
    cosine = F.round(
        _dot(F.col("probe_vec"), F.col("item_vec"))
        / (_norm(F.col("probe_vec")) * _norm(F.col("item_vec"))),
        4,
    )
    scored = (
        candidates.join(items, "item_id")
        .join(F.broadcast(probe_vecs), "probe_id")
        .select("probe_id", "item_id", cosine.alias("cosine"))
    )
    window = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") <= k)
        .select("probe_id", "item_id", "cosine", "rank")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = N_BANDS,
    band_planes: int = BAND_PLANES,
    signature_path: str = "arrow",
) -> DataFrame:
    """Approximate top-k: exact cosine ranked over banded-LSH candidates.

    Candidates are (probe, item) pairs colliding in ≥1 of ``n_bands``
    independent ``band_planes``-bit tables — recall comes from the band
    count, selectivity from the band width, both tunable to corpus size
    (a single 2^8 table degenerates to scanning ~N/256 items per probe at
    lake scale). The probe side is broadcast; the corpus side is touched
    once to band and once to fetch candidate vectors by id. Signatures
    default to the Arrow matmul path (``"expr"`` = oracle fold-order twin).
    For repeated probe workloads persist the banding once with
    ``write_ann_index`` and query through ``lsh_ann_topk_indexed``.
    """
    sig_fn = (
        lsh_banded_signatures_arrow if signature_path == "arrow" else lsh_banded_signatures
    )
    c_bands = sig_fn(
        corpus, dim, vec_col=vec_col, id_col=id_col, n_bands=n_bands, band_planes=band_planes
    ).select(F.col("vec_id").alias("item_id"), "band_id", "bucket")
    p_bands = sig_fn(
        probes, dim, vec_col=vec_col, id_col=id_col, n_bands=n_bands, band_planes=band_planes
    ).select(F.col("vec_id").alias("probe_id"), "band_id", "bucket")
    items = corpus.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec"))
    probe_vecs = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    return _lsh_topk_from_bands(c_bands, items, p_bands, probe_vecs, k)


# -- persisted ANN index -----------------------------------------------------
#
# Signatures and cell assignments are pure functions of the corpus, but
# recomputing them per probe batch re-scans (and for LSH re-matmuls) the
# whole corpus. ``write_ann_index`` lands them once as parquet tables;
# ``*_topk_indexed`` then answer repeated probe workloads touching only
# the index tables — the scale difference between "re-band 10^12 vectors
# per query batch" and "join against a prebuilt bucket table".


#: bands/ partition key width: leading bits of the bucket bit-string →
#: 256 partitions per band. cells/ partition count: cell_id modulo.
_BAND_PFX_BITS = 8
_CELL_PARTITIONS = 256


def _band_pfx(bucket: Column) -> Column:
    """Int partition key from a bucket bit-string's leading bits (see
    ``dedup._hex_pfx`` for why partition values must be typed ints)."""
    return F.conv(F.substring(bucket, 1, _BAND_PFX_BITS), 2, 10).cast("int")


class AnnIndex:
    """Handle to a persisted ANN index (see ``write_ann_index``)."""

    def __init__(
        self,
        bands: DataFrame,
        cells: DataFrame,
        centroids: list,
        dim: int,
        n_bands: int,
        band_planes: int,
    ) -> None:
        self.bands = bands  # (item_id, band_id, bucket)
        self.cells = cells  # (item_id, item_vec, cell_id)
        self.centroids = centroids
        self.dim = dim
        self.n_bands = n_bands
        self.band_planes = band_planes


def write_ann_index(
    corpus: DataFrame,
    dim: int,
    path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = N_BANDS,
    band_planes: int = BAND_PLANES,
    target_cells: int = IVF_TARGET_CELLS,
    stride: int | None = None,
    signature_path: str = "arrow",
    centroids: list | None = None,
) -> None:
    """Persist the reusable halves of both ANN structures:

    - ``bands``   — banded LSH signatures (item_id, band_id, bucket)
    - ``cells``   — IVF cell assignment carrying the vector
      (item_id, item_vec, cell_id), which doubles as the id→vector
      fetch table for LSH candidate verification
    - ``codebook``— the IVF centroid sample
    - ``meta``    — one row of the knobs the index was built with, so a
      reader cannot accidentally band probes with mismatched planes

    Probe-pruned, append-ready layout: both tables are hive-partitioned
    by ``batch_id`` (the full build is batch 0;
    ``append_to_ann_index`` grows the index one idempotent batch at a
    time), then ``bands/`` by ``band_id`` and ``pfx`` (the bucket
    bit-string's leading ``_BAND_PFX_BITS`` bits as an int) and
    ``cells/`` by ``cell_pfx`` (``cell_id mod _CELL_PARTITIONS``), so
    the ``*_topk_indexed`` paths read only the partitions a probe
    batch's buckets / probed cells land in instead of scanning the
    corpus-scale tables — the same file-pruning contract as the minhash
    dedup index (``operators/dedup.py``). The modulo keeps the
    directory count bounded (256) at the advertised 65536-cell setting;
    exact cell matching still happens in the join.

    Everything is written ``overwrite`` so a rebuild is idempotent.
    ``centroids`` overrides the stride sample (k-means output, or a
    frozen codebook an append must stay consistent with).
    """
    if centroids is None:
        centroids = ivf_centroids(
            corpus, target_cells=target_cells, stride=stride,
            vec_col=vec_col, id_col=id_col,
        )
    _write_ann_batch(
        corpus, dim, path, 0, centroids, dynamic=False,
        vec_col=vec_col, id_col=id_col,
        n_bands=n_bands, band_planes=band_planes,
        signature_path=signature_path,
    )
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids], "cid long, cvec array<float>"
    ).write.mode("overwrite").parquet(f"{path}/codebook")
    spark.createDataFrame(
        [(dim, n_bands, band_planes)], "dim int, n_bands int, band_planes int"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def _write_ann_batch(
    corpus: DataFrame,
    dim: int,
    path: str,
    batch_id: int,
    centroids: list,
    *,
    dynamic: bool,
    vec_col: str,
    id_col: str,
    n_bands: int,
    band_planes: int,
    signature_path: str,
) -> None:
    # The full build (dynamic=False) STATICALLY overwrites — truncating
    # the table dir, so a rebuild over a stale/older layout can never
    # leave conflicting partition dirs behind. Appends (dynamic=True)
    # replace only their own batch partitions.
    sig_fn = (
        lsh_banded_signatures_arrow if signature_path == "arrow" else lsh_banded_signatures
    )
    bid = F.lit(batch_id).cast("int")
    # Cluster on the partition key before each partitioned write — one
    # file per partition dir instead of one per (task × dir); see
    # dedup.write_minhash_index for the measured small-files blowup.
    bands = (
        sig_fn(
            corpus, dim, vec_col=vec_col, id_col=id_col,
            n_bands=n_bands, band_planes=band_planes,
        )
        .withColumnRenamed("vec_id", "item_id")
        .withColumn("batch_id", bid)
        .withColumn("pfx", _band_pfx(F.col("bucket")))
        .repartition("band_id", "pfx")
    )
    cells = (
        ivf_assign_arrow(
            corpus, centroids, vec_col=vec_col, id_col=id_col, keep_vec=True
        )
        .select(
            F.col("vec_id").alias("item_id"),
            F.col(vec_col).alias("item_vec"),
            "cell_id",
            bid.alias("batch_id"),
            F.pmod(F.col("cell_id"), F.lit(_CELL_PARTITIONS)).cast("int").alias("cell_pfx"),
        )
        .repartition("cell_pfx")
    )
    mode_opt = "dynamic" if dynamic else "static"
    (
        bands.write.mode("overwrite")
        .option("partitionOverwriteMode", mode_opt)
        .partitionBy("batch_id", "band_id", "pfx")
        .parquet(f"{path}/bands")
    )
    (
        cells.write.mode("overwrite")
        .option("partitionOverwriteMode", mode_opt)
        .partitionBy("batch_id", "cell_pfx")
        .parquet(f"{path}/cells")
    )


def append_to_ann_index(
    corpus_batch: DataFrame,
    path: str,
    *,
    batch_id: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    signature_path: str = "arrow",
) -> None:
    """Grow a ``write_ann_index`` index by one batch — O(batch).

    The embedding-lake sibling of ``dedup.append_to_minhash_index``: a
    daily vector batch bands and cell-assigns against the index's OWN
    frozen knobs (planes from ``meta``, centroids from ``codebook`` —
    never re-derived, so cell ids and buckets stay consistent with every
    earlier batch) and lands in its ``batch_id=<id>`` partitions with
    dynamic partition overwrite: replaying a crashed append rewrites the
    same files, and the corpus-scale batch 0 is never re-signatured.
    Searches through ``read_ann_index`` see the union automatically.

    Contract: ids must be new to the index (one batch per vector), and
    the codebook is frozen at build time — after heavy drift, rebuild
    with ``write_ann_index`` (optionally passing k-means ``centroids=``)
    as the compaction step.
    """
    if batch_id == 0:
        raise ValueError("batch_id 0 is reserved for the full build")
    spark = corpus_batch.sparkSession
    idx = read_ann_index(spark, path)
    _write_ann_batch(
        corpus_batch, idx.dim, path, batch_id, idx.centroids, dynamic=True,
        vec_col=vec_col, id_col=id_col,
        n_bands=idx.n_bands, band_planes=idx.band_planes,
        signature_path=signature_path,
    )


def read_ann_index(spark, path: str) -> AnnIndex:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    centroids = sorted(
        (int(r.cid), [float(x) for x in r.cvec])
        for r in spark.read.parquet(f"{path}/codebook").collect()
    )
    return AnnIndex(
        bands=spark.read.parquet(f"{path}/bands"),
        cells=spark.read.parquet(f"{path}/cells"),
        centroids=centroids,
        dim=int(meta.dim),
        n_bands=int(meta.n_bands),
        band_planes=int(meta.band_planes),
    )


def lsh_ann_topk_indexed(
    index: AnnIndex,
    probes: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    signature_path: str = "arrow",
) -> DataFrame:
    """``lsh_ann_topk`` against a persisted index: only the (small) probe
    side is banded; the corpus-side signatures and vectors come from the
    index tables. Identical results to the live path by construction —
    the scoring tail is the same function.

    The index's ``bands/`` scan partition-prunes on the probe batch's
    realized bucket prefixes (materialized once, collected as a bounded
    int set) — a handful of probes touch a handful of index files. The
    ``cells/`` scan stays full: it is the id→vector fetch table here and
    band-collision candidates can live in any cell.
    """
    sig_fn = (
        lsh_banded_signatures_arrow if signature_path == "arrow" else lsh_banded_signatures
    )
    p_bands = (
        sig_fn(
            probes, index.dim, vec_col=vec_col, id_col=id_col,
            n_bands=index.n_bands, band_planes=index.band_planes,
        )
        .select(F.col("vec_id").alias("probe_id"), "band_id", "bucket")
        .localCheckpoint()
    )
    c_bands = index.bands
    if "pfx" in c_bands.columns:
        pfxs = [
            r[0]
            for r in p_bands.select(_band_pfx(F.col("bucket")).alias("p"))
            .distinct()
            .collect()
        ]
        c_bands = c_bands.where(F.col("pfx").isin(pfxs or [-1]))
    probe_vecs = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    items = index.cells.select("item_id", "item_vec")
    return _lsh_topk_from_bands(c_bands, items, p_bands, probe_vecs, k)


#: Default SemDeDup cosine threshold. The paper (Abbas et al. 2023,
#: arXiv:2303.09540) sweeps 0.5–0.95 on real text embeddings; synthetic
#: near-random test corpora need a far lower cut to produce any pairs.
SEMANTIC_TAU = 0.8


def semantic_dedup(
    corpus: DataFrame,
    *,
    tau: float = SEMANTIC_TAU,
    target_cells: int = IVF_TARGET_CELLS,
    stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    path: str = "arrow",
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup: IVF-cluster embeddings, mark within-cell semantic dups.

    The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-cluster
    the embedding space, then compare pairs ONLY within a cluster — the
    cross-cluster comparisons that make naive near-dup O(N²) are pruned by
    construction. Here the clustering is the engine's IVF codebook
    (``ivf_centroids`` — deterministic stride sample, swap in k-means in
    production without touching this plan), and the duplicate rule is:
    a row is a semantic duplicate iff some LOWER-ID row in its cell has
    ``round(cosine, 4) >= tau``. Min-id witness makes the keeper set
    deterministic and SQL-expressible (the DuckDB oracle recomputes it
    from scratch); it is also exactly the per-cluster "keep one
    representative" outcome when a cell's dups form one clique.

    Scale shape: one narrow shuffle (hash-partition the cell-tagged
    corpus on ``cell_id``), then a per-cell numpy gram matrix inside
    ``applyInPandas`` — O(c² · dim) per cell where c ≈ N / target_cells
    stays constant as both grow; this per-cluster gram matrix IS the cost
    model the paper ran at 5B scale. Hot-cell skew (a giant cluster of
    bit-identical vectors) should be drained with exact dedup on
    ``md5(vector bytes)`` *before* this operator, same contract as
    ``ngram_jaccard_pairs``'s blocking.

    ``path="arrow"`` (production default) rides ``ivf_assign_arrow`` and
    the gram matrix; ``path="expr"`` is the interpreted twin — expression
    cell assignment plus a within-cell self-join with oracle-exact
    sequential fold order (small codebooks only; the two paths agree on
    the driver corpus, pinned by a path-agreement test).

    Returns (vec_id, cell_id, is_semantic_dup) — one row per input row.
    ``kmeans_iters > 0`` refines the codebook first (the paper's actual
    k-means clustering) via ``ivf_kmeans_centroids``; ``0`` (default)
    keeps the stride codebook.
    """
    centroids = ivf_kmeans_centroids(
        corpus, iters=kmeans_iters, target_cells=target_cells,
        stride=stride, vec_col=vec_col, id_col=id_col,
    )
    if path == "arrow":
        import numpy as np
        import pandas as pd

        assign = ivf_assign_arrow(
            corpus, centroids, vec_col=vec_col, id_col=id_col, keep_vec=True
        )

        def mark(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("vec_id", ignore_index=True)
            vecs = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            unit = vecs / norms
            cos = np.round(unit @ unit.T, 4)
            # dup[i] = any strictly-lower-id row within tau: strict lower
            # triangle of the thresholded gram matrix, any per row.
            dup = np.tril(cos >= tau, -1).any(axis=1)
            return pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell_id": pdf["cell_id"],
                    "is_semantic_dup": dup,
                }
            )

        return assign.groupBy("cell_id").applyInPandas(
            mark, schema="vec_id long, cell_id long, is_semantic_dup boolean"
        )

    assign = ivf_assign(corpus, centroids, vec_col=vec_col, id_col=id_col)
    withv = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("vec")
    ).join(assign, "vec_id")
    left = withv.select(
        F.col("vec_id").alias("id_l"), "cell_id", F.col("vec").alias("vec_l")
    )
    right = withv.select(
        F.col("vec_id").alias("id_r"), "cell_id", F.col("vec").alias("vec_r")
    )
    cosine = F.round(
        _dot(F.col("vec_l"), F.col("vec_r"))
        / (_norm(F.col("vec_l")) * _norm(F.col("vec_r"))),
        4,
    )
    dups = (
        left.join(right, "cell_id")
        .where(F.col("id_l") < F.col("id_r"))
        .where(cosine >= tau)
        .select(F.col("id_r").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return assign.join(dups, "vec_id", "left").select(
        "vec_id",
        "cell_id",
        F.coalesce(F.col("dup"), F.lit(False)).alias("is_semantic_dup"),
    )


def ivf_ann_topk_indexed(
    index: AnnIndex,
    probes: DataFrame,
    *,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_path: str = "arrow",
) -> DataFrame:
    """``ivf_ann_topk`` against a persisted index: cell assignment comes
    from the index; only probe→cell ranking runs per query batch
    (``probe_path="expr"`` is the literal-expression twin — small
    codebooks only).

    The ``cells/`` scan partition-prunes on the probed cells' partition
    keys (probes × nprobe ids, bounded by ``_CELL_PARTITIONS``): at the
    advertised 65536-cell setting a probe batch reads only the cell
    groups it actually ranks, not the corpus-scale table.
    """
    if probe_path == "arrow":
        probe_cells = ivf_probe_cells_arrow(
            probes, index.centroids, nprobe=nprobe, vec_col=vec_col, id_col=id_col
        )
    else:
        probe_cells = probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("probe_vec"),
            F.explode(
                F.transform(
                    F.slice(
                        _cell_ranking(F.col(vec_col), index.centroids), 1, nprobe
                    ),
                    lambda s: s["centroid_id"],
                )
            ).alias("probe_cell"),
        )
    cells = index.cells
    if "cell_pfx" in cells.columns:
        probe_cells = probe_cells.localCheckpoint()
        pfxs = [
            r[0]
            for r in probe_cells.select(
                F.pmod(F.col("probe_cell"), F.lit(_CELL_PARTITIONS))
                .cast("int")
                .alias("p")
            )
            .distinct()
            .collect()
        ]
        cells = cells.where(F.col("cell_pfx").isin(pfxs or [-1]))
    return _ivf_topk_from_cells(cells, probe_cells, k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): memory-bounded ANN codes + ADC search
# ---------------------------------------------------------------------------

#: PQ configuration: ``PQ_M`` subspaces of dim/M dims each, ``PQ_TARGET_CODES``
#: codes per subspace. Production (256 codes = 1 byte/subspace) compresses a
#: 64-dim float32 vector (256 B) to 8 B — the difference between an embedding
#: lake that fits in executor memory and one that doesn't. The codebook is
#: CONSTANT-size in the corpus (same stride rule as ``ivf_centroids``):
#: m × 256 × (dim/m) floats ≈ 64 KB at these defaults, broadcast-trivial.
PQ_M = 8
PQ_TARGET_CODES = 256


def pq_codebooks(
    corpus: DataFrame,
    *,
    m: int = PQ_M,
    target_codes: int = PQ_TARGET_CODES,
    stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Per-subspace PQ codebooks from ONE strided sample — bounded collect.

    The full-vector sample rows (every ``stride``-th id, stride defaulting
    to ``max(1, N // target_codes)`` so the codebook never grows with the
    corpus) are sorted by id and sliced into ``m`` equal subvectors; code
    ``c`` in every subspace comes from the same sampled row, and codes are
    dense ranks 0..k-1 so they pack into a byte at the production setting.
    Swap in per-subspace k-means output in production without touching the
    encode/search plan (same upgrade path as ``ivf_kmeans_centroids``).

    Returns ``m`` lists of ``(code, subvector)``, each sorted by code.
    Raises on an empty sample or a dimension not divisible by ``m``.
    """
    if stride is None:
        stride = max(1, corpus.count() // target_codes)
    rows = (
        corpus.where(F.col(id_col) % stride == 0)
        .select(F.col(id_col).cast("long").alias("sid"), F.col(vec_col).alias("svec"))
        .collect()
    )
    if not rows:
        raise ValueError(
            f"pq_codebooks: empty sample (no {id_col} divisible by stride "
            f"{stride}); pass a smaller stride/target_codes or remap ids"
        )
    sample = sorted((int(r.sid), [float(x) for x in r.svec]) for r in rows)
    dim = len(sample[0][1])
    if dim % m:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    d0 = dim // m
    return [
        [(code, vec[s * d0 : (s + 1) * d0]) for code, (_, vec) in enumerate(sample)]
        for s in range(m)
    ]


def pq_kmeans_codebooks(
    corpus: DataFrame,
    *,
    iters: int = 2,
    m: int = PQ_M,
    target_codes: int = PQ_TARGET_CODES,
    stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list:
    """Per-subspace Lloyd training of the PQ codebooks — the actual PQ
    recipe (Jégou et al.: k-means per subquantizer), with the same
    bounded contract as ``pq_codebooks`` (same nested list shape, so it
    drops into encode/ADC unchanged).

    Honest measurement (2000-vector planted corpus, m=8/64 codes):
    training does NOT lift top-5 recall here — raw-ADC recall@5 stays
    ~0.5 either way, because the planted clusters are so tight that
    same-cluster members quantize to identical codes and no codebook can
    order them. The dial that fixes that is RE-RANKING
    (``pq_adc_rerank_topk``: the true top-5 sits inside the ADC top-25
    with recall 1.0). Lloyd training is what reduces quantization
    distortion when the data is spread (real text embeddings), and is
    kept as the standard offline-training step with the same
    determinism/oracle contract as ``ivf_kmeans_centroids``.

    Cost per iteration: ONE corpus pass. A fused Arrow stage encodes the
    batch against all m codebooks (the ``pq_encode`` reshape) and, in
    the same numpy batch, accumulates per-(subspace, code) sums of the
    RAW subvectors — at most m × k × d0 tiny partial-sum rows leave each
    task. A partial-agg groupBy reduces to means; a bounded collect
    rebuilds the list. No corpus shuffle, plan constant in the codebook.

    Determinism rules (same as ``ivf_kmeans_centroids``): assignment
    uses the exact-integer quantized distance (min-code tie-break),
    means are rounded to 6 decimals per iteration, and a code that
    captures no members keeps its previous entry so code ids are stable
    across refinement.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    books = pq_codebooks(
        corpus, m=m, target_codes=target_codes, stride=stride,
        vec_col=vec_col, id_col=id_col,
    )
    d0 = len(books[0][0][1])
    src = corpus.select(vec_col)
    for _ in range(max(0, iters)):
        cb = _codebook_tensor(books)  # (m, k, d0)
        k = cb.shape[1]

        def batches(
            it: Iterator[pd.DataFrame], _cb=cb, _k=k
        ) -> Iterator[pd.DataFrame]:
            for batch in it:
                if not len(batch):
                    continue
                x = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
                )
                xs = x.reshape(len(x), m, 1, d0)
                diff = xs - _cb[None, :, :, :]
                q = np.floor(diff * diff * 10000.0 + 0.5).astype(np.int64).sum(-1)
                codes = np.argmin(q, axis=2)  # (n, m)
                sub = x.reshape(len(x), m, d0)
                frames = []
                for s in range(m):
                    acc = np.zeros((_k, d0))
                    np.add.at(acc, codes[:, s], sub[:, s, :])
                    cnt = np.bincount(codes[:, s], minlength=_k)
                    nz = np.flatnonzero(cnt)
                    frames.append(
                        pd.DataFrame(
                            {
                                "subspace": np.full(nz.size * d0, s, dtype=np.int32),
                                "code": np.repeat(nz, d0).astype("int32"),
                                "pos": np.tile(np.arange(d0, dtype=np.int32), nz.size),
                                "psum": acc[nz].ravel(),
                                "pcnt": np.repeat(cnt[nz], d0).astype("int64"),
                            }
                        )
                    )
                yield pd.concat(frames, ignore_index=True)

        means = (
            src.mapInPandas(
                batches,
                schema="subspace int, code int, pos int, psum double, pcnt long",
            )
            .groupBy("subspace", "code", "pos")
            .agg(F.round(F.sum("psum") / F.sum("pcnt"), 6).alias("mval"))
            .collect()
        )
        by: dict = {}
        for r in means:
            by.setdefault((int(r.subspace), int(r.code)), {})[int(r.pos)] = float(
                r.mval
            )
        books = [
            [
                (
                    code,
                    [by[(s, code)][p] for p in range(d0)]
                    if (s, code) in by
                    else old,
                )
                for code, old in book
            ]
            for s, book in enumerate(books)
        ]
    return books


def _pq_qdist(sub: Column, centroid: list) -> Column:
    """Quantized squared L2 distance between a subvector column and a
    codebook entry: ``Σ_i floor((x_i − c_i)² · 10⁴ + 0.5)`` as BIGINT.

    Quantizing PER COMPONENT before the sum makes the distance an exact
    integer in every engine — a float Σ(x−c)² rounded at the end would
    inherit the engine's summation order (numpy sums pairwise, SQL
    engines fold left), and ADC then ranks by SUMS of these quantities,
    compounding the noise. Integer addition is associative; the only
    residual parity window is a product landing within one ulp of a
    .5 quantization boundary, the same accepted class as every other
    x10k operator in this module.
    """
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(
            sub,
            lit,
            lambda x, c: F.floor(
                (x.cast("double") - c) * (x.cast("double") - c) * F.lit(10000.0)
                + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_encode_expr(
    corpus: DataFrame,
    codebooks: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Expression-twin PQ encoder — oracle-parity path, small codebooks
    only (the plan inlines one struct per (subspace, code); at the
    production 8×256 setting use ``pq_encode``, whose plan is constant
    size). Code choice per subspace: min quantized distance, ties to the
    smaller code."""
    m = len(codebooks)
    d0 = len(codebooks[0][0][1])
    subspaces = []
    for s, book in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), s * d0 + 1, d0)
        ranking = F.sort_array(
            F.array(
                *[
                    F.struct(
                        _pq_qdist(sub, cvec).alias("q"),
                        F.lit(code).cast("int").alias("code"),
                    )
                    for code, cvec in book
                ]
            )
        )
        subspaces.append(F.element_at(ranking, 1)["code"])
    return corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.array(*subspaces).alias("codes"),
    )


def _codebook_tensor(codebooks: list):
    """(m, k, d0) float64 tensor from ``pq_codebooks`` output."""
    import numpy as np

    return np.array(
        [[cvec for _, cvec in book] for book in codebooks], dtype=np.float64
    )


def _adc_lut(rows, cb):
    """(sorted probe ids, probes × m × k int64 LUT) for the Arrow ADC
    kernels, from collected ``(id, vec)`` rows and a ``_codebook_tensor``.

    Quantization is the per-dimension ``_pq_qdist`` exact-integer rule
    (floor(d²·10⁴ + 0.5) per dimension, int64 sum), identical in both
    kernels and the SQL oracle. Built CHUNKED with in-place ufuncs: the
    one-shot ``(P, m, k, d0)`` broadcast formulation allocated ~800 MB
    of temporaries and cost 2.5-3.5 s of serial DRIVER time per pass at
    1024 probes (measured; the single largest fixed cost in the r4 ANN
    scaling series) — 64-probe chunks keep temporaries cache-resident
    at ~0.12 s, bit-identical output."""
    import numpy as np

    m, k, d0 = cb.shape
    probe_ids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    order = np.argsort(probe_ids)
    probe_ids = probe_ids[order]
    x = np.stack(
        [np.asarray(rows[i][1], dtype=np.float64) for i in order]
    ).reshape(len(rows), m, 1, d0)
    lut = np.empty((len(rows), m, k), dtype=np.int64)
    for s in range(0, len(rows), 64):
        d = x[s : s + 64] - cb[None, :, :, :]
        np.multiply(d, d, out=d)
        d *= 10000.0
        d += 0.5
        np.floor(d, out=d)
        lut[s : s + 64] = d.astype(np.int64).sum(-1)
    if lut.size and 0 <= lut.min() and lut.max() <= np.iinfo(np.int32).max:
        # Same values, half the bytes: the int32 table keeps the
        # 1024-probe LUT LLC-resident where the int64 one spilled to
        # DRAM — measured 2→8-process gather scaling 0.67 (int64) vs
        # 0.99 (int32) on this VM, +38% absolute at 8 workers. The
        # kernels accumulate in int64 (explicit sum dtype / int64
        # accumulator array), so scores are bit-identical; values that
        # genuinely exceed int32 (pathological unnormalized vectors)
        # keep the int64 table.
        lut = lut.astype(np.int32)
    return probe_ids, lut


def pq_encode(
    corpus: DataFrame,
    codebooks: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Production PQ encoder: one numpy pass per Arrow batch, plan size
    constant in the codebook (the round-2 IVF literal-expression lesson,
    applied from the start). Emits (vec_id, codes array<int>).

    The quantized per-component distance (``_pq_qdist``) is an exact
    integer, so this path and ``pq_encode_expr`` agree EXACTLY — not
    just within float noise (pinned by the path-agreement test).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    cb = _codebook_tensor(codebooks)  # (m, k, d0)
    m, _, d0 = cb.shape

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
            )  # (n, dim)
            xs = x.reshape(len(x), m, 1, d0)  # (n, m, 1, d0)
            diff = xs - cb[None, :, :, :]  # (n, m, k, d0)
            q = np.floor(diff * diff * 10000.0 + 0.5).astype(np.int64).sum(-1)
            codes = np.argmin(q, axis=2).astype(np.int32)  # first-match = min code
            yield pd.DataFrame(
                {
                    "vec_id": batch[id_col].astype("int64"),
                    "codes": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        batches, schema="vec_id long, codes array<int>"
    )


def pq_probe_tables_arrow(
    probes: DataFrame,
    codebooks: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Production path for the per-probe ADC tables: one numpy pass per
    Arrow batch, plan CONSTANT-size in the codebook. The expression twin
    (``pq_probe_tables``) inlines one struct per (subspace, code) — at
    the production 8×256 setting that is thousands of plan nodes and
    planning dominated wall time 86s vs ~1s (measured, 20k corpus; the
    same lesson as the round-2 IVF probe-ranking verdict). The quantized
    distances are exact integers, so the two paths agree EXACTLY (pinned
    by the path-agreement test)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    cb = _codebook_tensor(codebooks)  # (m, k, d0)
    m, k, d0 = cb.shape
    for book in codebooks:
        if [c for c, _ in book] != list(range(k)):
            raise ValueError(
                "pq_probe_tables_arrow: codebook codes must be dense ranks "
                "0..k-1 (pq_codebooks guarantees this)"
            )
    id_type = dict(probes.dtypes)[id_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            if not len(batch):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            xs = x.reshape(len(x), m, 1, d0)
            diff = xs - cb[None, :, :, :]
            q = np.floor(diff * diff * 10000.0 + 0.5).astype(np.int64).sum(-1)
            n = len(batch)
            yield pd.DataFrame(
                {
                    "probe_id": batch[id_col].to_numpy().repeat(m * k),
                    "subspace": np.tile(
                        np.repeat(np.arange(m, dtype=np.int32), k), n
                    ),
                    "code": np.tile(
                        np.tile(np.arange(k, dtype=np.int32), m), n
                    ),
                    "q": q.reshape(n, m * k).ravel(),
                }
            )

    return probes.select(id_col, vec_col).mapInPandas(
        batches, schema=f"probe_id {id_type}, subspace int, code int, q long"
    )


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _require_integral_id(df: DataFrame, col: str, where: str) -> None:
    """The Arrow ADC kernels index numpy LUTs by probe id (searchsorted)
    and lexsort item ids inside the selection loop — both require integer
    ids. Fail fast with a usable message instead of a mid-job numpy
    ValueError (string-keyed frames should factorize to dense positions
    first, e.g. ``F.xxhash64`` or a zipWithIndex-style dense id)."""
    dtype = dict(df.dtypes).get(col)
    if dtype not in _INTEGRAL_TYPES:
        raise TypeError(
            f"{where}: id column '{col}' must be an integral type for the "
            f"Arrow LUT path (got {dtype!r}); map arbitrary ids to dense "
            "integer positions first, or use the join formulation"
        )


def pq_adc_scan_arrow(
    codes: DataFrame,
    probes: DataFrame,
    codebooks: list,
    *,
    per_probe_r: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force ADC scan: every corpus code row scored against ALL
    probes with one numpy LUT gather per accumulated Arrow batch — the
    full-scan sibling of ``pq_adc_scores_arrow`` (which requires
    pre-paired (probe, item) candidates and so can't serve the non-IVF
    scan).

    Per accumulated chunk the kernel gathers ``LUT[probe, s, code]`` for
    the whole chunk × a block of probes at once (probe blocks sized so
    the int64 score matrix stays ~8 MB), masks self-matches with an
    int64-max sentinel, and keeps each probe's top-``per_probe_r`` rows
    by the global total order ``(adc ASC, item ASC)``. Each (probe,
    item) pair exists in exactly one chunk, so the union of chunk top-R
    sets is a provable superset of the global top-R per probe (if x is
    in the global top-R, fewer than R pairs precede it globally, hence
    fewer than R in its own chunk) — downstream ``row_number`` ranking
    is EXACTLY unchanged while output shrinks from |corpus| × |probes|
    to chunks × probes × R rows.

    Scores use the ``_pq_qdist`` exact-integer rule: bit-identical to
    the join formulation and the SQL oracle (path-agreement pinned by
    test). Probe vectors are collected to build the LUT (probes × m × k
    int64 — 16 MB at 1024×8×256), bounded by the probe batch by design.

    Returns (probe_id, item_id, adc_x10k) candidate rows.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    _require_integral_id(probes, id_col, "pq_adc_scan_arrow")
    _require_integral_id(codes, "vec_id", "pq_adc_scan_arrow")
    cb = _codebook_tensor(codebooks)  # (m, k, d0)
    m, k, d0 = cb.shape
    rows = probes.select(id_col, vec_col).collect()
    probe_ids, lut = _adc_lut(rows, cb)
    bc = codes.sparkSession.sparkContext.broadcast((probe_ids, lut))
    sentinel = np.iinfo(np.int64).max
    r = int(per_probe_r)
    # probe-block × chunk score matrix budget: ~1M int64 cells (8 MB)
    _SCORE_CELLS = 1 << 20

    def score(chunk: pd.DataFrame) -> pd.DataFrame:
        pids, table = bc.value
        items = chunk["item_id"].to_numpy(dtype=np.int64)
        codes_mat = np.stack(
            [np.asarray(c, dtype=np.int64) for c in chunk["codes"]]
        )  # (n, m)
        n = len(items)
        blk = max(1, _SCORE_CELLS // max(n, 1))
        out_p: list = []
        out_i: list = []
        out_q: list = []
        for b0 in range(0, len(pids), blk):
            pid_blk = pids[b0 : b0 + blk]
            lut_blk = table[b0 : b0 + blk]  # (B, m, k)
            scores = np.zeros((len(pid_blk), n), dtype=np.int64)
            for s in range(m):
                # (B, k) rows gathered at the chunk's subspace-s codes
                scores += lut_blk[:, s, :][:, codes_mat[:, s]]
            scores[pid_blk[:, None] == items[None, :]] = sentinel
            for j in range(len(pid_blk)):
                row = scores[j]
                if n > r:
                    idx = np.argpartition(row, r - 1)
                    cand = np.flatnonzero(row <= row[idx[r - 1]])
                else:
                    cand = np.arange(n)
                sel = cand[np.lexsort((items[cand], row[cand]))[:r]]
                sel = sel[row[sel] != sentinel]
                out_p.append(np.full(len(sel), pid_blk[j], dtype=np.int64))
                out_i.append(items[sel])
                out_q.append(row[sel])
        return pd.DataFrame(
            {
                "probe_id": np.concatenate(out_p) if out_p else np.array([], dtype=np.int64),
                "item_id": np.concatenate(out_i) if out_i else np.array([], dtype=np.int64),
                "adc_x10k": np.concatenate(out_q) if out_q else np.array([], dtype=np.int64),
            }
        )

    # Same batch-accumulation rationale as pq_adc_scores_arrow: the
    # session Arrow batch size is PDF-tuned small; code rows are narrow.
    _TARGET = 65536

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list = []
        n = 0
        for batch in it:
            if not len(batch):
                continue
            buf.append(batch)
            n += len(batch)
            if n >= _TARGET:
                yield score(pd.concat(buf, ignore_index=True))
                buf, n = [], 0
        if buf:
            yield score(pd.concat(buf, ignore_index=True))

    p_type = dict(probes.dtypes)[id_col]
    i_type = dict(codes.dtypes)["vec_id"]
    return codes.select(F.col("vec_id").alias("item_id"), "codes").mapInPandas(
        batches,
        schema=f"probe_id {p_type}, item_id {i_type}, adc_x10k long",
    )


def pq_adc_scores_arrow(
    cands_with_codes: DataFrame,
    probes: DataFrame,
    codebooks: list,
    *,
    prune_per_batch: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_rows: list | None = None,
) -> DataFrame:
    """Production-rate ADC scoring: one numpy LUT *gather* per Arrow
    batch over (probe_id, item_id, codes) candidate rows — the memory
    path real IVFADC engines use, here as the Arrow twin of the join
    formulation.

    Why it exists (measured on the scaling corpus, 1024 probes × 16M
    candidates): the join path explodes candidates ×m (131M rows),
    probes a 2M-entry broadcast hash relation per row (cache-hostile —
    the relation is ~100× L2), and re-aggregates with a 16M-key hash
    groupBy; cores stall on DRAM instead of computing. This path reads
    each candidate row ONCE, gathers ``LUT[probe, subspace, code]``
    vectorized (the LUT tensor is probes × m × k int64 — 16 MB at
    1024×8×256, shipped once per executor), and needs no explode, no
    broadcast hash join, no re-aggregation.

    Quantization is the ``_pq_qdist`` exact-integer rule, so scores are
    BIT-IDENTICAL to the join path and the SQL oracle (path-agreement
    pinned by test). ``prune_per_batch=R`` keeps only each batch's
    top-R rows per probe by the global ordering ``(adc ASC, item ASC)``
    — the global top-R is a subset of the union of batch top-Rs, so
    downstream shortlist selection is EXACTLY unchanged while the
    shortlist shuffle shrinks from |candidates| to ≈ batches × probes
    × R rows (the standard partial-top-k trick, same spirit as
    map-side combine).

    Probe vectors are collected to the driver to build the LUT — the
    same data volume the join path ships through its broadcast, bounded
    by the probe batch by design. A caller that already holds the
    collected ``(id, vec)`` rows passes them via ``probe_rows`` to skip
    the second collect job — one of the measured fixed per-pass costs
    in the r4 ANN scaling series.

    Standalone kernel for callers with their OWN candidate generation
    (pre-paired rows). ``ivfpq_topk`` itself no longer pairs candidates
    as Spark rows — it defaults to the inverted-list
    ``pq_adc_cell_scan_arrow``, which moves the pairing inside the
    kernel and cuts the Arrow channel ~100× (measured rationale there).

    Returns (probe_id, item_id, adc_x10k).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    _require_integral_id(probes, id_col, "pq_adc_scores_arrow")
    cb = _codebook_tensor(codebooks)  # (m, k, d0)
    m, k, d0 = cb.shape
    rows = (
        probe_rows
        if probe_rows is not None
        else probes.select(id_col, vec_col).collect()
    )
    probe_ids, lut = _adc_lut(rows, cb)
    bc = cands_with_codes.sparkSession.sparkContext.broadcast((probe_ids, lut))
    sub = np.arange(m, dtype=np.int64)

    def score(chunk: pd.DataFrame) -> pd.DataFrame:
        pids, table = bc.value
        bp = chunk["probe_id"].to_numpy()
        pidx = np.searchsorted(pids, bp)
        if not np.array_equal(pids[np.clip(pidx, 0, len(pids) - 1)], bp):
            raise ValueError(
                "pq_adc_scores_arrow: candidate rows reference probe "
                "ids absent from the probe frame"
            )
        codes_mat = np.stack(
            [np.asarray(c, dtype=np.int64) for c in chunk["codes"]]
        )
        # int64 accumulation regardless of the LUT's storage dtype
        # (int32 when values fit — see _adc_lut): identical scores.
        q = table[pidx[:, None], sub[None, :], codes_mat].sum(
            axis=1, dtype=np.int64
        )
        out = pd.DataFrame(
            {
                "probe_id": chunk["probe_id"].to_numpy(),
                "item_id": chunk["item_id"].to_numpy(),
                "adc_x10k": q,
            }
        )
        if prune_per_batch is not None:
            out = (
                out.sort_values(["probe_id", "adc_x10k", "item_id"])
                .groupby("probe_id", sort=False)
                .head(prune_per_batch)
            )
        return out

    # Accumulate incoming Arrow batches to ~64k rows before scoring: the
    # session's arrow.maxRecordsPerBatch is tuned small (512) to bound
    # giant-DOCUMENT batches, but candidate rows are ~50 bytes — at 512
    # rows/batch the per-batch Python overhead dominates (~2ms × 31k
    # batches on the scaling corpus) and per-batch pruning never prunes
    # (a batch holds ≤ R rows per probe already). Chunking inside the
    # generator makes the operator independent of the session knob.
    _TARGET = 65536

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list = []
        n = 0
        for batch in it:
            if not len(batch):
                continue
            buf.append(batch)
            n += len(batch)
            if n >= _TARGET:
                yield score(pd.concat(buf, ignore_index=True))
                buf, n = [], 0
        if buf:
            yield score(pd.concat(buf, ignore_index=True))

    id_type = dict(cands_with_codes.dtypes).get("item_id", "bigint")
    p_type = dict(cands_with_codes.dtypes).get("probe_id", "bigint")
    return cands_with_codes.select("probe_id", "item_id", "codes").mapInPandas(
        batches,
        schema=f"probe_id {p_type}, item_id {id_type}, adc_x10k long",
    )


def pq_adc_cell_scan_arrow(
    codes_with_cells: DataFrame,
    probes: DataFrame,
    centroids: list,
    codebooks: list,
    *,
    nprobe: int,
    per_probe_r: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_rows: list | None = None,
) -> DataFrame:
    """IVFADC scoring the way inverted-list engines actually run it:
    each corpus code row ships ONCE with its ``cell_id``, and the kernel
    expands it against the probes probing that cell in numpy — the
    (probe × candidate) pairing never exists as Spark rows.

    Why it replaces the pre-paired formulation in ``ivfpq_topk``
    (measured, 131k-vector scaling corpus, 1024 probes, nprobe 8/64):
    generating candidates as a JVM join emitted |candidates| =
    |corpus| × probes-per-cell ≈ 16.7M rows and shipped them through
    the JVM→Python Arrow channel (~1.5 GB/pass with the code arrays) —
    the per-pass cost the ANN scaling series kept paying after every
    driver-side fixed cost was removed. This kernel's input is the
    corpus-size (item, cell, codes) frame (~131k rows, ~15 MB), its
    broadcast is the LUT + a cell→probe-positions map, and its output
    is pruned to ≲ probes × R per accumulated chunk, so Arrow traffic
    drops ~100× while the gather count (the actual ADC math) is
    unchanged.

    Exactness: quantization is the ``_pq_qdist`` integer rule via the
    shared ``_adc_lut``; probe→cell assignment is the bit-identical
    ``_probe_cell_assign``; self-matches mask to a sentinel exactly as
    ``pq_adc_scan_arrow``. Per (cell, chunk) block the kernel keeps,
    per probe, every pair whose score ties-or-beats the block's R-th
    smallest — a SUPERSET of the block's (adc ASC, item ASC) top-R, and
    each (probe, item) pair exists in exactly one block, so the union
    provably contains the global per-probe top-R and the downstream
    ``row_number`` shortlist is EXACTLY the join path's (path-agreement
    pinned by test).

    Returns (probe_id, item_id, adc_x10k) candidate rows.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    _require_integral_id(probes, id_col, "pq_adc_cell_scan_arrow")
    _require_integral_id(codes_with_cells, "item_id", "pq_adc_cell_scan_arrow")
    cb = _codebook_tensor(codebooks)
    m, k, d0 = cb.shape
    rows = (
        probe_rows
        if probe_rows is not None
        else probes.select(id_col, vec_col).collect()
    )
    pids, lut = _adc_lut(rows, cb)
    order = np.argsort(
        np.array([int(r[0]) for r in rows], dtype=np.int64)
    )
    assign = _probe_cell_assign([rows[i] for i in order], centroids, nprobe)
    cell_map: dict = {}
    for pos, row_cells in enumerate(assign):
        for c in row_cells:
            cell_map.setdefault(int(c), []).append(pos)
    cell_map = {
        c: np.array(v, dtype=np.int64) for c, v in cell_map.items()
    }
    bc = codes_with_cells.sparkSession.sparkContext.broadcast(
        (pids, lut, cell_map)
    )
    sentinel = np.iinfo(np.int64).max
    r = int(per_probe_r)

    def score(chunk: pd.DataFrame) -> pd.DataFrame:
        spids, table, cmap = bc.value
        items = chunk["item_id"].to_numpy(dtype=np.int64)
        cellids = chunk["cell_id"].to_numpy(dtype=np.int64)
        codes_mat = np.stack(
            [np.asarray(c, dtype=np.int64) for c in chunk["codes"]]
        )
        grp_order = np.argsort(cellids, kind="stable")
        bounds = np.flatnonzero(np.diff(cellids[grp_order])) + 1
        out_p: list = []
        out_i: list = []
        out_q: list = []
        for grp in np.split(grp_order, bounds):
            ppos = cmap.get(int(cellids[grp[0]]))
            if ppos is None:
                continue  # cell probed by nobody in this batch
            it = items[grp]
            cm = codes_mat[grp]  # (n_c, m)
            lut_c = table[ppos]  # (B, m, k)
            scores = np.zeros((len(ppos), len(grp)), dtype=np.int64)
            for s in range(m):
                scores += lut_c[:, s, :][:, cm[:, s]]
            scores[spids[ppos][:, None] == it[None, :]] = sentinel
            if len(grp) > r:
                kth = np.partition(scores, r - 1, axis=1)[:, r - 1 : r]
                mask = scores <= kth  # ties at the boundary stay in
            else:
                mask = np.ones_like(scores, dtype=bool)
            mask &= scores != sentinel
            pj, ij = np.nonzero(mask)
            out_p.append(spids[ppos[pj]])
            out_i.append(it[ij])
            out_q.append(scores[pj, ij])
        empty = np.array([], dtype=np.int64)
        if not out_p:
            return pd.DataFrame(
                {"probe_id": empty, "item_id": empty, "adc_x10k": empty}
            )
        p = np.concatenate(out_p)
        i = np.concatenate(out_i)
        q = np.concatenate(out_q)
        # Second-level prune: exact top-R per probe ACROSS the chunk's
        # cell blocks by the global (adc ASC, item ASC) order — same
        # subset-preservation argument one level up. Without it a probe
        # touching many (cell × chunk) blocks emits R rows per block
        # (measured 3.3M rows into the downstream row_number shuffle at
        # x256; ≤ probes × R per chunk after).
        order = np.lexsort((i, q, p))
        p, i, q = p[order], i[order], q[order]
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        sizes = np.diff(np.r_[starts, len(p)])
        ranks = np.arange(len(p)) - np.repeat(starts, sizes)
        keep = ranks < r
        return pd.DataFrame(
            {"probe_id": p[keep], "item_id": i[keep], "adc_x10k": q[keep]}
        )

    # Same batch-accumulation rationale as the sibling kernels.
    _TARGET = 65536

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list = []
        n = 0
        for batch in it:
            if not len(batch):
                continue
            buf.append(batch)
            n += len(batch)
            if n >= _TARGET:
                yield score(pd.concat(buf, ignore_index=True))
                buf, n = [], 0
        if buf:
            yield score(pd.concat(buf, ignore_index=True))

    p_type = dict(probes.dtypes)[id_col]
    i_type = dict(codes_with_cells.dtypes)["item_id"]
    return codes_with_cells.select("item_id", "cell_id", "codes").mapInPandas(
        batches,
        schema=f"probe_id {p_type}, item_id {i_type}, adc_x10k long",
    )


def pq_probe_tables(
    probes: DataFrame,
    codebooks: list,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Expression twin of ``pq_probe_tables_arrow``: (probe_id, subspace,
    code, q) built as literal structs — the oracle-parity path, small
    codebooks only (the plan grows one struct per codebook entry)."""
    m = len(codebooks)
    d0 = len(codebooks[0][0][1])
    entries = []
    for s, book in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), s * d0 + 1, d0)
        for code, cvec in book:
            entries.append(
                F.struct(
                    F.lit(s).cast("int").alias("subspace"),
                    F.lit(code).cast("int").alias("code"),
                    _pq_qdist(sub, cvec).alias("q"),
                )
            )
    return probes.select(
        F.col(id_col).cast("long").alias("probe_id"),
        F.explode(F.array(*entries)).alias("t"),
    ).select("probe_id", "t.subspace", "t.code", "t.q")


def pq_adc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: DataFrame | None = None,
    probe_path: str = "arrow",
    scan_path: str = "arrow",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — the scan that reads
    8-byte codes instead of 256-byte vectors. The corpus' raw embeddings
    are never read by the scan — pass ``codes`` (e.g. a persisted
    ``pq_encode`` table) to skip encoding entirely. Ranking is
    (adc_x10k ASC, item_id ASC); self-matches are excluded.

    ``scan_path="arrow"`` (production default) scores each accumulated
    Arrow batch of code rows against the full probe LUT in one numpy
    gather (``pq_adc_scan_arrow``) with per-chunk partial top-k — no
    explode, no broadcast hash probe per row, no |probes| × |corpus|-key
    re-aggregation. ``scan_path="join"`` is the JVM-join twin the SQL
    oracle mirrors: corpus codes explode to ``m`` narrow int rows per
    vector, the per-probe (m × k)-row tables broadcast, the join keys on
    (subspace, code) and a partial-agg integer sum collapses back to one
    ADC distance per (probe, vector). Measured (scaling corpus, 1024
    probes × 16M candidates, see ``pq_adc_scores_arrow``): the join
    formulation stalls cores on DRAM probing a ~100×-L2 broadcast
    relation per exploded row — the gather path reads each code row
    once. Exact-integer quantization makes the two paths agree
    bit-for-bit (path-agreement test).

    ``probe_path`` selects the join path's probe-table construction:
    "arrow" = constant-size Arrow kernel, "expr" = literal-expression
    oracle twin (small codebooks only — identical integers).

    Returns (probe_id, item_id, adc_x10k, rank).
    """
    from pyspark.sql.window import Window

    if codes is None:
        codes = pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col)
    if scan_path == "arrow":
        cand = pq_adc_scan_arrow(
            codes, probes, codebooks,
            per_probe_r=k, vec_col=vec_col, id_col=id_col,
        )
        w = Window.partitionBy("probe_id").orderBy(
            F.asc("adc_x10k"), F.asc("item_id")
        )
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("probe_id", "item_id", "adc_x10k", "rank")
        )
    m = len(codebooks)
    exploded = codes.select(
        F.col("vec_id").alias("item_id"),
        F.posexplode("codes").alias("subspace", "code"),
    )
    table_fn = pq_probe_tables_arrow if probe_path == "arrow" else pq_probe_tables
    tables = table_fn(probes, codebooks, vec_col=vec_col, id_col=id_col)
    adc = (
        exploded.join(
            F.broadcast(tables),
            ["subspace", "code"],
        )
        .where(F.col("item_id") != F.col("probe_id"))
        .groupBy("probe_id", "item_id")
        .agg(F.sum("q").alias("adc_x10k"), F.count("*").alias("_n"))
        # A (probe, item) pair survives only with all m subspace terms —
        # count acts as a correctness tripwire against partial joins.
        .where(F.col("_n") == m)
        .drop("_n")
    )
    w = Window.partitionBy("probe_id").orderBy(F.asc("adc_x10k"), F.asc("item_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "item_id", "adc_x10k", "rank")
    )


def pq_adc_rerank_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: list,
    *,
    k: int = 5,
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes: DataFrame | None = None,
    probe_path: str = "arrow",
    scan_path: str = "arrow",
) -> DataFrame:
    """ADC shortlist → exact cosine re-rank: the production PQ search
    architecture (Jégou et al.'s IVFADC+R). Raw ADC cannot order
    near-identical neighbors that quantize to the same codes, so the
    scan over-fetches ``shortlist`` candidates from the code table and
    re-ranks only those with exact cosine. Sizing rule (measured,
    scripts/ann_recall.py): ``shortlist`` must exceed the expected
    population of quantization TIES around a probe — on the 20k planted
    corpus (~40 near-identical vectors per cluster) recall@5 is 0.14
    raw, 0.74 at R=25, and 1.0 at R=50; on the 2k/16-dim test corpus
    R=25 already reaches 1.0. The default 5·k is a floor, not a
    recommendation — size R to the corpus' duplicate density.

    Scale shape: the corpus-wide pass stays on 8-byte codes
    (``pq_adc_topk``); exact distances touch |probes| × shortlist
    vectors, fetched with a broadcast semi-join on the candidate ids —
    the raw-vector table is scanned (column-pruned) but never shuffled
    and never crossed with the full probe set.

    Returns (probe_id, item_id, cosine, rank) — same contract as
    ``cosine_topk``, ranking (round(cos,4) DESC, item_id ASC).
    """
    r = shortlist if shortlist is not None else 5 * k
    sl = pq_adc_topk(
        corpus, probes, codebooks, k=r, vec_col=vec_col, id_col=id_col,
        codes=codes, probe_path=probe_path, scan_path=scan_path,
    ).select("probe_id", "item_id")
    return _exact_rerank(corpus, probes, sl, k, vec_col=vec_col, id_col=id_col)


def _exact_rerank(
    corpus: DataFrame,
    probes: DataFrame,
    sl: DataFrame,
    k: int,
    *,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Exact cosine re-rank of a (probe_id, item_id) shortlist: candidate
    vectors fetched with ONE broadcast join (the raw-vector table is
    scanned column-pruned, never shuffled, never crossed with the probe
    set — corpus rows without a shortlist entry drop at the join, so
    the scoring broadcast IS the candidate filter), ranked
    (round(cos,4) DESC, item_id ASC). Shared by every PQ-backed search
    (``pq_adc_rerank_topk``, ``ivfpq_topk``).

    Single-subtree shape, deliberately: the shortlist appears EXACTLY
    once in the plan. A previous formulation prefiltered with a
    broadcast semi-join on ``sl.select("item_id").distinct()`` and then
    joined ``broadcast(sl)`` again for scoring — two non-canonically-
    equal subtrees ReuseExchange cannot deduplicate, so the entire
    upstream ADC subtree computed TWICE per query (measured 16s of a
    44s ivfpq pass on the scaling corpus), patched with a
    ``localCheckpoint`` barrier that itself cost a fixed serial job
    per pass (part of the r4 scaling series' ~6s fixed cost). One
    subtree needs neither the barrier nor the dedup.
    """
    from pyspark.sql.window import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("probe_vec")
    )
    cosine = F.round(
        _dot(F.col("probe_vec"), F.col("item_vec"))
        / (_norm(F.col("probe_vec")) * _norm(F.col("item_vec"))),
        4,
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("item_id"), F.col(vec_col).alias("item_vec")
        )
        .join(F.broadcast(sl), "item_id")
        .join(F.broadcast(p), "probe_id")
        .select("probe_id", "item_id", cosine.alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "item_id", "cosine", "rank")
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    *,
    m: int = PQ_M,
    target_codes: int = PQ_TARGET_CODES,
    stride: int | None = None,
    kmeans_iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist a PQ index: ``codebooks/`` (one (subspace, code, cvec) row
    per entry — m × k rows, broadcast-trivial) and ``codes/`` (the
    ``pq_encode`` table, the only corpus-size artifact: m small ints per
    vector instead of dim floats). Overwrite-idempotent, same contract as
    ``write_ann_index``/``write_minhash_index``; repeated probe batches
    then run ``pq_adc_topk``/``pq_adc_rerank_topk`` with ``codes=`` and
    never re-encode (or, for raw ADC, even re-read) the corpus.
    ``kmeans_iters > 0`` Lloyd-trains the codebooks before encoding.

    ``codes/`` is hive-partitioned by ``batch_id`` (full build = 0) so
    ``append_to_pq_index`` can grow the code table one idempotent batch
    at a time against the frozen codebooks.
    """
    base = path.rstrip("/")
    if kmeans_iters > 0:
        books = pq_kmeans_codebooks(
            corpus, iters=kmeans_iters, m=m, target_codes=target_codes,
            stride=stride, vec_col=vec_col, id_col=id_col,
        )
    else:
        books = pq_codebooks(
            corpus, m=m, target_codes=target_codes, stride=stride,
            vec_col=vec_col, id_col=id_col,
        )
    spark = corpus.sparkSession
    rows = [
        (s, code, [float(x) for x in cvec])
        for s, book in enumerate(books)
        for code, cvec in book
    ]
    spark.createDataFrame(
        rows, "subspace int, code int, cvec array<double>"
    ).write.mode("overwrite").parquet(f"{base}/codebooks")
    pq_encode(corpus, books, vec_col=vec_col, id_col=id_col).withColumn(
        "batch_id", F.lit(0).cast("int")
    ).write.mode("overwrite").partitionBy("batch_id").parquet(f"{base}/codes")


def append_to_pq_index(
    corpus_batch: DataFrame,
    path: str,
    *,
    batch_id: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Grow a ``write_pq_index`` code table by one batch — O(batch).

    Encodes against the index's FROZEN codebooks (read back exactly;
    doubles are lossless in parquet) and lands in the batch's own
    ``codes/batch_id=<id>`` partition with dynamic partition overwrite —
    idempotent under at-least-once replay, corpus never re-encoded.
    Same drift contract as ``append_to_ann_index``: rebuild (optionally
    with retrained codebooks) as the compaction step.
    """
    if batch_id == 0:
        raise ValueError("batch_id 0 is reserved for the full build")
    spark = corpus_batch.sparkSession
    books, _ = read_pq_index(spark, path)
    (
        pq_encode(corpus_batch, books, vec_col=vec_col, id_col=id_col)
        .withColumn("batch_id", F.lit(batch_id).cast("int"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(f"{path.rstrip('/')}/codes")
    )


def read_pq_index(spark, path: str) -> tuple:
    """(codebooks list, codes DataFrame) from ``write_pq_index`` output —
    the list round-trips exactly (doubles stored losslessly in parquet),
    so indexed search is bit-identical to the live path."""
    base = path.rstrip("/")
    by: dict = {}
    for r in spark.read.parquet(f"{base}/codebooks").collect():
        by.setdefault(int(r.subspace), []).append(
            (int(r.code), [float(x) for x in r.cvec])
        )
    books = [sorted(by[s]) for s in sorted(by)]
    return books, spark.read.parquet(f"{base}/codes")


def ivfpq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: list,
    codebooks: list,
    *,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: DataFrame | None = None,
    codes: DataFrame | None = None,
    adc_path: str = "arrow",
) -> DataFrame:
    """IVFADC — the canonical billion-scale ANN composition (Jégou et
    al.): IVF cells prune WHICH vectors to score, PQ codes decide HOW
    CHEAPLY to score them, exact re-rank restores ordering fidelity.

    ``adc_path="arrow"`` (production default) runs the inverted-list
    scan ``pq_adc_cell_scan_arrow``: each code row ships once with its
    cell id and the kernel expands it against that cell's probes in
    numpy with per-block top-R pruning — the candidate pairing never
    exists as Spark rows; ``"join"`` is the JVM-join twin (broadcast
    probe→cell candidate join, explode ×m + broadcast probe tables +
    hash re-aggregate) whose plan the SQL oracle mirrors —
    exact-integer quantization makes the two paths agree bit-for-bit
    (path-agreement test).

    Cost model at lake scale: the ADC sum touches only vectors in the
    ``nprobe`` probed cells (≈ nprobe/cells of the corpus) and reads m
    small ints per vector, never the raw embedding; the exact re-rank
    touches |probes| × shortlist vectors. Both corpus-side artifacts
    (``cells``, ``codes``) are persistable — pass them from
    ``write_ann_index``/``write_pq_index`` output so a probe batch runs
    three broadcast-joined narrow scans and zero Arrow encodes.

    Candidate generation joins the cell table against the broadcast
    probe→cell list; ADC joins the candidates' exploded codes against
    the broadcast per-probe tables on (probe_id, subspace, code) and
    partial-agg sums; ranking/tie rules are identical to
    ``pq_adc_rerank_topk`` (shortlist sizing rule documented there
    applies unchanged).

    Returns (probe_id, item_id, cosine, rank).
    """
    from pyspark.sql.window import Window

    r = shortlist if shortlist is not None else 5 * k
    if cells is None:
        cells = ivf_assign_arrow(corpus, centroids, vec_col=vec_col, id_col=id_col)
    if codes is None:
        codes = pq_encode(corpus, codebooks, vec_col=vec_col, id_col=id_col)
    # One driver-side collect of the probe batch (bounded by design —
    # the ADC LUT needs it on the driver regardless) feeds the
    # probe→cell assignment and the LUT build, replacing two of the
    # measured fixed per-pass jobs from the r4 ANN scaling series (the
    # probe-side Arrow stage and the ADC kernel's own collect) with
    # one. Assignment math is bit-identical to ``ivf_probe_cells_arrow``
    # (same helpers, same rounding/tie-break).
    spark = probes.sparkSession
    probe_rows = probes.select(id_col, vec_col).collect()
    if adc_path == "arrow":
        # Inverted-list scan: the (probe × candidate) pairing happens
        # inside the kernel, never as Spark rows — see
        # pq_adc_cell_scan_arrow for the measured reasons.
        cwc = codes.select(F.col("vec_id").alias("item_id"), "codes").join(
            cells.select(F.col("vec_id").alias("item_id"), "cell_id"),
            "item_id",
        )
        adc = pq_adc_cell_scan_arrow(
            cwc, probes, centroids, codebooks,
            nprobe=nprobe, per_probe_r=r,
            vec_col=vec_col, id_col=id_col, probe_rows=probe_rows,
        )
    else:
        probe_cells = _probe_cells_local(
            spark, probe_rows, centroids,
            nprobe=nprobe, id_type=dict(probes.dtypes)[id_col],
        )
        cand = (
            cells.join(
                F.broadcast(probe_cells),
                cells.cell_id == probe_cells.probe_cell,
            )
            .where(F.col("vec_id") != F.col("probe_id"))
            .select("probe_id", F.col("vec_id").alias("item_id"))
        )
        cwc = cand.join(
            codes.select(F.col("vec_id").alias("item_id"), "codes"), "item_id"
        )
        m = len(codebooks)
        cand_codes = cwc.select(
            "probe_id", "item_id", F.posexplode("codes").alias("subspace", "code")
        )
        tables = pq_probe_tables_arrow(
            probes, codebooks, vec_col=vec_col, id_col=id_col
        )
        adc = (
            cand_codes.join(F.broadcast(tables), ["probe_id", "subspace", "code"])
            .groupBy("probe_id", "item_id")
            .agg(F.sum("q").alias("adc_x10k"), F.count("*").alias("_n"))
            .where(F.col("_n") == m)
            .drop("_n")
        )
    wsl = Window.partitionBy("probe_id").orderBy(F.asc("adc_x10k"), F.asc("item_id"))
    sl = (
        adc.withColumn("_r", F.row_number().over(wsl))
        .where(F.col("_r") <= r)
        .select("probe_id", "item_id")
    )
    return _exact_rerank(corpus, probes, sl, k, vec_col=vec_col, id_col=id_col)
