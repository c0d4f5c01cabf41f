"""Third-workload scaling evidence: IVFADC ANN search at N vs 4N.

The broadcast-probe ANN design's scaling claim, measured instead of
argued (round-3 verdict item 8): probe batches against a PERSISTED
index (``write_ann_index`` cells + ``write_pq_index`` codes — built
once, outside the timed region, exactly like production) run the full
``ivfpq_topk`` composition — cell-pruned candidate join, integer ADC
partial-agg, exact re-rank — at ``local[2]`` and ``local[8]`` in
separate JVMs, and the script prints the N→4N efficiency.

Measurement preconditions (same rationale as ``dedup_scaling.py``):

1. the corpus must be multi-split (the sf0.1 embeddings parquet is one
   row group → one scan task), so the script writes a replicated
   64-split copy with remapped ids;
2. the probe side stays broadcast on purpose — that IS the operator's
   scale shape (probe×nprobe and per-probe ADC tables are tiny by
   design) and their build cost is milliseconds, not the Amdahl serial
   step the dedup chain's gram-table broadcast was;
3. scan splits must reflect the production regime. The ADC stage's map
   work is ~1000× its input bytes (each candidate row explodes into m
   code rows joined against the probe tables), but Spark sizes scan
   partitions by INPUT bytes — at test scale the whole cells+codes
   input is ~40 MB, so the default 128 MB packing ran the entire 262M-
   row ADC stage in 2-4 tasks and N→4N measured 0.275 (task-starved,
   not operator-limited). A production codes table is terabytes across
   thousands of splits; ``maxPartitionBytes=1m`` reproduces that
   many-splits regime at test scale so the measurement exercises the
   operator, not the file packer.

    python scripts/ann_scaling.py [--sf-dir DIR] [--x 64] [--probes 256]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: IVF/PQ knobs for the scaling corpus: 64 cells keeps the expression
#: oracle twins usable elsewhere, nprobe=8 scores 1/8 of the corpus per
#: probe — a realistic recall-leaning setting.
CELLS, NPROBE, K = 64, 8, 10

PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from ebook_conversion_to_text_for_machine_learning_spark.session import build_session
from ebook_conversion_to_text_for_machine_learning_spark.operators import similarity as S
from pyspark.sql import functions as F
spark = build_session(master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.read.parquet({src!r})
# Dense id remap (orig*x + i): replica ids interleave, so the stride
# centroid rule (vec_id % stride == 0) samples DISTINCT base vectors.
# The first attempt's orig + i*10M scheme made every sampled id a copy
# of vector 0 (10M % stride == 0) -> 64 identical centroids -> the
# whole corpus in one cell.
# explode instead of an x-way union: the union plan grows one scan per
# replica (4096-way unions stall the analyzer); the explode is one scan.
big = emb.select(
    F.explode(F.sequence(F.lit(0), F.lit({x} - 1))).alias("_i"),
    "vec_id", "embedding",
).select((F.col("vec_id") * {x} + F.col("_i")).alias("vec_id"), "embedding")
big.repartition(max(64, {x} // 16)).write.mode("overwrite").parquet({corpus!r})
corpus = spark.read.parquet({corpus!r})
S.write_ann_index(corpus, {dim}, {ann_idx!r}, target_cells={cells})
S.write_pq_index(corpus, {pq_idx!r})
spark.stop()
"""

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ebook_conversion_to_text_for_machine_learning_spark.session import build_session
from ebook_conversion_to_text_for_machine_learning_spark.operators import similarity as S
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
spark = build_session(app_name=f"ann-scale-{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=max(cpus, 32),
                      extra_conf={{"spark.ui.showConsoleProgress": "false",
                                   "spark.sql.files.maxPartitionBytes": "1m",
                                   "spark.sql.files.openCostInBytes": "65536",
                                   # AQE sizes post-shuffle stages by BYTES
                                   # (64MB advisory) — right for JVM stages,
                                   # wrong above an Arrow-Python kernel doing
                                   # ~100x the work per byte: the candidate
                                   # join's 256MB output coalesced to 4-12
                                   # tasks and left local[8] half idle.
                                   "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"}})
spark.sparkContext.setLogLevel("ERROR")
idx = S.read_ann_index(spark, {ann_idx!r})
books, codes = S.read_pq_index(spark, {pq_idx!r})
corpus = spark.read.parquet({corpus!r})
n_corpus = corpus.count()
stride = (n_corpus // {probes}) or 1
# repartition after limit(): limit coalesces to ONE partition, which
# would serialize the probe-side Arrow stages.
probes = (
    corpus.where(F.col("vec_id") % stride == 1)
    .limit({probes})
    .repartition(max(cpus, 8))
    .localCheckpoint()
)
cells = idx.cells.select(F.col("item_id").alias("vec_id"), "cell_id")

def run():
    S.ivfpq_topk(
        corpus, probes, idx.centroids, books,
        k={k}, nprobe={nprobe}, cells=cells, codes=codes,
    ).write.mode("overwrite").format("noop").save()

run()  # warm-up: worker pool + codegen, untimed
best = None
for _ in range(2):
    t = time.time(); run(); el = time.time() - t
    best = el if best is None or el < best else best
print(json.dumps({{"cpus": cpus, "sec": round(best, 3)}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--x", type=int, default=64, help="corpus replication factor")
    ap.add_argument("--probes", type=int, default=256)
    args = ap.parse_args()

    tmp = tempfile.gettempdir()
    corpus = os.path.join(tmp, f"ann_scaling_corpus_x{args.x}")
    ann_idx = os.path.join(tmp, f"ann_scaling_annidx_x{args.x}")
    pq_idx = os.path.join(tmp, f"ann_scaling_pqidx_x{args.x}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        prep = PREP.format(
            repo=REPO,
            src=os.path.join(args.sf_dir, "embeddings.parquet"),
            corpus=corpus, x=args.x, dim=64,
            ann_idx=ann_idx, pq_idx=pq_idx, cells=CELLS,
        )
        subprocess.run([sys.executable, "-c", prep], check=True)

    results = {}
    for cpus in (2, 8):
        out = subprocess.run(
            [
                sys.executable,
                "-c",
                RUNNER.format(
                    repo=REPO, ann_idx=ann_idx, pq_idx=pq_idx,
                    corpus=corpus, probes=args.probes, k=K, nprobe=NPROBE,
                ),
                str(cpus),
            ],
            check=True, capture_output=True, text=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[cpus])
    eff = results[2]["sec"] / (results[8]["sec"] * 4)
    print(json.dumps({"n_to_4n_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
