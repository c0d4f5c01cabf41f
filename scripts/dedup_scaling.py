"""Second-workload scaling evidence: the MinHash dedup chain at N vs 4N.

Runs the full ``minhash_candidate_pairs`` → exact-Jaccard-verify chain
(the ``minhash_verified_dedup`` plan) over the sf0.1 documents table at
``local[2]`` and ``local[8]`` in separate JVMs and prints the N→4N
efficiency. Produces the numbers recorded in BENCH/BASELINE.md's
"Second workload series" table.

Two measurement preconditions this script enforces (both are artifacts
that otherwise masquerade as poor operator scaling):

1. **The input must be multi-split.** The sf0.1 ``documents.parquet``
   is a single 594 KB row group — unsplittable, so ANY scan is one task
   and nothing downstream of it can parallelize the tokenize/hash work.
   Production inputs arrive in thousands of splits; the script writes a
   64-split copy (optionally replicated ``--x N`` with remapped ids and
   perturbed text to grow the workload) and measures on that.
2. **The joins must run in the shape Catalyst picks at real scale.**
   At toy scale the verify joins broadcast, and building the broadcast
   hash relation is a SERIAL step that Amdahl-caps speedup (measured
   0.71). ``autoBroadcastJoinThreshold=-1`` forces the sort-merge join
   a real-sized gram table would get, which is the shape whose scaling
   matters (measured 0.874 vs the 0.958 busy-loop ceiling).

    python scripts/dedup_scaling.py [--sf-dir DIR] [--x 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from ebook_conversion_to_text_for_machine_learning_spark.session import build_session
from ebook_conversion_to_text_for_machine_learning_spark.operators import dedup as D
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
corpus = sys.argv[2]
spark = build_session(app_name=f"dedup-scale-{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=max(cpus, 32),
                      extra_conf={{"spark.ui.showConsoleProgress": "false",
                                   "spark.sql.autoBroadcastJoinThreshold": "-1"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(corpus)

def run():
    cands = D.minhash_candidate_pairs(docs)
    grams = docs.select("doc_id", D.shingles_col(F.col("text")).alias("grams"))
    ga = grams.select(F.col("doc_id").alias("doc_a"),
                      F.col("grams").alias("grams_a"), F.size("grams").alias("na"))
    gb = grams.select(F.col("doc_id").alias("doc_b"),
                      F.col("grams").alias("grams_b"), F.size("grams").alias("nb"))
    n_common = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b"))).cast("long")
    n_union = (F.col("na") + F.col("nb")).cast("long") - n_common
    (cands.join(ga, "doc_a").join(gb, "doc_b")
          .select("doc_a", "doc_b", n_common.alias("n_common"), n_union.alias("n_union"))
          .where(F.lit(2) * F.col("n_common") >= F.col("n_union"))
          .write.mode("overwrite").format("noop").save())

run()  # warm-up: worker pool + codegen on every core, untimed
best = None
for _ in range(2):  # best-of-2: this VM shows multi-second steal spikes
    t = time.time(); run(); el = time.time() - t
    best = el if best is None or el < best else best
print(json.dumps({{"cpus": cpus, "sec": round(best, 3)}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--x", type=int, default=4, help="corpus replication factor")
    args = ap.parse_args()

    corpus = os.path.join(tempfile.gettempdir(), f"dedup_scaling_corpus_x{args.x}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        prep = rf"""
import sys
sys.path.insert(0, {REPO!r})
from ebook_conversion_to_text_for_machine_learning_spark.session import build_session
from pyspark.sql import functions as F
spark = build_session(master="local[8]", shuffle_partitions=16)
d = spark.read.parquet({os.path.join(args.sf_dir, "documents.parquet")!r})
parts = [d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
          .withColumn("text", F.concat(F.col("text"), F.lit(f" variant{{i}}")))
         for i in range({args.x})]
big = parts[0]
for p in parts[1:]:
    big = big.union(p)
big.repartition(64).write.mode("overwrite").parquet({corpus!r})
spark.stop()
"""
        subprocess.run([sys.executable, "-c", prep], check=True)

    results = {}
    for cpus in (2, 8):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER.format(repo=REPO), str(cpus), corpus],
            check=True, capture_output=True, text=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[cpus])
    eff = results[2]["sec"] / (results[8]["sec"] * 4)
    print(json.dumps({"n_to_4n_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
