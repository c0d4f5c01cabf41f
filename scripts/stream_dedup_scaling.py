"""Fourth-workload scaling evidence: the STREAMING near-dedup loop at
N vs 4N.

``stream_near_dedup`` (streaming/dedup.py) is the micro-batch twin of
the batch dedup chain: every trigger runs intra-batch verified dedup,
probes the persisted minhash index with partition pruning, and appends
the trigger's novelties — with ``compact_every`` folding committed
index batches back into the base. The batch chain has an N→4N series
(``dedup_scaling.py``); this script produces the same evidence for the
full streaming loop, compaction cadence included: the sf0.1 documents
table is split into ``--batches`` file drops of 8 part-files each
(multi-split, so a trigger's scan is never one task), one Structured
Streaming query with ``maxFilesPerTrigger=8`` + ``availableNow``
consumes them as ~one micro-batch per drop at ``local[2]`` and
``local[8]`` in separate JVMs, and the script prints docs/sec at each
level plus the N→4N efficiency.

Measurement notes:

1. Each level gets its OWN virgin index/checkpoint/output dirs — the
   input file drops are shared and written once.
2. A streaming loop has an irreducible per-trigger serial floor the
   batch series does not: checkpoint commits, offset-log writes, the
   foreachBatch driver turnaround, and the probe's driver-side pfx
   collect all happen once per trigger regardless of cores. Efficiency
   is therefore reported alongside the per-trigger wall breakdown so
   the serial floor is visible rather than read as operator
   non-scaling; larger ``--docs-per-batch`` amortizes it exactly as
   bigger triggers do in production.

    python scripts/stream_dedup_scaling.py [--sf-dir DIR] [--batches 8]
        [--x 2] [--compact-every 4]
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
import json, shutil, sys, time
sys.path.insert(0, {repo!r})
from ebook_conversion_to_text_for_machine_learning_spark.session import build_session
from ebook_conversion_to_text_for_machine_learning_spark.streaming.dedup import (
    stream_near_dedup,
)

cpus = int(sys.argv[1])
in_glob, work_dir, schema = sys.argv[2], sys.argv[3], sys.argv[4]
n_docs = int(sys.argv[5])
shutil.rmtree(work_dir, ignore_errors=True)
spark = build_session(app_name=f"stream-dedup-scale-{{cpus}}",
                      master=f"local[{{cpus}}]",
                      shuffle_partitions=max(cpus, 32),
                      extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
q = stream_near_dedup(
    spark, in_glob, f"{{work_dir}}/out", f"{{work_dir}}/ckpt",
    f"{{work_dir}}/idx", schema=schema, max_files_per_trigger=8,
    available_now=True, compact_every={compact_every},
)
q.awaitTermination()
wall = time.time() - t0
n_out = spark.read.parquet(f"{{work_dir}}/out").count()
assert n_out == n_docs, (n_out, n_docs)
progress = [p for p in q.recentProgress if p.get("numInputRows")]
n_triggers = len(progress)
# Per-trigger wall breakdown (measurement note 2): addBatch is the
# foreachBatch body (dedup + probe + append — the parallelizable part);
# the rest (offset log, WAL/checkpoint commits, planning, trigger
# turnaround) is the serial streaming floor no core count touches.
dur = {{}}
for p in progress:
    for key, ms in (p.get("durationMs") or {{}}).items():
        dur[key] = dur.get(key, 0.0) + ms / 1000.0
breakdown = {{key: round(v / max(n_triggers, 1), 2)
              for key, v in sorted(dur.items())}}
print(json.dumps({{"cpus": cpus, "sec": round(wall, 3),
                   "docs_per_sec": round(n_docs / wall, 1),
                   "triggers": n_triggers,
                   "sec_per_trigger": round(wall / max(n_triggers, 1), 2),
                   "per_trigger_durationMs_mean_sec": breakdown}}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--x", type=int, default=4, help="near-dup variants per base doc")
    ap.add_argument(
        "--bases",
        type=int,
        default=1,
        help="UNIQUE-base replication factor: each extra copy j>0 gets a "
        "per-copy salt token inserted every 2 words, so every 3-shingle "
        "contains the salt and copies share no shingles (J=0 across "
        "copies, no cross-copy candidates). Grows trigger size at "
        "CONSTANT near-dup density — the --x axis alone also multiplies "
        "co-batch variants per base, i.e. verify pairs per doc.",
    )
    ap.add_argument("--compact-every", type=int, default=4)
    args = ap.parse_args()

    tmp = tempfile.gettempdir()
    bases_tag = f"_bs{args.bases}" if args.bases > 1 else ""
    in_root = os.path.join(
        tmp, f"stream_dedup_scaling_in_x{args.x}_b{args.batches}{bases_tag}"
    )
    meta_path = os.path.join(in_root, "_meta.json")
    if not os.path.exists(meta_path):
        prep = rf"""
import json, sys
sys.path.insert(0, {REPO!r})
from ebook_conversion_to_text_for_machine_learning_spark.session import build_session
from pyspark.sql import functions as F
spark = build_session(master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet({os.path.join(args.sf_dir, "documents.parquet")!r})
d = d.select("doc_id", "lang", "text")
parts = []
for j in range({args.bases}):
    s = d if j == 0 else d.withColumn(
        "text",
        F.regexp_replace("text", r"(\S+\s+\S+\s+)", "$1ub{{}}s ".format(j)),
    )
    for i in range({args.x}):
        parts.append(
            s.withColumn(
                "doc_id",
                (F.col("doc_id") * {args.bases} + j) * {args.x} + i,
            ).withColumn(
                "text",
                F.when(F.lit(i == 0), F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" v{{}}".format(i)))
                ),
            )
        )
big = parts[0]
for p in parts[1:]:
    big = big.union(p)
big = big.localCheckpoint()
n = big.count()
for b in range({args.batches}):
    (big.where(F.col("doc_id") % {args.batches} == b).repartition(8)
        .write.mode("overwrite").parquet({in_root!r} + f"/drop{{b:03d}}"))
schema = ", ".join(f"{{f.name}} {{f.dataType.simpleString()}}" for f in big.schema)
with open({meta_path!r}, "w") as fh:
    json.dump({{"n_docs": n, "schema": schema}}, fh)
spark.stop()
"""
        subprocess.run([sys.executable, "-c", prep], check=True)

    with open(meta_path) as fh:
        meta = json.load(fh)

    results = {}
    for cpus in (2, 8):
        work = os.path.join(tmp, f"stream_dedup_scaling_work_{cpus}")
        out = subprocess.run(
            [
                sys.executable, "-c",
                RUNNER.format(repo=REPO, compact_every=args.compact_every),
                str(cpus), f"{in_root}/drop*", work, meta["schema"],
                str(meta["n_docs"]),
            ],
            check=True, capture_output=True, text=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[cpus])
    eff = results[2]["sec"] / (results[8]["sec"] * 4)
    print(json.dumps({"n_to_4n_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
