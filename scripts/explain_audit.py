"""Dump the formatted physical plans of the headline operators to
BENCH/PLANS.md — the human-readable companion to tests/test_plans.py
(which pins the same properties mechanically).

    python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue().strip()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from ebook_conversion_to_text_for_machine_learning_spark.operators import (
        media as M,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.operators import (
        similarity as S,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
        extract_spans,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.session import (
        build_session,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.sources.tables import (
        documents_as_txt_spans,
    )

    spark = build_session(app_name="explain-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    sections = []

    def add(title: str, df, note: str) -> None:
        sections.append((title, note, plan_of(df)))

    add(
        "Extraction (MapInArrow, one Python crossing)",
        extract_spans(documents_as_txt_spans(spark, sf_dir)),
        "The scan feeds MapInArrow directly — no shuffle before the fold, "
        "no row-wise Python anywhere.",
    )
    add(
        "Filter pushdown + column pruning (embeddings probe)",
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") < 10)
        .select("vec_id"),
        "PushedFilters reaches the parquet scan; ReadSchema omits the "
        "64-float embedding column.",
    )
    add(
        "Broadcast dimension join (nation_revenue)",
        queries["nation_revenue"](spark, sf_dir),
        "Both dimension joins are BroadcastHashJoin — the orders fact table "
        "is never shuffled for the join.",
    )
    add(
        "MinHash LSH candidate join",
        queries["minhash_candidates"](spark, sf_dir),
        "The self-join keys on (band_id, bucket) — narrow md5 strings, "
        "never raw text; partial min-aggregates run map-side.",
    )
    add(
        "IVF cell assignment (no shuffle)",
        S.ivf_assign(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            S.ivf_centroids(
                spark.read.parquet(f"{sf_dir}/embeddings.parquet"), target_cells=10
            ),
        ),
        "The codebook is inlined as literal expressions (constant-size in "
        "corpus length): assignment is a pure projection with zero "
        "Exchange nodes.",
    )
    add(
        "SimHash signatures (explode → 64-way partial sum)",
        queries["simhash_signatures"](spark, sf_dir),
        "The md5 is unpacked once per token into four longs; every bit "
        "aggregate is SUM((word >> shift) & 1) with map-side partial "
        "aggregation, so the shuffle carries 65 longs per document.",
    )
    add(
        "SimHash near-pairs (pigeonhole block join)",
        queries["simhash_near_pairs"](spark, sf_dir),
        "Candidates join on (block_id, block_val) — small ints sliced from "
        "the 64-bit signature — then bit_count(xor) verifies the exact "
        "Hamming distance on candidates only.",
    )
    add(
        "Embedding near-dup (Arrow banded LSH → verify)",
        queries["embedding_near_dup"](spark, sf_dir),
        "Bucket bits come from one numpy matmul per Arrow batch "
        "(MapInPandas); the candidate self-join keys on (band_id, bucket) "
        "narrow strings and exact cosine runs only on distinct candidates.",
    )
    add(
        "Decontamination (broadcast eval array, shuffle-free corpus map)",
        queries["decontaminate"](spark, sf_dir),
        "Eval shingles aggregate to one array row and broadcast; the "
        "corpus side is a pure map with array_intersect in codegen — no "
        "hash partitioning of the corpus anywhere.",
    )
    add(
        "Line-level dedup (partial-aggregate keeper + reassembly)",
        queries["line_dedup"](spark, sf_dir),
        "The keeper decision is a map-side-combinable min(struct(doc_id, "
        "line_idx)) aggregate keyed on md5(line) — immune to blank-line "
        "skew (a window would funnel every corpus-wide occurrence through "
        "one reducer); a join-back flags occurrences and groupBy(doc_id) "
        "rebuilds each document from its surviving lines.",
    )
    add(
        "Repeated passages (token-window explode → one aggregate)",
        queries["repeated_passages"](spark, sf_dir),
        "Token-aligned width-8 windows hash to narrow (doc_id, md5) rows "
        "in the Generate; ONE two-phase distinct-aggregate (partial "
        "map-side sets) groups them corpus-wide — no joins, no windows.",
    )
    add(
        "Quality filter funnel (one scan, one single-row exchange)",
        queries["quality_filter_funnel"](spark, sf_dir),
        "Cumulative-survival booleans evaluate per row in a partial "
        "HashAggregate; the Exchange moves ONE row of five counters; the "
        "per-stage table explodes from that row at constant cost.",
    )
    add(
        "PQ ADC top-k (Arrow LUT-gather full scan)",
        queries["pq_ann_topk"](spark, sf_dir),
        "MapInPandas encodes each Arrow batch against the broadcast-size "
        "codebook; a second MapInPandas scores each accumulated ~64k-row "
        "batch of codes against the full probe LUT with one numpy gather "
        "and keeps a batch-local top-k, so no explode, no broadcast-hash "
        "join, and only top-k-per-batch rows reach the final "
        "WindowGroupLimit exchange. The join formulation survives as the "
        "oracle twin (scan_path=\"join\"); path agreement is pinned by "
        "tests/test_operators.py. Raw embeddings never enter the scan "
        "when a persisted codes table is passed "
        "(tests/test_plans.py::test_pq_adc_scan_reads_codes_not_vectors).",
    )
    add(
        "Event funnel (chained strictly-after min-aggregates)",
        queries["event_funnel"](spark, sf_dir),
        "Each step is a narrow (user_id, min-ts) partial aggregate joined "
        "to the next step's filtered scan — no per-user event arrays, no "
        "windows; the per-step counters collapse to one row and explode.",
    )
    add(
        "Training mix (two text-carrying shuffles end-to-end)",
        queries["training_mix"](spark, sf_dir),
        "Arrow extraction, per-row quality filter, ONE dedup aggregate "
        "shuffle, post-dedup repetition-flag aggregates on narrow gram "
        "rows (AQE reuses the dedup exchange), broadcast decontamination, "
        "ONE packing-window shuffle sharded on md5-bucket % n_shards.",
    )
    add(
        "Incremental near-dup probe (partition-pruned index scans)",
        queries["dedup_against_index"](spark, sf_dir),
        "Both corpus-scale index tables carry a pfx PartitionFilter from "
        "the batch's realized prefix sets (bounded int collects), so the "
        "probe reads a handful of files; the candidate prefilter stays a "
        "broadcast LeftSemi and index totals come from counts/ — the "
        "batch, never the corpus, pays the query. The verify collects "
        "each side's gram hashes once per doc and array_intersects on "
        "the candidate row (no pair x gram explosion; 82.3s -> 59.7s at "
        "76k keepers vs a 76k-doc index, identical output).",
    )
    add(
        "n-gram Jaccard (exact size-bucket composite blocking)",
        queries["ngram_jaccard"](spark, sf_dir),
        "The pair join keys on (lang, size-bucket) with home/guest roles "
        "rejecting guest x guest — provably identical output to whole-"
        "language blocking with groups bounded by the size histogram; the "
        "Jaccard acceptance predicate sits LAST in the join conjunction "
        "so the O(n) array_intersect runs only after the integer guards.",
    )
    add(
        "IVFADC (inverted-list Arrow ADC scan, no candidate join)",
        queries["ivfpq_topk"](spark, sf_dir),
        "Each code row ships ONCE with its cell_id into MapInPandas; the "
        "kernel expands it against that cell's probes in numpy (LUT "
        "gather + two-level top-R prune), so the (probe x candidate) "
        "pairing never exists as Spark rows — no JVM candidate join, no "
        "xm posexplode, no broadcast hash relation, ~100x less Arrow "
        "traffic; the shortlist re-ranks with exact cosine through one "
        "broadcast join (single ADC subtree, no checkpoint barrier).",
    )
    add(
        "BPE encode (fold of literal replaces, pure map)",
        queries["bpe_encode"](spark, sf_dir),
        "48 literal JVM replace() calls inside whole-stage codegen over "
        "the delimited symbol representation — zero Exchange nodes, zero "
        "Python; the oracle runs the identical replace chain.",
    )
    add(
        "Frame sampling (JVM-side bounded explode)",
        M.sample_frames(
            M.attach_payloads(
                spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "text", "image"
            )
        ),
        "Generate + binary substring/md5 inside codegen; no Python, no "
        "shuffle, explode factor capped at MAX_FRAMES.",
    )

    out = ["# Physical plans of the headline operators", "",
           f"Generated by `python scripts/explain_audit.py {sf_dir}`; the same",
           "properties are asserted mechanically in `tests/test_plans.py`.", ""]
    for title, note, plan in sections:
        out += [f"## {title}", "", note, "", "```", plan, "```", ""]
    path = os.path.join(REPO, "BENCH", "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
