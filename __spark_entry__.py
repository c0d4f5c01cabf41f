"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the flagship smoke query; each ``queries()[name]``
runs at sf=0.01 against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Parity rules used throughout (so Spark and DuckDB agree bit-for-bit):
- all hashing is md5 hex (identical in both engines);
- float outputs are rounded (4 dp for unit-scale values, 1 dp for large
  aggregate sums) or replaced by exact integer arithmetic;
- counts/sizes are cast to BIGINT on both sides;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.core.chapter import (
    BOILERPLATE_PREFIXES,
    DEFAULT_AUTHOR,
    DEFAULT_TITLE,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators import (
    dedup as D,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators import (
    media as M,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators import (
    similarity as S,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators import (
    text_stats as T,
)
from ebook_conversion_to_text_for_machine_learning_spark.operators.extract import (
    INPUT_SCHEMA,
    extract_spans,
)
from ebook_conversion_to_text_for_machine_learning_spark.sources.tables import (
    documents_as_txt_spans,
    read_table,
)
from ebook_conversion_to_text_for_machine_learning_spark.testing import fixtures as fx

EMBED_DIM = 64

#: Hamming radius for the simhash near-pair driver query. 64-bit signatures
#: make radius 2 nearly empty on the synthetic corpus, so the driver query
#: widens the radius to keep the oracle non-vacuous (≈15k pairs at sf0.01);
#: production dedup runs the same plan at max_hamming 2-3, whose 21-bit
#: blocks are far more selective than the 10-bit blocks radius 5 induces.
_SIMHASH_MAX_HAMMING = 5

# ---------------------------------------------------------------------------
# Shared expression builders (Spark side)
# ---------------------------------------------------------------------------

_SMART_FROM = "‘’“”–—•"
_SMART_TO = "''\"\"--*"


def _desmarten(col):
    return F.replace(F.translate(col, _SMART_FROM, _SMART_TO), F.lit("…"), F.lit("..."))


def _pystrip(col):
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def _collapse(col):
    return F.regexp_replace(_pystrip(col), r"(\s)+", "$1")


def _scratch_index_path(prefix: str, sf_dir: str) -> str:
    """Deterministic per-(kind, sf_dir) scratch dir for persisted-index
    queries: the writers are overwrite-idempotent, so repeated
    harness/bench runs reuse one dir instead of leaking a mkdtemp per
    invocation. Shared by the ANN and minhash index queries."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")


def _golden_docs_df(spark: SparkSession) -> DataFrame:
    rows = [
        (
            d["doc_id"],
            d["fmt"],
            d["title"],
            d["author"],
            [
                {"kind": k, "text": t, "media_ref": r, "offset": o}
                for k, t, r, o in d["spans"]
            ],
        )
        for d, _ in fx.GOLDEN_DOCS
    ]
    return spark.createDataFrame(rows, schema=INPUT_SCHEMA)


# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB side)
# ---------------------------------------------------------------------------

_SQL_DESMARTEN = (
    "replace(translate({col}, '‘’“”–—•', '''''\"\"--*'), '…', '...')"
)
_SQL_PYSTRIP = r"regexp_replace({col}, '^\s+|\s+$', '', 'g')"
_SQL_COLLAPSE = (
    r"regexp_replace(" + _SQL_PYSTRIP + r", '(\s)+', '\1', 'g')"
)
_SQL_TOKENS = "list_filter(string_split_regex({col}, ' +'), x -> x != '')"

_BOILER_PATTERN = "^(?:%s)" % "|".join(
    sorted(BOILERPLATE_PREFIXES | {DEFAULT_TITLE, DEFAULT_AUTHOR})
)

_STOPWORD_SQL_LIST = "[%s]" % ", ".join(f"'{w}'" for w in T.STOPWORDS)

#: Deterministic PII decoration for the scrub_pii driver query (the
#: synthetic corpus itself contains no PII-shaped strings).
_PII_SUFFIX = (
    " visit https://example.com/a?user=1 mail bob.smith@ex-corp.io "
    "or call +1 (555) 123-4567 now"
)


def _sql_quote(text: str) -> str:
    return "'" + text.replace("'", "''") + "'"


def _golden_values_sql() -> str:
    rows = []
    for doc, expected in fx.GOLDEN_DOCS:
        for kind, text, ref, order in expected:
            rows.append(
                f"({_sql_quote(doc['doc_id'])}, {_sql_quote(kind)}, "
                f"{_sql_quote(text)}, {_sql_quote(ref)}, {order})"
            )
    if not rows:
        rows.append("('x','x','x','x',0) WHERE 1=0")
    return (
        "SELECT * FROM (VALUES %s) AS t(doc_id, kind, text, media_ref, span_order)"
        % ", ".join(rows)
    )


def _pdf_file_corpus() -> list:
    """Deterministic in-memory corpus of REAL PDF files (no external data):
    five well-formed FlateDecode documents (one carrying an image XObject)
    plus one corrupt file for the quarantine path."""
    from ebook_conversion_to_text_for_machine_learning_spark.testing.pdf_fixture import (
        build_pdf,
    )

    corpus = []
    for i in range(5):
        pages = [
            [f"{fx.TITLE} "],
            [f"Chapter {1 + (i % 2)} ", f"Body paragraph number {i}. "],
            [f"Closing line {i} ", " "],
        ]
        if i == 3:  # one doc exercises the image→media_ref path
            pages[1] = [("img",)] + pages[1]
        data, _ids = build_pdf(pages, compress=True)
        corpus.append((f"mem://book_{i}.pdf", data))
    corpus.append(("mem://broken.pdf", b"%PDF-1.4 truncated garbage, no objects"))
    # Legacy RC4 encryption: the empty-user-password file extracts the
    # same spans as its plaintext twin; the password-protected one
    # quarantines (status='error').
    enc_pages = [["Encrypted title "], ["Chapter 1 ", "Secret body text. "]]
    corpus.append(
        ("mem://owner_locked.pdf", build_pdf(enc_pages, encrypt="rc4-128")[0])
    )
    corpus.append(
        ("mem://password.pdf", build_pdf(enc_pages, encrypt="rc4-locked")[0])
    )
    corpus.append(
        ("mem://aes_book.pdf", build_pdf(enc_pages, encrypt="aes-128")[0])
    )
    return corpus


def _ebook_file_corpus() -> list:
    """Deterministic in-memory EPUB/DOCX/TXT corpus (plus one corrupt zip)
    for the binary-ingest driver query — the zip-format sibling of
    ``_pdf_file_corpus``."""
    from ebook_conversion_to_text_for_machine_learning_spark.testing.ebook_fixture import (
        build_docx,
        build_epub,
    )

    corpus = []
    for i in range(3):
        sections = [
            ("Text/s1.xhtml", f"<p>Book number {i}</p>"),
            (
                "Text/s2.xhtml",
                f"<p>Chapter One</p><p>Epub body paragraph {i}.</p>"
                + ('<img src="cover.jpg"/>' if i == 2 else ""),
            ),
            ("Text/s3.xhtml", f"<p>Chapter 2</p><p>Second chapter text {i}.</p>"),
        ]
        corpus.append((f"mem://book_{i}.epub", build_epub(sections)))
    for i in range(3):
        paragraphs = [
            (f"Doc title {i}", False, None),
            ("Chapter 1", True, None),
            (f"Docx body paragraph {i}.", False, None),
            ("Chapter 2", True, "rId7" if i == 1 else None),
            (f"Closing paragraph {i}.", False, None),
        ]
        corpus.append((f"mem://doc_{i}.docx", build_docx(paragraphs)))
    corpus.append(
        (
            "mem://plain.txt",
            "A Plain Title\n\nChapter 1\nTxt body line.\n2\nThe end.".encode("utf-8"),
        )
    )
    corpus.append(("mem://broken.epub", b"PK\x03\x04 truncated central directory"))
    return corpus


def _file_corpus_values_sql(corpus) -> str:
    """Expected per-document extraction for an in-memory file corpus,
    computed by the pure-Python twin of the distributed path: the SAME
    stdlib parsers (``bytes_to_spans``) and the SAME pure-core fold
    (``extract_document``), no Spark, no Arrow — so the oracle checks the
    binary-batch plumbing end-to-end over real files. Shared by the PDF
    and EPUB/DOCX/TXT ingest oracles; the select-list is the single
    source of truth for the binary-ingest contract."""
    from ebook_conversion_to_text_for_machine_learning_spark.core.extract import (
        extract_document,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.sources.file_ingest import (
        bytes_to_spans,
    )

    rows = []
    for name, data in corpus:
        try:
            fmt, spans = bytes_to_spans(name, data)
        except Exception:
            fmt, spans = "error", []
        out, status = extract_document(fmt, [(k, t, r) for k, t, r, _o in spans], None, None)
        n_media = sum(1 for k, _t, _r, _o in out if k == "media_ref")
        text = "".join(t for _k, t, _r, _o in out)
        rows.append(
            f"({_sql_quote(name)}, {_sql_quote(fmt)}, {_sql_quote(status)}, "
            f"{len(out)}, {n_media}, {_sql_quote(text)})"
        )
    return (
        "SELECT doc_id, fmt, status, CAST(n_spans AS BIGINT) AS n_spans, "
        "CAST(n_media AS BIGINT) AS n_media, extracted_text "
        f"FROM (VALUES {', '.join(rows)}) AS t(doc_id, fmt, status, n_spans, n_media, extracted_text)"
    )


def _ebook_files_values_sql() -> str:
    return _file_corpus_values_sql(_ebook_file_corpus())


def _pdf_files_values_sql() -> str:
    return _file_corpus_values_sql(_pdf_file_corpus())


def _random_corpus_values_sql() -> str:
    """Expected (fmt, status) aggregate for the seed-42 random corpus.

    Computed by running the SAME pure-core fold (`core.extract
    .extract_document`, no Spark, no Arrow) over the corpus the Spark query
    processes — the oracle verifies the distributed wrapper (span ordering,
    Arrow marshalling, n_spans/n_media accounting) against the sequential
    reference implementation, the strongest check available for a fuzz
    corpus with no literal golden.
    """
    from ebook_conversion_to_text_for_machine_learning_spark.core.extract import (
        extract_document,
    )

    agg: dict[tuple[str, str], list[int]] = {}
    for d in fx.random_corpus(300, seed=42):
        ordered = sorted(d["spans"], key=lambda s: s[3])
        rows = [(k, t, r) for k, t, r, _ in ordered]
        out, status = extract_document(d["fmt"], rows, d["title"], d["author"])
        n_media = sum(1 for k, _t, _r, _o in out if k == "media_ref")
        ent = agg.setdefault((d["fmt"], status), [0, 0, 0])
        ent[0] += 1
        ent[1] += len(out)
        ent[2] += n_media
    values = ", ".join(
        f"({_sql_quote(fmt)}, {_sql_quote(status)}, {n}, {spans}, {media})"
        for (fmt, status), (n, spans, media) in sorted(agg.items())
    )
    return (
        "SELECT fmt, status, CAST(n_docs AS BIGINT) AS n_docs, "
        "CAST(total_spans AS BIGINT) AS total_spans, "
        "CAST(total_media AS BIGINT) AS total_media "
        f"FROM (VALUES {values}) AS t(fmt, status, n_docs, total_spans, total_media)"
    )


def _sql_minhash_sig_cte() -> str:
    # Slot i = min over shingles of substr(md5(g || ':' || i//4), (i%4)*8+1, 8)
    # — mirrors D.minhash_signatures' digest-slicing hash family exactly.
    toks = _SQL_TOKENS.format(col="text")
    return f"""
t AS (SELECT doc_id, {toks} AS toks FROM documents),
grams_t AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' ')))
    ELSE [] END AS grams
  FROM t),
sig AS (SELECT doc_id, {", ".join(
        "list_aggregate(list_transform(grams, g -> substr(md5(g || ':%d'), %d, 8)), 'min') AS sig_%d"
        % (i // 4, (i % 4) * 8 + 1, i)
        for i in range(D.MINHASH_K)
    )} FROM grams_t)"""


def _sql_plane_literal(plane) -> str:
    return "[" + ", ".join(f"{float(w):.1f}" for w in plane) + "]::DOUBLE[]"


def _sql_lsh_bucket(vec_expr: str) -> str:
    planes = S.hyperplanes(EMBED_DIM)
    bits = [
        f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], {_sql_plane_literal(p)}) > 0 "
        "THEN '1' ELSE '0' END)"
        for p in planes
    ]
    return " || ".join(bits)


#: Banded-LSH shape for the embedding_near_dup driver query: production
#: defaults are S.N_BANDS × S.BAND_PLANES (4×16); the query narrows bands to
#: 8 planes so the 500-vector synthetic corpus still produces candidates.
_ND_BANDS = 4
_ND_BAND_PLANES = 8

#: IVF codebook size for the driver queries: production default is
#: S.IVF_TARGET_CELLS (65536); the 500-vector synthetic corpus uses 10 so
#: cells hold ~50 vectors each. The oracle derives the identical stride
#: from count(*), mirroring ivf_centroids' constant-size-codebook rule.
_IVF_TEST_CELLS = 10

#: PQ codebook size for the driver queries: production default is
#: S.PQ_TARGET_CODES (256 codes = byte-packed); the 500-vector synthetic
#: corpus samples ~16 so every code captures ~30 vectors. The oracle
#: derives the identical stride from count(*).
_PQ_TEST_CODES = 16


def _sql_pq_ctes() -> str:
    """Shared PQ oracle prefix: stride-sampled codebook (code = dense rank
    of the sampled vec_id, sliced into 8 subvectors of 8 dims), then the
    exact-integer quantized distance Σ_i floor((x_i−c_i)²·10⁴+0.5) from
    every vector to every (subspace, code) — mirrors S.pq_codebooks /
    S._pq_qdist. ``d`` holds all distances; ``codes`` the argmin
    (min-code tie-break) per (vec, subspace)."""
    return f"""
cb0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, embedding::DOUBLE[] AS cvec
  FROM embeddings
  WHERE vec_id % (SELECT greatest(1, count(*) // {_PQ_TEST_CODES}) FROM embeddings) = 0),
cb AS (
  SELECT s, code, cvec[s*8+1 : s*8+8] AS sub
  FROM cb0 CROSS JOIN (SELECT unnest(range(0, 8)) AS s)),
v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
d AS (
  SELECT v.vec_id, cb.s, cb.code,
    list_sum(list_transform(range(1, 9), i ->
      CAST(floor((e[cb.s*8 + i] - sub[i]) * (e[cb.s*8 + i] - sub[i]) * 10000.0 + 0.5) AS BIGINT))) AS q
  FROM v CROSS JOIN cb),
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT vec_id, s, code, row_number() OVER (PARTITION BY vec_id, s ORDER BY q, code) AS r
    FROM d) WHERE r = 1)"""


def _sql_banded_bucket_selects(vec_table: str) -> str:
    """UNION ALL of one (vec_id, band_id, bucket) select per LSH band,
    mirroring S.lsh_banded_signatures' shared-plane-sequence slicing."""
    planes = S.hyperplanes(EMBED_DIM, _ND_BANDS * _ND_BAND_PLANES)
    selects = []
    for b in range(_ND_BANDS):
        bits = [
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_sql_plane_literal(p)}) > 0 "
            "THEN '1' ELSE '0' END)"
            for p in planes[b * _ND_BAND_PLANES : (b + 1) * _ND_BAND_PLANES]
        ]
        selects.append(
            f"SELECT vec_id, {b} AS band_id, {' || '.join(bits)} AS bucket FROM {vec_table}"
        )
    return " UNION ALL ".join(selects)


_SQL_COSINE = (
    "round(list_dot_product({p}::DOUBLE[], {c}::DOUBLE[]) / "
    "(sqrt(list_dot_product({p}::DOUBLE[], {p}::DOUBLE[])) * "
    "sqrt(list_dot_product({c}::DOUBLE[], {c}::DOUBLE[]))), 4)"
)


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over sf0.001 documents as txt spans."""
    extracted = extract_spans(documents_as_txt_spans(spark, "/root/testdata/sf0.001"))
    return extracted.select(
        "doc_id",
        "status",
        F.size("spans").cast("long").alias("n_spans"),
        F.array_join(F.transform("spans", lambda s: s["text"]), "").alias("extracted_text"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- extraction semantics -------------------------------------------
    def extract_goldens(spark, sf_dir):
        out = extract_spans(_golden_docs_df(spark))
        span = F.explode("spans").alias("s")
        return out.select("doc_id", span).select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.order").cast("int").alias("span_order"),
        )

    q["extract_goldens"] = extract_goldens

    def extract_documents_txt(spark, sf_dir):
        out = extract_spans(documents_as_txt_spans(spark, sf_dir))
        return out.select(
            "doc_id",
            F.array_join(F.transform("spans", lambda s: s["text"]), "").alias("extracted_text"),
            F.size("spans").cast("long").alias("n_spans"),
        )

    q["extract_documents_txt"] = extract_documents_txt

    def extract_random_corpus(spark, sf_dir):
        docs = fx.random_corpus(300, seed=42)
        rows = [
            (
                d["doc_id"], d["fmt"], d["title"], d["author"],
                [
                    {"kind": k, "text": t, "media_ref": r, "offset": o}
                    for k, t, r, o in d["spans"]
                ],
            )
            for d in docs
        ]
        df = spark.createDataFrame(rows, schema=INPUT_SCHEMA)
        return (
            extract_spans(df)
            .groupBy("fmt", "status")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_spans").alias("total_spans"),
                F.sum("n_media").alias("total_media"),
            )
        )

    q["extract_random_corpus"] = extract_random_corpus

    def _extract_file_corpus(spark, corpus):
        """Shared binary-ingest query body: real file bytes → stdlib parse
        (Arrow-batched) → extraction, projected to the ingest contract."""
        from ebook_conversion_to_text_for_machine_learning_spark.sources.file_ingest import (
            spans_from_binary_df,
        )

        bin_df = spark.createDataFrame(
            [(name, data) for name, data in corpus], "path string, content binary"
        )
        extracted = extract_spans(spans_from_binary_df(bin_df))
        return extracted.select(
            "doc_id",
            "fmt",
            "status",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("n_media").cast("long").alias("n_media"),
            F.array_join(F.transform("spans", lambda s: s["text"]), "").alias("extracted_text"),
        )

    def extract_pdf_files(spark, sf_dir):
        """Real .pdf bytes → stdlib parse (Arrow-batched) → extraction."""
        return _extract_file_corpus(spark, _pdf_file_corpus())

    q["extract_pdf_files"] = extract_pdf_files

    def extract_ebook_files(spark, sf_dir):
        """Real EPUB/DOCX/TXT bytes → stdlib zip/XML parse → extraction."""
        return _extract_file_corpus(spark, _ebook_file_corpus())

    q["extract_ebook_files"] = extract_ebook_files

    def training_data_prep(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.plans.training_prep import (
            prepare_training_data,
        )

        return prepare_training_data(documents_as_txt_spans(spark, sf_dir))

    q["training_data_prep"] = training_data_prep

    def training_sequences(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.plans.training_prep import (
            prepare_training_sequences,
        )

        return prepare_training_sequences(
            documents_as_txt_spans(spark, sf_dir), chunk_tokens=32, overlap=8
        )

    q["training_sequences"] = training_sequences

    def training_mix(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.plans.training_prep import (
            prepare_training_mix,
        )

        eval_df = (
            read_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 97 == 0)
            .select("text")
        )
        return prepare_training_mix(
            documents_as_txt_spans(spark, sf_dir),
            eval_df=eval_df,
            chunk_tokens=32,
            overlap=8,
            budget=64,
            n_shards=8,
        )

    q["training_mix"] = training_mix

    # --- scalar text ops (P1-P7) ----------------------------------------
    def fold_smart_punct(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        decorated = F.concat(F.col("text"), F.lit(" — “q”… ‘x’ •"))
        return docs.select("doc_id", _desmarten(decorated).alias("folded_text"))

    q["fold_smart_punct"] = fold_smart_punct

    def clean_text_block(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        decorated = F.concat(F.lit("***\n***\n  "), F.col("text"), F.lit("  \n\n"))
        collapsed = _collapse(decorated)
        deduped = F.regexp_replace(collapsed, r"(?:\*\*\*\n)+", "***\n")
        cleaned = F.regexp_replace(deduped, r"^\*\*\*\n", "")
        return docs.select("doc_id", cleaned.alias("cleaned_text"))

    q["clean_text_block"] = clean_text_block

    def pdf_squeeze(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        decorated = F.concat(F.lit("a\n\n\nb   c  "), F.col("text"))
        squeezed = F.regexp_replace(F.regexp_replace(decorated, r"\n+", "\n"), " {2,}", " ")
        return docs.select("doc_id", squeezed.alias("squeezed_text"))

    q["pdf_squeeze"] = pdf_squeeze

    def sentence_end_flag(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        stripped = F.regexp_replace(F.col("text"), r"\s+$", "")
        flag = stripped.rlike('[.!?]"?$')
        return docs.select("doc_id", flag.cast("int").alias("ends_sentence"))

    q["sentence_end_flag"] = sentence_end_flag

    def classify_headings(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        trimmed = F.lower(_pystrip(F.col("text")))
        return docs.select(
            "doc_id",
            trimmed.startswith("chapter").cast("int").alias("is_chapter_prefix"),
            F.lower(F.col("text")).rlike(_BOILER_PATTERN).cast("int").alias("is_boilerplate"),
        )

    q["classify_headings"] = classify_headings

    # --- text analysis ----------------------------------------------------
    def token_stats(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        out = T.token_stats(docs)
        return out.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
            F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        )

    q["token_stats"] = token_stats

    def quality_scores(spark, sf_dir):
        return T.quality_scores(read_table(spark, sf_dir, "documents"))

    q["quality_scores"] = quality_scores

    def language_id(spark, sf_dir):
        out = T.language_id(read_table(spark, sf_dir, "documents"))
        casts = [F.col(f"score_{lang}").cast("long").alias(f"score_{lang}") for lang in T.LANG_MARKERS]
        return out.select("doc_id", "actual_lang", "predicted_lang", *casts)

    q["language_id"] = language_id

    def fingerprints(spark, sf_dir):
        return T.fingerprints(read_table(spark, sf_dir, "documents"))

    q["fingerprints"] = fingerprints

    def bpe_pair_counts(spark, sf_dir):
        return T.bpe_pair_counts(read_table(spark, sf_dir, "documents"), min_count=2)

    q["bpe_pair_counts"] = bpe_pair_counts

    def bpe_encode(spark, sf_dir):
        # Encode against the frozen DEFAULT_BPE_MERGES vocab artifact
        # (trained offline by bpe.train_bpe_merges on sf0.01) — the
        # oracle applies the IDENTICAL replace() chain generated from
        # the same constant.
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            bpe as B,
        )

        return B.bpe_encode(
            read_table(spark, sf_dir, "documents"), B.DEFAULT_BPE_MERGES
        )

    q["bpe_encode"] = bpe_encode

    def bpe_token_stats(spark, sf_dir):
        # chunk_documents with real-tokenizer accounting: every chunk
        # carries both the whitespace proxy count and its BPE token
        # count under the frozen vocab (what pack_sequences budgets on
        # via count_col="n_bpe_chunk_tokens").
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            bpe as B,
            curation as C2,
        )

        ch = C2.chunk_documents(
            read_table(spark, sf_dir, "documents"),
            chunk_tokens=32,
            overlap=4,
            bpe_merges=B.DEFAULT_BPE_MERGES,
        )
        return ch.select(
            "doc_id", "chunk_idx", "n_chunk_tokens", "n_bpe_chunk_tokens"
        )

    q["bpe_token_stats"] = bpe_token_stats

    def tfidf_top_terms(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        return T.tfidf_top_terms(docs, k=5)

    q["tfidf_top_terms"] = tfidf_top_terms

    def document_features(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators.features import (
            document_features as _feat,
        )

        return _feat(read_table(spark, sf_dir, "documents"))

    q["document_features"] = document_features

    # --- curation ----------------------------------------------------------
    def scrub_pii(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        decorated = docs.withColumn("text", F.concat(F.col("text"), F.lit(_PII_SUFFIX)))
        return C.scrub_pii(decorated)

    q["scrub_pii"] = scrub_pii

    def chunk_documents(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        return C.chunk_documents(docs, chunk_tokens=32, overlap=8)

    q["chunk_documents"] = chunk_documents

    def split_assign(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        return C.split_assign(read_table(spark, sf_dir, "documents"))

    q["split_assign"] = split_assign

    def stratified_sample(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        out = C.stratified_sample(
            docs, {"en": 0.5, "es": 0.25}, group_col="lang", default_rate=0.125
        )
        return out.select("doc_id", "lang", "sample_bucket")

    q["stratified_sample"] = stratified_sample

    def pack_sequences(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents").withColumn(
            "split", C.split_col(F.col("doc_id"))
        )
        chunks = C.chunk_documents(
            docs, chunk_tokens=32, overlap=8, carry_cols=("split",)
        )
        return C.pack_sequences(chunks, budget=64, n_shards=8)

    q["pack_sequences"] = pack_sequences

    def repetition_signals(spark, sf_dir):
        return T.repetition_signals(read_table(spark, sf_dir, "documents"))

    q["repetition_signals"] = repetition_signals

    def line_repetition(spark, sf_dir):
        # same decorated 2-line corpus as line_dedup (the synthetic
        # documents are single-line)
        docs = read_table(spark, sf_dir, "documents")
        shared = docs.where(F.col("doc_id") < 50).select(
            F.col("doc_id").alias("k"), F.col("text").alias("extra")
        )
        decorated = docs.join(
            F.broadcast(shared), (F.col("doc_id") % 50) == F.col("k")
        ).select("doc_id", F.concat_ws("\n", "text", "extra").alias("text"))
        return T.line_repetition_signals(decorated)

    q["line_repetition"] = line_repetition

    def corpus_stats(spark, sf_dir):
        return T.corpus_stats(read_table(spark, sf_dir, "documents"))

    q["corpus_stats"] = corpus_stats

    def source_mix_stats(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        return C.source_mix_stats(docs)

    q["source_mix_stats"] = source_mix_stats

    def temperature_mix(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        return C.temperature_mix_plan(docs, token_budget=100_000, temperature=0.5)

    q["temperature_mix"] = temperature_mix

    def domain_affinity(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        target = docs.where(F.col("source") == "src0")
        return C.domain_affinity(docs, target, n=2)

    q["domain_affinity"] = domain_affinity

    def quality_filter_funnel(spark, sf_dir):
        from ebook_conversion_to_text_for_machine_learning_spark.operators import (
            curation as C,
        )

        docs = read_table(spark, sf_dir, "documents")
        toks = T.tokens_col(F.col("text"))
        n = F.size(toks)
        distinct_x10k = F.floor(
            F.size(F.array_distinct(toks)).cast("double")
            / n.cast("double")
            * 10000.0
            + 0.5
        )
        return C.filter_funnel(
            docs,
            [
                ("lang_en", F.col("lang") == "en"),
                ("min_tokens", n >= 40),
                ("quality", (n > 0) & (T.quality_score_x10k_col(F.col("text")) >= 5500)),
                ("lexical_diversity", distinct_x10k >= 5000),
            ],
        )

    q["quality_filter_funnel"] = quality_filter_funnel

    # --- dedup -------------------------------------------------------------
    def exact_dedup(spark, sf_dir):
        return D.exact_dedup(read_table(spark, sf_dir, "documents"))

    q["exact_dedup"] = exact_dedup

    def line_dedup(spark, sf_dir):
        # The synthetic corpus is single-line; decorate every document with
        # a second line borrowed from one of the first 50 documents so the
        # corpus genuinely shares lines across documents (the broadcast
        # 50-row side mirrors the oracle's self-join exactly).
        docs = read_table(spark, sf_dir, "documents")
        shared = docs.where(F.col("doc_id") < 50).select(
            F.col("doc_id").alias("k"), F.col("text").alias("extra")
        )
        decorated = docs.join(
            F.broadcast(shared), (F.col("doc_id") % 50) == F.col("k")
        ).select("doc_id", F.concat_ws("\n", "text", "extra").alias("text"))
        return D.line_dedup(decorated)

    q["line_dedup"] = line_dedup

    def repeated_passages(spark, sf_dir):
        return D.repeated_passages(
            read_table(spark, sf_dir, "documents"), width=8, min_docs=2
        )

    q["repeated_passages"] = repeated_passages

    def gram_novelty(spark, sf_dir):
        return D.gram_novelty(read_table(spark, sf_dir, "documents"), n=3)

    q["gram_novelty"] = gram_novelty

    def decontaminate(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        eval_df = docs.where(F.col("doc_id") % 97 == 0)
        return D.decontaminate(docs, eval_df, n=3, threshold_pct=10)

    q["decontaminate"] = decontaminate

    def decontaminate_join(spark, sf_dir):
        # Same semantics through the too-big-to-broadcast eval path: one
        # (doc_id, n_grams, md5(gram)) explode + hash join against the
        # distinct eval hashes instead of a broadcast gram array. Shares
        # the broadcast path's oracle.
        docs = read_table(spark, sf_dir, "documents")
        eval_df = docs.where(F.col("doc_id") % 97 == 0)
        return D.decontaminate(
            docs, eval_df, n=3, threshold_pct=10, broadcast_eval=False
        )

    q["decontaminate_join"] = decontaminate_join

    def minhash_signatures(spark, sf_dir):
        return D.minhash_signatures(read_table(spark, sf_dir, "documents"))

    q["minhash_signatures"] = minhash_signatures

    def minhash_candidates(spark, sf_dir):
        return D.minhash_candidate_pairs(read_table(spark, sf_dir, "documents"))

    q["minhash_candidates"] = minhash_candidates

    def ngram_jaccard(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        grams = F.array_distinct(T.tokens_col(F.col("text")))
        # Exact token interning: build a (token → unique id) dictionary and
        # compare INT arrays instead of string arrays in the O(n²) verify —
        # set sizes and intersections are invariant under the 1:1 mapping,
        # so the SQL oracle is unchanged, while array_intersect on longs
        # benches ~2.3× faster than on strings at sf0.1. The dictionary is
        # broadcast (word-level vocabs are tiny relative to the corpus); at
        # extreme vocab sizes drop the broadcast hint and let AQE decide.
        tok = docs.select("doc_id", "lang", F.explode(grams).alias("t"))
        # Deterministic token ids: monotonically_increasing_id is
        # partition-order-dependent, and the vocab feeds BOTH sides of the
        # pair self-join — a stage retry or AQE replan re-running the
        # distinct could hand the two sides different ids for the same
        # token, silently undercounting intersections. xxhash64 is a pure
        # function of the token (64-bit collisions are negligible at any
        # realistic vocab size, and a collision could only overcount).
        vocab = tok.select("t").distinct().withColumn("tid", F.xxhash64("t"))
        grouped = (
            tok.join(F.broadcast(vocab), "t")
            .groupBy("doc_id", "lang")
            .agg(F.collect_list("tid").alias("grams"))
        )
        # Token-less docs vanish in the explode but the oracle keeps them
        # (two empty sets pass the 2·|∩| ≥ |∪| filter as 0 ≥ 0): restore
        # them with empty gram arrays.
        interned = (
            docs.select("doc_id", "lang")
            .join(grouped, ["doc_id", "lang"], "left")
            .select(
                "doc_id",
                "lang",
                F.coalesce(F.col("grams"), F.array().cast("array<long>")).alias("grams"),
            )
        )
        # Bounded composite blocking (lang, size-bucket): J ≥ 1/2 forces
        # max(|A|,|B|) ≤ 2·min, so qualifying pairs sit in the same or
        # adjacent power-of-two gram-count buckets. dedup.size_bucket_keys
        # emits each doc into its home bucket plus one guest bucket below;
        # the join rejects guest×guest so every pair is generated exactly
        # once — output (and the whole-language oracle) provably
        # unchanged, but the O(n²) groups are now bounded by the
        # per-language size histogram, not the language's corpus share.
        base = interned.select(
            "doc_id",
            F.col("lang").alias("block"),
            F.col("grams"),
            F.size("grams").alias("n_grams"),
        ).select(
            "*", F.explode(D.size_bucket_keys(F.col("n_grams"), 0.5)).alias("sk")
        ).select("doc_id", "block", "grams", "n_grams", "sk.skey", "sk.guest")
        left, right = base.alias("l"), base.alias("r")
        n_common = F.size(F.array_intersect(F.col("l.grams"), F.col("r.grams"))).cast("long")
        # |A∪B| = |A|+|B|-|A∩B| — avoids materializing the union array.
        n_union = (F.col("l.n_grams") + F.col("r.n_grams")).cast("long") - n_common
        # J ≥ 1/2 forces 3·min(|A|,|B|) ≥ |A|+|B| — cheap integer prune in
        # the join condition, evaluated before the O(n) array_intersect.
        size_ok = (
            F.lit(3) * F.least(F.col("l.n_grams"), F.col("r.n_grams"))
            >= F.col("l.n_grams") + F.col("r.n_grams")
        )
        # The Jaccard acceptance predicate goes LAST inside the join
        # condition (not in a .where() above it): predicate pushdown
        # prepends pushed filters to the join conjunction, and codegen
        # short-circuits left-to-right — a .where() would put the O(n)
        # array_intersect BEFORE the integer guest/id/size guards, paying
        # it for every key collision including the guest×guest rows the
        # blocking scheme exists to discard (measured 41s vs 16s at
        # sf0.1).
        return left.join(
            right,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.skey") == F.col("r.skey"))
            & ~((F.col("l.guest") >= 1) & (F.col("r.guest") >= 1))
            & (F.col("l.doc_id") < F.col("r.doc_id"))
            & size_ok
            & (F.lit(2) * n_common >= n_union),
        ).select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            n_common.alias("n_common"),
            n_union.alias("n_union"),
        )

    q["ngram_jaccard"] = ngram_jaccard

    def minhash_verified_dedup(spark, sf_dir):
        # One definition: the library's array-intersect verify IS this
        # query's historical formulation (the library converged on it).
        return D.minhash_verified_pairs(read_table(spark, sf_dir, "documents"))

    q["minhash_verified_dedup"] = minhash_verified_dedup

    def source_dedup_matrix(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        pairs = minhash_verified_dedup(spark, sf_dir).select("doc_a", "doc_b")
        return D.source_pair_matrix(docs, pairs)

    q["source_dedup_matrix"] = source_dedup_matrix

    _minhash_index_cache: set = set()

    def dedup_against_index(spark, sf_dir):
        # Incremental-corpus shape: docs with doc_id % 3 != 0 are the
        # landed corpus (persisted as a minhash index at a deterministic
        # overwrite-idempotent path, built once per sf_dir); the % 3 == 0
        # docs arrive as the new batch and dedup against the index only.
        docs = read_table(spark, sf_dir, "documents")
        path = _scratch_index_path("minhash_index", sf_dir)
        if path not in _minhash_index_cache:
            D.write_minhash_index(docs.where(F.col("doc_id") % 3 != 0), path)
            _minhash_index_cache.add(path)
        batch = docs.where(F.col("doc_id") % 3 == 0)
        return D.dedup_against_index(spark, batch, path)

    q["dedup_against_index"] = dedup_against_index

    def dedup_index_probe(spark, sf_dir):
        # Probe-only twin of dedup_against_index: identical decisions,
        # but the per-process index cache means the one-time build is
        # paid by whichever of the two queries runs first (the bench
        # orders dedup_against_index first), so THIS entry's bench time
        # is the recurring O(batch) partition-pruned probe the
        # batch_id/pfx layout is designed for — the number a streaming
        # ingest loop pays per trigger — not build + probe fused.
        docs = read_table(spark, sf_dir, "documents")
        path = _scratch_index_path("minhash_index", sf_dir)
        if path not in _minhash_index_cache:
            D.write_minhash_index(docs.where(F.col("doc_id") % 3 != 0), path)
            _minhash_index_cache.add(path)
        batch = docs.where(F.col("doc_id") % 3 == 0)
        return D.dedup_against_index(spark, batch, path)

    q["dedup_index_probe"] = dedup_index_probe

    def simhash_signatures(spark, sf_dir):
        return D.simhash_signatures(read_table(spark, sf_dir, "documents"))

    q["simhash_signatures"] = simhash_signatures

    def simhash_near_pairs(spark, sf_dir):
        return D.simhash_near_pairs(
            read_table(spark, sf_dir, "documents"), max_hamming=_SIMHASH_MAX_HAMMING
        )

    q["simhash_near_pairs"] = simhash_near_pairs

    def dedup_components(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        pairs = D.simhash_near_pairs(
            docs, max_hamming=_SIMHASH_MAX_HAMMING
        ).select("doc_a", "doc_b")
        out = D.dedup_components(docs.select("doc_id"), pairs)
        return out.select(
            "doc_id", F.col("component").cast("long").alias("component"), "is_keeper"
        )

    q["dedup_components"] = dedup_components

    # --- similarity search --------------------------------------------------
    def cosine_topk(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        probes = emb.where(F.col("vec_id") < 10)
        out = S.cosine_topk(emb, probes, k=5)
        return out.select("probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))

    q["cosine_topk"] = cosine_topk

    def knn_label_vote(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        probes = emb.where(F.col("vec_id") < 10)
        return S.knn_label_vote(emb, probes, k=5)

    q["knn_label_vote"] = knn_label_vote

    def lsh_signatures(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        return S.lsh_bucket_signatures(emb, EMBED_DIM)

    q["lsh_signatures"] = lsh_signatures

    # NOTE on the Arrow-path oracle queries (lsh_ann_topk, ivf_ann_topk,
    # embedding_near_dup): the matmul paths sum floats in a different
    # order than the oracle's sequential fold, so a plane dot or centroid
    # ranking within ~1e-13 of a tie COULD bucket differently. The
    # path-agreement tests pin exactness on the driver corpus; if the
    # corpus is ever regenerated and a tie appears, switch these queries
    # to signature_path/assign_path="expr" (bit-identical with the SQL
    # fold by construction) and keep Arrow for production entry points.
    def lsh_ann_topk(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        probes = emb.where(F.col("vec_id") < 10)
        # Banded candidates (8-plane bands at test scale; 4×16 production
        # defaults), Arrow matmul signatures.
        out = S.lsh_ann_topk(
            emb, probes, EMBED_DIM, k=5,
            n_bands=_ND_BANDS, band_planes=_ND_BAND_PLANES,
        )
        return out.select("probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))

    q["lsh_ann_topk"] = lsh_ann_topk

    def ivf_cells(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        # Expression-path parity twin of the Arrow assignment (same codebook,
        # same ranking, oracle-identical fold order).
        out = S.ivf_assign(emb, S.ivf_centroids(emb, target_cells=_IVF_TEST_CELLS))
        return out.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell_id").cast("long").alias("cell_id"),
        )

    q["ivf_cells"] = ivf_cells

    def ivf_kmeans_cells(spark, sf_dir):
        # Two spherical-Lloyd refinement passes over the stride-sampled
        # codebook, then the production Arrow assignment with the refined
        # centroids. The oracle unrolls the identical two iterations in
        # SQL (assign -> unit-mean per cell -> reassign), so this pins the
        # whole refinement loop, not just the final argmax.
        emb = read_table(spark, sf_dir, "embeddings")
        cents = S.ivf_kmeans_centroids(
            emb, iters=2, target_cells=_IVF_TEST_CELLS
        )
        out = S.ivf_assign_arrow(emb, cents)
        return out.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell_id").cast("long").alias("cell_id"),
        )

    q["ivf_kmeans_cells"] = ivf_kmeans_cells

    def ivf_ann_topk(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        probes = emb.where(F.col("vec_id") < 10)
        # Production path: Arrow matmul assigns the corpus side.
        out = S.ivf_ann_topk(emb, probes, k=5, target_cells=_IVF_TEST_CELLS)
        return out.select("probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))

    q["ivf_ann_topk"] = ivf_ann_topk

    _ann_index_cache: dict = {}

    def _build_ann_index(spark, sf_dir):
        # Persisted-index round trip: write bands/cells/codebook/meta to a
        # scratch dir, read them back, query through the index tables.
        # Results must be IDENTICAL to the live twins (same oracle SQL).
        # Built once per sf_dir (both indexed queries share it) and
        # written to a DETERMINISTIC path — write_ann_index is
        # overwrite-idempotent — so repeated harness/bench runs reuse one
        # scratch dir instead of leaking a mkdtemp per invocation.
        if sf_dir in _ann_index_cache:
            return _ann_index_cache[sf_dir]
        emb = read_table(spark, sf_dir, "embeddings")
        path = _scratch_index_path("ann_index", sf_dir)
        S.write_ann_index(
            emb, EMBED_DIM, path,
            n_bands=_ND_BANDS, band_planes=_ND_BAND_PLANES,
            target_cells=_IVF_TEST_CELLS,
        )
        _ann_index_cache[sf_dir] = (emb, S.read_ann_index(spark, path))
        return _ann_index_cache[sf_dir]

    def lsh_ann_topk_indexed(spark, sf_dir):
        emb, idx = _build_ann_index(spark, sf_dir)
        probes = emb.where(F.col("vec_id") < 10)
        out = S.lsh_ann_topk_indexed(idx, probes, k=5)
        return out.select("probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))

    q["lsh_ann_topk_indexed"] = lsh_ann_topk_indexed

    def ivf_ann_topk_indexed(spark, sf_dir):
        emb, idx = _build_ann_index(spark, sf_dir)
        probes = emb.where(F.col("vec_id") < 10)
        out = S.ivf_ann_topk_indexed(idx, probes, k=5)
        return out.select("probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank"))

    q["ivf_ann_topk_indexed"] = ivf_ann_topk_indexed

    _pq_books_cache: dict = {}

    def _pq_books(spark, sf_dir):
        if sf_dir not in _pq_books_cache:
            emb = read_table(spark, sf_dir, "embeddings")
            _pq_books_cache[sf_dir] = (
                emb,
                S.pq_codebooks(emb, target_codes=_PQ_TEST_CODES),
            )
        return _pq_books_cache[sf_dir]

    def pq_codes(spark, sf_dir):
        emb, books = _pq_books(spark, sf_dir)
        return S.pq_encode(emb, books).select(
            "vec_id", F.posexplode("codes").alias("subspace", "code")
        )

    q["pq_codes"] = pq_codes

    def pq_ann_topk(spark, sf_dir):
        emb, books = _pq_books(spark, sf_dir)
        probes = emb.where(F.col("vec_id") < 10)
        out = S.pq_adc_topk(emb, probes, books, k=5)
        return out.select(
            "probe_id", "item_id", "adc_x10k", F.col("rank").cast("int").alias("rank")
        )

    q["pq_ann_topk"] = pq_ann_topk

    def pq_rerank_topk(spark, sf_dir):
        emb, books = _pq_books(spark, sf_dir)
        probes = emb.where(F.col("vec_id") < 10)
        out = S.pq_adc_rerank_topk(emb, probes, books, k=5, shortlist=25)
        return out.select(
            "probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank")
        )

    q["pq_rerank_topk"] = pq_rerank_topk

    def ivfpq_topk(spark, sf_dir):
        emb, books = _pq_books(spark, sf_dir)
        cents = S.ivf_centroids(emb, target_cells=_IVF_TEST_CELLS)
        probes = emb.where(F.col("vec_id") < 10)
        out = S.ivfpq_topk(
            emb, probes, cents, books, k=5, nprobe=2, shortlist=25
        )
        return out.select(
            "probe_id", "item_id", "cosine", F.col("rank").cast("int").alias("rank")
        )

    q["ivfpq_topk"] = ivfpq_topk

    def embedding_near_dup(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        # 0.25 / 8-plane bands are tuned to the synthetic corpus (no true
        # near-dups exist in it); production near-dup removal runs the same
        # plan at ~0.9 with the 4×16 defaults.
        return S.embedding_near_dup(
            emb, EMBED_DIM, threshold=0.25,
            n_bands=_ND_BANDS, band_planes=_ND_BAND_PLANES,
        )

    q["embedding_near_dup"] = embedding_near_dup

    def semantic_dedup(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        # SemDeDup over the IVF cells: tau=0.35 is tuned to the synthetic
        # near-random corpus (real text embeddings run ~0.8); production
        # path (Arrow assignment + per-cell numpy gram matrix) — the expr
        # twin agrees, pinned by test_semantic_dedup_path_agreement.
        return S.semantic_dedup(emb, tau=0.35, target_cells=_IVF_TEST_CELLS)

    q["semantic_dedup"] = semantic_dedup

    def semantic_dedup_kmeans(spark, sf_dir):
        # The paper's actual recipe: k-means cells, not a raw stride
        # sample. Two Lloyd passes refine the codebook, then the same
        # within-cell min-id-witness marking; the oracle unrolls the
        # refinement AND the dup rule, so the full composed path is
        # hash-verified.
        emb = read_table(spark, sf_dir, "embeddings")
        return S.semantic_dedup(
            emb, tau=0.35, target_cells=_IVF_TEST_CELLS, kmeans_iters=2
        )

    q["semantic_dedup_kmeans"] = semantic_dedup_kmeans

    # --- multimodal plumbing -------------------------------------------------
    def media_features(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        payloads = M.attach_payloads(docs, "doc_id", "text", "image")
        return M.extract_media_features(payloads)

    q["media_features"] = media_features

    def frame_samples(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        payloads = M.attach_payloads(docs, "doc_id", "text", "image")
        return M.sample_frames(payloads)

    q["frame_samples"] = frame_samples

    def resize_media(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        payloads = M.attach_payloads(docs, "doc_id", "text", "image")
        out = M.resize_media_stub(payloads, target_w=8, target_h=8)
        return out.select(
            "media_id",
            F.col("target_w").cast("int").alias("target_w"),
            F.col("target_h").cast("int").alias("target_h"),
            F.col("resized_bytes").cast("long").alias("resized_bytes"),
            "resized_md5",
            "status",
        )

    q["resize_media"] = resize_media

    def transcript_enrichment(spark, sf_dir):
        """Sidecar OCR-transcript splice (M5 north_star path) as a query:
        every doc gets a line + img span; even doc_ids have a sidecar row
        whose transcript overwrites the img text, odd ones keep ''."""
        from ebook_conversion_to_text_for_machine_learning_spark.operators.transcripts import (
            apply_transcripts,
        )

        docs = read_table(spark, sf_dir, "documents")
        spans = F.array(
            F.struct(
                F.lit("line").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("img").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("img-"), F.col("doc_id")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
        )
        spans_df = docs.select("doc_id", spans.alias("spans"))
        sidecar = docs.where(F.col("doc_id") % 2 == 0).select(
            "doc_id",
            F.concat(F.lit("img-"), F.col("doc_id")).alias("media_ref"),
            F.upper(F.substring("text", 1, 20)).alias("transcript"),
        )
        enriched = apply_transcripts(spans_df, sidecar)
        s = F.explode("spans").alias("s")
        return enriched.select("doc_id", s).select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").cast("int").alias("span_offset"),
        )

    q["transcript_enrichment"] = transcript_enrichment

    # --- relational shell (lineage/metrics-style aggregations + joins) ------
    def pricing_summary(spark, sf_dir):
        li = read_table(spark, sf_dir, "lineitem")
        return (
            li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 1).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 1).alias("sum_disc_price"),
                F.count("*").alias("count_order"),
            )
        )

    q["pricing_summary"] = pricing_summary

    def nation_revenue(spark, sf_dir):
        orders = read_table(spark, sf_dir, "orders")
        customer = read_table(spark, sf_dir, "customer")
        nation = read_table(spark, sf_dir, "nation")
        return (
            orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 1).alias("revenue"),
            )
        )

    q["nation_revenue"] = nation_revenue

    def top_events_per_user(spark, sf_dir):
        from pyspark.sql.window import Window

        events = read_table(spark, sf_dir, "events")
        w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
        return (
            events.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 3)
            .select("user_id", "event_id", "event_type", "value", F.col("rank").cast("int").alias("rank"))
        )

    q["top_events_per_user"] = top_events_per_user

    def sessionization(spark, sf_dir):
        from pyspark.sql.window import Window

        events = read_table(spark, sf_dir, "events")
        e = events.select("user_id", "event_id", F.unix_timestamp(F.col("ts")).alias("tsec"))
        w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
        gap = F.col("tsec") - F.lag("tsec").over(w)
        flagged = e.withColumn(
            "is_new", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
        )
        running = Window.partitionBy("user_id").orderBy("tsec", "event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        sessions = flagged.withColumn("session_idx", F.sum("is_new").over(running))
        return sessions.groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx")).agg(
            F.count("*").alias("n_events"),
            F.min("tsec").alias("first_ts"),
        )

    q["sessionization"] = sessionization

    def event_funnel(spark, sf_dir):
        # Ordered-sequence conversion funnel (view → click → purchase):
        # a user reaches step i+1 only with an event of that type STRICTLY
        # after their earliest qualifying time for step i. Each step is a
        # narrow (user_id, min-ts) partial aggregate joined to the next
        # step's filtered scan — no per-user event arrays, no windows, so
        # a power user with 10^6 events costs the same shuffle bytes as
        # anyone else. The final per-step counters collapse to one row
        # (single-partition exchange of 3 longs) and explode to the
        # funnel table, exactly like curation.filter_funnel.
        events = read_table(spark, sf_dir, "events")
        e = events.select(
            "user_id", "event_type", F.unix_timestamp(F.col("ts")).alias("tsec")
        )
        steps = ["view", "click", "purchase"]
        reached = e.where(F.col("event_type") == steps[0]).groupBy("user_id").agg(
            F.min("tsec").alias("t")
        )
        counters = reached.agg(F.count("*").cast("long").alias("_c1"))
        for i, step in enumerate(steps[1:], start=2):
            nxt = (
                e.where(F.col("event_type") == step)
                .join(reached.select("user_id", F.col("t").alias("_prev_t")), "user_id")
                .where(F.col("tsec") > F.col("_prev_t"))
                .groupBy("user_id")
                .agg(F.min("tsec").alias("t"))
            )
            counters = counters.crossJoin(
                nxt.agg(F.count("*").cast("long").alias(f"_c{i}"))
            )
            reached = nxt
        rows = []
        for i, step in enumerate(steps, start=1):
            conv = (
                F.lit(10000).cast("long")
                if i == 1
                else F.expr(
                    f"CASE WHEN _c{i - 1} > 0 THEN (_c{i} * 10000) div _c{i - 1} "
                    "ELSE CAST(0 AS BIGINT) END"
                )
            )
            rows.append(
                F.struct(
                    F.lit(i).cast("int").alias("step_idx"),
                    F.lit(step).alias("step"),
                    F.col(f"_c{i}").alias("n_users"),
                    conv.alias("conv_from_prev_x10k"),
                )
            )
        return counters.select(F.explode(F.array(*rows)).alias("s")).select("s.*")

    q["event_funnel"] = event_funnel

    def asof_latest_order(spark, sf_dir):
        events = read_table(spark, sf_dir, "events")
        orders = read_table(spark, sf_dir, "orders")
        ev = events.select("event_id", "user_id", F.unix_timestamp(F.col("ts")).alias("tsec"))
        od = orders.select("o_custkey", F.unix_timestamp(F.col("o_orderdate")).alias("otsec"))
        joined = ev.join(
            F.broadcast(od),
            (F.col("o_custkey") == F.col("user_id")) & (F.col("otsec") <= F.col("tsec")),
        )
        return joined.groupBy("event_id", "user_id").agg(
            F.max("otsec").alias("latest_order_ts"),
            F.count("*").alias("n_prior_orders"),
        )

    q["asof_latest_order"] = asof_latest_order

    def pivot_event_counts(spark, sf_dir):
        events = read_table(spark, sf_dir, "events")
        counts = [
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
            for t in ("click", "view", "purchase", "signup", "error")
        ]
        return events.groupBy("user_id").agg(*counts, F.count("*").alias("n_total"))

    q["pivot_event_counts"] = pivot_event_counts

    def events_hourly(spark, sf_dir):
        events = read_table(spark, sf_dir, "events")
        return (
            events.groupBy(
                F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long").alias("hour_ts"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )

    q["events_hourly"] = events_hourly

    def events_percentiles(spark, sf_dir):
        # Exact interpolated percentiles: Spark's percentile() and
        # DuckDB's quantile_cont() share the (n-1)p linear-interpolation
        # definition, verified to agree to 4dp on this table. Spark's
        # exact percentile is a full-sort-per-group aggregate — right for
        # grouped dashboard rollups (bounded groups), not for a 10^12-row
        # ungrouped quantile, where approx_percentile is the scale path.
        events = read_table(spark, sf_dir, "events")
        return events.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_value"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )

    q["events_percentiles"] = events_percentiles

    return _rotate_for_driver(q)


# Driver-sampling rotation: the correctness driver checks the FIRST 50
# entries of queries() each round.  With >50 registered queries, front-load
# the ones with the fewest driver rows so every query gets a driver-verified
# CORRECTNESS row at least every other round:
#   - round 4 sampled positions 1-50 of the round-4 ordering (all 50 green
#     in CORRECTNESS_r04.json), leaving the 28 below unsampled — all of them
#     last driver-checked in round 3;
#   - round 5 therefore fronts those 28 (+ any new round-5 queries, which
#     are appended to this list as they are registered);
#   - next round, update this list to front whatever round 5 left unsampled
#     (the tail of the round-5 ordering past the driver's sample window).
_DRIVER_FRONT = [
    # new in round 5 (never driver-checked); note pq_ann_topk /
    # pq_rerank_topk (fresh r4 rows) now route through the Arrow scan
    # kernel by default — their oracles verify the Arrow path from here on
    "dedup_index_probe",
    # last driver-checked in round 3 (outside the r4 50-query window)
    "split_assign",
    "stratified_sample",
    "pack_sequences",
    "repetition_signals",
    "line_repetition",
    "corpus_stats",
    "source_mix_stats",
    "temperature_mix",
    "domain_affinity",
    "quality_filter_funnel",
    "exact_dedup",
    "line_dedup",
    "repeated_passages",
    "gram_novelty",
    "decontaminate",
    "decontaminate_join",
    "minhash_signatures",
    "minhash_candidates",
    "ngram_jaccard",
    "minhash_verified_dedup",
    "source_dedup_matrix",
    "dedup_against_index",
    "simhash_signatures",
    "simhash_near_pairs",
    "dedup_components",
    "cosine_topk",
    "knn_label_vote",
    "lsh_signatures",
]


def _rotate_for_driver(q: dict) -> dict:
    front = {name: q[name] for name in _DRIVER_FRONT if name in q}
    rest = {name: fn for name, fn in q.items() if name not in front}
    return {**front, **rest}


def oracle_sql() -> dict[str, str]:
    tokens = _SQL_TOKENS.format(col="text")
    tokens_lower = _SQL_TOKENS.format(col="lower(text)")
    desmarten_text = _SQL_DESMARTEN.format(col="text")
    o: dict[str, str] = {}

    o["extract_goldens"] = _golden_values_sql()
    o["extract_random_corpus"] = _random_corpus_values_sql()
    o["extract_pdf_files"] = _pdf_files_values_sql()
    o["extract_ebook_files"] = _ebook_files_values_sql()

    o["extract_documents_txt"] = f"""
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         {_SQL_PYSTRIP.format(col="text")} AS trimmed
  FROM documents
), cls AS (
  SELECT doc_id, text,
    (lower(trimmed) LIKE 'chapter%'
     OR (strpos(trimmed, ' ') = 0 AND regexp_matches(trimmed, '^[0-9]+$'))) AS is_chap
  FROM base
), line AS (
  SELECT doc_id,
    CASE WHEN is_chap THEN '***'
         ELSE {_SQL_COLLAPSE.format(col=desmarten_text)} END AS cleaned
  FROM cls
)
SELECT doc_id,
  ltrim(CASE WHEN {_SQL_PYSTRIP.format(col="cleaned")} = '' THEN '' ELSE cleaned END, '*') AS extracted_text,
  CAST(CASE WHEN ltrim(CASE WHEN {_SQL_PYSTRIP.format(col="cleaned")} = '' THEN '' ELSE cleaned END, '*') = ''
            THEN 0 ELSE 1 END AS BIGINT) AS n_spans
FROM line"""

    _ext_expr = (
        "ltrim(CASE WHEN "
        + _SQL_PYSTRIP.format(col="cleaned")
        + " = '' THEN '' ELSE cleaned END, '*')"
    )
    _toks_ext = _SQL_TOKENS.format(col="extracted_text")
    _train_prep_ctes = f"""base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         {_SQL_PYSTRIP.format(col="text")} AS trimmed
  FROM documents
), cls AS (
  SELECT doc_id, text,
    (lower(trimmed) LIKE 'chapter%'
     OR (strpos(trimmed, ' ') = 0 AND regexp_matches(trimmed, '^[0-9]+$'))) AS is_chap
  FROM base
), line AS (
  SELECT doc_id,
    CASE WHEN is_chap THEN '***'
         ELSE {_SQL_COLLAPSE.format(col=_SQL_DESMARTEN.format(col="text"))} END AS cleaned
  FROM cls
), ext AS (
  SELECT doc_id, {_ext_expr} AS extracted_text FROM line
), toks_t AS (
  SELECT doc_id, extracted_text, {_toks_ext} AS toks
  FROM ext WHERE length(extracted_text) > 0
), nz AS (SELECT * FROM toks_t WHERE len(toks) > 0),
q AS (
  SELECT doc_id, extracted_text,
    floor((0.4 * least(1.0, len(toks)::DOUBLE / 50.0)
         + 0.3 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
         + 0.3 * (len(list_filter(toks, x -> list_contains({_STOPWORD_SQL_LIST}, lower(x))))::DOUBLE
                  / len(toks)::DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS quality_score
  FROM nz),
f AS (SELECT * FROM q WHERE quality_score >= 0.5)"""

    o["training_data_prep"] = f"""
WITH {_train_prep_ctes}
SELECT md5(extracted_text) AS text_hash,
       min(doc_id) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       min(quality_score) AS quality_score,
       min(extracted_text) AS extracted_text
FROM f GROUP BY 1"""

    from ebook_conversion_to_text_for_machine_learning_spark.operators import (
        curation as _C,
    )

    _seq_chunk, _seq_step = 32, 24
    _seq_toks = _SQL_TOKENS.format(col="text")
    _seq_nib = "strpos('0123456789abcdef', substr(md5(doc_id), {pos}, 1)) - 1"
    _seq_bucket = f"(({_seq_nib.format(pos=1)}) * 16 + ({_seq_nib.format(pos=2)}))"
    o["training_sequences"] = f"""
WITH {_train_prep_ctes},
keep AS (
  SELECT md5(extracted_text) AS text_hash,
         min(doc_id) AS doc_id, min(extracted_text) AS raw_text
  FROM f GROUP BY 1),
scrub AS (
  SELECT doc_id, text_hash,
    regexp_replace(regexp_replace(regexp_replace(raw_text,
        '{_C.URL_PATTERN}', '{_C.URL_TOKEN}', 'g'),
        '{_C.EMAIL_PATTERN}', '{_C.EMAIL_TOKEN}', 'g'),
        '{_C.PHONE_PATTERN}', '{_C.PHONE_TOKEN}', 'g') AS text
  FROM keep),
tok AS (SELECT doc_id, text_hash, {_seq_toks} AS toks FROM scrub),
ch AS (
  SELECT doc_id, text_hash, toks,
         unnest(range(0, CAST(ceil(len(toks)::DOUBLE / {_seq_step}) AS INT))) AS i
  FROM tok WHERE len(toks) > 0)
SELECT doc_id, text_hash,
  CAST(i AS BIGINT) AS chunk_idx,
  CAST(i * {_seq_step} AS BIGINT) AS chunk_start,
  array_to_string(toks[i * {_seq_step} + 1 : i * {_seq_step} + {_seq_chunk}], ' ') AS chunk_text,
  CAST(len(toks[i * {_seq_step} + 1 : i * {_seq_step} + {_seq_chunk}]) AS BIGINT) AS n_chunk_tokens,
  CASE WHEN {_seq_bucket} < {_C.TRAIN_UPPER} THEN 'train'
       WHEN {_seq_bucket} < {_C.VAL_UPPER} THEN 'val'
       ELSE 'test' END AS split
FROM ch"""

    # training_mix: the sequences chain plus repetition filter (per-row
    # Gopher flag), decontamination against documents with doc_id % 97 == 0,
    # and offset packing into 64-token bins over (split, md5-bucket % 8)
    # shards — mirrors plans.training_prep.prepare_training_mix.
    _mix_scrub = (
        "regexp_replace(regexp_replace(regexp_replace(raw_text, "
        f"'{_C.URL_PATTERN}', '{_C.URL_TOKEN}', 'g'), "
        f"'{_C.EMAIL_PATTERN}', '{_C.EMAIL_TOKEN}', 'g'), "
        f"'{_C.PHONE_PATTERN}', '{_C.PHONE_TOKEN}', 'g')"
    )
    _mix_ev_toks = _SQL_TOKENS.format(col="text")
    _g3 = (
        "CASE WHEN len({t}) >= 3 THEN list_distinct(list_transform("
        "range(1, len({t}) - 1), i -> array_to_string({t}[i:i+2], ' '))) "
        "ELSE [] END"
    )
    o["training_mix"] = f"""
WITH {_train_prep_ctes},
rtok AS (SELECT doc_id, extracted_text,
           {_SQL_TOKENS.format(col="extracted_text")} AS toks FROM f),
rgram AS (SELECT doc_id, extracted_text,
    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
         i -> array_to_string(toks[i:i+1], ' ')) ELSE [] END AS g2,
    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
         i -> array_to_string(toks[i:i+2], ' ')) ELSE [] END AS g3
  FROM rtok),
rep AS (
  SELECT doc_id, extracted_text FROM rgram
  WHERE NOT (
    (len(g2) > 0 AND coalesce(list_aggregate(list_transform(list_distinct(g2),
        d -> len(list_filter(g2, x -> x = d))), 'max'), 0) * 100 > {T.TOP_2GRAM_PCT} * len(g2))
    OR (len(g3) > 0 AND coalesce(list_aggregate(list_filter(list_transform(list_distinct(g3),
        d -> len(list_filter(g3, x -> x = d))), c -> c > 1), 'sum'), 0) * 100 > {T.DUP_3GRAM_PCT} * len(g3)))),
keep AS (
  SELECT md5(extracted_text) AS text_hash,
         min(doc_id) AS doc_id, min(extracted_text) AS raw_text
  FROM rep GROUP BY 1),
ev AS (SELECT DISTINCT unnest({_g3.format(t="toks")}) AS g
       FROM (SELECT {_mix_ev_toks} AS toks FROM documents WHERE doc_id % 97 = 0)),
kg AS (SELECT text_hash, doc_id, raw_text, {_g3.format(t="ktoks")} AS grams
       FROM (SELECT text_hash, doc_id, raw_text,
                    {_SQL_TOKENS.format(col="raw_text")} AS ktoks FROM keep)),
hit AS (SELECT text_hash, count(*) AS n_hit
        FROM (SELECT text_hash, unnest(grams) AS g FROM kg) x JOIN ev USING (g)
        GROUP BY 1),
dk AS (SELECT kg.text_hash, kg.doc_id, kg.raw_text
       FROM kg LEFT JOIN hit USING (text_hash)
       WHERE NOT (len(grams) > 0 AND coalesce(n_hit, 0) * 100 >= 10 * len(grams))),
scrub AS (SELECT doc_id, text_hash, {_mix_scrub} AS text FROM dk),
tok AS (SELECT doc_id, text_hash, {_seq_toks} AS toks FROM scrub),
ch AS (
  SELECT doc_id, text_hash, toks,
         unnest(range(0, CAST(ceil(len(toks)::DOUBLE / {_seq_step}) AS INT))) AS i
  FROM tok WHERE len(toks) > 0),
cc AS (
  SELECT doc_id, text_hash,
    CAST(i AS BIGINT) AS chunk_idx,
    array_to_string(toks[i * {_seq_step} + 1 : i * {_seq_step} + {_seq_chunk}], ' ') AS chunk_text,
    CAST(len(toks[i * {_seq_step} + 1 : i * {_seq_step} + {_seq_chunk}]) AS BIGINT) AS n_tokens,
    CASE WHEN {_seq_bucket} < {_C.TRAIN_UPPER} THEN 'train'
         WHEN {_seq_bucket} < {_C.VAL_UPPER} THEN 'val'
         ELSE 'test' END AS split,
    CAST({_seq_bucket} % 8 AS BIGINT) AS shard
  FROM ch),
w AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS bin_offset
  FROM cc)
SELECT split, shard, doc_id, chunk_idx, text_hash, chunk_text, n_tokens,
  CAST(bin_offset AS BIGINT) AS bin_offset,
  CAST(floor(bin_offset / 64) AS BIGINT) AS bin_id
FROM w"""

    decorated = "text || ' — “q”… ‘x’ •'"
    o["fold_smart_punct"] = (
        f"SELECT doc_id, {_SQL_DESMARTEN.format(col=decorated)} AS folded_text FROM documents"
    )

    cleaned_input = "'***' || chr(10) || '***' || chr(10) || '  ' || text || '  ' || chr(10) || chr(10)"
    o["clean_text_block"] = rf"""
SELECT doc_id,
  regexp_replace(
    regexp_replace({_SQL_COLLAPSE.format(col=cleaned_input)}, '(?:\*\*\*\n)+', '***' || chr(10), 'g'),
    '^\*\*\*\n', '') AS cleaned_text
FROM documents"""

    o["pdf_squeeze"] = rf"""
SELECT doc_id,
  regexp_replace(regexp_replace('a' || chr(10) || chr(10) || chr(10) || 'b   c  ' || text, '\n+', chr(10), 'g'), ' {{2,}}', ' ', 'g') AS squeezed_text
FROM documents"""

    o["sentence_end_flag"] = r"""
SELECT doc_id,
  CAST(regexp_matches(regexp_replace(text, '\s+$', ''), '[.!?]"?$') AS INT) AS ends_sentence
FROM documents"""

    o["classify_headings"] = f"""
SELECT doc_id,
  CAST(lower({_SQL_PYSTRIP.format(col="text")}) LIKE 'chapter%' AS INT) AS is_chapter_prefix,
  CAST(regexp_matches(lower(text), '{_BOILER_PATTERN}') AS INT) AS is_boilerplate
FROM documents"""

    o["token_stats"] = f"""
SELECT doc_id,
  CAST(len({tokens}) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct({tokens})) AS BIGINT) AS n_distinct_tokens,
  CAST(len(regexp_extract_all(lower(text), '{T.BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents"""

    o["quality_scores"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
r AS (SELECT doc_id,
  len(toks)::DOUBLE AS n,
  len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE AS dr,
  len(list_filter(toks, x -> list_contains({_STOPWORD_SQL_LIST}, lower(x))))::DOUBLE / len(toks)::DOUBLE AS sr
FROM t)
SELECT doc_id,
  floor(dr * 10000.0 + 0.5) / 10000.0 AS distinct_ratio,
  floor(sr * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
  floor((0.4 * least(1.0, n / 50.0) + 0.3 * dr + 0.3 * sr) * 10000.0 + 0.5) / 10000.0 AS quality_score
FROM r"""

    marker_scores = ",\n  ".join(
        "CAST(len(list_filter({toks}, x -> list_contains([{words}], x))) AS BIGINT) AS score_{lang}".format(
            toks="toks", words=", ".join(f"'{w}'" for w in words), lang=lang
        )
        for lang, words in T.LANG_MARKERS.items()
    )
    predicted_cases = " ".join(
        f"WHEN score_{lang} = best AND best > 0 THEN '{lang}'" for lang in T.LANG_MARKERS
    )
    o["language_id"] = f"""
WITH t AS (SELECT doc_id, lang AS actual_lang, {tokens_lower} AS toks FROM documents),
s AS (SELECT doc_id, actual_lang, {marker_scores} FROM t),
b AS (SELECT *, greatest({", ".join(f"score_{lang}" for lang in T.LANG_MARKERS)}) AS best FROM s)
SELECT doc_id, actual_lang,
  CASE {predicted_cases} ELSE 'und' END AS predicted_lang,
  {", ".join(f"score_{lang}" for lang in T.LANG_MARKERS)}
FROM b"""

    from ebook_conversion_to_text_for_machine_learning_spark.operators import (
        curation as _CUR,
    )

    _feat_scores = marker_scores.replace("list_filter(toks,", "list_filter(ltoks,")
    _feat_quality = f"""CASE WHEN len(toks) > 0 THEN
    floor((0.4 * least(1.0, len(toks)::DOUBLE / 50.0)
         + 0.3 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
         + 0.3 * (len(list_filter(toks, x -> list_contains({_STOPWORD_SQL_LIST}, lower(x))))::DOUBLE
                  / len(toks)::DOUBLE)) * 10000.0 + 0.5) / 10000.0
    ELSE 0.0 END"""
    o["document_features"] = f"""
WITH t AS (SELECT doc_id, text, {tokens} AS toks, {tokens_lower} AS ltoks FROM documents),
g AS (SELECT *,
    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
         i -> array_to_string(toks[i:i+1], ' ')) ELSE [] END AS g2,
    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
         i -> array_to_string(toks[i:i+2], ' ')) ELSE [] END AS g3
  FROM t),
s AS (SELECT doc_id, text, toks, g2, g3, {_feat_scores} FROM g),
b AS (SELECT *, greatest({", ".join(f"score_{lang}" for lang in T.LANG_MARKERS)}) AS best FROM s)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
  CAST(len(regexp_extract_all(lower(text), '{T.BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  {_feat_quality} AS quality_score,
  {", ".join(f"score_{lang}" for lang in T.LANG_MARKERS)},
  CASE {predicted_cases} ELSE 'und' END AS predicted_lang,
  CAST(len(regexp_extract_all(text, '{_CUR.URL_PATTERN}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(text, '{_CUR.EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{_CUR.PHONE_PATTERN}')) AS BIGINT) AS n_phones,
  ((len(g2) > 0 AND coalesce(list_aggregate(list_transform(list_distinct(g2),
      d -> len(list_filter(g2, x -> x = d))), 'max'), 0) * 100 > {T.TOP_2GRAM_PCT} * len(g2))
   OR (len(g3) > 0 AND coalesce(list_aggregate(list_filter(list_transform(list_distinct(g3),
      d -> len(list_filter(g3, x -> x = d))), c -> c > 1), 'sum'), 0) * 100 > {T.DUP_3GRAM_PCT} * len(g3))) AS repetitive,
  md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fingerprint
FROM b"""

    o["fingerprints"] = """
SELECT doc_id, md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fingerprint
FROM documents"""

    # Smoothed tf-idf, scikit-style: score = tf * (ln((N+1)/(df+1)) + 1).
    # Both engines quantize to x10k BIGINT BEFORE ranking, so the
    # row_number windows order identical integers (term ASC tie-break).
    o["tfidf_top_terms"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS.format(col="text")}) AS term FROM documents),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM tf GROUP BY 1),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(floor(tf.tf * (ln((n.n_docs + 1)::DOUBLE / (dfreq.doc_freq + 1)) + 1)
                    * 10000 + 0.5) AS BIGINT) AS score_x10k
  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_x10k DESC, term) AS rnk
  FROM scored)
SELECT doc_id, term, tf, score_x10k, CAST(rnk AS INT) AS rank
FROM ranked WHERE rnk <= 5"""

    from ebook_conversion_to_text_for_machine_learning_spark.operators import (
        curation as C,
    )

    _pii_text = f"text || '{_PII_SUFFIX}'"
    o["scrub_pii"] = f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace({_pii_text},
      '{C.URL_PATTERN}', '{C.URL_TOKEN}', 'g'),
      '{C.EMAIL_PATTERN}', '{C.EMAIL_TOKEN}', 'g'),
      '{C.PHONE_PATTERN}', '{C.PHONE_TOKEN}', 'g') AS scrubbed_text,
  CAST(len(regexp_extract_all({_pii_text}, '{C.URL_PATTERN}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all({_pii_text}, '{C.EMAIL_PATTERN}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all({_pii_text}, '{C.PHONE_PATTERN}')) AS BIGINT) AS n_phones
FROM documents"""

    _chunk, _step = 32, 24
    o["chunk_documents"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks)::DOUBLE / {_step}) AS INT))) AS i
  FROM t WHERE len(toks) > 0)
SELECT doc_id,
  CAST(i AS BIGINT) AS chunk_idx,
  CAST(i * {_step} AS BIGINT) AS chunk_start,
  array_to_string(toks[i * {_step} + 1 : i * {_step} + {_chunk}], ' ') AS chunk_text,
  CAST(len(toks[i * {_step} + 1 : i * {_step} + {_chunk}]) AS BIGINT) AS n_chunk_tokens
FROM s"""

    _nib = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {pos}, 1)) - 1"
    _bucket = f"(({_nib.format(pos=1)}) * 16 + ({_nib.format(pos=2)}))"
    o["split_assign"] = f"""
SELECT doc_id,
  CAST({_bucket} AS INT) AS bucket,
  CASE WHEN {_bucket} < {C.TRAIN_UPPER} THEN 'train'
       WHEN {_bucket} < {C.VAL_UPPER} THEN 'val'
       ELSE 'test' END AS split
FROM documents"""

    _nib16 = "strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {pos}, 1)) - 1"
    _bucket16 = "((((%s) * 16 + (%s)) * 16 + (%s)) * 16 + (%s))" % tuple(
        _nib16.format(pos=p) for p in (1, 2, 3, 4)
    )
    o["stratified_sample"] = f"""
SELECT doc_id, lang, CAST({_bucket16} AS INT) AS sample_bucket
FROM documents
WHERE {_bucket16} < CASE WHEN lang = 'en' THEN {int(0.5 * 65536)}
                         WHEN lang = 'es' THEN {int(0.25 * 65536)}
                         ELSE {int(0.125 * 65536)} END"""

    _pk_chunk, _pk_step, _pk_budget, _pk_shards = 32, 24, 64, 8
    o["pack_sequences"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks)::DOUBLE / {_pk_step}) AS INT))) AS i
  FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id,
    CAST(i AS BIGINT) AS chunk_idx,
    CAST(len(toks[i * {_pk_step} + 1 : i * {_pk_step} + {_pk_chunk}]) AS BIGINT) AS n_tokens,
    CASE WHEN {_bucket} < {C.TRAIN_UPPER} THEN 'train'
         WHEN {_bucket} < {C.VAL_UPPER} THEN 'val'
         ELSE 'test' END AS split,
    CAST(doc_id % {_pk_shards} AS BIGINT) AS shard
  FROM s),
w AS (
  SELECT split, shard, doc_id, chunk_idx, n_tokens,
    sum(n_tokens) OVER (PARTITION BY split, shard ORDER BY doc_id, chunk_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS bin_offset
  FROM c)
SELECT split, shard, doc_id, chunk_idx, n_tokens,
  CAST(bin_offset AS BIGINT) AS bin_offset,
  CAST(floor(bin_offset / {_pk_budget}) AS BIGINT) AS bin_id
FROM w"""

    o["repetition_signals"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
g2 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        THEN list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))
        ELSE [] END) AS g FROM t),
c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY doc_id, g),
a2 AS (SELECT doc_id, sum(cnt) AS n_2grams, max(cnt) AS top_2gram_cnt,
        coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup_2gram_cnt
       FROM c2 GROUP BY doc_id),
g3 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3
        THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        ELSE [] END) AS g FROM t),
c3 AS (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY doc_id, g),
a3 AS (SELECT doc_id, sum(cnt) AS n_3grams, max(cnt) AS top_3gram_cnt,
        coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS dup_3gram_cnt
       FROM c3 GROUP BY doc_id),
m AS (
  SELECT d.doc_id,
    CAST(coalesce(n_2grams, 0) AS BIGINT) AS n_2grams,
    CAST(coalesce(top_2gram_cnt, 0) AS BIGINT) AS top_2gram_cnt,
    CAST(coalesce(dup_2gram_cnt, 0) AS BIGINT) AS dup_2gram_cnt,
    CAST(coalesce(n_3grams, 0) AS BIGINT) AS n_3grams,
    CAST(coalesce(top_3gram_cnt, 0) AS BIGINT) AS top_3gram_cnt,
    CAST(coalesce(dup_3gram_cnt, 0) AS BIGINT) AS dup_3gram_cnt
  FROM documents d LEFT JOIN a2 ON d.doc_id = a2.doc_id LEFT JOIN a3 ON d.doc_id = a3.doc_id)
SELECT doc_id, n_2grams, top_2gram_cnt, dup_2gram_cnt, n_3grams, top_3gram_cnt, dup_3gram_cnt,
  CASE WHEN n_2grams > 0
       THEN floor(top_2gram_cnt::DOUBLE / n_2grams::DOUBLE * 10000.0 + 0.5) / 10000.0
       ELSE 0.0 END AS top_2gram_frac,
  CASE WHEN n_3grams > 0
       THEN floor(dup_3gram_cnt::DOUBLE / n_3grams::DOUBLE * 10000.0 + 0.5) / 10000.0
       ELSE 0.0 END AS dup_3gram_frac,
  ((top_2gram_cnt * 100 > {T.TOP_2GRAM_PCT} * n_2grams AND n_2grams > 0)
   OR (dup_3gram_cnt * 100 > {T.DUP_3GRAM_PCT} * n_3grams AND n_3grams > 0)) AS repetitive
FROM m"""

    o["line_repetition"] = """
WITH dec AS (
  SELECT d.doc_id, d.text || chr(10) || s.text AS text
  FROM documents d JOIN documents s ON d.doc_id % 50 = s.doc_id AND s.doc_id < 50),
l0 AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM dec),
l AS (SELECT doc_id, unnest(range(0, len(lines))) AS i, lines FROM l0),
lx AS (SELECT doc_id, lines[i + 1] AS line FROM l),
pv AS (SELECT doc_id, md5(line) AS h, count(*) AS cnt, sum(length(line)) AS chars
       FROM lx GROUP BY doc_id, md5(line))
SELECT doc_id,
  CAST(sum(cnt) AS BIGINT) AS n_lines,
  CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS n_dup_lines,
  CAST(sum(chars) AS BIGINT) AS n_line_chars,
  CAST(coalesce(sum(CASE WHEN cnt > 1 THEN chars END), 0) AS BIGINT) AS n_dup_line_chars
FROM pv GROUP BY doc_id"""

    # Same exact-integer conventions as corpus_stats (x10k sums, floor
    # mean) plus two INTEGER-divided rates — `//` here, `div` in Spark —
    # so every output column is a BIGINT no float can perturb.
    o["source_mix_stats"] = f"""
WITH t AS (SELECT source, text, {tokens} AS toks FROM documents),
r AS (SELECT source,
    CAST(len(toks) AS BIGINT) AS n_toks,
    CAST(CASE WHEN len(toks) > 0 THEN
      floor((0.4 * least(1.0, len(toks)::DOUBLE / 50.0)
           + 0.3 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
           + 0.3 * (len(list_filter(toks, x -> list_contains({_STOPWORD_SQL_LIST}, lower(x))))::DOUBLE
                    / len(toks)::DOUBLE)) * 10000.0 + 0.5)
      ELSE 0.0 END AS BIGINT) AS q10k,
    md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS fp
  FROM t),
a AS (SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
    CAST(floor(sum(q10k)::DOUBLE / count(*)) AS BIGINT) AS mean_quality_x10k,
    CAST(count(DISTINCT fp) AS BIGINT) AS n_unique
  FROM r GROUP BY source),
tot AS (SELECT sum(n_tokens) AS total_tokens FROM a)
SELECT source, n_docs, n_tokens, mean_quality_x10k, n_unique,
  CAST(((n_docs - n_unique) * 10000) // n_docs AS BIGINT) AS dup_rate_x10k,
  CAST(CASE WHEN total_tokens > 0 THEN (n_tokens * 10000) // total_tokens
       ELSE 0 END AS BIGINT) AS token_share_x10k
FROM a CROSS JOIN tot"""

    # weight = floor(sqrt(n_tokens)): sqrt is IEEE-correctly-rounded in both
    # engines, so the integer weights (and everything downstream, all
    # integer division) match exactly.
    o["temperature_mix"] = f"""
WITH t AS (SELECT source, CAST(len({tokens}) AS BIGINT) AS n FROM documents),
a AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens FROM t GROUP BY source),
w AS (SELECT source, n_tokens, CAST(floor(sqrt(n_tokens::DOUBLE)) AS BIGINT) AS weight FROM a),
tot AS (SELECT sum(weight) AS tw FROM w),
p AS (SELECT source, n_tokens, weight,
        CAST(CASE WHEN tw > 0 THEN (100000 * weight) // tw ELSE 0 END AS BIGINT) AS target_tokens
      FROM w CROSS JOIN tot)
SELECT source, n_tokens, weight, target_tokens,
  CAST(CASE WHEN n_tokens > 0 THEN least(10000, (target_tokens * 10000) // n_tokens) ELSE 0 END AS BIGINT) AS sample_rate_x10k,
  CAST(CASE WHEN n_tokens > 0 THEN (target_tokens * 10000) // n_tokens ELSE 0 END AS BIGINT) AS epochs_x10k
FROM p"""

    o["bpe_pair_counts"] = f"""
WITH t AS (SELECT {tokens} AS toks FROM documents),
w AS (SELECT unnest(toks) AS tok FROM t),
i AS (SELECT tok, unnest(range(1, length(tok))) AS pos FROM w WHERE length(tok) >= 2)
SELECT substr(tok, pos, 2) AS pair, CAST(count(*) AS BIGINT) AS n_occurrences
FROM i GROUP BY substr(tok, pos, 2) HAVING count(*) >= 2"""

    # BPE encode: the SAME fold of literal replace() calls as the Spark
    # side, generated from the one DEFAULT_BPE_MERGES constant —
    # replace() is left-to-right non-overlapping in both engines, so the
    # chains agree byte-for-byte (see operators/bpe.py module doc).
    from ebook_conversion_to_text_for_machine_learning_spark.operators.bpe import (
        DEFAULT_BPE_MERGES as _BPE_MERGES,
    )

    _O, _C = "\x01", "\x02"

    def _bpe_enc_sql(text_expr: str) -> str:
        stripped = f"replace(replace({text_expr}, '{_O}', ''), '{_C}', '')"
        toks = _SQL_TOKENS.format(col=stripped)
        wrapped = (
            f"array_to_string(list_transform({toks}, "
            f"t -> regexp_replace(t, '(?s)(.)', '{_O}' || '\\1' || '{_C}', 'g')), ' ')"
        )
        out = wrapped
        for a, b in _BPE_MERGES:
            out = f"replace({out}, '{_O}{a}{_C}{_O}{b}{_C}', '{_O}{a}{b}{_C}')"
        return out

    def _bpe_count_sql(enc: str) -> str:
        return f"CAST(len(string_split({enc}, '{_O}')) - 1 AS BIGINT)"

    _bpe_display = (
        f"replace(replace(replace(replace(enc, '{_C} {_O}', ' | '), "
        f"'{_C}{_O}', ' '), '{_O}', ''), '{_C}', '')"
    )
    o["bpe_encode"] = f"""
WITH e AS (SELECT doc_id, {_bpe_enc_sql('text')} AS enc FROM documents)
SELECT doc_id,
  {_bpe_count_sql('enc')} AS n_bpe_tokens,
  {_bpe_display} AS encoded
FROM e"""

    _bts_step, _bts_chunk = 28, 32
    o["bpe_token_stats"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(ceil(len(toks)::DOUBLE / {_bts_step}) AS INT))) AS i
  FROM t WHERE len(toks) > 0),
c AS (
  SELECT doc_id, i,
         array_to_string(toks[i * {_bts_step} + 1 : i * {_bts_step} + {_bts_chunk}], ' ') AS chunk_text,
         CAST(len(toks[i * {_bts_step} + 1 : i * {_bts_step} + {_bts_chunk}]) AS BIGINT) AS n_chunk_tokens
  FROM s)
SELECT doc_id,
  CAST(i AS BIGINT) AS chunk_idx,
  n_chunk_tokens,
  {_bpe_count_sql(_bpe_enc_sql('chunk_text'))} AS n_bpe_chunk_tokens
FROM c"""

    o["domain_affinity"] = f"""
WITH t AS (SELECT doc_id, source, {tokens} AS toks FROM documents),
g AS (SELECT doc_id, source,
        CASE WHEN len(toks) >= 2 THEN
          list_distinct(list_transform(range(1, len(toks)),
                                       i -> array_to_string(toks[i:i+1], ' ')))
        ELSE [] END AS grams
      FROM t),
x AS (SELECT doc_id, source, md5(unnest(grams)) AS gram_hash FROM g),
ctf AS (SELECT gram_hash, CAST(count(*) AS BIGINT) AS tfc FROM x GROUP BY gram_hash),
ttf AS (SELECT gram_hash, CAST(count(*) AS BIGINT) AS tft
        FROM x WHERE source = 'src0' GROUP BY gram_hash),
w AS (SELECT x.doc_id, (coalesce(ttf.tft, 0) * 10000) // ctf.tfc AS w
      FROM x JOIN ctf USING (gram_hash) LEFT JOIN ttf USING (gram_hash)),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(w) // count(*) AS BIGINT) AS affinity
        FROM w GROUP BY doc_id)
SELECT g.doc_id,
  coalesce(n_grams, 0) AS n_grams,
  coalesce(affinity, 0) AS affinity_x10k
FROM g LEFT JOIN agg ON g.doc_id = agg.doc_id"""

    # Funnel stages mirror the Spark query cumulatively; n>=40 subsumes the
    # Spark side's n>0 quality-guard, so the conditions are identical.
    o["quality_filter_funnel"] = f"""
WITH t AS (SELECT lang, {tokens} AS toks FROM documents),
r AS (SELECT lang, len(toks) AS n,
    CASE WHEN len(toks) > 0 THEN
      floor((0.4 * least(1.0, len(toks)::DOUBLE / 50.0)
           + 0.3 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
           + 0.3 * (len(list_filter(toks, x -> list_contains({_STOPWORD_SQL_LIST}, lower(x))))::DOUBLE
                    / len(toks)::DOUBLE)) * 10000.0 + 0.5)
    END AS q10k,
    CASE WHEN len(toks) > 0 THEN
      floor(len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE * 10000.0 + 0.5)
    END AS dr10k
  FROM t),
c AS (SELECT
    CAST(count(*) AS BIGINT) AS c0,
    CAST(coalesce(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 0) AS BIGINT) AS c1,
    CAST(coalesce(sum(CASE WHEN lang = 'en' AND n >= 40 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c2,
    CAST(coalesce(sum(CASE WHEN lang = 'en' AND n >= 40 AND q10k >= 5500 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c3,
    CAST(coalesce(sum(CASE WHEN lang = 'en' AND n >= 40 AND q10k >= 5500 AND dr10k >= 5000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c4
  FROM r)
SELECT CAST(1 AS INT) AS stage_idx, 'lang_en' AS stage, c0 AS n_in, c0 - c1 AS n_dropped, c1 AS n_out FROM c
UNION ALL SELECT 2, 'min_tokens', c1, c1 - c2, c2 FROM c
UNION ALL SELECT 3, 'quality', c2, c2 - c3, c3 FROM c
UNION ALL SELECT 4, 'lexical_diversity', c3, c3 - c4, c4 FROM c"""

    o["corpus_stats"] = f"""
WITH t AS (SELECT lang, text, {tokens} AS toks FROM documents),
g AS (SELECT *,
    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
         i -> array_to_string(toks[i:i+1], ' ')) ELSE [] END AS g2,
    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
         i -> array_to_string(toks[i:i+2], ' ')) ELSE [] END AS g3
  FROM t),
r AS (SELECT lang,
    CAST(len(toks) AS BIGINT) AS n_toks,
    CAST(CASE WHEN len(toks) > 0 THEN
      floor((0.4 * least(1.0, len(toks)::DOUBLE / 50.0)
           + 0.3 * (len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE)
           + 0.3 * (len(list_filter(toks, x -> list_contains({_STOPWORD_SQL_LIST}, lower(x))))::DOUBLE
                    / len(toks)::DOUBLE)) * 10000.0 + 0.5)
      ELSE 0.0 END AS BIGINT) AS q10k,
    CASE WHEN
      (len(g2) > 0 AND coalesce(list_aggregate(list_transform(list_distinct(g2),
          d -> len(list_filter(g2, x -> x = d))), 'max'), 0) * 100 > {T.TOP_2GRAM_PCT} * len(g2))
      OR (len(g3) > 0 AND coalesce(list_aggregate(list_filter(list_transform(list_distinct(g3),
          d -> len(list_filter(g3, x -> x = d))), c -> c > 1), 'sum'), 0) * 100 > {T.DUP_3GRAM_PCT} * len(g3))
    THEN 1 ELSE 0 END AS rep
  FROM g)
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
  CAST(floor(sum(q10k)::DOUBLE / count(*)) AS BIGINT) AS mean_quality_x10k,
  CAST(sum(rep) AS BIGINT) AS n_repetitive
FROM r GROUP BY lang"""

    o["exact_dedup"] = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)"""

    o["line_dedup"] = """
WITH dec AS (
  SELECT d.doc_id, d.text || chr(10) || s.text AS text
  FROM documents d JOIN documents s ON d.doc_id % 50 = s.doc_id AND s.doc_id < 50),
l0 AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM dec),
l AS (SELECT doc_id, unnest(range(0, len(lines))) AS line_idx, lines FROM l0),
lx AS (SELECT doc_id, CAST(line_idx AS BIGINT) AS line_idx, lines[line_idx + 1] AS line FROM l),
k AS (SELECT doc_id, line_idx, line,
        row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_idx) = 1 AS keep
      FROM lx)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY line_idx), '') AS kept_text
FROM k GROUP BY doc_id"""

    # width=8 token windows at stride 1; Spark's F.slice(toks, i, 8) ==
    # DuckDB's toks[i:i+7] (both 1-based, 8 elements).
    o["repeated_passages"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
w AS (SELECT doc_id,
        unnest(list_transform(range(1, len(toks) - 6),
                              i -> md5(array_to_string(toks[i:i+7], ' ')))) AS passage_hash
      FROM t WHERE len(toks) >= 8)
SELECT passage_hash,
  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_occurrences,
  min(doc_id) AS first_doc
FROM w GROUP BY passage_hash HAVING count(DISTINCT doc_id) >= 2"""

    o["gram_novelty"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
g AS (SELECT doc_id,
        CASE WHEN len(toks) >= 3 THEN
          list_distinct(list_transform(range(1, len(toks) - 1),
                                       i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [] END AS grams
      FROM t),
x AS (SELECT doc_id, md5(unnest(grams)) AS gram_hash FROM g),
fo AS (SELECT gram_hash, min(doc_id) AS first_doc FROM x GROUP BY gram_hash),
agg AS (SELECT x.doc_id,
          CAST(count(*) AS BIGINT) AS n_grams,
          CAST(sum(CASE WHEN x.doc_id = fo.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM x JOIN fo USING (gram_hash) GROUP BY x.doc_id)
SELECT g.doc_id,
  coalesce(n_grams, 0) AS n_grams,
  coalesce(n_novel, 0) AS n_novel,
  CAST(CASE WHEN coalesce(n_grams, 0) > 0 THEN (n_novel * 10000) // n_grams ELSE 0 END AS BIGINT) AS novelty_x10k
FROM g LEFT JOIN agg ON g.doc_id = agg.doc_id"""

    o["decontaminate"] = f"""
WITH t AS (SELECT doc_id, {tokens} AS toks FROM documents),
g AS (SELECT doc_id,
        CASE WHEN len(toks) >= 3 THEN
          list_distinct(list_transform(range(1, len(toks) - 1),
                                       i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [] END AS grams
      FROM t),
e AS (SELECT DISTINCT unnest(grams) AS g FROM g WHERE doc_id % 97 = 0),
hits AS (SELECT doc_id, unnest(grams) AS g FROM g),
h AS (SELECT hits.doc_id, count(*) AS n_hit FROM hits JOIN e ON hits.g = e.g GROUP BY hits.doc_id)
SELECT g.doc_id,
  CAST(len(grams) AS BIGINT) AS n_grams,
  CAST(coalesce(n_hit, 0) AS BIGINT) AS n_contaminated,
  (len(grams) > 0 AND coalesce(n_hit, 0) * 100 >= 10 * len(grams)) AS contaminated
FROM g LEFT JOIN h ON g.doc_id = h.doc_id"""

    # The join path computes the identical quantity (shingles are distinct
    # per doc, so semi-join hit count == intersection size) — same oracle.
    o["decontaminate_join"] = o["decontaminate"]

    o["minhash_signatures"] = f"""
WITH {_sql_minhash_sig_cte()}
SELECT * FROM sig"""

    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, sig_{2*b} || '|' || sig_{2*b+1} AS bucket FROM sig"
        for b in range(D.MINHASH_K // D.BAND_SIZE)
    )
    o["minhash_candidates"] = f"""
WITH {_sql_minhash_sig_cte()},
bands AS ({band_selects})
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM bands l JOIN bands r
  ON l.band_id = r.band_id AND l.bucket = r.bucket AND l.doc_id < r.doc_id"""

    o["minhash_verified_dedup"] = f"""
WITH {_sql_minhash_sig_cte()},
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b,
    CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_common,
    CAST(len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS n_union
  FROM cand c
  JOIN grams_t ga ON ga.doc_id = c.doc_a
  JOIN grams_t gb ON gb.doc_id = c.doc_b)
SELECT * FROM verified WHERE 2 * n_common >= n_union"""

    o["source_dedup_matrix"] = f"""
WITH {_sql_minhash_sig_cte()},
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
ok AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN grams_t ga ON ga.doc_id = c.doc_a
  JOIN grams_t gb ON gb.doc_id = c.doc_b
  WHERE 2 * len(list_intersect(ga.grams, gb.grams))
        >= len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams)))
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM ok
JOIN documents da ON da.doc_id = ok.doc_a
JOIN documents db ON db.doc_id = ok.doc_b
GROUP BY 1, 2"""

    # Index-vs-batch twin of minhash_verified_dedup: same hash family,
    # same acceptance rule, but candidates pair the % 3 == 0 batch
    # against the % 3 != 0 indexed corpus instead of self-joining. The
    # oracle recomputes both sides straight from the documents table —
    # the Spark path goes through the parquet index round trip, so
    # agreement proves persistence changes nothing. n_union > 0 mirrors
    # the Spark side's inner join through the gram tables (a gram-less
    # doc has no gram rows and never reports).
    o["dedup_against_index"] = f"""
WITH {_sql_minhash_sig_cte()},
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT b.doc_id AS doc_id, i.doc_id AS dup_of
  FROM bands b JOIN bands i
    ON b.band_id = i.band_id AND b.bucket = i.bucket
  WHERE b.doc_id % 3 = 0 AND i.doc_id % 3 != 0),
verified AS (
  SELECT c.doc_id, c.dup_of,
    CAST(len(list_intersect(gb.grams, gi.grams)) AS BIGINT) AS n_common,
    CAST(len(gb.grams) + len(gi.grams) - len(list_intersect(gb.grams, gi.grams)) AS BIGINT) AS n_union
  FROM cand c
  JOIN grams_t gb ON gb.doc_id = c.doc_id
  JOIN grams_t gi ON gi.doc_id = c.dup_of)
SELECT * FROM verified WHERE 2 * n_common >= n_union AND n_union > 0"""

    # Probe-only bench twin — same batch, same index contents, same
    # decisions by construction, so the oracle is the same recomputation.
    o["dedup_index_probe"] = o["dedup_against_index"]

    o["ngram_jaccard"] = f"""
WITH t AS (SELECT doc_id, lang, list_distinct({tokens}) AS grams FROM documents)
SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
  CAST(len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_common,
  CAST(len(list_distinct(list_concat(l.grams, r.grams))) AS BIGINT) AS n_union
FROM t l JOIN t r ON l.lang = r.lang AND l.doc_id < r.doc_id
WHERE 2 * len(list_intersect(l.grams, r.grams)) >= len(list_distinct(list_concat(l.grams, r.grams)))"""

    # 64-bit SimHash: bit j reads nibble j//2 of md5 (8-bit for even j,
    # 4-bit for odd), mirroring D.simhash_vote; the signed value assembly
    # mirrors D.simhash_signatures (bit 0 contributes -2^63). The Spark
    # side computes the same bits via word-unpacked shift/AND arithmetic —
    # equivalent by 2·s > n ⇔ vote-sum > 0.
    bit_sums = ",\n  ".join(
        "SUM(CASE WHEN ((strpos('0123456789abcdef', substr(hx, %d, 1)) - 1) & %d) != 0 "
        "THEN 1 ELSE -1 END) AS b%d" % (j // 2 + 1, 8 if j % 2 == 0 else 4, j)
        for j in range(D.SIMHASH_BITS)
    )
    bit_value = " + ".join(
        ["(CASE WHEN b0 > 0 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)"]
        + [
            f"(CASE WHEN b{j} > 0 THEN CAST({1 << (D.SIMHASH_BITS - 1 - j)} AS BIGINT) ELSE 0 END)"
            for j in range(1, D.SIMHASH_BITS)
        ]
    )
    _sig_ctes = f"""
t AS (SELECT doc_id, unnest(list_distinct({tokens_lower})) AS tok FROM documents),
h AS (SELECT doc_id, md5(tok) AS hx FROM t),
s AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
sig0 AS (SELECT doc_id, CAST({bit_value} AS BIGINT) AS simhash FROM s),
sig AS (
  SELECT d.doc_id, COALESCE(sig0.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig0 ON sig0.doc_id = d.doc_id)"""

    o["simhash_signatures"] = f"""
WITH {_sig_ctes}
SELECT doc_id, simhash FROM sig"""

    n_blocks = _SIMHASH_MAX_HAMMING + 1  # pigeonhole: h flips hit ≤ h blocks
    width = D.SIMHASH_BITS // n_blocks
    block_rows = ", ".join(
        f"({b}, {b * width}, {D.SIMHASH_BITS - b * width if b == n_blocks - 1 else width})"
        for b in range(n_blocks)
    )
    o["simhash_near_pairs"] = f"""
WITH {_sig_ctes},
blocks(block_id, lo, w) AS (VALUES {block_rows}),
banded AS (
  SELECT doc_id, simhash, block_id,
         (simhash >> lo) & ((1::BIGINT << w) - 1) AS block_val
  FROM sig CROSS JOIN blocks)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
  CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
FROM banded l JOIN banded r
  ON l.block_id = r.block_id AND l.block_val = r.block_val AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= {_SIMHASH_MAX_HAMMING}"""

    # Connected components over the same near-pair graph: transitive
    # closure via a recursive CTE (min reachable id per node) — the SQL
    # twin of the Spark label-propagation loop in dedup.dedup_components.
    o["dedup_components"] = f"""
WITH RECURSIVE {_sig_ctes},
blocks(block_id, lo, w) AS (VALUES {block_rows}),
banded AS (
  SELECT doc_id, simhash, block_id,
         (simhash >> lo) & ((1::BIGINT << w) - 1) AS block_val
  FROM sig CROSS JOIN blocks),
np AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
  FROM banded l JOIN banded r
    ON l.block_id = r.block_id AND l.block_val = r.block_val AND l.doc_id < r.doc_id
  WHERE bit_count(xor(l.simhash, r.simhash)) <= {_SIMHASH_MAX_HAMMING}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM np
          UNION ALL SELECT doc_b, doc_a FROM np),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a)
SELECT node AS doc_id,
  CAST(min(r) AS BIGINT) AS component,
  min(r) = node AS is_keeper
FROM reach GROUP BY node"""

    cosine = _SQL_COSINE.format(p="p.embedding", c="c.embedding")
    o["cosine_topk"] = f"""
WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS item_id, {cosine} AS cosine
  FROM probes p JOIN embeddings c ON c.vec_id != p.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, item_id) AS rnk
  FROM pairs)
SELECT probe_id, item_id, cosine, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5"""

    # kNN vote over the exact top-5: identical ranked CTE as cosine_topk,
    # then a (probe, label) count with (n_votes DESC, label ASC) as the
    # deterministic modal tie-break — the same rule the Spark window uses.
    o["knn_label_vote"] = f"""
WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS item_id, {cosine} AS cosine
  FROM probes p JOIN embeddings c ON c.vec_id != p.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, item_id) AS rnk
  FROM pairs),
votes AS (
  SELECT r.probe_id, e.label, CAST(count(*) AS BIGINT) AS n_votes
  FROM ranked r JOIN embeddings e ON e.vec_id = r.item_id
  WHERE r.rnk <= 5 GROUP BY 1, 2),
best AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY n_votes DESC, label) AS vr
  FROM votes)
SELECT probe_id, CAST(label AS BIGINT) AS pred_label, n_votes
FROM best WHERE vr = 1"""

    o["pq_codes"] = f"""
WITH {_sql_pq_ctes()}
SELECT vec_id, CAST(s AS INT) AS subspace, CAST(code AS INT) AS code FROM codes"""

    o["pq_ann_topk"] = f"""
WITH {_sql_pq_ctes()},
pt AS (SELECT vec_id AS probe_id, s, code, q FROM d WHERE vec_id < 10),
adc AS (
  SELECT pt.probe_id, c.vec_id AS item_id, CAST(sum(pt.q) AS BIGINT) AS adc_x10k
  FROM codes c JOIN pt ON pt.s = c.s AND pt.code = c.code
  WHERE c.vec_id != pt.probe_id
  GROUP BY pt.probe_id, c.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adc_x10k, item_id) AS rnk
  FROM adc)
SELECT probe_id, item_id, adc_x10k, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5"""

    o["pq_rerank_topk"] = f"""
WITH {_sql_pq_ctes()},
pt AS (SELECT vec_id AS probe_id, s, code, q FROM d WHERE vec_id < 10),
adc AS (
  SELECT pt.probe_id, c.vec_id AS item_id, CAST(sum(pt.q) AS BIGINT) AS adc_x10k
  FROM codes c JOIN pt ON pt.s = c.s AND pt.code = c.code
  WHERE c.vec_id != pt.probe_id
  GROUP BY pt.probe_id, c.vec_id),
sl AS (
  SELECT probe_id, item_id FROM (
    SELECT probe_id, item_id, row_number() OVER (PARTITION BY probe_id ORDER BY adc_x10k, item_id) AS rnk
    FROM adc) WHERE rnk <= 25),
pairs AS (
  SELECT sl.probe_id, sl.item_id,
         {_SQL_COSINE.format(p="pe.embedding", c="ce.embedding")} AS cosine
  FROM sl
  JOIN embeddings pe ON pe.vec_id = sl.probe_id
  JOIN embeddings ce ON ce.vec_id = sl.item_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, item_id) AS rnk
  FROM pairs)
SELECT probe_id, item_id, cosine, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5"""

    o["lsh_signatures"] = f"""
SELECT vec_id, {_sql_lsh_bucket("embedding")} AS bucket FROM embeddings"""

    o["lsh_ann_topk"] = f"""
WITH banded AS ({_sql_banded_bucket_selects("embeddings")}),
cand AS (
  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS item_id
  FROM banded p JOIN banded c
    ON c.band_id = p.band_id AND c.bucket = p.bucket AND c.vec_id != p.vec_id
  WHERE p.vec_id < 10),
pairs AS (
  SELECT cand.probe_id, cand.item_id,
         {_SQL_COSINE.format(p="pe.embedding", c="ce.embedding")} AS cosine
  FROM cand
  JOIN embeddings pe ON pe.vec_id = cand.probe_id
  JOIN embeddings ce ON ce.vec_id = cand.item_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, item_id) AS rnk
  FROM pairs)
SELECT probe_id, item_id, cosine, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5"""

    ivf_assign_ctes = f"""
cent AS (SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
         WHERE vec_id % (SELECT greatest(1, count(*) // {_IVF_TEST_CELLS}) FROM embeddings) = 0),
scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_SQL_COSINE.format(p="e.embedding", c="c.cvec")} AS cos
  FROM embeddings e CROSS JOIN cent c),
assign AS (
  SELECT vec_id, embedding, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS crnk
  FROM scored)"""

    o["ivf_cells"] = f"""
WITH {ivf_assign_ctes}
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(centroid_id AS BIGINT) AS cell_id
FROM assign WHERE crnk = 1"""

    # IVFADC: IVF cells (crnk=1 per item; crnk<=nprobe=2 per probe) prune
    # the candidate set, PQ codes score it with exact-integer ADC sums,
    # exact cosine re-ranks the top-25 shortlist. Candidates need no
    # DISTINCT: an item's single cell matches at most one of a probe's
    # probed cells, and a duplicate row would double the ADC join — both
    # engines rely on the same uniqueness.
    o["ivfpq_topk"] = f"""
WITH {ivf_assign_ctes},
cellt AS (SELECT vec_id, centroid_id AS cell_id FROM assign WHERE crnk = 1),
pcells AS (SELECT vec_id AS probe_id, centroid_id AS probe_cell
           FROM assign WHERE vec_id < 10 AND crnk <= 2),
{_sql_pq_ctes().lstrip()},
pt AS (SELECT vec_id AS probe_id, s, code, q FROM d WHERE vec_id < 10),
cand AS (
  SELECT pc.probe_id, ct.vec_id AS item_id
  FROM cellt ct JOIN pcells pc ON ct.cell_id = pc.probe_cell
  WHERE ct.vec_id != pc.probe_id),
adc AS (
  SELECT cand.probe_id, cand.item_id, CAST(sum(pt.q) AS BIGINT) AS adc_x10k
  FROM cand
  JOIN codes c ON c.vec_id = cand.item_id
  JOIN pt ON pt.probe_id = cand.probe_id AND pt.s = c.s AND pt.code = c.code
  GROUP BY cand.probe_id, cand.item_id),
sl AS (
  SELECT probe_id, item_id FROM (
    SELECT probe_id, item_id, row_number() OVER (PARTITION BY probe_id ORDER BY adc_x10k, item_id) AS rnk
    FROM adc) WHERE rnk <= 25),
pairs AS (
  SELECT sl.probe_id, sl.item_id,
         {_SQL_COSINE.format(p="pe.embedding", c="ce.embedding")} AS cosine
  FROM sl
  JOIN embeddings pe ON pe.vec_id = sl.probe_id
  JOIN embeddings ce ON ce.vec_id = sl.item_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, item_id) AS rnk
  FROM pairs)
SELECT probe_id, item_id, cosine, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5"""

    # Unrolled spherical k-means: each iteration assigns against the
    # previous codebook (same round-4 / min-id ranking as every IVF
    # oracle), takes the per-cell elementwise mean of the L2-NORMALIZED
    # members (two zip-unnests: component value + 1-based position),
    # rounds components to 6 decimals — the same quantization the Spark
    # side applies, which is what keeps both engines iterating from
    # identical codebooks — and keeps the old centroid for any cell that
    # captured no members.
    def _km_iter(prev: str, n: int) -> str:
        return f"""
scored{n} AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_SQL_COSINE.format(p="e.embedding", c="c.cvec")} AS cos
  FROM embeddings e CROSS JOIN {prev} c),
assign{n} AS (
  SELECT vec_id, embedding, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS crnk
  FROM scored{n}),
memb{n} AS (
  SELECT centroid_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM assign{n} WHERE crnk = 1),
unit{n} AS (
  SELECT centroid_id,
         unnest(list_transform(e, x -> x / (CASE WHEN nrm = 0 THEN 1 ELSE nrm END))) AS val,
         unnest(range(1, {EMBED_DIM + 1})) AS pos
  FROM memb{n}),
mean{n} AS (
  SELECT centroid_id, pos, round(sum(val) / count(*), 6) AS mval
  FROM unit{n} GROUP BY 1, 2),
cent{n} AS (
  SELECT centroid_id, list(mval ORDER BY pos) AS cvec FROM mean{n} GROUP BY 1
  UNION ALL
  SELECT centroid_id, cvec::DOUBLE[] AS cvec FROM {prev}
  WHERE centroid_id NOT IN (SELECT centroid_id FROM mean{n}))"""

    _km_final_assign = f"""
scoredF AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_SQL_COSINE.format(p="e.embedding", c="c.cvec")} AS cos
  FROM embeddings e CROSS JOIN cent2 c),
assignF AS (
  SELECT vec_id, embedding, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_id) AS crnk
  FROM scoredF)"""

    _km_ctes = f"""cent0 AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
  WHERE vec_id % (SELECT greatest(1, count(*) // {_IVF_TEST_CELLS}) FROM embeddings) = 0),
{_km_iter("cent0", 1)},
{_km_iter("cent1", 2)},
{_km_final_assign}"""

    o["ivf_kmeans_cells"] = f"""
WITH {_km_ctes}
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(centroid_id AS BIGINT) AS cell_id
FROM assignF WHERE crnk = 1"""


    o["ivf_ann_topk"] = f"""
WITH {ivf_assign_ctes},
cells AS (SELECT vec_id, embedding, centroid_id AS cell_id FROM assign WHERE crnk = 1),
probe_cells AS (
  SELECT vec_id, embedding, centroid_id AS cell_id FROM assign
  WHERE crnk <= {S.IVF_NPROBE} AND vec_id < 10),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS item_id,
         {_SQL_COSINE.format(p="p.embedding", c="c.embedding")} AS cosine
  FROM probe_cells p JOIN cells c ON c.cell_id = p.cell_id AND c.vec_id != p.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, item_id) AS rnk
  FROM pairs)
SELECT probe_id, item_id, cosine, CAST(rnk AS INT) AS rank FROM ranked WHERE rnk <= 5"""

    # Persisted-index round trips must reproduce the live paths exactly —
    # same oracles, proving the parquet round trip changes nothing.
    o["lsh_ann_topk_indexed"] = o["lsh_ann_topk"]
    o["ivf_ann_topk_indexed"] = o["ivf_ann_topk"]

    o["embedding_near_dup"] = f"""
WITH banded AS ({_sql_banded_bucket_selects("embeddings")}),
cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b
  FROM banded l JOIN banded r
    ON l.band_id = r.band_id AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
SELECT c.vec_a, c.vec_b,
       {_SQL_COSINE.format(p="a.embedding", c="b.embedding")} AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings b ON b.vec_id = c.vec_b
WHERE {_SQL_COSINE.format(p="a.embedding", c="b.embedding")} >= 0.25"""

    # SemDeDup from scratch: the same stride-sampled IVF assignment CTEs,
    # then a within-cell self-join marks every row that has a lower-id
    # neighbor at round(cosine,4) >= tau in its own cell. The dup rule
    # has ONE definition, parameterized on the assignment CTE, so the
    # stride and k-means variants can never desynchronize.
    def _semdedup_tail(assign_cte: str) -> str:
        return f"""
cells AS (SELECT vec_id, embedding, centroid_id AS cell_id FROM {assign_cte} WHERE crnk = 1),
dup AS (
  SELECT DISTINCT r.vec_id
  FROM cells l JOIN cells r ON l.cell_id = r.cell_id AND l.vec_id < r.vec_id
  WHERE {_SQL_COSINE.format(p="l.embedding", c="r.embedding")} >= 0.35)
SELECT CAST(c.vec_id AS BIGINT) AS vec_id, CAST(c.cell_id AS BIGINT) AS cell_id,
       (d.vec_id IS NOT NULL) AS is_semantic_dup
FROM cells c LEFT JOIN dup d ON d.vec_id = c.vec_id"""

    o["semantic_dedup"] = f"""
WITH {ivf_assign_ctes},
{_semdedup_tail("assign")}"""

    # Composed path: the refined codebook's cells feed the SHARED
    # within-cell min-id-witness dup rule (_semdedup_tail) after the
    # unrolled two-iteration Lloyd refinement (_km_ctes).
    o["semantic_dedup_kmeans"] = f"""
WITH {_km_ctes},
{_semdedup_tail("assignF")}"""

    # Byte-exact framing: slice the hex encoding (2 chars/byte) so offsets
    # and the md5 fingerprint operate on BYTES in both engines even when
    # the payload's UTF-8 runs are multi-byte (a char-based substring would
    # drift); the Spark side fingerprints md5(hex(frame)) to match.
    o["frame_samples"] = f"""
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents),
f AS (
  SELECT media_id, hx,
         unnest(range(0, least({M.MAX_FRAMES}, CAST(floor((n - 1) / {M.FRAME_STRIDE}) AS INT) + 1))) AS i
  FROM t WHERE n > 0)
SELECT media_id, 'image' AS media_type,
  CAST(i AS INT) AS frame_idx,
  CAST(i * {M.FRAME_STRIDE} AS BIGINT) AS frame_offset,
  CAST(length(substr(hx, i * {M.FRAME_STRIDE} * 2 + 1, {M.FRAME_SIZE} * 2)) // 2 AS BIGINT) AS frame_bytes,
  md5(substr(hx, i * {M.FRAME_STRIDE} * 2 + 1, {M.FRAME_SIZE} * 2)) AS frame_md5
FROM f"""

    _resize_target = 8 * 8
    o["resize_media"] = f"""
SELECT CAST(doc_id AS VARCHAR) AS media_id,
  CAST(8 AS INT) AS target_w, CAST(8 AS INT) AS target_h,
  CAST({_resize_target} AS BIGINT) AS resized_bytes,
  md5(rpad(substr(hex(encode(text)), 1, {_resize_target * 2}), {_resize_target * 2}, '0')) AS resized_md5,
  'stub_resized' AS status
FROM documents"""

    o["transcript_enrichment"] = """
SELECT doc_id, 'line' AS kind, text, '' AS media_ref, CAST(0 AS INT) AS span_offset
FROM documents
UNION ALL
SELECT doc_id, 'img' AS kind,
  CASE WHEN doc_id % 2 = 0 THEN upper(substr(text, 1, 20)) ELSE '' END AS text,
  'img-' || doc_id AS media_ref, CAST(1 AS INT) AS span_offset
FROM documents"""

    o["media_features"] = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
  'image' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
  CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) % 2147483648 AS BIGINT) AS byte_sum_mod,
  'stub_decoded' AS status
FROM documents"""

    o["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 1) AS sum_qty,
  round(sum(l_extendedprice), 1) AS sum_base_price,
  round(sum(l_extendedprice * (1.0 - l_discount)), 1) AS sum_disc_price,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""

    o["nation_revenue"] = """
SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
  round(sum(o.o_totalprice), 1) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""

    o["top_events_per_user"] = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
  FROM events)
SELECT user_id, event_id, event_type, value, CAST(rnk AS INT) AS rank
FROM ranked WHERE rnk <= 3"""

    o["sessionization"] = """
WITH e AS (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS tsec FROM events),
l AS (SELECT *, lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS prev FROM e),
s AS (SELECT *, CASE WHEN prev IS NULL OR tsec - prev > 1800 THEN 1 ELSE 0 END AS is_new FROM l),
c AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsec, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM s)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events, MIN(tsec) AS first_ts
FROM c GROUP BY user_id, session_idx"""

    o["event_funnel"] = """
WITH e AS (SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS tsec FROM events),
s1 AS (SELECT user_id, min(tsec) AS t FROM e WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.tsec) AS t FROM e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.tsec > s1.t GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.tsec) AS t FROM e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.tsec > s2.t GROUP BY e.user_id),
c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS c1,
             (SELECT CAST(count(*) AS BIGINT) FROM s2) AS c2,
             (SELECT CAST(count(*) AS BIGINT) FROM s3) AS c3)
SELECT CAST(1 AS INT) AS step_idx, 'view' AS step, c1 AS n_users, CAST(10000 AS BIGINT) AS conv_from_prev_x10k FROM c
UNION ALL SELECT 2, 'click', c2, CAST(CASE WHEN c1 > 0 THEN (c2 * 10000) // c1 ELSE 0 END AS BIGINT) FROM c
UNION ALL SELECT 3, 'purchase', c3, CAST(CASE WHEN c2 > 0 THEN (c3 * 10000) // c2 ELSE 0 END AS BIGINT) FROM c"""

    o["asof_latest_order"] = """
WITH e AS (SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS tsec FROM events),
o AS (SELECT o_custkey, epoch(o_orderdate)::BIGINT AS otsec FROM orders)
SELECT e.event_id, e.user_id,
       MAX(o.otsec) AS latest_order_ts,
       CAST(count(*) AS BIGINT) AS n_prior_orders
FROM e JOIN o ON o.o_custkey = e.user_id AND o.otsec <= e.tsec
GROUP BY e.event_id, e.user_id"""

    o["pivot_event_counts"] = """
SELECT user_id,
  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY user_id"""

    o["events_hourly"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts, event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2"""

    # quantile_cont shares Spark percentile()'s (n-1)p interpolation —
    # verified to agree to 4dp on this table before registration.
    o["events_percentiles"] = """
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  round(quantile_cont(value, 0.5), 4) AS p50_value,
  round(quantile_cont(value, 0.95), 4) AS p95_value,
  round(max(value), 4) AS max_value
FROM events
GROUP BY 1"""

    return o
