"""BPE merge application: encode semantics, trainer, chunk wiring."""

from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.operators.bpe import (
    DEFAULT_BPE_MERGES,
    bpe_apply_col,
    bpe_display_col,
    bpe_encode,
    bpe_token_count_col,
    bpe_wrap_col,
    train_bpe_merges,
)


def _one(spark, text, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_bpe_encode_known_merges(spark):
    """Rank-order application with left-to-right non-overlap: 'banana'
    under merges (a,n),(an,an) → b an an a → b anan a."""
    df = spark.createDataFrame([(1, "banana split")], "doc_id long, text string")
    out = bpe_encode(df, [("a", "n"), ("an", "an"), ("s", "p")]).collect()[0]
    assert out.encoded == "b anan a | sp l i t"
    assert out.n_bpe_tokens == 7


def test_bpe_overlap_is_left_to_right(spark):
    """'aaa' with merge (a,a): the reference semantics give (aa, a), not
    (a, aa) — left-to-right non-overlapping replacement."""
    df = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    out = bpe_encode(df, [("a", "a")]).collect()[0]
    assert out.encoded == "aa a"


def test_bpe_never_merges_across_words(spark):
    df = spark.createDataFrame([(1, "ab ba")], "doc_id long, text string")
    # (b,b) is adjacent only across the word boundary — must not apply
    out = bpe_encode(df, [("b", "b")]).collect()[0]
    assert out.encoded == "a b | b a"
    assert out.n_bpe_tokens == 4


def test_bpe_empty_and_marker_stripping(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "\x01ab\x02")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_encode(df, [("a", "b")]).collect()}
    assert rows[1].n_bpe_tokens == 0 and rows[1].encoded == ""
    # markers in input are stripped before wrapping, not interpreted
    assert rows[2].encoded == "ab" and rows[2].n_bpe_tokens == 1


def test_train_bpe_merges_greedy_order(spark):
    """Most frequent pair merges first; later rounds see merged symbols.
    Corpus 'low low lowest': (l,o) count 3 wins, then (lo,w) count 3."""
    df = spark.createDataFrame(
        [(1, "low low lowest")], "doc_id long, text string"
    )
    merges = train_bpe_merges(df, n_merges=3, min_count=2)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # encode with the learned merges: 'low' is one symbol now
    out = bpe_encode(df, merges).collect()[0]
    assert out.encoded.startswith("low | low | low")


def test_chunk_documents_bpe_counts_are_additive(spark):
    """Word-aligned chunk boundaries make per-chunk BPE counts sum to
    the document count at overlap=0 (BPE never merges across words)."""
    from ebook_conversion_to_text_for_machine_learning_spark.operators.curation import (
        chunk_documents,
        pack_sequences,
    )

    words = " ".join(["vector order customer filter batch"] * 7)
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    doc_n = _one(spark, words, bpe_token_count_col(F.lit(words), DEFAULT_BPE_MERGES))
    chunks = chunk_documents(
        df, chunk_tokens=8, overlap=0, bpe_merges=DEFAULT_BPE_MERGES
    )
    rows = chunks.collect()
    assert sum(r.n_bpe_chunk_tokens for r in rows) == doc_n
    # and every one of these real words compresses below its char count
    assert all(r.n_bpe_chunk_tokens < len(r.chunk_text.replace(" ", "")) for r in rows)

    # pack_sequences budgets directly on the BPE counts
    packed = pack_sequences(
        chunks.withColumn("split", F.lit("train")),
        budget=16,
        n_shards=2,
        count_col="n_bpe_chunk_tokens",
    ).collect()
    assert {r.n_tokens for r in packed} == {r.n_bpe_chunk_tokens for r in rows}


def test_wrap_display_round_trip(spark):
    """display(wrap(text)) with no merges = chars space-joined, words
    '|'-separated."""
    df = spark.range(1)
    enc = bpe_display_col(bpe_apply_col(bpe_wrap_col(F.lit("hi yo")), []))
    assert df.select(enc.alias("v")).collect()[0].v == "h i | y o"
