"""BPE merge application — the encode half of byte-pair tokenization.

``text_stats.bpe_pair_counts`` is the distributed *counting* pass of BPE
vocab induction; this module closes the loop: ``train_bpe_merges`` runs
the driver-side greedy argmax over per-iteration pair counts to produce
a merge list, and ``bpe_apply_col`` / ``bpe_encode`` apply a fixed merge
list to encode text — so ``chunk_documents`` / ``pack_sequences`` can
budget in *real tokenizer tokens* instead of whitespace proxies.

Engine extension beyond the reference (the reference repo tokenizes
nothing); the algorithm is the public BPE of Sennrich et al. 2015
(arXiv:1508.07909): merges applied in rank order, each replacing all
non-overlapping occurrences left-to-right.

Representation (the part that makes this pure JVM expressions, no UDF):
a text is encoded as its whitespace tokens joined by ``" "``, each
symbol wrapped as ``\\x01<symbol>\\x02``. A merge ``(a, b)`` is then ONE
literal ``replace`` of ``\\x01a\\x02\\x01b\\x02`` with ``\\x01ab\\x02``:

- the full wrapping makes cross-symbol false matches impossible
  (``\\x01b\\x02`` never matches inside ``\\x01ab\\x02``),
- the bare space between tokens breaks adjacency, so merges never cross
  word boundaries (standard BPE pre-tokenization),
- ``replace`` is left-to-right non-overlapping in both Spark
  (UTF8String.replace) and DuckDB — exactly the reference BPE
  application order — so the DuckDB oracle is the *same* chain of
  ``replace()`` calls, not a reimplementation.

Applying M merges is M literal-string scans per document inside
whole-stage codegen — O(M·len), shuffle-free, and constant in the
corpus (the merge table is a model artifact, like a tokenizer's
merges.txt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ebook_conversion_to_text_for_machine_learning_spark.operators.text_stats import (
    tokens_col,
)

#: Symbol open / close markers. Stripped from input text first, so they
#: can never occur inside a symbol.
SYM_OPEN = "\x01"
SYM_CLOSE = "\x02"

#: Merge list trained by ``train_bpe_merges`` on the sf0.01 documents
#: corpus (n_merges=48, min_count=2) and frozen as the published vocab
#: artifact — the registered ``bpe_encode`` query and its DuckDB oracle
#: both derive their replace chains from this one constant, the same way
#: a production pipeline ships a tokenizer's merges.txt.
DEFAULT_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'), ('s', 't'), ('m', 'er'),
    ('a', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('j', 'o'), ('jo', 'in'),
    ('a', 's'), ('as', 'h'), ('h', 'ash'), ('r', 'ow'), ('at', 'c'),
    ('atc', 'h'), ('b', 'atch'), ('a', 'n'), ('c', 'an'), ('s', 'can'),
    ('c', 'o'), ('c', 'u'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n'),
    ('cu', 'st'), ('cust', 'o'), ('custo', 'mer'), ('f', 'i'), ('fi', 'l'),
    ('fil', 't'), ('filt', 'er'), ('a', 'l'), ('al', 'l'), ('m', 'all'),
    ('s', 'mall'), ('g', 'e'), ('l', 'ow'), ('mer', 'ge'), ('s', 'low'),
    ('c', 't'), ('ct', 'or'), ('d', 'er'), ('e', 'ctor'), ('or', 'der'),
    ('v', 'ector'),
)


def bpe_wrap_col(text: Column) -> Column:
    """Initial character-level encoding of ``text`` (see module doc)."""
    clean = F.replace(
        F.replace(text, F.lit(SYM_OPEN), F.lit("")), F.lit(SYM_CLOSE), F.lit("")
    )
    wrapped_tok = lambda t: F.regexp_replace(  # noqa: E731
        t, "(?s)(.)", SYM_OPEN + "$1" + SYM_CLOSE
    )
    return F.array_join(F.transform(tokens_col(clean), wrapped_tok), " ")


def bpe_apply_col(wrapped: Column, merges) -> Column:
    """Fold a merge list over a wrapped encoding — one literal replace
    per merge, in rank order."""
    out = wrapped
    for a, b in merges:
        out = F.replace(
            out,
            F.lit(SYM_OPEN + a + SYM_CLOSE + SYM_OPEN + b + SYM_CLOSE),
            F.lit(SYM_OPEN + a + b + SYM_CLOSE),
        )
    return out


def bpe_token_count_col(text: Column, merges) -> Column:
    """Real-tokenizer token count of ``text`` under ``merges`` — the
    count ``pack_sequences`` budgets should use once a vocab exists.
    ``n_symbols = occurrences of SYM_OPEN`` in the encoded form."""
    enc = bpe_apply_col(bpe_wrap_col(text), merges)
    return (F.size(F.split(enc, SYM_OPEN)) - 1).cast("long")


def bpe_display_col(enc: Column) -> Column:
    """Human-readable form of an encoding: symbols space-separated,
    token boundaries marked ``|`` — literal replaces only, so the oracle
    reproduces it with the same calls."""
    out = F.replace(enc, F.lit(SYM_CLOSE + " " + SYM_OPEN), F.lit(" | "))
    out = F.replace(out, F.lit(SYM_CLOSE + SYM_OPEN), F.lit(" "))
    out = F.replace(out, F.lit(SYM_OPEN), F.lit(""))
    return F.replace(out, F.lit(SYM_CLOSE), F.lit(""))


def bpe_encode(df: DataFrame, merges, *, text_col: str = "text") -> DataFrame:
    """Encode a corpus against a fixed merge list.

    Returns (doc_id, n_bpe_tokens, encoded) — the real token count and
    the display form of the symbol sequence. Pure map: no shuffle, no
    Python, M+constant literal replaces per row in codegen.
    """
    enc = bpe_apply_col(bpe_wrap_col(F.col(text_col)), merges)
    return df.select(
        "doc_id",
        (F.size(F.split(enc, SYM_OPEN)) - 1).cast("long").alias("n_bpe_tokens"),
        bpe_display_col(enc).alias("encoded"),
    )


#: Overlapping adjacent-symbol-pair extraction: lookahead so ``a b c``
#: yields both (a,b) and (b,c); the bare inter-token space breaks the
#: pattern, so pairs never cross words.
_PAIR_PATTERN = (
    f"(?=({SYM_OPEN}[^{SYM_OPEN}{SYM_CLOSE}]+{SYM_CLOSE}"
    f"{SYM_OPEN}[^{SYM_OPEN}{SYM_CLOSE}]+{SYM_CLOSE}))"
)


def bpe_symbol_pair_counts(encoded: DataFrame, *, enc_col: str = "enc") -> DataFrame:
    """Corpus-wide adjacent-symbol pair counts over a wrapped encoding —
    the generalized ``bpe_pair_counts`` that stays correct after merges
    (symbols are no longer single chars). Same scale shape: explode to
    narrow pair strings, one partial-agg hash aggregate."""
    pairs = encoded.select(
        F.explode(F.regexp_extract_all(F.col(enc_col), F.lit(_PAIR_PATTERN), 1)).alias(
            "pair"
        )
    )
    return pairs.groupBy("pair").agg(F.count("*").cast("long").alias("n_occurrences"))


def train_bpe_merges(
    df: DataFrame,
    *,
    n_merges: int = 48,
    min_count: int = 2,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Greedy BPE vocab induction: ``n_merges`` rounds of corpus-wide
    pair counting (distributed, partial-agg) + driver argmax (one row).

    Each round re-encodes incrementally — ONE literal replace over the
    previous round's materialized encoding (localCheckpoint), so round i
    costs one map pass + one narrow aggregate regardless of i; the
    corpus text is read once at round 0. Tie-break: highest count, then
    lexicographically smallest pair — deterministic across engines and
    cluster sizes (the aggregate is exact, not sampled).

    This is the offline trainer; ship its output as a frozen constant
    (``DEFAULT_BPE_MERGES``) and apply with ``bpe_apply_col``.
    """
    cur = df.select(bpe_wrap_col(F.col(text_col)).alias("enc")).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            bpe_symbol_pair_counts(cur)
            .where(F.col("n_occurrences") >= min_count)
            .orderBy(F.col("n_occurrences").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair = top[0].pair
        # pair is \x01a\x02\x01b\x02 — split on the internal close+open
        a, b = pair[1:-1].split(SYM_CLOSE + SYM_OPEN, 1)
        merges.append((a, b))
        cur = cur.select(bpe_apply_col(F.col("enc"), [(a, b)]).alias("enc")).localCheckpoint()
    return merges
