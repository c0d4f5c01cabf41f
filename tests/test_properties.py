"""Property-based tests (hypothesis) for the span assembler and parsers.

The assembler invariant is testable independently of the folds: for ANY
atom stream, concatenating the produced span texts must equal the naive
string the reference sinks build (join + char-class lstrip), and the first
string span must never be a chapter_break.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ebook_conversion_to_text_for_machine_learning_spark.core.chapter import (
    parse_roman,
    parse_spelled_number,
)
from ebook_conversion_to_text_for_machine_learning_spark.core.spans import (
    assemble_output_spans,
)

_FORMAT_PARAMS = [
    {"joiner": "\n", "break_text": "***", "lstrip_chars": "*"},      # txt/docx
    {"joiner": "", "break_text": "***\n", "lstrip_chars": "*\n"},    # pdf
]

_text_atom = st.text(
    alphabet=st.sampled_from("ab*\n ."), min_size=1, max_size=6
).filter(lambda s: s.strip())

_atoms = st.lists(
    st.one_of(
        st.tuples(st.just("T"), _text_atom),
        st.tuples(st.just("B"), st.none()),
        st.tuples(st.just("M"), st.sampled_from(["r1", "r2"])),
    ),
    max_size=12,
)


def _naive_string(atoms, joiner, break_text, lstrip_chars):
    parts = [break_text if k == "B" else t for k, t in atoms if k != "M"]
    return joiner.join(parts).lstrip(lstrip_chars)


@settings(max_examples=500, deadline=None)
@given(atoms=_atoms, params=st.sampled_from(_FORMAT_PARAMS))
def test_assembler_concat_invariant(atoms, params):
    spans = assemble_output_spans(atoms, **params)
    concat = "".join(t for _, t, _, _ in spans)
    assert concat == _naive_string(atoms, **params)
    # orders are dense and media markers are zero-width
    assert [o for _, _, _, o in spans] == list(range(len(spans)))
    assert all(t == "" for k, t, _, _ in spans if k == "media_ref")
    # media refs survive in order
    assert [r for k, _, r, _ in spans if k == "media_ref"] == [
        p for k, p in atoms if k == "M"
    ]
    # the first string span is never a chapter_break (invariant 3)
    string_spans = [k for k, _, _, _ in spans if k != "media_ref"]
    if string_spans:
        assert string_spans[0] != "chapter_break"


def _canonical_roman(n: int) -> str:
    out = []
    for value, sym in (
        (1000, "M"), (900, "CM"), (500, "D"), (400, "CD"), (100, "C"),
        (90, "XC"), (50, "L"), (40, "XL"), (10, "X"), (9, "IX"),
        (5, "V"), (4, "IV"), (1, "I"),
    ):
        while n >= value:
            out.append(sym)
            n -= value
    return "".join(out)


@settings(max_examples=300, deadline=None)
@given(n=st.integers(min_value=1, max_value=3999))
def test_roman_roundtrip_canonical(n):
    assert parse_roman(_canonical_roman(n)) == n


@settings(max_examples=300, deadline=None)
@given(
    tens=st.sampled_from("twenty thirty forty fifty sixty seventy eighty ninety".split()),
    ones=st.sampled_from("one two three four five six seven eight nine".split()),
)
def test_spelled_compound_roundtrip(tens, ones):
    values = {
        "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
        "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
        "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
        "six": 6, "seven": 7, "eight": 8, "nine": 9,
    }
    assert parse_spelled_number(f"{tens}-{ones}") == values[tens] + values[ones]
    assert parse_spelled_number(f"{tens} {ones}") == values[tens] + values[ones]


_fuzz_kind = st.sampled_from(
    ["line", "para", "img", "page_break", "section", "p", "h1", "weird", ""]
)
_fuzz_text = st.text(max_size=40)  # arbitrary unicode incl. controls/surrogate-adjacent
_fuzz_span = st.tuples(_fuzz_kind, _fuzz_text, st.text(max_size=8))
_fuzz_fmt = st.sampled_from(["txt", "epub", "docx", "pdf", "text", "mobi", ""])


@settings(max_examples=300, deadline=None)
@given(
    fmt=_fuzz_fmt,
    spans=st.lists(_fuzz_span, max_size=30),
    title=st.one_of(st.none(), _fuzz_text),
    author=st.one_of(st.none(), _fuzz_text),
)
def test_extract_document_total_on_arbitrary_spans(fmt, spans, title, author):
    """Totality fuzz: any unicode garbage through any format fold must
    return a well-formed result — never an unhandled exception, output
    spans always (kind, text, media_ref, contiguous order), and a
    quarantine status only for unknown formats."""
    from ebook_conversion_to_text_for_machine_learning_spark.core.extract import (
        extract_document,
    )

    out, status = extract_document(fmt, spans, title, author)
    if fmt in ("txt", "text", "epub", "docx", "pdf"):
        assert status == "ok", (fmt, spans, status)
    else:
        assert status == "unknown_format" and out == []
    assert [o for _, _, _, o in out] == list(range(len(out)))
    for kind, text, ref, _ in out:
        assert kind in ("text", "chapter_break", "media_ref")
        assert isinstance(text, str) and isinstance(ref, str)


# --- PDF builder ↔ parser round trip ----------------------------------------

# Latin-1-encodable text (the simple-font PDF string space), no control
# chars that the content-stream tokenizer treats as whitespace.
_pdf_line = st.text(
    alphabet=st.characters(
        codec="latin-1", blacklist_categories=("Cs", "Cc"),
    ),
    min_size=0,
    max_size=60,
)
_pdf_page = st.lists(_pdf_line, min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(pages=st.lists(_pdf_page, min_size=1, max_size=5))
def test_pdf_build_parse_round_trip(pages):
    """Any latin-1 text through build_pdf (incl. parens/backslashes that
    need string escaping) must come back verbatim from the stdlib parser,
    one line span per input line plus page_break markers."""
    from ebook_conversion_to_text_for_machine_learning_spark.sources.pdf_text import (
        pdf_bytes_to_rows,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.testing.pdf_fixture import (
        build_pdf,
    )

    data, _ = build_pdf(pages, compress=True)
    rows = pdf_bytes_to_rows(data)
    expected = []
    for i, page in enumerate(pages):
        if i:
            expected.append(("page_break", "", ""))
        expected.extend(("line", line + "\n", "") for line in page)
    assert rows == expected


@settings(max_examples=40, deadline=None)
@given(
    pages=st.lists(_pdf_page, min_size=1, max_size=3),
    mode=st.sampled_from(["rc4-40", "rc4-128", "aes-128", "aes-256"]),
)
def test_pdf_rc4_encrypted_round_trip_property(pages, mode):
    """Decryption must be transparent for ANY content: the encrypted
    serialization parses to exactly the rows of its plaintext twin. The
    fixture's crypto is an independent spec implementation, so this
    cross-checks the reader's key derivation over arbitrary stream
    bytes (compression makes every ciphertext differ)."""
    from ebook_conversion_to_text_for_machine_learning_spark.sources.pdf_text import (
        pdf_bytes_to_rows,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.testing.pdf_fixture import (
        build_pdf,
    )

    plain, _ = build_pdf(pages, compress=True)
    enc, _ = build_pdf(pages, compress=True, encrypt=mode)
    assert pdf_bytes_to_rows(enc) == pdf_bytes_to_rows(plain)


@settings(max_examples=150, deadline=None)
@given(data=st.binary(min_size=0, max_size=4000))
def test_pdf_stream_codecs_round_trip(data):
    """Every fixture encoder must invert through the extractor's decoder
    on arbitrary bytes — including LZW width ladders and table clears."""
    from ebook_conversion_to_text_for_machine_learning_spark.sources.pdf_text import (
        _ascii85_decode,
        _ascii_hex_decode,
        _lzw_decode,
        _run_length_decode,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.testing.pdf_fixture import (
        encode_stream,
    )

    assert _lzw_decode(encode_stream(data, "LZWDecode")) == data
    assert _ascii85_decode(encode_stream(data, "ASCII85Decode")) == data
    assert _ascii_hex_decode(encode_stream(data, "ASCIIHexDecode")) == data
    assert _run_length_decode(encode_stream(data, "RunLengthDecode")) == data


@settings(max_examples=100, deadline=None)
@given(pages=st.lists(_pdf_page, min_size=1, max_size=3))
def test_pdf_objstm_parse_matches_classic(pages):
    """The PDF 1.5 serialization (ObjStm + xref stream + PNG predictor)
    must extract row-for-row identically to the classic-xref build of the
    same pages."""
    from ebook_conversion_to_text_for_machine_learning_spark.sources.pdf_text import (
        pdf_bytes_to_rows,
    )
    from ebook_conversion_to_text_for_machine_learning_spark.testing.pdf_fixture import (
        build_pdf,
    )

    classic, _ = build_pdf(pages, compress=True)
    modern, _ = build_pdf(pages, objstm=True)
    assert pdf_bytes_to_rows(modern) == pdf_bytes_to_rows(classic)
