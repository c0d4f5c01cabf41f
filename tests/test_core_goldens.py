"""Golden span-sequence tests for the pure extraction cores (FIXTURES.md §3).

Each canonical document's output spans must equal the hand-traced contract
tuple-for-tuple ``(kind, text, media_ref, order)``, and the concatenation of
span texts must reproduce the reference's ``return_string`` output
(invariant 1).
"""

import pytest

from ebook_conversion_to_text_for_machine_learning_spark.core.extract import (
    extract_document,
)
from tests import fixtures as fx

GOLDEN_IDS = [doc["doc_id"] for doc, _ in fx.GOLDEN_DOCS]


def _run(doc):
    spans = [(k, t, r) for k, t, r, _ in sorted(doc["spans"], key=lambda s: s[3])]
    out, status = extract_document(doc["fmt"], spans, doc["title"], doc["author"])
    assert status == "ok"
    return out


@pytest.mark.parametrize("doc,expected", fx.GOLDEN_DOCS, ids=GOLDEN_IDS)
def test_golden_span_sequence(doc, expected):
    assert _run(doc) == expected


@pytest.mark.parametrize("doc,expected", fx.GOLDEN_DOCS, ids=GOLDEN_IDS)
def test_concat_invariant(doc, expected):
    out = _run(doc)
    assert "".join(t for _, t, _, _ in out) == "".join(t for _, t, _, _ in expected)


def test_canonical_strings():
    """Cross-pins from the reference's own golden assertions."""
    # test_pdf_conversion.py:166-188
    out = _run(fx.PDF_001)
    assert "".join(t for _, t, _, _ in out) == (
        "First chapter paragraph text.\n***\n"
        "Lorem ipsum odor amet, consectetuer adipiscing elit. Purus "
        "suscipit varius est leo parturient.\n"
        "Venenatis malesuada pretium ligula sagittis tristique varius "
        "facilisi.\n"
    )
    # test_epub_conversion.py:55-61 — first chapter text
    out = _run(fx.EPUB_001)
    assert out[0][1] == "First chapter paragraph text."


def test_unknown_format_quarantined():
    out, status = extract_document("mobi", [("line", "x", "")], None, None)
    assert out == [] and status == "unknown_format"


def test_pdf_page_cap():
    """Spans after the 25th page break are dropped (pdf_converter.py:56)."""
    pages = [[("line", f"Filler body line {i} stays here. \n", "")] for i in range(40)]
    # Put a chapter marker deep past the cap: it must not appear.
    pages[30] = [("line", "Chapter 9 \n", ""), ("line", "Late text. \n", "")]
    doc = fx._pdf_doc("pdf-cap", pages)
    out = _run(doc)
    joined = "".join(t for _, t, _, _ in out)
    assert "Late text." not in joined
    assert "Filler body line 24" in joined
    assert "Filler body line 25" not in joined


def test_txt_content_break_lookalike_is_text():
    """A content line folding to *** is text, not a chapter break."""
    doc = fx._doc(
        "txt-stars",
        "txt",
        fx._spans([("line", "Opening line.", ""), ("line", "•••", ""), ("line", "More text.", "")]),
    )
    out = _run(doc)
    assert [k for k, _, _, _ in out] == ["text"]
    assert out[0][1] == "Opening line.\n***\nMore text."


def test_docx_sticky_latch_across_pages():
    """The non-chapter latch persists across page breaks until a chapter."""
    doc = fx._doc(
        "docx-latch",
        "docx",
        fx._spans(
            [
                ("para", "Copyright 2021", ""),
                ("para", "suppressed paragraph one.", ""),
                ("page_break", "", ""),
                ("para", "still suppressed after the break.", ""),
                ("page_break", "", ""),
                ("para", "Chapter 1", ""),
                ("para", "finally visible.", ""),
            ]
        ),
    )
    out = _run(doc)
    assert "".join(t for _, t, _, _ in out) == "\nfinally visible."


def test_epub_blank_and_whitespace_elements():
    """Mirrors test_epub_conversion.py:117-138: blank/whitespace elements
    consume detection-window slots without triggering or dropping."""
    doc = fx._doc(
        "epub-blank",
        "epub",
        fx._spans(
            [
                ("section", "Text/c1.xhtml", ""),
                ("p", "", ""),
                ("p", "   ", ""),
                ("p", "Chapter 1", ""),
                ("p", "Body text after blanks.", ""),
            ]
        ),
    )
    out = _run(doc)
    assert out == [("text", "Body text after blanks.", "", 0)]

    # Trigger beyond the 6-element window → section dropped.
    doc2 = fx._doc(
        "epub-late-heading",
        "epub",
        fx._spans(
            [("section", "Text/c1.xhtml", "")]
            + [("p", f"filler paragraph {i}.", "") for i in range(6)]
            + [("p", "Chapter 1", ""), ("p", "Too late.", "")]
        ),
    )
    assert _run(doc2) == []


def test_epub_whitespace_body_contributes_blank_line():
    doc = fx._doc(
        "epub-ws-body",
        "epub",
        fx._spans(
            [
                ("section", "Text/c1.xhtml", ""),
                ("h1", "Chapter 5", ""),
                ("p", "First.", ""),
                ("p", "  ", ""),
                ("p", "Last.", ""),
            ]
        ),
    )
    out = _run(doc)
    assert out == [("text", "First.\n\nLast.", "", 0)]


def test_pdf_multiline_element_splice():
    """A single pdfminer text element may embed newlines; the machine
    splices it in place and reprocesses (pdf_converter.py:118-120)."""
    doc = fx._pdf_doc(
        "pdf-splice",
        [
            [
                ("line", "Chapter 1 \nFirst split line. \nSecond split line. \n", ""),
            ]
        ],
    )
    out = _run(doc)
    assert "".join(t for _, t, _, _ in out) == (
        "First split line.\nSecond split line.\n"
    )


def test_randomized_corpus_runs_clean():
    """Every randomized doc extracts with status ok and valid span orders."""
    for doc in fx.random_corpus(200, seed=42):
        spans = [(k, t, r) for k, t, r, _ in doc["spans"]]
        out, status = extract_document(doc["fmt"], spans, doc["title"], doc["author"])
        assert status == "ok"
        assert [o for _, _, _, o in out] == list(range(len(out)))
        if out:
            assert out[0][0] != "chapter_break"


def test_blocks_pdf_yields_every_page_including_blanks():
    """Generator parity: the reference's PDF parse_file yields one string
    per page, blank pages included (pdf_converter.py:154-167); the string
    reduce later drops blanks. blocks_pdf must preserve that granularity."""
    from ebook_conversion_to_text_for_machine_learning_spark.core.formats import (
        blocks_pdf,
        extract_pdf,
    )

    spans = [
        ("line", "Chapter 1", ""),
        ("line", "First page text.", ""),
        ("page_break", "", ""),
        # blank page: only an empty line
        ("line", "   ", ""),
        ("page_break", "", ""),
        ("line", "Chapter 2", ""),
        ("line", "Second page text.", ""),
    ]
    blocks = blocks_pdf(spans, "T", "A")
    assert len(blocks) == 3  # every page yields, blank included
    # (UNINIT,CHAPTER)->FIRST_LINE then the prev=CHAPTER,cur=LINE special
    # case inserts the separator (pdf_line_logic.py:67-72).
    assert blocks[0] == "***\nFirst page text.\n"
    assert blocks[1] == ""
    assert blocks[2] == "***\nSecond page text.\n"
    # Span path == reference return_string: non-blank join + lstrip("***\n").
    out = extract_pdf(spans, "T", "A")
    reduced = "".join(b for b in blocks if b.strip()).lstrip("*\n")
    assert "".join(t for _, t, _, _ in out) == reduced


def test_collapse_whitespace_ascii_separator_chars():
    """\\x1c-\\x1f are regex \\s whitespace: the ASCII fast path must not
    skip collapsing their runs (reference remove_whitespace collapses
    every \\s run)."""
    import re

    from ebook_conversion_to_text_for_machine_learning_spark.core.normalize import (
        collapse_whitespace_runs,
    )

    for ch in ("\x1c", "\x1d", "\x1e", "\x1f"):
        text = f"a{ch}{ch}b"
        assert collapse_whitespace_runs(text) == f"a{ch}b"
        assert collapse_whitespace_runs(text) == re.sub(r"(\s)+", r"\1", text.strip())


def test_docx_whitespace_only_page_dropped():
    """A page whose only content is whitespace must vanish from the docx
    extraction (reference return_string filters line.strip(),
    docx_converter.py:137) — its media markers survive, its text does not."""
    from ebook_conversion_to_text_for_machine_learning_spark.core.formats import (
        extract_docx,
    )

    spans = [
        ("para", "Real title", ""),
        ("page_break", "", ""),
        ("para", " ", ""),          # whitespace-only page
        ("page_break", "", ""),
        ("para", "Chapter 1", ""),
        ("para", "Hello world.", ""),
    ]
    out = extract_docx(spans, "Real title", "Nobody")
    text = "".join(t for _k, t, _r, _o in out)
    assert " \n" not in text and not text.startswith(" ")
    assert "Hello world." in text
