"""Canonical golden fixture documents (FIXTURES.md §3) + randomized corpus.

The canonical docs were hand-traced from the reference source; the expected
output spans below are the correctness contract (FIXTURES.md), cross-pinned
by the reference's own golden test assertions where they exist.
"""

from __future__ import annotations

import random
from typing import List, Tuple

TITLE = "Sample Title"
AUTHOR = "Sample Author"

# Thirteen deterministic lorem-ish paragraphs (≥200 chars, no boilerplate
# words, no title/author prefix, sentence-final periods) — FIXTURES.md §3.
LOREM = [
    (
        f"Lorem ipsum odor amet, consectetuer adipiscing elit. Paragraph {i} "
        "carries a steady stream of unremarkable narrative prose that rolls "
        "onward through the middle of the story without ever naming the "
        "people who wrote it or the matter at the edges of the binding, and "
        "it closes with a tidy period."
    )
    for i in range(1, 14)
]

InSpan = Tuple[str, str, str, int]
OutSpan = Tuple[str, str, str, int]


def _spans(rows: List[Tuple[str, str, str]]) -> List[InSpan]:
    return [(k, t, r, i) for i, (k, t, r) in enumerate(rows)]


def _doc(doc_id, fmt, spans, title=TITLE, author=AUTHOR):
    return {
        "doc_id": doc_id,
        "fmt": fmt,
        "title": title,
        "author": author,
        "spans": spans,
    }


# --- EPUB ------------------------------------------------------------------

EPUB_001 = _doc(
    "epub-001",
    "epub",
    _spans(
        [
            ("section", "Text/Section0001.xhtml", ""),
            ("p", TITLE, ""),
            ("section", "Text/Section0002.xhtml", ""),
            ("p", "", ""),
            ("section", "Text/Section0003.xhtml", ""),
            ("p", "Introduction", ""),
            ("p", "Sample introduction text paragraph.", ""),
            ("section", "Text/Section0004.xhtml", ""),
            ("p", "Chapter One", ""),
            ("p", "First chapter paragraph text.", ""),
            ("section", "Text/Section0005.xhtml", ""),
            ("p", "Chapter 2", ""),
        ]
        + [("p", paragraph, "") for paragraph in LOREM]
    ),
)

EPUB_001_EXPECTED: List[OutSpan] = [
    ("text", "First chapter paragraph text.", "", 0),
    ("chapter_break", "\n***\n", "", 1),
    ("text", "\n".join(LOREM), "", 2),
]

# Heading rendered as an image whose OCR transcript is the trigger.
EPUB_002 = _doc(
    "epub-002",
    "epub",
    _spans(
        [
            ("section", "Text/Section0001.xhtml", ""),
            ("p", TITLE, ""),
            ("section", "Text/Section0002.xhtml", ""),
            ("p", "", ""),
            ("section", "Text/Section0003.xhtml", ""),
            ("p", "Introduction", ""),
            ("p", "Sample introduction text paragraph.", ""),
            ("section", "Text/Section0004.xhtml", ""),
            ("img", "Chapter One", "chapter_one.jpg"),
            ("p", "First chapter paragraph text.", ""),
            ("section", "Text/Section0005.xhtml", ""),
            ("p", "Chapter 2", ""),
        ]
        + [("p", paragraph, "") for paragraph in LOREM]
    ),
)

EPUB_002_EXPECTED = EPUB_001_EXPECTED  # trigger image leaves no trace

# Body image → zero-width media marker + blank joined line.
EPUB_003 = _doc(
    "epub-003",
    "epub",
    _spans(
        [
            ("section", "Text/c3.xhtml", ""),
            ("p", "Chapter 3", ""),
            ("img", "", "img7"),
            ("p", "Closing chapter text.", ""),
        ]
    ),
)

EPUB_003_EXPECTED: List[OutSpan] = [
    ("media_ref", "", "img7", 0),
    ("text", "\nClosing chapter text.", "", 1),
]

# --- DOCX ------------------------------------------------------------------

_DOCX_BODY = [
    ("para", TITLE, ""),
    ("para", "", ""),
    ("para", AUTHOR, ""),
    ("page_break", "", ""),
    ("para", "Introduction", ""),
    ("para", "Sample introduction text paragraph.", ""),
    ("page_break", "", ""),
    ("para", "Chapter 1", ""),
    ("para", "First chapter paragraph text.", ""),
    ("page_break", "", ""),
    ("para", "Chapter 2", ""),
    ("para", LOREM[0], ""),
    ("para", LOREM[1], ""),
    ("page_break", "", ""),
    ("para", LOREM[2], ""),
    ("para", LOREM[3], ""),
    ("para", LOREM[4], ""),
]

DOCX_001 = _doc("docx-001", "docx", _spans(_DOCX_BODY))

DOCX_001_EXPECTED: List[OutSpan] = [
    ("text", "\nFirst chapter paragraph text.", "", 0),
    ("chapter_break", "\n***\n", "", 1),
    ("text", "\n".join(LOREM[:5]), "", 2),
]

# Same paragraphs, run-level breaks only (invisible) → empty output.
DOCX_002 = _doc(
    "docx-002",
    "docx",
    _spans([row for row in _DOCX_BODY if row[0] != "page_break"]),
)

DOCX_002_EXPECTED: List[OutSpan] = []

# Image chapter heading after real content.
DOCX_003 = _doc(
    "docx-003",
    "docx",
    _spans(
        _DOCX_BODY
        + [
            ("page_break", "", ""),
            ("img", "Chapter One", "rId5"),
            ("para", "After image text.", ""),
        ]
    ),
)

DOCX_003_EXPECTED: List[OutSpan] = [
    ("text", "\nFirst chapter paragraph text.", "", 0),
    ("chapter_break", "\n***\n", "", 1),
    ("text", "\n".join(LOREM[:5]), "", 2),
    ("media_ref", "", "rId5", 3),
    ("chapter_break", "\n***\n", "", 4),
    ("text", "After image text.", "", 5),
]

# --- PDF -------------------------------------------------------------------

_PDF_PAGES = [
    [("line", f"{TITLE} \n", ""), ("line", " \n", "")],
    [("line", f"{AUTHOR} \n", ""), ("line", " \n", "")],
    [("line", " \n", "")],
    [
        ("line", "Introduction \n", ""),
        ("line", "Sample introduction text paragraph. \n", ""),
        ("line", " \n", ""),
        ("line", " \n", ""),
    ],
    [
        ("line", "Chapter 1 \n", ""),
        ("line", "First chapter paragraph text. \n", ""),
        ("line", " \n", ""),
        ("line", " \n", ""),
    ],
    [
        ("line", "Chapter 2 \n", ""),
        ("line", "Lorem ipsum odor amet, consectetuer adipiscing elit. Purus \n", ""),
        ("line", "suscipit varius est leo parturient. \n", ""),
    ],
    [
        ("line", "Venenatis malesuada pretium ligula sagittis tristique varius \n", ""),
        ("line", "facilisi. \n", ""),
    ],
]


def _pdf_doc(doc_id, pages):
    rows = []
    for i, page in enumerate(pages):
        if i:
            rows.append(("page_break", "", ""))
        rows.extend(page)
    return _doc(doc_id, "pdf", _spans(rows))


PDF_001 = _pdf_doc("pdf-001", _PDF_PAGES)

PDF_001_EXPECTED: List[OutSpan] = [
    ("text", "First chapter paragraph text.\n", "", 0),
    ("chapter_break", "***\n", "", 1),
    (
        "text",
        "Lorem ipsum odor amet, consectetuer adipiscing elit. Purus "
        "suscipit varius est leo parturient.\n"
        "Venenatis malesuada pretium ligula sagittis tristique varius "
        "facilisi.\n",
        "",
        2,
    ),
]

_PDF_IMG_PAGES = [page[:] for page in _PDF_PAGES]
_PDF_IMG_PAGES[4] = [("img", "Chapter One", "24")] + _PDF_PAGES[4][1:]
PDF_002 = _pdf_doc("pdf-002", _PDF_IMG_PAGES)

PDF_002_EXPECTED: List[OutSpan] = [
    ("media_ref", "", "24", 0),
    ("text", "First chapter paragraph text.\n", "", 1),
    ("chapter_break", "***\n", "", 2),
    (PDF_001_EXPECTED[2][0], PDF_001_EXPECTED[2][1], "", 3),
]

# --- TXT -------------------------------------------------------------------

TXT_001 = _doc(
    "txt-001",
    "txt",
    _spans(
        [
            ("line", TITLE, ""),
            ("line", "", ""),
            ("line", "Chapter 1", ""),
            (
                "line",
                "It was a dark and stormy night; the rain fell in torrents "
                "— except at occasional intervals.",
                "",
            ),
            ("line", "“Quote,” she said… • done", ""),
            ("line", "2", ""),
            ("line", "The end.", ""),
        ]
    ),
)

TXT_001_EXPECTED: List[OutSpan] = [
    ("text", TITLE, "", 0),
    ("chapter_break", "\n***\n", "", 1),
    (
        "text",
        "It was a dark and stormy night; the rain fell in torrents - except "
        'at occasional intervals.\n"Quote," she said... * done',
        "",
        2,
    ),
    ("chapter_break", "\n***\n", "", 3),
    ("text", "The end.", "", 4),
]

GOLDEN_DOCS = [
    (EPUB_001, EPUB_001_EXPECTED),
    (EPUB_002, EPUB_002_EXPECTED),
    (EPUB_003, EPUB_003_EXPECTED),
    (DOCX_001, DOCX_001_EXPECTED),
    (DOCX_002, DOCX_002_EXPECTED),
    (DOCX_003, DOCX_003_EXPECTED),
    (PDF_001, PDF_001_EXPECTED),
    (PDF_002, PDF_002_EXPECTED),
    (TXT_001, TXT_001_EXPECTED),
]


# --- Randomized corpus (FIXTURES.md §4) -------------------------------------

_HEADING_STYLES = [
    lambda n: f"Chapter {n}",
    lambda n: f"CHAPTER {_to_roman(n)}",
    lambda n: str(n),
    lambda n: _to_roman(n),
    lambda n: _spell(n),
]

_ONES = "zero one two three four five six seven eight nine".split()
_TENS = ["", "ten", "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty", "ninety"]


def _spell(n: int) -> str:
    n = n % 100
    if n < 10:
        return _ONES[n]
    if n in (11, 12, 13):
        return ["eleven", "twelve", "thirteen"][n - 11]
    tens, ones = divmod(n, 10)
    return _TENS[tens] + ("-" + _ONES[ones] if ones else "")


def _to_roman(n: int) -> str:
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


_SMART_SENTENCE = "He said “well–done…” — ‘truly’ • fine."
_BOILER_WORDS = ["Introduction", "Copyright", "Contents", "Dedication", "Preface", "Appendix"]


def random_corpus(n_docs: int, seed: int = 42) -> List[dict]:
    """Deterministic interleaved corpus with skewed span counts."""
    return [make_doc(d, seed) for d in range(n_docs)]


def make_doc(d: int, seed: int = 42) -> dict:
    """One deterministic synthetic document, independent per index.

    Seeded per ``(seed, d)`` so corpus generation parallelizes across Spark
    partitions with no sequential RNG state.
    """
    rng = random.Random(f"{seed}:{d}")
    fmt = rng.choices(["epub", "docx", "pdf", "txt"], weights=[35, 25, 25, 15])[0]
    n_spans = max(6, int(rng.lognormvariate(3.7, 0.7)))
    if rng.random() < 0.005:
        n_spans = rng.randint(2000, 5000)  # giant-PDF tail
    heading = _HEADING_STYLES[rng.randrange(len(_HEADING_STYLES))]
    rows: List[Tuple[str, str, str]] = []

    def sentence(i: int) -> str:
        base = f"Body sentence number {i} rolls along with plain words and ends cleanly."
        return _SMART_SENTENCE if rng.random() < 0.1 else base

    chapter_no = 1
    if fmt == "txt":
        rows.append(("line", TITLE, ""))
        for i in range(n_spans):
            if rng.random() < 0.06:
                rows.append(("line", heading(chapter_no), ""))
                chapter_no += 1
            else:
                rows.append(("line", sentence(i), ""))
    elif fmt == "epub":
        rows.append(("section", "Text/titlepage.xhtml", ""))
        rows.append(("p", TITLE, ""))
        rows.append(("section", "Text/toc.xhtml", ""))
        rows.append(("p", rng.choice(_BOILER_WORDS), ""))
        per_section = max(3, n_spans // 6)
        for s in range(max(1, n_spans // per_section)):
            rows.append(("section", f"Text/Section{s:04d}.xhtml", ""))
            rows.append(("h1", heading(chapter_no), ""))
            chapter_no += 1
            for i in range(per_section):
                if rng.random() < 0.05:
                    rows.append(("img", "", f"img{d}_{s}_{i}"))
                else:
                    rows.append(("p", sentence(i), ""))
    elif fmt == "docx":
        rows.append(("para", TITLE, ""))
        rows.append(("para", AUTHOR, ""))
        per_page = max(2, n_spans // 8)
        for p in range(max(1, n_spans // per_page)):
            rows.append(("page_break", "", ""))
            if rng.random() < 0.7:
                rows.append(("para", heading(chapter_no), ""))
                chapter_no += 1
            elif rng.random() < 0.5:
                rows.append(("para", rng.choice(_BOILER_WORDS), ""))
            for i in range(per_page):
                if rng.random() < 0.03:
                    rows.append(("img", "Chapter " + str(chapter_no), f"rId{d}_{p}_{i}"))
                else:
                    rows.append(("para", sentence(i), ""))
    else:  # pdf — may exceed 25 pages to pin the cap
        n_pages = max(2, n_spans // 10)
        for p in range(n_pages):
            if p:
                rows.append(("page_break", "", ""))
            if p == 0:
                rows.append(("line", f"{TITLE} \n", ""))
                rows.append(("line", " \n", ""))
                continue
            if rng.random() < 0.6:
                rows.append(("line", f"{heading(chapter_no)} \n", ""))
                chapter_no += 1
            if rng.random() < 0.05:
                rows.append(("img", "Chapter " + str(chapter_no), str(100 + p)))
            for i in range(9):
                tail = ". \n" if rng.random() < 0.6 else " \n"
                rows.append(("line", f"pdf body words {p} {i}{tail}", ""))
    return _doc(f"{fmt}-r{d:06d}", fmt, _spans(rows))
