"""Chapter-heading and boilerplate predicates (SURVEY.md §2.3, F1-F8).

These reproduce the reference's quirky grammars exactly (citations per
function), including the documented oddities the test suite pins:

- roman validator: ≤1 each of V/L/D, ≤3 consecutive equal chars, legal
  subtractive pairs only, so ``"IIII"`` is invalid while ``"IXI"`` (=10) is
  accepted;
- spelled-number parser: greedy reverse-suffix match over a 23-word
  vocabulary, so ``"teen"`` (=10) and ``"twoone"`` (=3) are accepted while
  ``"thirteen"``/``"eighteen"`` are REJECTED (the greedy pass strips the
  trailing ``"teen"`` and strands ``"thir"``/``"eigh"``);
- ``is_not_chapter`` lowercases its input, the PDF header check does not.

Implemented exception-free (parsers return ``None`` on invalid input) so
they can run over millions of tokens inside Arrow batches without the
try/except overhead of the reference's wrappers.
"""

from __future__ import annotations

#: 44 front/back-matter stop-words (reference: chapter_check.py:1-45).
BOILERPLATE_PREFIXES: frozenset[str] = frozenset(
    """about acknowledgements afterward annotation appendix assessment
    backmatter bibliography colophon conclusion contents contributors
    copyright cover credits dedication division endnotes epigraph errata
    footnotes forward frontmatter glossary imprintur imprint index
    introduction landmarks list notice page preamble preface prologue
    question rear revision table toc volume warning""".split()
) | frozenset({"sign up"})

#: Exact-token variant used by the EPUB detection window (F11), which does a
#: case-sensitive ``word in NOT_CHAPTER`` membership test per whitespace
#: token (reference: epub_converter.py:91). Same vocabulary.
BOILERPLATE_TOKENS: frozenset[str] = BOILERPLATE_PREFIXES

#: Defaults substituted for missing metadata (reference: chapter_check.py:219-220).
DEFAULT_TITLE = "no title found"
DEFAULT_AUTHOR = "no author found"

_ROMAN_VALUES = {"I": 1, "V": 5, "X": 10, "L": 50, "C": 100, "D": 500, "M": 1000}
#: For value(ch) < value(right neighbour), the only legal (right, ch) pairs
#: (reference: chapter_check.py:95-100).
_SUBTRACTIVE_PARTNER = {"V": "I", "X": "I", "L": "X", "C": "X", "D": "C", "M": "C"}

_NUMBER_WORDS = {
    "zero": 0,
    "one": 1,
    "two": 2,
    "three": 3,
    "four": 4,
    "five": 5,
    "six": 6,
    "seven": 7,
    "eight": 8,
    "nine": 9,
    "ten": 10,
    "teen": 10,
    "eleven": 11,
    "twelve": 12,
    "thirteen": 13,
    "twenty": 20,
    "thirty": 30,
    "forty": 40,
    "fifty": 50,
    "sixty": 60,
    "seventy": 70,
    "eighty": 80,
    "ninety": 90,
}


def parse_roman(token: str) -> int | None:
    """F1: strict roman-numeral parse; ``None`` when invalid.

    Reference grammar: chapter_check.py:48-106 (``roman_to_int``), processed
    right-to-left. A numeral with total value 0 (empty string) is invalid.
    """
    if not isinstance(token, str):
        return None
    numeral = token.upper()
    if numeral.count("V") > 1 or numeral.count("L") > 1 or numeral.count("D") > 1:
        return None

    total = 0
    right_value = 0
    right_char = ""
    run_length = 0
    for ch in reversed(numeral):
        value = _ROMAN_VALUES.get(ch)
        if value is None:
            return None
        run_length = run_length + 1 if ch == right_char else 1
        if run_length > 3:
            return None
        if value >= right_value:
            total += value
        elif _SUBTRACTIVE_PARTNER.get(right_char) == ch:
            total -= value
        else:
            return None
        right_value = value
        right_char = ch
    return total if total else None


def parse_spelled_number(token: str) -> int | None:
    """F2: greedy reverse-suffix spelled-number parse; ``None`` when invalid.

    Reference grammar: chapter_check.py:109-163 (``word_to_num``). Hyphens
    and spaces are removed; the scan walks right-to-left accumulating a
    suffix until it equals a vocabulary word, adds its value, and resets.
    Any stranded prefix invalidates the whole token. Note ``""`` after
    cleaning (e.g. input ``"-"``) parses to 0, which IS a valid number.
    """
    if not isinstance(token, str) or not token:
        return None
    squeezed = token.lower().replace("-", "").replace(" ", "")
    total = 0
    pending = ""
    for ch in reversed(squeezed):
        pending = ch + pending
        value = _NUMBER_WORDS.get(pending)
        if value is not None:
            total += value
            pending = ""
    if pending:
        return None
    return total


def is_number_token(token: str) -> bool:
    """F5: digits, valid roman numeral, or valid spelled-out number.

    Reference: chapter_check.py:192-198 (``is_number``).
    """
    return (
        token.isdigit()
        or parse_roman(token) is not None
        or parse_spelled_number(token) is not None
    )


def is_chapter_heading(text: str) -> bool:
    """F6: chapter-heading test.

    Lower+strip, then: starts with ``"chapter"``, OR is exactly one
    whitespace-separated token that is a number (F5).
    Reference: chapter_check.py:201-212 (``is_chapter``).
    """
    # str.lower maps per character (lower(a+b) == lower(a)+lower(b)), so
    # lowering only the 7-char prefix decides the startswith test without
    # allocating a lowered copy of a whole paragraph. strip-then-lower ==
    # lower-then-strip (case mappings never touch whitespace).
    stripped = text.strip()
    if stripped[:7].lower().startswith("chapter"):
        return True
    # maxsplit=1 bounds the scan: a long paragraph exits at its first
    # whitespace instead of being tokenized end-to-end just to be counted.
    parts = stripped.split(None, 1)
    return len(parts) == 1 and is_number_token(parts[0].lower())


import re as _re

#: Anchored alternation over the stop-words — one C-level match instead of
#: 43 ``startswith`` calls per paragraph (this predicate runs on every line
#: of every document; it dominated the fold profile before compiling).
_BOILER_RE = _re.compile("|".join(sorted(BOILERPLATE_PREFIXES, key=len, reverse=True)))
_MAX_BOILER_LEN = max(len(p) for p in BOILERPLATE_PREFIXES)


def is_boilerplate(paragraph: str, title: str, author: str) -> bool:
    """F7: front/back-matter test (case-insensitive prefix match).

    True when the lowercased paragraph starts with the lowercased title,
    the lowercased author, or any of the 44 stop-words.
    Reference: chapter_check.py:215-227 (``is_not_chapter``); callers pass
    the already-defaulted title/author (chapter_check.py:219-220).
    """
    # Prefix-only lowering (lower distributes over concatenation): the
    # anchored alternation can only match within the first _MAX_BOILER_LEN
    # chars, and the title/author tests within max(len) chars — no need to
    # allocate a lowered copy of the full paragraph per line.
    if _BOILER_RE.match(paragraph[:_MAX_BOILER_LEN].lower()):
        return True
    t, a = title.lower(), author.lower()
    head = paragraph[: max(len(t), len(a))].lower()
    return head.startswith(t) or head.startswith(a)


def is_pdf_header(line: str, title: str, author: str) -> bool:
    """F8: PDF page-header test — CASE-SENSITIVE prefix/suffix match.

    Reference: pdf_line_logic.py:5-23 (``is_header``).
    """
    return (
        line.startswith(title)
        or line.endswith(title)
        or line.startswith(author)
        or line.endswith(author)
    )


def default_metadata(title: str | None, author: str | None) -> tuple[str, str]:
    """Apply the reference's missing-metadata defaults."""
    return (
        title if title is not None else DEFAULT_TITLE,
        author if author is not None else DEFAULT_AUTHOR,
    )
