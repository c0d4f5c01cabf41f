"""Span data contract + atom-stream → output-span assembly.

The per-format folds (txt/docx/pdf) produce an ordered stream of *atoms*:

- ``("T", text)``   a content chunk exactly as the reference appended it
- ``("B", None)``   a chapter-break marker emitted by the fold
- ``("M", ref)``    a zero-width media marker (image consulted here)

The reference then string-joins its yielded blocks and left-strips a
separator char-class at the sink (``return_string`` /
``_clean_before_write``, e.g. text_parser.py:72-85, pdf_converter.py:204-217).
``assemble_output_spans`` reproduces that exact string while cutting it into
typed output spans ``(kind, text, media_ref, order)`` whose concatenation of
``text`` equals the reference string (FIXTURES.md invariant 1).

Because both the in-page join and the across-page join of every format use
the same joiner, the full reference string is exactly
``joiner.join(atom strings)`` then ``lstrip(lstrip_chars)`` — so assembly is
a single linear pass, no re-parsing.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

Atom = Tuple[str, Optional[str]]  # ("T", text) | ("B", None) | ("M", media_ref)
OutSpan = Tuple[str, str, str, int]  # (kind, text, media_ref, order)

KIND_TEXT = "text"
KIND_BREAK = "chapter_break"
KIND_MEDIA = "media_ref"


def _lstrip_chars(text: str, strip_set: frozenset) -> str:
    i = 0
    n = len(text)
    while i < n and text[i] in strip_set:
        i += 1
    return text[i:]


def assemble_output_spans(
    atoms: Iterable[Atom],
    *,
    joiner: str,
    break_text: str,
    lstrip_chars: str,
) -> List[OutSpan]:
    """Cut the reference's joined+stripped output string into typed spans.

    Segmentation rule: maximal runs of break markers (with any joiner glue
    adjacent to a marker) become one ``chapter_break`` span; content chunks
    (with glue between two content chunks) merge into ``text`` spans; media
    markers are zero-width and flush the current text span. A leading break
    that survives the sink's lstrip is retyped to ``text`` so the first span
    of a document is never ``chapter_break`` (FIXTURES.md invariant 3).

    Single fused pass (the fold's hottest helper — this used to be three
    list passes). Invariants that make the fusion exact:

    - glue sits between two string atoms (media is transparent), so a glue
      segment is break-adjacent iff the previous surviving string atom or
      the current atom is a break;
    - the sink lstrip consumes segments only at the very front, before any
      payload survives, so ``stripping`` implies no surviving predecessor
      (``prev_kind is None``) — dropped segments can never sit between
      survivors;
    - a glue that survives the strip turns stripping off before its
      following atom is examined, so "glue survived but atom dropped" is
      impossible.
    """
    strip_set = frozenset(lstrip_chars)
    stripping = bool(strip_set)

    spans: List[Tuple[str, str, str]] = []
    text_parts: List[str] = []
    break_parts: List[str] = []
    seen_string = False  # any string atom so far → glue before the next one
    prev_kind: Optional[str] = None  # last SURVIVING string segment kind

    def _flush_text() -> None:
        if text_parts:
            spans.append((KIND_TEXT, "".join(text_parts), ""))
            text_parts.clear()

    def _flush_break() -> None:
        if break_parts:
            spans.append((KIND_BREAK, "".join(break_parts), ""))
            break_parts.clear()

    for kind, payload in atoms:
        if kind == "M":
            _flush_break()
            _flush_text()
            spans.append((KIND_MEDIA, "", payload or ""))
            continue

        text = break_text if kind == "B" else (payload or "")
        glue = joiner if (seen_string and joiner) else ""
        seen_string = True

        if stripping:
            if glue:
                glue = _lstrip_chars(glue, strip_set)
            if glue:
                stripping = False  # glue survived → atom text is NOT stripped
            else:
                text = _lstrip_chars(text, strip_set)
                if not text:
                    continue  # whole segment consumed; invisible to grouping
                stripping = False
                # glue was fully consumed (or absent): only the text remains.
                if kind == "B":
                    _flush_text()
                    break_parts.append(text)
                else:
                    _flush_break()
                    text_parts.append(text)
                prev_kind = kind
                continue

        if glue:
            if prev_kind == "B" or kind == "B":
                _flush_text()
                break_parts.append(glue)
            else:
                _flush_break()
                text_parts.append(glue)
        if kind == "B":
            _flush_text()
            break_parts.append(text)
        else:
            _flush_break()
            text_parts.append(text)
        prev_kind = kind

    _flush_break()
    _flush_text()

    # Invariant 3: the first string span is never a chapter_break (the
    # sink's strip removed the canonical leading separator; any residue is
    # plain text as far as downstream consumers are concerned).
    for idx, (kind, text, ref) in enumerate(spans):
        if kind == KIND_MEDIA:
            continue
        if kind == KIND_BREAK:
            spans[idx] = (KIND_TEXT, text, ref)
        break

    return [(k, t, r, order) for order, (k, t, r) in enumerate(spans)]
