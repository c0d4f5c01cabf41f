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
    """
    # 1) Interleave joiner glue between consecutive string atoms; media
    #    atoms are transparent to joining.
    segments: List[Tuple[str, str]] = []  # (type T|B|G|M, payload)
    seen_string = False
    for kind, payload in atoms:
        if kind == "M":
            segments.append(("M", payload or ""))
            continue
        if seen_string and joiner:
            segments.append(("G", joiner))
        elif seen_string:
            pass  # empty joiner: no glue segment
        segments.append((kind, break_text if kind == "B" else (payload or "")))
        seen_string = True

    # 2) Sink-side lstrip over the concatenated string (char-class strip).
    strip_set = frozenset(lstrip_chars)
    stripped: List[Tuple[str, str]] = []
    stripping = bool(strip_set)
    for typ, payload in segments:
        if stripping and typ != "M":
            payload = _lstrip_chars(payload, strip_set)
            if not payload:
                continue  # segment fully consumed by the strip
            stripping = False
        stripped.append((typ, payload))
    segments = stripped

    # 3) Group into spans.
    def _is_break_adjacent(idx: int) -> bool:
        """Is the glue at ``idx`` next to a break marker (skipping media)?"""
        j = idx - 1
        while j >= 0 and segments[j][0] == "M":
            j -= 1
        if j >= 0 and segments[j][0] == "B":
            return True
        j = idx + 1
        while j < len(segments) and segments[j][0] == "M":
            j += 1
        return j < len(segments) and segments[j][0] == "B"

    spans: List[Tuple[str, str, str]] = []
    buffer: List[str] = []

    def _flush_text() -> None:
        if buffer:
            spans.append((KIND_TEXT, "".join(buffer), ""))
            buffer.clear()

    i = 0
    n = len(segments)
    while i < n:
        typ, payload = segments[i]
        if typ == "M":
            _flush_text()
            spans.append((KIND_MEDIA, "", payload))
            i += 1
        elif typ == "B" or (typ == "G" and _is_break_adjacent(i)):
            _flush_text()
            run: List[str] = []
            while i < n:
                t, p = segments[i]
                if t == "B" or (t == "G" and _is_break_adjacent(i)):
                    run.append(p)
                    i += 1
                else:
                    break
            spans.append((KIND_BREAK, "".join(run), ""))
        else:  # T, or glue between two text chunks
            buffer.append(payload)
            i += 1
    _flush_text()

    # 4) Invariant 3: the first string span is never a chapter_break (the
    #    sink's strip removed the canonical leading separator; any residue is
    #    plain text as far as downstream consumers are concerned).
    for idx, (kind, text, ref) in enumerate(spans):
        if kind == KIND_MEDIA:
            continue
        if kind == KIND_BREAK:
            spans[idx] = (KIND_TEXT, text, ref)
        break

    return [(k, t, r, order) for order, (k, t, r) in enumerate(spans)]
