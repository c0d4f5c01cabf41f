"""Format dispatch for the per-document extraction fold (SURVEY.md §2.1 S1).

Unknown formats are quarantined, not raised: at 10^12-document scale a bad
row must become a status code, never a task failure (the reference raises
``ValueError`` for unknown extensions, convert_file.py:28-36 — we map that
to ``status='unknown_format'``).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ebook_conversion_to_text_for_machine_learning_spark.core.chapter import (
    default_metadata,
)
from ebook_conversion_to_text_for_machine_learning_spark.core.formats import (
    extract_docx,
    extract_epub,
    extract_pdf,
    extract_txt,
)
from ebook_conversion_to_text_for_machine_learning_spark.core.spans import OutSpan

InSpan = Tuple[str, str, str]

_DISPATCH = {
    "epub": extract_epub,
    "docx": extract_docx,
    "pdf": extract_pdf,
    "txt": extract_txt,
    "text": extract_txt,  # reference accepts both .txt and .text (convert_file.py:34)
}

STATUS_OK = "ok"
STATUS_UNKNOWN_FORMAT = "unknown_format"
STATUS_ERROR = "error"


def extract_document(
    fmt: str,
    spans: Sequence[InSpan],
    title: str | None,
    author: str | None,
) -> Tuple[List[OutSpan], str]:
    """Run one document through its format fold.

    ``spans`` must already be in source order. Returns ``(output_spans,
    status)``; extraction failures are caught per-document so a poisoned row
    cannot kill an executor task.
    """
    fold = _DISPATCH.get(fmt)
    if fold is None:
        return [], STATUS_UNKNOWN_FORMAT
    resolved_title, resolved_author = default_metadata(title, author)
    try:
        return fold(spans, resolved_title, resolved_author), STATUS_OK
    except Exception:  # noqa: BLE001 — quarantine, mirror reference's error rows
        return [], STATUS_ERROR
