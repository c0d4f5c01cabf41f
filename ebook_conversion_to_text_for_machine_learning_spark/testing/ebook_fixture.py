"""Build real EPUB/DOCX files in memory — stdlib only, deterministic.

Byte-level siblings of ``pdf_fixture.build_pdf`` for the zip formats, so
driver queries and tests can run the stdlib readers (``epub_file_to_spans``
/ ``docx_file_to_spans``) over genuine archives with no filesystem or
external data. The EPUB layout matches what the reference's ebooklib path
consumes (container.xml → OPF manifest → XHTML items); the DOCX layout is
minimal WordprocessingML (``word/document.xml`` with runs, optional
``pageBreakBefore`` and ``a:blip`` image references).
"""

from __future__ import annotations

import io
import zipfile
from typing import List, Optional, Sequence, Tuple

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def build_epub(sections: Sequence[Tuple[str, str]]) -> bytes:
    """``sections``: (href, xhtml body) pairs in manifest order."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?>'
            '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container" version="1.0">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles></container>',
        )
        manifest = "".join(
            f'<item id="s{i}" href="{href}" media-type="application/xhtml+xml"/>'
            for i, (href, _) in enumerate(sections)
        )
        spine = "".join(f'<itemref idref="s{i}"/>' for i in range(len(sections)))
        zf.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?>'
            '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="id">'
            f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>",
        )
        for href, body in sections:
            zf.writestr(
                f"OEBPS/{href}",
                "<?xml version='1.0' encoding='utf-8'?><html><head><title>x</title></head>"
                f"<body>{body}</body></html>",
            )
    return buf.getvalue()


def build_docx(
    paragraphs: Sequence[Tuple[str, bool, Optional[str]]],
) -> bytes:
    """``paragraphs``: (text, page_break_before, image_rid_or_None)."""
    paras: List[str] = []
    for text, brk, rid in paragraphs:
        ppr = "<w:pPr><w:pageBreakBefore/></w:pPr>" if brk else ""
        drawing = (
            f'<w:drawing><a:blip xmlns:a="{_A}" r:embed="{rid}"/></w:drawing>'
            if rid
            else ""
        )
        paras.append(f"<w:p>{ppr}<w:r>{drawing}<w:t>{text}</w:t></w:r></w:p>")
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W}" xmlns:r="{_R}">'
        f"<w:body>{''.join(paras)}</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()
