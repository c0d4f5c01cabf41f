"""Build real, spec-conformant PDF files for ingest tests — stdlib only.

``build_pdf`` emits a classic-xref PDF (header, indirect objects, xref
table, trailer) whose pages contain one ``Tj`` per text line inside a
single ``BT``/``ET`` block (``Td`` line advances), optionally preceded by
an image XObject ``Do``. This is the layout shape the reference's golden
PDFs exercise (one text line per layout line, images as separate
elements), so the pure-Python extractor (sources/pdf_text.py) and the
pdfminer path both see a well-formed file.

Content streams are FlateDecode-compressed when ``compress=True`` —
covering the dominant machine-generated case — or stored raw.
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Sequence, Tuple, Union

#: A page item: a text line (shown verbatim, one layout line) or an image
#: marker — ``("img",)`` for a default 1×1 gray XObject, or
#: ``("img", spec)`` with a dict of ``width``/``height``/``bpc``/
#: ``color_space``/``filter`` ("FlateDecode" | "DCTDecode" | None) /
#: ``data`` (raw pixel or JPEG bytes) to exercise the image-decode
#: pipeline's gates and paths.
PageItem = Union[str, tuple]


def _escape(text: str) -> bytes:
    return (
        text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def _page_content(items: Sequence[PageItem], image_names: List[str]) -> bytes:
    """Serialize items IN ORDER: each contiguous run of text lines gets
    its own BT/ET block and images emit in place, so text-image-text
    layouts round-trip with the documented item order (a single trailing
    image pass used to push mid-text images after the whole text block).
    Blocks descend a shared y cursor so layout-order readers agree."""
    ops: List[bytes] = []
    img_iter = iter(image_names)
    y = 720
    idx = 0
    while idx < len(items):
        if isinstance(items[idx], str):
            run: List[str] = []
            while idx < len(items) and isinstance(items[idx], str):
                run.append(items[idx])
                idx += 1
            ops.append(b"BT")
            ops.append(b"/F1 12 Tf")
            ops.append(b"72 %d Td" % y)
            first = True
            for line in run:
                if not first:
                    ops.append(b"0 -14 Td")
                y -= 14
                ops.append(b"(" + _escape(line) + b") Tj")
                first = False
            ops.append(b"ET")
        else:
            name = next(img_iter)
            ops.append(b"q 100 0 0 100 72 %d cm /" % y + name.encode() + b" Do Q")
            y -= 14
            idx += 1
    return b"\n".join(ops) + b"\n"


def build_pdf(
    pages: Sequence[Sequence[PageItem]], *, compress: bool = True
) -> Tuple[bytes, List[List[int]]]:
    """Serialize a PDF; returns ``(pdf_bytes, image_object_ids_per_page)``.

    The returned image object ids are what the extractor (and pdfminer via
    ``stream.objid``) reports as each image span's ``media_ref``.
    """
    # --- object numbering: 1 Catalog, 2 Pages, 3 Font, then per page:
    # page, content, images...
    next_num = 4
    page_nums: List[int] = []
    content_nums: List[int] = []
    image_nums: List[List[int]] = []
    for items in pages:
        page_nums.append(next_num)
        content_nums.append(next_num + 1)
        next_num += 2
        imgs = []
        for it in items:
            if not isinstance(it, str):
                imgs.append(next_num)
                next_num += 1
        image_nums.append(imgs)

    bodies: Dict[int, bytes] = {}
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    bodies[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    bodies[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(pages)} >>".encode()
    )
    bodies[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    streams: Dict[int, bytes] = {}
    for pi, items in enumerate(pages):
        names = [f"Im{j}" for j in range(len(image_nums[pi]))]
        xobj = ""
        if names:
            refs = " ".join(
                f"/{name} {num} 0 R" for name, num in zip(names, image_nums[pi])
            )
            xobj = f" /XObject << {refs} >>"
        bodies[page_nums[pi]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >>{xobj} >> "
            f"/Contents {content_nums[pi]} 0 R >>"
        ).encode()

        content = _page_content(items, names)
        if compress:
            data = zlib.compress(content)
            streams[content_nums[pi]] = data
            bodies[content_nums[pi]] = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
            )
        else:
            streams[content_nums[pi]] = content
            bodies[content_nums[pi]] = f"<< /Length {len(content)} >>".encode()

        specs = [it[1] if len(it) > 1 else {} for it in items if not isinstance(it, str)]
        for num, spec in zip(image_nums[pi], specs):
            width = spec.get("width", 1)
            height = spec.get("height", 1)
            bpc = spec.get("bpc", 8)
            cs = spec.get("color_space", "DeviceGray")
            filt = spec.get("filter")
            raw = spec.get("data", b"\x00")
            if filt == "FlateDecode":
                payload = zlib.compress(raw)
            else:  # raw or DCTDecode (JPEG bytes stored verbatim)
                payload = raw
            filter_entry = f" /Filter /{filt}" if filt else ""
            streams[num] = payload
            bodies[num] = (
                f"<< /Type /XObject /Subtype /Image /Width {width} "
                f"/Height {height} /ColorSpace /{cs} /BitsPerComponent {bpc}"
                f"{filter_entry} /Length {len(payload)} >>"
            ).encode()

    # --- serialize with a correct xref table -----------------------------
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: Dict[int, int] = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode()
        out += bodies[num]
        if num in streams:
            out += b"\nstream\n" + streams[num] + b"\nendstream"
        out += b"\nendobj\n"
    xref_at = len(out)
    count = max(bodies) + 1
    out += f"xref\n0 {count}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, count):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {count} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out), image_nums
