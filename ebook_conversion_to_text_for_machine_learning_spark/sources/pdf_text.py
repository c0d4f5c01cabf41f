"""Pure-stdlib PDF text extraction (the common-case ``.pdf`` ingest path).

The reference reads PDFs through pdfminer's layout tree
(pdf_conversion/pdf_text_extractor.py:43-129): per page it classifies
top-level elements — objects with a ``stream`` become images keyed by
object id, ``LTText`` elements become lines (``get_text()`` keeps the
trailing newline), and containers recurse into their FIRST child only.
pdfminer is not installable in this sandbox, so this module implements the
subset of the PDF object model that covers the overwhelmingly common
machine-generated ebook case with nothing but ``re`` + ``zlib``:

- classic cross-reference PDFs (objects scanned directly, so damaged or
  1.5+ xref-table variants still parse as long as objects are not packed
  into object streams);
- uncompressed and FlateDecode content streams;
- text via BT/ET blocks: ``Tj``/``TJ``/``'``/``"`` show-text operators,
  line advances from ``Td``/``TD``/``T*``/``Tm``/``'``;
- image XObjects referenced by ``Do``, emitted as ``("img", "", objid)``
  in content order — the media_ref matches pdfminer's ``stream.objid``;
- the reference's 25-page cap (pdf_text_extractor.py:63 ``maxpages=25``).

Line semantics: every flushed text line becomes one ``("line", text+"\\n",
"")`` span, matching ``LTTextLine.get_text()``. The reference's
first-child-only container recursion reduces to the identity here because
each extracted line is modeled as its own single-line box (the same shape
its golden-test PDFs produce, one text box per line).

Not handled (use the pdfminer path for these): encrypted files, object
streams (ObjStm), CID/Type0 composite fonts, and glyph repositioning via
``Tm`` with rotation. Strings decode as Latin-1, the identity for the
simple WinAnsi-ish fonts ebook PDFs use.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

InSpan = Tuple[str, str, str, int]

_MAX_PAGES = 25  # reference: extract_pages(..., maxpages=25)

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


class _Name(str):
    """PDF name object (``/Foo`` → ``_Name('Foo')``)."""


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
            i += 1
        elif c == b"%":  # comment to end of line
            while i < n and data[i : i + 1] not in (b"\r", b"\n"):
                i += 1
        else:
            break
    return i


_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


def _parse_value(data: bytes, i: int):
    """Parse one PDF object value at ``i``; returns (value, next_index)."""
    i = _skip_ws(data, i)
    c = data[i : i + 1]
    if c == b"<":
        if data[i : i + 2] == b"<<":
            return _parse_dict(data, i)
        return _parse_hex_string(data, i)
    if c == b"(":
        return _parse_literal_string(data, i)
    if c == b"[":
        i += 1
        out: list = []
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 1] == b"]":
                return out, i + 1
            v, i = _parse_value(data, i)
            out.append(v)
    if c == b"/":
        j = i + 1
        while j < len(data) and data[j : j + 1] not in _WHITESPACE and data[
            j : j + 1
        ] not in (b"(", b")", b"<", b">", b"[", b"]", b"{", b"}", b"/", b"%"):
            j += 1
        return _Name(data[i + 1 : j].decode("latin-1")), j
    if data[i : i + 4] == b"true":
        return True, i + 4
    if data[i : i + 5] == b"false":
        return False, i + 5
    if data[i : i + 4] == b"null":
        return None, i + 4
    m = _REF_RE.match(data, i)
    if m:
        return _Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        text = m.group(0)
        return (float(text) if b"." in text else int(text)), m.end()
    raise ValueError(f"unparseable PDF value at offset {i}: {data[i:i+20]!r}")


def _parse_dict(data: bytes, i: int):
    assert data[i : i + 2] == b"<<"
    i += 2
    out: Dict[str, object] = {}
    while True:
        i = _skip_ws(data, i)
        if data[i : i + 2] == b">>":
            return out, i + 2
        key, i = _parse_value(data, i)
        val, i = _parse_value(data, i)
        out[str(key)] = val


_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_literal_string(data: bytes, i: int):
    assert data[i : i + 1] == b"("
    i += 1
    depth = 1
    out = bytearray()
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ooo (1-3 digits)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and data[j : j + 1].isdigit():
                    digits += data[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
            elif nxt in (b"\r", b"\n"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out += c
        i += 1
    raise ValueError("unterminated PDF string")


def _parse_hex_string(data: bytes, i: int):
    end = data.index(b">", i + 1)
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : end])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode("ascii")), end + 1


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")


class _PdfFile:
    """Minimal indirect-object store scanned straight off the raw bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.objects: Dict[int, Tuple[dict, Optional[bytes]]] = {}
        #: byte offset just past each object's `obj` keyword, recorded by
        #: the stream-skipping scan (so scalar re-parses cannot be
        #: shadowed by fake "N G obj" bytes inside stream bodies)
        self._offsets: Dict[int, int] = {}
        self._scan()

    def _scan(self) -> None:
        # Manual cursor, NOT finditer over the whole file: stream bodies
        # are effectively random bytes (FlateDecode), so "N G obj"
        # sequences inside them would clobber real objects. After parsing
        # an object's stream the cursor jumps past it before searching on.
        pos = 0
        while True:
            m = _OBJ_RE.search(self.data, pos)
            if m is None:
                break
            num = int(m.group(1))
            self._offsets[num] = m.end()
            i = _skip_ws(self.data, m.end())
            body: dict = {}
            stream: Optional[bytes] = None
            if self.data[i : i + 2] == b"<<":
                body, i = _parse_dict(self.data, i)
                i = _skip_ws(self.data, i)
                if self.data[i : i + 6] == b"stream":
                    i += 6
                    if self.data[i : i + 2] == b"\r\n":
                        i += 2
                    elif self.data[i : i + 1] == b"\n":
                        i += 1
                    length = self.resolve(body.get("Length"))
                    if isinstance(length, int):
                        # Trust Length only if `endstream` actually follows:
                        # an overstated Length would jump the cursor past
                        # (and silently drop) later real objects.
                        j = _skip_ws(self.data, i + length)
                        if self.data[j : j + 9] != b"endstream":
                            length = None
                    if isinstance(length, int):
                        stream = self.data[i : i + length]
                        i += length
                    else:  # damaged/absent Length: fall back to scanning
                        end = self.data.find(b"endstream", i)
                        if end == -1:
                            end = len(self.data)
                        stream = self.data[i:end].rstrip(b"\r\n")
                        i = end
            self.objects[num] = (body, stream)
            pos = max(i, m.end())

    def resolve(self, value):
        seen = set()
        while isinstance(value, _Ref):
            if value.num in seen or value.num not in self.objects:
                return None
            seen.add(value.num)
            body, stream = self.objects[value.num]
            if stream is not None:
                return (body, stream)
            if body:
                return body
            # Bare scalar object (e.g. an indirect /Length): re-parse the
            # raw bytes, since _scan only captures dict bodies.
            value = self._parse_scalar(value.num)
        return value

    def _parse_scalar(self, num: int):
        # Offsets come from the stream-skipping scan — a raw finditer here
        # could match fake "N G obj" bytes inside an earlier stream body
        # and shadow the real object. A FORWARD indirect /Length (object
        # scanned later than its use) misses and falls back to the
        # endstream scan in _scan, which is the damaged-Length path.
        pos = self._offsets.get(num)
        if pos is None:
            return None
        v, _ = _parse_value(self.data, pos)
        return v

    def decoded_stream(self, num: int) -> bytes:
        body, stream = self.objects.get(num, ({}, None))
        if stream is None:
            return b""
        filt = body.get("Filter")
        filters = [filt] if not isinstance(filt, list) else filt
        out = stream
        for f in filters:
            if f is None:
                continue
            if str(f) == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error as e:  # corrupt stream → parse error
                    raise ValueError(f"FlateDecode failed: {e}") from e
            else:  # unsupported filter (DCT etc.) — not a text stream
                return b""
        return out

    # -- page tree ---------------------------------------------------------

    def page_numbers(self) -> List[int]:
        """Page object numbers in tree order (fallback: numeric order)."""
        root_pages = None
        for num, (body, _s) in self.objects.items():
            if str(body.get("Type")) == "Catalog":
                root_pages = body.get("Pages")
                break
        ordered: List[int] = []
        visited: set = set()  # corrupt Kids graphs can cycle

        def walk(ref) -> None:
            if not isinstance(ref, _Ref) or ref.num not in self.objects:
                return
            if ref.num in visited:
                return
            visited.add(ref.num)
            body, _s = self.objects[ref.num]
            t = str(body.get("Type"))
            if t == "Pages":
                for kid in body.get("Kids") or []:
                    walk(kid)
            elif t == "Page":
                ordered.append(ref.num)

        walk(root_pages)
        if ordered:
            return ordered
        return sorted(
            num for num, (body, _s) in self.objects.items()
            if str(body.get("Type")) == "Page"
        )


_TOKEN_RE = re.compile(
    rb"""
    (?P<str>\() | (?P<hex><(?!<)) | (?P<dict><<|>>) | (?P<arr>\[|\]) |
    (?P<name>/[^\s()<>\[\]{}/%]*) |
    (?P<num>[+-]?\d*\.?\d+) |
    (?P<op>[A-Za-z'"*]+)
    """,
    re.VERBOSE,
)


def _content_tokens(content: bytes):
    """Token stream for a content stream: strings/arrays/names/numbers/ops."""
    i = 0
    n = len(content)
    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            return
        m = _TOKEN_RE.match(content, i)
        if not m:
            i += 1  # skip junk byte
            continue
        if m.lastgroup == "str":
            s, i = _parse_literal_string(content, i)
            yield ("str", s)
        elif m.lastgroup == "hex":
            s, i = _parse_hex_string(content, i)
            yield ("str", s)
        elif m.lastgroup == "arr":
            yield ("arr", m.group(0))
            i = m.end()
        elif m.lastgroup == "dict":
            yield ("dict", m.group(0))
            i = m.end()
        elif m.lastgroup == "name":
            yield ("name", m.group(0)[1:].decode("latin-1"))
            i = m.end()
        elif m.lastgroup == "num":
            t = m.group(0)
            yield ("num", float(t) if b"." in t else int(t))
            i = m.end()
        else:
            yield ("op", m.group(0).decode("latin-1"))
            i = m.end()


def _extract_page_rows(
    content: bytes, image_xobjects: Dict[str, int]
) -> List[Tuple[str, str, str]]:
    """One content stream → ordered (kind, text, media_ref) rows.

    Text state: a line buffer flushed on every line-advance operator
    (``Td``/``TD`` with a vertical move, ``T*``, ``Tm`` with a new y, the
    ``'``/``"`` next-line-show forms) and at ``ET``; flushed lines keep a
    trailing newline, pdfminer-style. ``Do`` of an image XObject emits an
    img row keyed by the image's object id, as the reference does with
    ``element.stream.objid``.
    """
    rows: List[Tuple[str, str, str]] = []
    stack: List[object] = []
    line: List[str] = []
    in_text = False
    current_y: Optional[float] = None

    def flush() -> None:
        if line:
            rows.append(("line", "".join(line) + "\n", ""))
            line.clear()

    for kind, value in _content_tokens(content):
        if kind in ("str", "num", "name"):
            stack.append(value)
            continue
        if kind in ("arr", "dict"):
            # Delimiter tokens hold a stack position but must never look
            # like shown text: pushing the raw b'[' / b']' bytes made the
            # TJ handler emit them into the line ("[HelloWorld]").
            stack.append(None)
            continue
        op = value
        if op == "BT":
            in_text = True
            current_y = None
            stack.clear()
        elif op == "ET":
            flush()
            in_text = False
            stack.clear()
        elif op == "Tj" and in_text:
            if stack and isinstance(stack[-1], bytes):
                line.append(stack[-1].decode("latin-1"))
            stack.clear()
        elif op == "TJ" and in_text:
            # Everything bytes-typed back to the array-open marker is shown
            # text; numeric kerns are positioning only.
            for item in stack:
                if isinstance(item, bytes):
                    line.append(item.decode("latin-1"))
            stack.clear()
        elif op in ("'", '"') and in_text:
            flush()
            if stack and isinstance(stack[-1], bytes):
                line.append(stack[-1].decode("latin-1"))
            stack.clear()
        elif op in ("Td", "TD") and in_text:
            ty = stack[-1] if stack and isinstance(stack[-1], (int, float)) else 0
            if ty != 0:
                flush()
            stack.clear()
        elif op == "T*" and in_text:
            flush()
            stack.clear()
        elif op == "Tm" and in_text:
            ty = stack[-1] if stack and isinstance(stack[-1], (int, float)) else None
            if current_y is not None and ty != current_y:
                flush()
            current_y = ty if isinstance(ty, (int, float)) else current_y
            stack.clear()
        elif op == "Do":
            name = stack[-1] if stack and isinstance(stack[-1], str) else None
            if name in image_xobjects:
                flush()
                rows.append(("img", "", str(image_xobjects[name])))
            stack.clear()
        else:
            stack.clear()
    flush()
    return rows


def pdf_bytes_to_rows(data: bytes) -> List[Tuple[str, str, str]]:
    """Whole file → ordered rows with ``page_break`` markers between pages."""
    pdf = _PdfFile(data)
    pages = pdf.page_numbers()
    if not pages:
        raise ValueError("no PDF pages found")
    rows: List[Tuple[str, str, str]] = []
    for page_index, page_num in enumerate(pages[:_MAX_PAGES]):
        if page_index:
            rows.append(("page_break", "", ""))
        body, _stream = pdf.objects[page_num]

        image_xobjects: Dict[str, int] = {}
        resources = pdf.resolve(body.get("Resources"))
        if isinstance(resources, tuple):
            resources = resources[0]
        if isinstance(resources, dict):
            xobjects = pdf.resolve(resources.get("XObject"))
            if isinstance(xobjects, tuple):
                xobjects = xobjects[0]
            if isinstance(xobjects, dict):
                for name, ref in xobjects.items():
                    if isinstance(ref, _Ref) and ref.num in pdf.objects:
                        xbody, _xs = pdf.objects[ref.num]
                        if str(xbody.get("Subtype")) == "Image":
                            image_xobjects[name] = ref.num

        contents = body.get("Contents")
        content_refs = contents if isinstance(contents, list) else [contents]
        content = b"\n".join(
            pdf.decoded_stream(ref.num)
            for ref in content_refs
            if isinstance(ref, _Ref)
        )
        rows.extend(_extract_page_rows(content, image_xobjects))
    return rows
