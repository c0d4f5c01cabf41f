"""Pure media-preparation helpers (pre-ingest image/OCR stage).

These are the reference's image-decode and OCR-response semantics (SURVEY
M4/M5) as plain functions — no Pillow/pdfminer/OpenAI required. At scale
they run in the fixture/ingest tooling that resolves ``media_ref`` payloads
*before* documents enter the engine, but their behavior shapes which spans
exist, so they are ported and pinned 1:1 against the reference's tests.
"""

from __future__ import annotations

import itertools

from ebook_conversion_to_text_for_machine_learning_spark.compat import (
    ImageTooLargeError,
    ImageTooSmallError,
)

#: Refusal markers stripped from OCR answers (reference ocr.py:15-20).
GPT_REFUSALS = (
    "I'm sorry",
    "I apologize",
    "I cannot",
    "text-based",
)

#: Image size gates (reference pdf_image_extractor.py:254-259): soft-mask
#: stand-ins are tiny, full-page scans are huge; both are rejected.
MIN_IMAGE_PX = 5
MAX_IMAGE_PX = 1000


def expand_bits(data: bytes, bit_depth: int) -> bytes:
    """2-/4-bit pixel data → 8-bit; 1/8-bit pass through; else ValueError.

    Reference: pdf_image_extractor.py:18-34 (``_expand_bits``).
    """
    if bit_depth in {8, 1}:
        return data
    if bit_depth not in {2, 4}:
        raise ValueError(f"Unsupported bit depth: {bit_depth}")
    pixels_per_byte = 8 // bit_depth
    mask = (1 << bit_depth) - 1
    result = bytearray()
    for byte, i in itertools.product(data, range(pixels_per_byte - 1, -1, -1)):
        pixel = (byte >> (i * bit_depth)) & mask
        result.append((pixel * 255) // ((1 << bit_depth) - 1))
    return bytes(result)


def pillow_mode_for(color_space: str) -> str:
    """Color space → Pillow mode; unknown spaces default to RGB.

    Reference: pdf_image_extractor.py:42-58 (``_get_pillow_mode``).
    """
    if color_space == "DeviceCMYK":
        return "CMYK"
    return "RGB"


def psliteral_to_str(attr: object) -> str:
    """PSLiteral repr → bare name (reference pdf_image_extractor.py:37-39)."""
    return str(attr).lstrip("/'").rstrip("'")


def check_image_size(width: int, height: int) -> None:
    """Raise the reference's size-gate exceptions.

    ``<5`` px either side → ``ImageTooSmallError`` (caller retries the NEXT
    object id — soft-mask quirk, pdf_image_extractor.py:206-211); ``>1000``
    px both sides → ``ImageTooLargeError`` (full-page scan, skipped,
    pdf_image_extractor.py:212-214, :254-259).
    """
    if width < MIN_IMAGE_PX or height < MIN_IMAGE_PX:
        raise ImageTooSmallError("Image too small. Get soft mask from next object")
    if width > MAX_IMAGE_PX and height > MAX_IMAGE_PX:
        raise ImageTooLargeError("probably full page image")


def clean_ocr_response(answer: str) -> str:
    """Map 'No text found' and refusal answers to '' (reference ocr.py:70-77)."""
    if answer == "No text found":
        return ""
    if any(refusal in answer for refusal in GPT_REFUSALS):
        return ""
    return answer
