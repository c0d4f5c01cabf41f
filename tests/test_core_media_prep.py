"""1:1 ports of the reference's media-helper tests
(tests/test_pdf_image_helpers.py:9-95) plus the OCR response cleaning and
size-gate semantics (test_ocr.py refusal handling, pdf_image_extractor
size gates)."""

import pytest

from ebook_conversion_to_text_for_machine_learning_spark.compat import (
    ImageTooLargeError,
    ImageTooSmallError,
)
from ebook_conversion_to_text_for_machine_learning_spark.core.media_prep import (
    check_image_size,
    clean_ocr_response,
    expand_bits,
    pillow_mode_for,
    psliteral_to_str,
)


class TestExpandBits:
    def test_2bit_to_8bit_conversion(self):
        assert expand_bits(bytes([0b11001100]), 2) == bytes([255, 0, 255, 0])

    def test_4bit_to_8bit_conversion(self):
        assert expand_bits(bytes([0xF0]), 4) == bytes([255, 0])

    def test_8bit_passthrough(self):
        data = bytes([0, 128, 255])
        assert expand_bits(data, 8) == data

    def test_1bit_passthrough(self):
        data = bytes([0b10101010])
        assert expand_bits(data, 1) == data

    def test_pixel_value_scaling(self):
        assert expand_bits(bytes([0b01101001]), 2) == bytes([85, 170, 170, 85])

    def test_empty_input(self):
        assert expand_bits(b"", 2) == b""

    def test_single_byte_input(self):
        assert expand_bits(bytes([0b00000011]), 2) == bytes([0, 0, 0, 255])

    def test_large_input(self):
        result = expand_bits(bytes([0xFF] * 1000), 4)
        assert len(result) == 2000
        assert all(b == 255 for b in result)

    @pytest.mark.parametrize("depth", [0, -2, 3, 16])
    def test_unsupported_bit_depth(self, depth):
        with pytest.raises(ValueError, match=f"Unsupported bit depth: {depth}"):
            expand_bits(bytes([0xFF]), depth)


class TestPillowMode:
    @pytest.mark.parametrize(
        "space,mode",
        [("", "RGB"), ("DeviceRGB", "RGB"), ("DeviceCMYK", "CMYK"), ("UnknownColorSpace", "RGB")],
    )
    def test_modes(self, space, mode):
        assert pillow_mode_for(space) == mode


def test_psliteral_to_str():
    assert psliteral_to_str("/DCTDecode'") == "DCTDecode"
    assert psliteral_to_str("/'DeviceRGB'") == "DeviceRGB"


class TestSizeGates:
    def test_soft_mask_too_small(self):
        with pytest.raises(ImageTooSmallError):
            check_image_size(2, 2)
        with pytest.raises(ImageTooSmallError):
            check_image_size(4, 500)

    def test_full_page_too_large(self):
        with pytest.raises(ImageTooLargeError):
            check_image_size(1200, 1600)

    def test_wide_but_short_passes(self):
        # the large gate needs BOTH dimensions > 1000 (reference `and`)
        check_image_size(1200, 300)
        check_image_size(5, 5)


class TestCleanOcrResponse:
    def test_no_text_found_maps_to_empty(self):
        assert clean_ocr_response("No text found") == ""

    @pytest.mark.parametrize(
        "refusal",
        [
            "I'm sorry, I can't help with that",
            "I apologize but this is an image",
            "I cannot read this",
            "As a text-based assistant...",
        ],
    )
    def test_refusals_map_to_empty(self, refusal):
        assert clean_ocr_response(refusal) == ""

    def test_real_answer_passes_through(self):
        assert clean_ocr_response("Chapter One") == "Chapter One"
