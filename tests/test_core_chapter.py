"""Chapter/boilerplate predicate tests.

Ports every assertion of the reference's tests/test_chapter_check.py:14-133
onto the engine's exception-free cores, plus the documented grammar quirks
(SURVEY.md §7.2) that FIXTURES.md relies on.
"""

from ebook_conversion_to_text_for_machine_learning_spark.core.chapter import (
    BOILERPLATE_PREFIXES,
    default_metadata,
    is_boilerplate,
    is_chapter_heading,
    is_number_token,
    is_pdf_header,
    parse_roman,
    parse_spelled_number,
)


class TestParseRoman:
    def test_valid(self):
        assert parse_roman("I") == 1
        assert parse_roman("IV") == 4
        assert parse_roman("IX") == 9
        assert parse_roman("X") == 10
        assert parse_roman("XL") == 40
        assert parse_roman("XC") == 90
        assert parse_roman("C") == 100
        assert parse_roman("CD") == 400
        assert parse_roman("CM") == 900
        assert parse_roman("M") == 1000
        assert parse_roman("MCMXCIX") == 1999

    def test_invalid(self):
        assert parse_roman("IIII") is None  # 4+ consecutive
        assert parse_roman("VV") is None  # duplicate V
        assert parse_roman("VX") is None  # illegal subtraction
        assert parse_roman("IC") is None
        assert parse_roman("IM") is None
        assert parse_roman("A") is None
        assert parse_roman("") is None
        assert parse_roman(123) is None

    def test_reference_quirks(self):
        # The reference grammar accepts non-canonical forms like IXI (= 10).
        assert parse_roman("IXI") == 10
        assert parse_roman("xiv") == 14  # case-insensitive


class TestParseSpelledNumber:
    def test_valid(self):
        assert parse_spelled_number("zero") == 0
        assert parse_spelled_number("one") == 1
        assert parse_spelled_number("twenty-one") == 21
        assert parse_spelled_number("Thirty-Five") == 35
        assert parse_spelled_number("ninety-nine") == 99

    def test_invalid(self):
        assert parse_spelled_number("onehundred") is None
        assert parse_spelled_number("blah") is None
        assert parse_spelled_number("") is None
        assert parse_spelled_number(123) is None

    def test_reference_quirks(self):
        # Greedy reverse-suffix parsing: "teen" alone = 10, concatenations
        # accepted, but the trailing "teen" strands "thir"/"eigh".
        assert parse_spelled_number("teen") == 10
        assert parse_spelled_number("seventeen") == 17
        assert parse_spelled_number("twoone") == 3
        assert parse_spelled_number("thirteen") is None
        assert parse_spelled_number("eighteen") is None
        # "-" cleans to "" and parses to 0 (a valid number!).
        assert parse_spelled_number("-") == 0


class TestIsNumberToken:
    def test_variants(self):
        assert is_number_token("123")
        assert is_number_token("XIV")
        assert is_number_token("twenty-five")
        assert not is_number_token("blah")


class TestIsChapterHeading:
    def test_variants(self):
        assert is_chapter_heading("Chapter 1")
        assert is_chapter_heading("I")
        assert is_chapter_heading("one")
        assert is_chapter_heading("1")
        assert not is_chapter_heading("Introduction")
        assert not is_chapter_heading("IIII")  # invalid-roman decoy
        assert is_chapter_heading("  CHAPTER the long night  ")


class TestIsBoilerplate:
    def test_title_author_match(self):
        assert is_boilerplate("My Awesome Book", "My Awesome Book", "no author found")
        assert is_boilerplate("John Doe", "no title found", "John Doe")

    def test_stopwords(self):
        title, author = default_metadata(None, None)
        assert is_boilerplate("Introduction", title, author)
        assert is_boilerplate("Appendix A", title, author)
        assert not is_boilerplate("Chapter 1", title, author)

    def test_case_insensitive(self):
        title, author = default_metadata(None, None)
        assert is_boilerplate("COPYRIGHT 2020", title, author)

    def test_vocabulary_size(self):
        assert len(BOILERPLATE_PREFIXES) == 43
        assert "sign up" in BOILERPLATE_PREFIXES


class TestIsPdfHeader:
    def test_case_sensitive(self):
        assert is_pdf_header("Sample Title and more", "Sample Title", "A")
        assert is_pdf_header("ends with Sample Author", "T", "Sample Author")
        assert not is_pdf_header("sample title lowered", "Sample Title", "A")


class TestDefaultMetadata:
    def test_defaults(self):
        assert default_metadata(None, None) == ("no title found", "no author found")
        assert default_metadata("T", None) == ("T", "no author found")
        assert default_metadata("", "") == ("", "")
