"""Text-normalization tests — ports tests/test_text_conversion.py:10-102."""

from ebook_conversion_to_text_for_machine_learning_spark.core.normalize import (
    clean_text_block,
    collapse_whitespace_runs,
    dedupe_chapter_breaks,
    ends_with_sentence_punct,
    fold_smart_punctuation,
    squeeze_pdf_whitespace,
    strip_leading_chapter_break,
)

BREAK = "***\n"


class TestFoldSmartPunctuation:
    def test_basic(self):
        assert (
            fold_smart_punctuation("Hello ‘world’! “This” is a test.")
            == "Hello 'world'! \"This\" is a test."
        )

    def test_all_chars(self):
        text = "‘quoted’ “double quoted” – en dash — em dash … ellipsis • bullet"
        expected = "'quoted' \"double quoted\" - en dash - em dash ... ellipsis * bullet"
        assert fold_smart_punctuation(text) == expected

    def test_no_change(self):
        assert fold_smart_punctuation("This is a regular sentence.") == "This is a regular sentence."


class TestDedupeChapterBreaks:
    def test_two(self):
        assert dedupe_chapter_breaks(f"Some text.{BREAK}{BREAK}Some text.") == f"Some text.{BREAK}Some text."

    def test_multiple(self):
        assert (
            dedupe_chapter_breaks(f"Some text.{BREAK}{BREAK}{BREAK}Some text.")
            == f"Some text.{BREAK}Some text."
        )

    def test_no_change(self):
        text = f"Some text.{BREAK}Some text."
        assert dedupe_chapter_breaks(text) == text


class TestStripLeadingChapterBreak:
    def test_strip(self):
        assert strip_leading_chapter_break(f"{BREAK}Some text.") == "Some text."

    def test_single_occurrence_only(self):
        assert strip_leading_chapter_break(f"{BREAK}{BREAK}x") == f"{BREAK}x"

    def test_no_change(self):
        assert strip_leading_chapter_break("Some text.") == "Some text."


class TestCleanTextBlock:
    def test_breaks_with_whitespace(self):
        assert clean_text_block(f"Some text.{BREAK}\n{BREAK}Some text.") == f"Some text.{BREAK}Some text."

    def test_leading_breaks(self):
        assert clean_text_block(f"{BREAK}{BREAK}Some text.") == "Some text."

    def test_keeps_expected_breaks(self):
        text = f"Some text.{BREAK}{BREAK}Some text.{BREAK}Some text."
        assert clean_text_block(text) == f"Some text.{BREAK}Some text.{BREAK}Some text."

    def test_no_extra_whitespace(self):
        assert clean_text_block("This is a normal sentence.") == "This is a normal sentence."

    def test_empty(self):
        assert clean_text_block("") == ""


class TestCollapseWhitespaceRuns:
    def test_basic(self):
        assert collapse_whitespace_runs("  This  is   a  test.  ") == "This is a test."

    def test_keeps_last_char_of_run(self):
        # ``(\s)+`` captures the LAST repetition, so a run collapses to its
        # final whitespace char — not necessarily to a space.
        assert collapse_whitespace_runs(f"String 1.{BREAK}\nString 2.") == "String 1.***\nString 2."
        assert collapse_whitespace_runs("a \tb") == "a\tb"

    def test_no_change(self):
        assert collapse_whitespace_runs("This is a normal sentence.") == "This is a normal sentence."


class TestSqueezePdfWhitespace:
    def test_newline_runs(self):
        assert squeeze_pdf_whitespace("a\n\n\nb") == "a\nb"

    def test_space_runs(self):
        assert squeeze_pdf_whitespace("a    b") == "a b"
        assert squeeze_pdf_whitespace("a \t b") == "a \t b"  # only literal spaces


class TestEndsWithSentencePunct:
    def test_variants(self):
        assert ends_with_sentence_punct("Done.")
        assert ends_with_sentence_punct('He said "stop!" ')
        assert ends_with_sentence_punct('Quoted?"')
        assert not ends_with_sentence_punct("trailing word ")
        assert not ends_with_sentence_punct("comma,")
