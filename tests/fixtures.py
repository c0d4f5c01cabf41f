"""Re-export of the package's golden fixtures (kept importable as tests.fixtures)."""

from ebook_conversion_to_text_for_machine_learning_spark.testing.fixtures import *  # noqa: F401,F403
from ebook_conversion_to_text_for_machine_learning_spark.testing.fixtures import (  # noqa: F401
    _PDF_PAGES,
    _doc,
    _pdf_doc,
    _spans,
)
