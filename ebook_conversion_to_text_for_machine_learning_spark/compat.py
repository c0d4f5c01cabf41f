"""Public-API compatibility with the reference library.

Mirrors the reference's exception hierarchy (_exceptions.py:31-48) and its
swappable module logger (_logger.py:1-34) so code written against the
reference can switch imports and keep its ``except EpubConversionError``
handlers and ``set_logger(...)`` calls working unchanged. The image-size
exceptions (_exceptions.py:1-24) belong to the pre-ingest image decode
stage, carried here for completeness.
"""

from __future__ import annotations

import logging
from typing import Any


class ImageSizeError(Exception):
    """Image size-related errors (pre-ingest decode stage)."""


class ImageTooSmallError(ImageSizeError):
    pass


class ImageTooLargeError(ImageSizeError):
    pass


class NoResponseError(Exception):
    """OCR transport failure (reference ocr.py retry path)."""


class EbookConversionError(Exception):
    pass


class EpubConversionError(EbookConversionError):
    pass


class PDFConversionError(EbookConversionError):
    pass


class DocxConversionError(EbookConversionError):
    pass


class TextConversionError(EbookConversionError):
    pass


class _LoggerProxy:
    """Late-bound logger: defaults to the stdlib logger for this package,
    replaceable wholesale via ``set_logger`` (reference _logger.py:5-23)."""

    def __init__(self) -> None:
        self._logger: Any = None

    def set_logger(self, custom_logger: Any) -> None:
        self._logger = custom_logger

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            # Dunder probes (pickling's __reduce_ex__, copy, etc.) must
            # fail fast: falling through to self._logger recurses forever
            # on a partially-constructed instance and made the proxy
            # unpicklable in Spark closures.
            raise AttributeError(name)
        if self._logger is None:
            # Match the reference's first-use behavior (_logger.py
            # _add_basic_logger): ensure a root handler exists AND an
            # effective INFO level so default logger.info/debug calls are
            # emitted, not silently dropped (basicConfig without level=
            # leaves the root at WARNING). basicConfig is a no-op when the
            # application has already configured handlers.
            logging.basicConfig(level=logging.INFO)
            self._logger = logging.getLogger(
                "ebook_conversion_to_text_for_machine_learning_spark"
            )
        return getattr(self._logger, name)


logger = _LoggerProxy()


def set_logger(custom_logger: Any) -> None:
    """Swap the library-wide logger (reference _logger.py:27-34)."""
    logger.set_logger(custom_logger)
