"""PySpark-native main-content extraction engine.

A from-scratch, Spark-first re-expression of the document-extraction
semantics of the reference library ``ebook2text`` (see SURVEY.md): given a
table of interleaved EPUB/DOCX/PDF/TXT documents pre-parsed into ordered
span arrays, drop front/back-matter boilerplate, split on chapter headings,
fold smart punctuation to ASCII, and emit per-document output span arrays
``(kind, text, media_ref, order)`` whose concatenation reproduces the
reference's extracted text exactly.

Layout:
- ``core/``       pure-Python semantic cores (no Spark import; unit-testable)
- ``operators/``  Spark operators (extraction mapInPandas, dedup, similarity,
                  text stats, media plumbing)
- ``sources/``    table readers / adapters (parquet now, Iceberg DDL documented)
- ``plans/``      end-to-end job pipeline (salting, lineage, metrics, resume)
- ``streaming/``  Structured Streaming variant of the extraction stage
"""

__version__ = "0.1.0"
