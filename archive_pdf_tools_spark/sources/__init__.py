"""Table sources: the synthetic interleaved corpus (generated
executor-side) and the driver testdata parquet tables."""

from .corpus_source import synthetic_documents  # noqa: F401
from .testdata import load_table, load_tables  # noqa: F401
