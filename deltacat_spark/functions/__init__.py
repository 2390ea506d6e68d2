"""Reusable column/DataFrame functions for the LLM-data-pipeline surface.

The reference ships no scalar-function library (SURVEY §2.7) and no text
or similarity operators; these are the "beyond the reference" operators a
100 TB training-data pipeline needs (dedup, similarity search, text
analysis), built on Spark built-ins so they stay JVM-side.
"""

from deltacat_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    quality_score,
    token_count,
    tokens,
    word_shingles,
)
from deltacat_spark.functions.vectors import cosine_components, l2_norm

__all__ = [
    "char_shingles",
    "cosine_components",
    "doc_fingerprint",
    "l2_norm",
    "quality_score",
    "token_count",
    "tokens",
    "word_shingles",
]
